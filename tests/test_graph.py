"""PageRank (operators/graph.py): Spark result vs an independent pure-
Python mirror of the integer nano-unit algorithm, plus structural
properties."""

from __future__ import annotations

import math

from frappe_data_pipelines_spark.operators.graph import pagerank


def _py_pagerank(edge_list, damping=0.85, iters=3):
    adj: dict = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    deg = {v: len(nb) for v, nb in adj.items()}
    base = int((1.0 - damping) * 1000000000.0 / n)
    r = {v: int(1000000000.0 / n) for v in adj}
    for _ in range(iters):
        s = {v: 0 for v in adj}
        for u, nbs in adj.items():
            c = r[u] // deg[u]
            for v in nbs:
                s[v] += c
        r = {v: base + math.floor(damping * s[v]) for v in adj}
    return r


def test_pagerank_matches_python_reference(spark):
    edge_list = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (6, 4), (7, 1)]
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    got = {
        row["vid"]: row["pagerank_nanos"]
        for row in pagerank(edges, damping=0.85, iters=3).collect()
    }
    assert got == _py_pagerank(edge_list)


def test_pagerank_star_center_dominates(spark):
    edge_list = [(0, i) for i in range(1, 8)]
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    rows = pagerank(edges, iters=3).collect()
    ranks = {r["vid"]: r["pagerank_nanos"] for r in rows}
    assert all(ranks[0] > ranks[i] for i in range(1, 8))
    # mass conservation up to integer-floor loss: one nano per floor per
    # vertex per iteration, plus the initial split remainder
    total = sum(ranks.values())
    assert abs(total - 1_000_000_000) < 8 * 4 * 2 + 1000


class TestLabelPropagation:
    def _run(self, spark, pairs, iters=3):
        from frappe_data_pipelines_spark.operators.graph import label_propagation

        edges = spark.createDataFrame(pairs, "id_a string, id_b string")
        return {
            r["vid"]: (r["community"], r["community_size"])
            for r in label_propagation(edges, iters=iters).collect()
        }

    def test_two_cliques_with_bridge(self, spark):
        # two triangles joined by one bridge edge: LPA should give each
        # triangle one community (min-label wins within each)
        tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
        tri2 = [("x", "y"), ("y", "z"), ("x", "z")]
        got = self._run(spark, tri1 + tri2 + [("c", "x")])
        assert got["a"][0] == got["b"][0] == got["c"][0]
        assert got["x"][0] == got["y"][0] == got["z"][0]

    def test_isolated_edge_converges_to_min_label(self, spark):
        got = self._run(spark, [("p", "q")])
        # synchronous 2-cycle oscillation resolves by the min-label tie
        # break only via majority — with one neighbor each, labels swap;
        # after an odd round count p holds q's label and vice versa, but
        # community labels still form exactly one 2-community partition
        assert len({v[0] for v in got.values()}) <= 2
        assert all(v[1] >= 1 for v in got.values())

    def test_deterministic_across_runs(self, spark):
        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("b", "d")]
        assert self._run(spark, pairs) == self._run(spark, pairs)
