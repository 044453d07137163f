"""Graph analytics over document/embedding similarity graphs.

``connected_components_star`` (dedup.py) covers clustering; this module
adds PageRank — the standard importance score for graph-based data
selection (e.g. rank documents by centrality in the near-dup/similarity
graph and keep one representative per dense region).

Spark-first shape: PageRank is iterated join-aggregate, NOT a driver
loop over collected data — each iteration is one keyed equi-join
(contributions) plus one partial-aggregated groupBy (sums), both
shuffle-partitioned on vertex id. Iteration count is a fixed parameter
(data-independent), so the whole computation is a static DAG Catalyst
can pipeline; per-iteration contributions are round(·,9)-ed and summed
in exact DECIMAL so the result is identical under any partitioning and
hash-stable against a DuckDB oracle with the iterations unrolled as
CTEs (the same determinism discipline as semdedup's unrolled k-means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """PageRank over an UNDIRECTED edge list (distinct canonical pairs).

    Returns (vid, pagerank) for every vertex incident to an edge.
    ``iters`` fixed-point steps of r ← (1-d)/N + d·Σ r(u)/deg(u).

    The only driver-side value is N (one count — a scalar, not data).
    At 100 TB scale the edge list comes from the LSH/IVF candidate
    generators rather than brute-force similarity; the iteration cost is
    iters × (one shuffle join + one shuffled partial agg), both keyed on
    vertex id, AQE-skew-safe.

    All rank mass is carried as exact BIGINT nano-units (1e9 = mass 1.0):
    contributions use integer division, sums are integer sums, and the
    only float op per iteration — damping × sum — is a single IEEE
    multiply+floor that every engine evaluates identically. This sidesteps
    the decimal-rounding halfway cases that plague round(r/deg, k) (9-dp
    ranks divided by small integers land on exact .5 boundaries, where
    HALF_UP and HALF_EVEN engines disagree).
    """
    directed = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionAll(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    # iterative algorithm: pin the edge list + degrees, or every iteration
    # re-derives them from lineage (for a KNN graph that means re-running
    # candidate generation per step — the standard cache point in any
    # Spark graph iteration)
    directed = directed.cache()
    deg = directed.groupBy("src").agg(F.count("*").alias("deg")).cache()
    n = deg.count()
    # oracle parity: the SQL twin must write these with the same literal
    # ops — (1.0 - d) differs from the folded constant in the last ulp
    base_nanos = int((1.0 - damping) * 1000000000.0 / n)
    r = deg.select(
        F.col("src").alias("vid"),
        F.lit(int(1000000000.0 / n)).cast("long").alias("r"),
    )
    for _ in range(iters):
        contrib = (
            directed.join(r, directed["src"] == r["vid"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("cvid"),
                F.expr("r div deg").alias("c"),
            )
        )
        sums = contrib.groupBy("cvid").agg(F.sum("c").alias("s"))
        r = (
            r.join(sums, r["vid"] == sums["cvid"], "left")
            .select(
                F.col("vid"),
                (
                    F.lit(base_nanos)
                    + F.floor(F.lit(damping) * F.coalesce(F.col("s"), F.lit(0)))
                ).cast("long").alias("r"),
            )
        )
    return r.select(
        "vid",
        F.col("r").alias("pagerank_nanos"),
        (F.col("r") / F.lit(1000000000.0)).alias("pagerank"),
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) over an
    UNDIRECTED edge list — community detection for similarity graphs
    (pick one representative per community, or cap per-community counts,
    the coarser cousin of the near-dup clusters).

    Every vertex starts labeled with its own id; each round it adopts the
    label most frequent among its neighbors, ties broken by smallest
    label — the deterministic variant, so a fixed ``iters`` unrolls into
    a DuckDB CTE oracle exactly like pagerank. Each round is one keyed
    join + one partial-agg count + one per-vertex top-1 (row_number over
    a count/label ordering) — all shuffle-partitioned on vertex id, no
    driver-side state at any point.
    """
    from pyspark.sql import Window

    directed = edges.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionAll(edges.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
    directed = directed.cache()  # same pin as pagerank: one derivation
    labels = directed.select(F.col("src").alias("vid")).distinct().select(
        "vid", F.col("vid").alias("lbl")
    )
    for _ in range(iters):
        neigh = directed.join(
            labels, directed["dst"] == labels["vid"]
        ).select(directed["src"].alias("v"), "lbl")
        cnt = neigh.groupBy("v", "lbl").agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("v").orderBy(F.col("c").desc(), F.col("lbl").asc())
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("v").alias("vid"), "lbl")
        )
    sizes = labels.groupBy("lbl").agg(
        F.count(F.lit(1)).cast("long").alias("community_size")
    )
    return labels.join(sizes, "lbl").select(
        "vid", F.col("lbl").alias("community"), "community_size"
    )
