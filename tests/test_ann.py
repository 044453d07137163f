"""ANN operator tests: IVF and LSH recall against the brute-force oracle."""

from __future__ import annotations

import pytest

import numpy as np

from pyspark.sql import functions as F

from frappe_data_pipelines_spark.operators import ann
from frappe_data_pipelines_spark.operators.search import knn_topk
from frappe_data_pipelines_spark.sources.tables import load_table


def _query_vec(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return list(emb.filter(F.col("vec_id") == 0).first()["embedding"])


def test_ivf_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    exact = [r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()]
    assigned, centroids = ann.ivf_build(emb, n_clusters=8, n_iter=2)
    approx = [r["vec_id"] for r in ann.ivf_search(assigned, centroids, qv, k=10, n_probe=6).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"IVF recall {recall}"


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    _, c1 = ann.ivf_build(emb, n_clusters=4, n_iter=1)
    _, c2 = ann.ivf_build(emb, n_clusters=4, n_iter=1)
    assert c1 == c2


def test_ivf_sampled_training(spark, sf_dir):
    """The 100TB path: centroids train on a bounded hash-sample (faiss-style
    IVF recipe), the full corpus only gets the one assignment pass. Sample
    training must stay deterministic, assign every row, and keep recall
    useful."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    assigned, c1 = ann.ivf_build(
        emb, n_clusters=8, n_iter=2, max_train_rows=n // 4
    )
    _, c2 = ann.ivf_build(emb, n_clusters=8, n_iter=2, max_train_rows=n // 4)
    assert c1 == c2  # hash-sample is order/partitioning independent
    assert assigned.count() == n  # every row assigned, not just the sample
    assert assigned.filter(F.col("cluster") < 0).count() == 0
    qv = _query_vec(spark, sf_dir)
    exact = [r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in ann.ivf_search(assigned, c1, qv, k=10, n_probe=6).collect()
    ]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.5, f"sampled-IVF recall {recall}"


def test_lsh_pairs_subset_of_brute(spark, sf_dir):
    """Every LSH pair must be a true ≥threshold pair (precision = 1 since we
    re-score exactly); recall over the bucketed candidates is partial by
    design."""
    from frappe_data_pipelines_spark.operators.dedup import embedding_neardup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    brute = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in embedding_neardup_pairs(emb, threshold=0.3).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in ann.lsh_similarity_join(emb, n_planes=6, threshold=0.3).collect()
    }
    assert lsh, "LSH should find some pairs"
    for k, v in lsh.items():
        assert k in brute
        assert abs(brute[k] - v) < 1e-9


def test_mllib_lsh_recall_vs_brute(spark, sf_dir):
    """MLlib BucketedRandomProjectionLSH candidates cover most true
    near-pairs (vectors are L2-normalized, so dist² = 2 - 2·cos)."""
    import math

    from frappe_data_pipelines_spark.operators.ann import mllib_lsh_similarity_join
    from frappe_data_pipelines_spark.operators.dedup import embedding_neardup_pairs
    from frappe_data_pipelines_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cos_floor = 0.3
    dist_ceil = math.sqrt(2 - 2 * cos_floor) + 1e-6
    truth = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=cos_floor).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in mllib_lsh_similarity_join(emb, threshold_dist=dist_ceil, num_tables=4).collect()
    }
    assert truth, "expected true near pairs"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"recall {recall}"


def test_ivf_cluster_becomes_partition_pruning(spark, sf_dir, tmp_path):
    """The IVF promise (operators/ann.py): persisting vectors partitioned by
    cluster turns n_probe selection into parquet partition pruning — the
    scan's PartitionFilters carries the cluster predicate, so non-probed
    clusters are never read."""
    from frappe_data_pipelines_spark.operators import ann
    from frappe_data_pipelines_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ann.ivf_build(emb, n_clusters=4, n_iter=1)
    path = str(tmp_path / "ivf_vectors")
    assigned.write.partitionBy("cluster").parquet(path)

    stored = spark.read.parquet(path)
    qv = [float(x) for x in emb.first()["embedding"]]
    hits = ann.ivf_search(stored, centroids, qv, k=5, n_probe=2)
    hits.collect()
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cluster" in plan
    assert hits.count() == 5


class TestProductQuantization:
    def test_pq_recall_and_determinism(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators import ann
        from frappe_data_pipelines_spark.operators.search import knn_topk
        from frappe_data_pipelines_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        qv = [float(x) for x in emb.first()["embedding"]]

        # fine quantization: the testdata vectors are near-orthogonal noise,
        # so neighbor gaps are tiny — 16 subvectors x 64 centroids keeps them
        books = ann.pq_train(emb, m_subvectors=16, k_centroids=64)
        books2 = ann.pq_train(emb, m_subvectors=16, k_centroids=64)
        assert (books == books2).all()  # deterministic training

        codes = ann.pq_encode(emb, books)
        assert codes.count() == emb.count()
        row = codes.first()
        assert len(row["codes"]) == 16 and all(0 <= c < 64 for c in row["codes"])

        exact = [r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()]
        approx = [r["id"] for r in ann.pq_search(codes, books, qv, k=20).collect()]
        recall = len(set(exact) & set(approx)) / 10
        assert recall >= 0.5, f"PQ recall@10-in-20 {recall}"

    def test_pq_compression_shape(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators import ann
        from frappe_data_pipelines_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        with __import__("pytest").raises(ValueError, match="divisible"):
            ann.pq_train(emb, m_subvectors=7)


def test_ivf_write_read_roundtrip(spark, sf_dir, tmp_path):
    from frappe_data_pipelines_spark.operators import ann
    from frappe_data_pipelines_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = ann.ivf_build(emb, n_clusters=4, n_iter=1)
    path = str(tmp_path / "ivf_idx")
    ann.ivf_write(assigned, cents, path)
    stored, cents2 = ann.ivf_read(spark, path)
    assert cents2 == cents
    assert stored.count() == emb.count()
    qv = [float(x) for x in emb.first()["embedding"]]
    hits = ann.ivf_search(stored, cents2, qv, k=5, n_probe=2)
    assert hits.count() == 5


def test_pq_rerank_beats_adc_only(spark, sf_dir):
    """Exact re-rank of the ADC shortlist recovers the recall PQ's
    quantization error loses (the IVFADC pattern)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    exact = {r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()}
    books = ann.pq_train(emb, m_subvectors=8, k_centroids=16, n_iter=3)
    codes = emb.sparkSession.createDataFrame(
        ann.pq_encode(emb, books).collect()
    )  # materialize once for both searches
    adc = {r["id"] for r in ann.pq_search(codes, books, qv, k=10).collect()}
    rr = {
        r["vec_id"]
        for r in ann.pq_search_rerank(codes, emb, books, qv, k=10, rerank_depth=100).collect()
    }
    assert len(rr & exact) >= len(adc & exact)
    assert len(rr & exact) >= 5  # shortlist depth 100 on this corpus


def test_knn_batch_matches_per_query(spark, sf_dir):
    """Batched multi-query KNN returns exactly the per-query brute-force
    top-k for every query in the batch."""
    emb = load_table(spark, sf_dir, "embeddings")
    ids = [0, 7, 42]
    qdf = emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann.knn_batch(emb, qdf, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    for qid in ids:
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        expect = [(r["vec_id"], r["score"]) for r in knn_topk(emb, qv, k=5).collect()]
        assert sorted(by_q[qid]) == sorted(expect), f"query {qid} diverged"


def test_knn_batch_nan_embedding_excluded(spark, sf_dir):
    """A corpus row whose embedding contains NaN must not appear in any
    query's top-k (Spark DESC ranks NaN as the largest double; the batched
    path excludes NaN scores so pruned and naive rankings agree)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(50)
    dim = len(emb.first()["embedding"])
    poisoned = emb.unionByName(
        emb.sparkSession.createDataFrame(
            [(999_999, [float("nan")] * dim)], "vec_id long, embedding array<float>"
        )
    )
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann.knn_batch(poisoned, qdf, k=5).collect()
    assert len(got) == 5
    assert all(r["vec_id"] != 999_999 for r in got)
    assert all(r["score"] == r["score"] for r in got)  # no NaN survives


def test_knn_batch_null_query_id_kept(spark, sf_dir):
    """A null query id is still a partition key: it must come back with its
    own top-k, not be silently dropped by the map-side prune."""
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    qv = list(emb.first()["embedding"])
    qdf = emb.sparkSession.createDataFrame(
        [(None, qv)], "query_id long, query_vec array<float>"
    )
    got = ann.knn_batch(emb, qdf, k=5).collect()
    assert len(got) == 5
    assert all(r["query_id"] is None for r in got)


def test_pq_write_read_roundtrip(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    books = ann.pq_train(emb, m_subvectors=8, k_centroids=16, n_iter=2)
    codes = ann.pq_encode(emb, books)
    path = str(tmp_path / "pq_index")
    ann.pq_write(codes, books, path)
    codes2, books2, rot2 = ann.pq_read(spark, path)
    assert (books == books2).all()
    assert rot2 is None  # plain-PQ index: no rotation sidecar
    before = [tuple(r) for r in ann.pq_search(codes, books, qv, k=5).collect()]
    after = [tuple(r) for r in ann.pq_search(codes2, books2, qv, k=5).collect()]
    assert before == after


def _correlated_vectors(spark, n=600, dim=16, seed=7):
    """Deterministic correlated corpus: low-rank structure + noise — the
    regime where plain PQ's positional dim-split quantizes badly."""
    rng = np.random.default_rng(seed)
    basis = rng.standard_normal((3, dim))
    Z = rng.standard_normal((n, 3)) @ basis + 0.05 * rng.standard_normal((n, dim))
    Z /= np.linalg.norm(Z, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in Z[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), Z


def test_opq_rotation_is_orthonormal_and_improves_distortion(spark):
    df, Z = _correlated_vectors(spark)
    R, obooks = ann.opq_train(df, m_subvectors=4, k_centroids=8, n_iter=4, opq_iters=6,
                              sample_rows=600)
    assert np.allclose(R @ R.T, np.eye(R.shape[0]), atol=1e-8)
    books = ann.pq_train(df, m_subvectors=4, k_centroids=8, n_iter=4, sample_rows=600)

    def distortion(X, bks):
        rec = ann._reconstruct_np(ann._encode_np(X, bks), bks)
        return float(((X - rec) ** 2).sum())

    d_pq = distortion(Z, books)
    d_opq = distortion(Z @ R, obooks)
    assert d_opq < d_pq, f"OPQ distortion {d_opq} !< PQ {d_pq}"


def test_opq_search_recall_at_least_pq(spark):
    df, Z = _correlated_vectors(spark)
    qv = [float(x) for x in Z[0]]
    exact = {r["vec_id"] for r in knn_topk(df, qv, k=10).collect()}
    books = ann.pq_train(df, m_subvectors=4, k_centroids=8, n_iter=4, sample_rows=600)
    R, obooks = ann.opq_train(df, m_subvectors=4, k_centroids=8, n_iter=4, opq_iters=6,
                              sample_rows=600)
    pq_hits = {r["id"] for r in ann.pq_search(
        ann.pq_encode(df, books), books, qv, k=10).collect()}
    opq_hits = {r["id"] for r in ann.pq_search(
        ann.pq_encode(df, obooks, rotation=R), obooks, qv, k=10, rotation=R).collect()}
    assert len(opq_hits & exact) >= len(pq_hits & exact)
    assert len(opq_hits & exact) >= 5


def test_opq_write_read_roundtrip(spark, tmp_path):
    df, Z = _correlated_vectors(spark, n=200)
    R, obooks = ann.opq_train(df, m_subvectors=4, k_centroids=8, n_iter=2, opq_iters=3,
                              sample_rows=200)
    codes = ann.pq_encode(df, obooks, rotation=R)
    path = str(tmp_path / "opq_index")
    ann.pq_write(codes, obooks, path, rotation=R)
    codes2, books2, rot2 = ann.pq_read(spark, path)
    assert np.allclose(rot2, R)
    qv = [float(x) for x in Z[3]]
    before = [tuple(r) for r in ann.pq_search(codes, obooks, qv, k=5, rotation=R).collect()]
    after = [tuple(r) for r in ann.pq_search(codes2, books2, qv, k=5, rotation=rot2).collect()]
    assert before == after


def test_opq_pure_python_differential(spark):
    """Fixed-seed DIFFERENTIAL for OPQ's learned rotation (VERDICT r8 task
    6, the same move as the chunker's LangChain differential): an
    independent scalar-loop reimplementation of the published algorithm
    (Ge et al. CVPR'13 non-parametric OPQ — per-subspace Lloyd k-means
    alternated with the Procrustes update R <- U@Vt of SVD(X^T X_hat))
    must reproduce the production rotation and codebooks from the same
    sample and seed. Distances are summed in the same element order, so
    assignments match bit-for-bit and the comparison is tight."""
    df, Z = _correlated_vectors(spark, n=200)
    m, kc, n_iter, opq_iters, seed = 4, 8, 3, 4, 42
    R_prod, books_prod = ann.opq_train(
        df, m_subvectors=m, k_centroids=kc, n_iter=n_iter,
        opq_iters=opq_iters, sample_rows=200, seed=seed,
    )

    # the same hash-ordered, L2-normalized sample the production trainer
    # collects (sampling is data plumbing; the differential targets the
    # ALGORITHM: k-means, encode/reconstruct, Procrustes)
    rows = (
        df.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(200)
        .collect()
    )
    X = np.array([list(map(float, r["embedding"])) for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    n, dim = X.shape
    dsub = dim // m

    def ref_fit(Y, rng):
        books = np.zeros((m, kc, dsub))
        for mi in range(m):
            sub = Y[:, mi * dsub : (mi + 1) * dsub]
            cents = sub[rng.choice(n, size=kc, replace=n < kc)].copy()
            for _ in range(n_iter):
                assign = []
                for row in sub:
                    best, bestd = 0, None
                    for ci in range(kc):
                        d = 0.0
                        for a, b in zip(row, cents[ci]):
                            d += (a - b) ** 2
                        if bestd is None or d < bestd:
                            best, bestd = ci, d
                    assign.append(best)
                for ci in range(kc):
                    members = [sub[i] for i in range(n) if assign[i] == ci]
                    if members:
                        cents[ci] = np.mean(members, axis=0)
            books[mi] = cents
        return books

    def ref_encode(Y, books):
        codes = []
        for row in Y:
            cs = []
            for mi in range(m):
                sub = row[mi * dsub : (mi + 1) * dsub]
                best, bestd = 0, None
                for ci in range(kc):
                    d = 0.0
                    for a, b in zip(sub, books[mi][ci]):
                        d += (a - b) ** 2
                    if bestd is None or d < bestd:
                        best, bestd = ci, d
                cs.append(best)
            codes.append(cs)
        return codes

    rng = np.random.default_rng(seed)
    R = np.eye(dim)
    for _ in range(opq_iters):
        Y = X @ R
        books = ref_fit(Y, rng)
        codes = ref_encode(Y, books)
        Yhat = np.array([
            np.concatenate([books[mi][c[mi]] for mi in range(m)]) for c in codes
        ])
        U, _s, Vt = np.linalg.svd(X.T @ Yhat)
        R = U @ Vt
    books = ref_fit(X @ R, rng)

    assert np.allclose(R, R_prod, atol=1e-9), "rotation diverged from the paper algorithm"
    assert np.allclose(books, books_prod, atol=1e-9), "codebooks diverged"


def test_hnsw_index_exact_on_small_graph():
    """With ef >= n the beam search degenerates to exhaustive — results must
    equal brute force exactly."""
    rng = np.random.default_rng(3)
    X = rng.standard_normal((80, 8))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    idx = ann.HNSWIndex(M=6, ef_construction=80).build(X)
    q = X[5]
    got = [i for i, _ in idx.search(q, k=5, ef=80)]
    brute = np.argsort(((X - q) ** 2).sum(axis=1), kind="stable")[:5].tolist()
    assert got == brute


def test_hnsw_deterministic_build():
    rng = np.random.default_rng(4)
    X = rng.standard_normal((60, 8))
    a = ann.HNSWIndex(M=4, ef_construction=24).build(X)
    b = ann.HNSWIndex(M=4, ef_construction=24).build(X)
    assert a.levels == b.levels and a.entry == b.entry
    assert a.graphs == b.graphs


def test_hnsw_partition_search_recall(spark, sf_dir):
    """Sharded HNSW over the real embeddings table: per-partition graphs +
    global merge reach >=80% recall@10 vs brute force, for every query."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(4)
    ids = [0, 7, 42]
    qdf = emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann.hnsw_partition_search(emb, qdf, k=10, ef_search=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in ids:
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        exact = {r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()}
        rec = len(by_q[qid] & exact) / 10
        assert rec >= 0.8, f"query {qid} recall {rec}"
        assert len(by_q[qid]) == 10


class TestFilteredANN:
    def test_selective_predicate_takes_pre_filter_and_is_exact(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        qv = _query_vec(spark, sf_dir)
        pred = (F.col("label") == 3) & (F.col("vec_id") % 7 == 0)  # very selective
        got = ann.filtered_ann_search(emb, qv, pred, k=5).collect()
        assert all(r.strategy == "pre-filter" for r in got)
        exact = [(r.vec_id, r.score) for r in knn_topk(emb.filter(pred), qv, k=5).collect()]
        assert [(r.vec_id, r.score) for r in got] == exact

    def test_broad_predicate_takes_post_filter(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings").repartition(4)
        qv = _query_vec(spark, sf_dir)
        pred = F.col("label") < 8  # keeps most of the corpus
        got = ann.filtered_ann_search(emb, qv, pred, k=10, overfetch=8).collect()
        assert got and all(r.strategy == "post-filter" for r in got)
        # all hits satisfy the predicate; recall vs exact filtered top-k
        exact = {r.vec_id for r in knn_topk(emb.filter(pred), qv, k=10).collect()}
        hits = {r.vec_id for r in got}
        assert len(hits & exact) / 10 >= 0.6, hits

    def test_force_pins_branch(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings").repartition(2)
        qv = _query_vec(spark, sf_dir)
        pred = F.col("label") == 3
        pre = ann.filtered_ann_search(emb, qv, pred, k=3, force="pre").collect()
        post = ann.filtered_ann_search(emb, qv, pred, k=3, force="post", overfetch=16).collect()
        assert {r.strategy for r in pre} == {"pre-filter"}
        assert {r.strategy for r in post} == {"post-filter"}


def test_sq8_recall_vs_brute(spark, sf_dir):
    """SQ8's distortion is tiny (8 bits per dim on a per-dim grid), so its
    top-10 should nearly coincide with the exact top-10."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    exact = [r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()]
    lo, hi = ann.sq_train(emb)
    codes = ann.sq_encode(emb, lo, hi)
    approx = [r["id"] for r in ann.sq_search(codes, lo, hi, qv, k=10).collect()]
    recall = len(set(exact) & set(approx)) / 10
    assert recall >= 0.8, f"SQ8 recall {recall}"


def test_sq8_codes_bounded(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    lo, hi = ann.sq_train(emb)
    row = ann.sq_encode(emb, lo, hi).first()
    assert all(0 <= c <= 255 for c in row["codes"])
    assert len(lo) == len(hi) == len(row["codes"])


class TestIvfAppend:
    """Incremental index maintenance: append assigns to existing centroids,
    search sees the new vectors, drift guard fires only on shifted data."""

    @staticmethod
    def _build(spark, sf_dir, tmp_path, n=100):
        emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < n)
        assigned, cents = ann.ivf_build(emb, n_clusters=8, n_iter=2)
        path = str(tmp_path / "ivf_idx")
        ann.ivf_write(assigned, cents, path)
        return emb, cents, path

    def test_append_in_distribution_low_drift(self, spark, sf_dir, tmp_path):
        emb, _cents, path = self._build(spark, sf_dir, tmp_path)
        delta = load_table(spark, sf_dir, "embeddings").filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 150)
        )
        res = ann.ivf_append(spark, path, delta)
        assert res["appended"] == 50
        assert not res["needs_retrain"], res
        # appended ids are searchable through the same pruned search
        stored, cents2 = ann.ivf_read(spark, path)
        qv = list(delta.filter(F.col("vec_id") == 120).first()["embedding"])
        hits = [r["vec_id"] for r in
                ann.ivf_search(stored, cents2, qv, k=5, n_probe=8).collect()]
        assert 120 in hits

    def test_out_of_distribution_triggers_retrain_flag(self, spark, sf_dir, tmp_path):
        emb, cents, path = self._build(spark, sf_dir, tmp_path)
        dim = len(cents[0])
        far = spark.createDataFrame(
            [(10_000 + i, [50.0 + i] * dim) for i in range(10)],
            "vec_id long, embedding array<double>",
        )
        res = ann.ivf_append(spark, path, far, drift_threshold=2.0)
        assert res["appended"] == 10
        assert res["needs_retrain"], res
        assert res["drift_ratio"] > 2.0

    def test_stats_accumulate_across_appends(self, spark, sf_dir, tmp_path):
        emb, _c, path = self._build(spark, sf_dir, tmp_path)
        d1 = load_table(spark, sf_dir, "embeddings").filter(
            (F.col("vec_id") >= 100) & (F.col("vec_id") < 120)
        )
        d2 = load_table(spark, sf_dir, "embeddings").filter(
            (F.col("vec_id") >= 120) & (F.col("vec_id") < 130)
        )
        r1 = ann.ivf_append(spark, path, d1)
        r2 = ann.ivf_append(spark, path, d2)
        assert r2["n_rows"] == r1["n_rows"] + 10
        assert r1["train_mse"] == r2["train_mse"]  # baseline is pinned


def test_knn_batch_pair_filter_excludes_positives(spark, sf_dir):
    """pair_filter (hard-negative mining) removes a query's positive set
    BEFORE ranking: no same-label row ever appears, and the survivors are
    exactly the brute-force top-k of the different-label subset."""
    emb = load_table(spark, sf_dir, "embeddings")
    ids = [0, 100]
    qdf = emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    got = ann.knn_batch(
        emb, qdf, k=5, pair_filter=F.col("label") != F.col("query_label")
    ).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    for qid in ids:
        qlabel = labels[qid]
        assert all(labels[v] != qlabel for v, _ in by_q[qid])
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        negs_only = emb.filter(F.col("label") != qlabel)
        expect = [(r["vec_id"], r["score"]) for r in knn_topk(negs_only, qv, k=5).collect()]
        assert sorted(by_q[qid]) == sorted(expect), f"query {qid} diverged"


class TestBinaryQuantization:
    def test_encode_matches_python_bits(self, spark, sf_dir):
        """Packed words equal the Python sign-bit packing for every vector
        (incl. the two's-complement wrap when bit 63 is set)."""
        import pyspark.sql.functions as F

        from frappe_data_pipelines_spark.operators.ann import (
            bq_encode,
            bq_query_words,
        )

        emb = load_table(spark, sf_dir, "embeddings").limit(50)
        rows = {r.vec_id: list(r.embedding) for r in emb.collect()}
        dim = len(next(iter(rows.values())))
        got = {r.id: list(r.words) for r in bq_encode(emb, dim).collect()}
        assert got == {k: bq_query_words(v) for k, v in rows.items()}

    def test_recall_improves_with_overfetch(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators.ann import bq_search
        from frappe_data_pipelines_spark.operators.search import knn_topk

        emb = load_table(spark, sf_dir, "embeddings")
        q = list(emb.filter("vec_id = 7").first()["embedding"])
        exact = {r.vec_id for r in knn_topk(emb, q, k=10).collect()}

        def recall(ov):
            got = {r.vec_id for r in bq_search(emb, q, k=10, overfetch=ov).collect()}
            return len(exact & got) / 10

        r4, r16 = recall(4), recall(16)
        assert r4 >= 0.3  # 1-bit codes on 64 dims: coarse but useful
        assert r16 >= r4
        assert r16 >= 0.6

    def test_search_deterministic_and_guarded(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators.ann import bq_encode, bq_search

        emb = load_table(spark, sf_dir, "embeddings")
        q = list(emb.filter("vec_id = 0").first()["embedding"])
        a = [tuple(r) for r in bq_search(emb, q, k=5).collect()]
        b = [tuple(r) for r in bq_search(emb, q, k=5).collect()]
        assert a == b and len(a) == 5
        assert a[0][0] == 0  # the query's own vector ranks first
        with pytest.raises(ValueError, match="dim"):
            bq_encode(emb, 0)


def test_sq8_exact_kernel_matches_numpy_and_grid(spark, sf_dir):
    """The oracle-grade Column kernel (sq_grid + exact scoring) returns the
    same ranking as the numpy throughput path on the same grid, and
    sq_grid's exact min/max agree with sq_train's within float tolerance."""
    import numpy as np

    from frappe_data_pipelines_spark.operators import ann
    from frappe_data_pipelines_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = list(emb.filter("vec_id = 0").first()["embedding"])
    grid = ann.sq_grid(emb).orderBy("d").collect()
    lo = np.array([r["lo"] for r in grid])
    hi = np.array([r["hi"] for r in grid])
    lo_np, hi_np = ann.sq_train(emb)
    assert np.allclose(lo, lo_np, atol=1e-12) and np.allclose(hi, hi_np, atol=1e-12)
    codes = ann.sq_encode(emb, lo, hi)
    exact = [(r.id, r.score) for r in ann.sq_search(codes, lo, hi, q, k=10, exact=True).collect()]
    fast = [(r.id, r.score) for r in ann.sq_search(codes, lo, hi, q, k=10).collect()]
    assert [i for i, _ in exact] == [i for i, _ in fast]
    for (_, a), (_, b) in zip(exact, fast):
        assert abs(a - b) < 1e-5


class TestPQExactTier:
    """Round 8: the oracled PQ tier (pq_exact_search) — the gate proves
    SQL parity; these prove the quantizer is a sane ANN."""

    def test_pq_exact_topk_overlaps_brute_force(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators import ann
        from frappe_data_pipelines_spark.operators.search import knn_topk
        from frappe_data_pipelines_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        qv = [
            float(x)
            for x in emb.filter("vec_id = 0").first()["embedding"]
        ]
        exact = [r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()]
        got = ann.pq_exact_search(emb, query_id=0, topk=20).collect()
        ids = [r["id"] for r in got]
        # 16x16 codebooks (64 bits/vector) on near-orthogonal noise:
        # expect solid overlap, not equality — and the query itself first
        assert ids[0] == 0
        assert len(set(exact) & set(ids)) >= 5
        # scores are descending, 6-dp rounded
        scores = [r["score"] for r in got]
        assert scores == sorted(scores, reverse=True)

    def test_pq_exact_deterministic_across_partitionings(self, spark, sf_dir):
        from frappe_data_pipelines_spark.operators import ann
        from frappe_data_pipelines_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        a = ann.pq_exact_search(emb, query_id=0).collect()
        b = ann.pq_exact_search(emb.repartition(7), query_id=0).collect()
        assert [(r["id"], r["score"]) for r in a] == [
            (r["id"], r["score"]) for r in b
        ]


def test_hnsw_build_extend_differential():
    """The append invariant the persisted lifecycle rests on:
    build(A ++ B) == build(A).extend(B) EXACTLY — same levels, same entry,
    same graphs (level assignment hashes the global insert index)."""
    rng = np.random.default_rng(9)
    X = rng.standard_normal((90, 8))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    whole = ann.HNSWIndex(M=4, ef_construction=24).build(X)
    grown = ann.HNSWIndex(M=4, ef_construction=24).build(X[:60]).extend(X[60:])
    assert whole.levels == grown.levels
    assert whole.entry == grown.entry
    assert whole.graphs == grown.graphs


def test_hnsw_persisted_lifecycle(spark, sf_dir, tmp_path):
    """VERDICT r10 task 6: build/save/load/append for sharded HNSW,
    mirroring the IVF lifecycle coverage. Persisted search must equal the
    in-memory shard search would at the same sharding, keep >=0.8
    recall@10 vs brute force, and an append must (a) rewrite only the
    touched shards, (b) make the new vectors findable."""
    path = str(tmp_path / "hnsw_idx")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    head = emb.filter(F.col("vec_id") < n - 40)
    tail = emb.filter(F.col("vec_id") >= n - 40)
    ann.hnsw_write(head, path, n_shards=4, M=8, ef_construction=64)

    ids = [0, 7, 42]
    qdf = emb.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = ann.hnsw_read_search(spark, path, qdf, k=10, ef_search=64).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    for qid in ids:
        qv = list(emb.filter(F.col("vec_id") == qid).first()["embedding"])
        exact = {r["vec_id"] for r in knn_topk(head, qv, k=10).collect()}
        rec = len(by_q[qid] & exact) / 10
        assert rec >= 0.8, f"persisted query {qid} recall {rec}"
        assert len(by_q[qid]) == 10

    # append the tail: ONLY the designated delta shard written (VERDICT
    # r11 task 4 — the old id%n_shards routing rewrote every shard), new
    # ids findable
    import glob
    import os

    before = {p: os.path.getmtime(p)
              for p in glob.glob(os.path.join(path, "shard=*/*.parquet"))}
    res = ann.hnsw_append(spark, path, tail)
    assert res["n_appended"] == 40
    assert res["touched_shards"] == [4], "append must hit only the delta shard"
    if not res["rebalanced"]:
        for s in range(4):  # every BASE shard's files untouched
            for p in glob.glob(os.path.join(path, f"shard={s}/*.parquet")):
                assert os.path.getmtime(p) == before[p], \
                    "base shard rewritten by append"

    probe_id = n - 1
    qv = list(emb.filter(F.col("vec_id") == probe_id).first()["embedding"])
    q2 = spark.createDataFrame([(99, qv)], "query_id long, query_vec array<double>")
    got2 = {r["vec_id"]
            for r in ann.hnsw_read_search(spark, path, q2, k=10).collect()}
    assert probe_id in got2, "appended vector not findable (it is its own NN)"
    exact2 = {r["vec_id"] for r in knn_topk(emb, qv, k=10).collect()}
    assert len(got2 & exact2) / 10 >= 0.8


def test_hnsw_read_search_empty_queries(spark, sf_dir, tmp_path):
    """ADVICE r11: an empty query batch must return an empty (query_id,
    vec_id, dist) frame, not crash in np.linalg.norm on a shape-(0,)
    array."""
    path = str(tmp_path / "hnsw_idx")
    emb = load_table(spark, sf_dir, "embeddings").limit(64)
    ann.hnsw_write(emb, path, n_shards=2, M=8, ef_construction=32)
    q0 = spark.createDataFrame([], "query_id long, query_vec array<double>")
    got = ann.hnsw_read_search(spark, path, q0, k=5)
    assert got.columns == ["query_id", "vec_id", "dist"]
    assert got.count() == 0


def test_hnsw_append_rebalance_trigger(spark, sf_dir, tmp_path):
    """Delta-shard drift contract (VERDICT r11 task 4): appends
    accumulate in the designated delta shard until its share of the
    corpus crosses rebalance_threshold, at which point the append drains
    it via a full re-shard that is bit-identical to a from-scratch
    hnsw_write of the same vectors (id%n_shards routing, vec_id-ascending
    inserts)."""
    import os

    path = str(tmp_path / "hnsw_idx")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    head = emb.filter(F.col("vec_id") < n // 2)
    tail = emb.filter(F.col("vec_id") >= n // 2)
    ann.hnsw_write(head, path, n_shards=4, M=8, ef_construction=32)

    # appending half the corpus must blow the 0.2 default threshold
    res = ann.hnsw_append(spark, path, tail)
    assert res["rebalanced"] is True
    assert res["delta_fraction"] > 0.2
    assert res["touched_shards"] == [0, 1, 2, 3, 4]
    # delta shard drained: no shard=4 partition remains
    assert not os.path.isdir(os.path.join(path, "shard=4"))

    # bit-identical to a from-scratch build over the same vectors
    ref_path = str(tmp_path / "hnsw_ref")
    ann.hnsw_write(emb, ref_path, n_shards=4, M=8, ef_construction=32)
    got = spark.read.parquet(path).orderBy("shard", "kind", "idx", "vec_id")
    ref = spark.read.parquet(ref_path).orderBy("shard", "kind", "idx", "vec_id")
    assert [r.asDict() for r in got.collect()] == \
        [r.asDict() for r in ref.collect()]

    # a SMALL append on the rebalanced index stays delta-only
    extra = spark.createDataFrame(
        [(n + i, [float(i % 7), 1.0] + [0.0] * 62) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    res2 = ann.hnsw_append(spark, path, extra)
    assert res2["rebalanced"] is False
    assert res2["touched_shards"] == [4]
    qv = [0.0, 1.0] + [0.0] * 62
    q2 = spark.createDataFrame([(7, qv)], "query_id long, query_vec array<double>")
    found = {r["vec_id"]
             for r in ann.hnsw_read_search(spark, path, q2, k=10).collect()}
    assert found & {n + i for i in range(5)}, "delta-shard vectors not served"


def test_sq_persisted_lifecycle(spark, sf_dir, tmp_path):
    """SQ8 build/serve split (round 12): sq_write persists codes + grid
    sidecar; sq_read_search must return exactly what the in-memory
    train/encode/search path returns, for BOTH kernels (exact DECIMAL and
    numpy throughput)."""
    import json
    import os

    from frappe_data_pipelines_spark.operators.guards import collect_bounded

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vec(spark, sf_dir)
    path = str(tmp_path / "sq_idx")
    ann.sq_write(emb, path)

    with open(os.path.join(path, "_sq_meta.json")) as f:
        meta = json.load(f)
    grid = collect_bounded(ann.sq_grid(emb).orderBy("d"), 4096, "grid")
    assert meta["lo"] == [r["lo"] for r in grid]  # sidecar bit-exact
    assert meta["hi"] == [r["hi"] for r in grid]
    assert meta["n_vectors"] == emb.count()

    lo = np.array(meta["lo"])
    hi = np.array(meta["hi"])
    codes = ann.sq_encode(emb, lo, hi)
    for exact in (True, False):
        base = [tuple(r) for r in
                ann.sq_search(codes, lo, hi, qv, k=10, exact=exact).collect()]
        got = [tuple(r) for r in
               ann.sq_read_search(spark, path, qv, k=10, exact=exact).collect()]
        assert got == base, f"persisted != in-memory (exact={exact})"
