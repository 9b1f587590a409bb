"""IVF ANN tests: output contract + recall vs exact brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_spark.similarity.knn import brute_force_topk_blas, ivf_topk

SF = "/root/testdata/sf0.001"


def test_ivf_contract_and_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 50)

    exact = brute_force_topk_blas(q, emb, k=3).collect()
    approx = ivf_topk(q, emb, dim=64, k=3, n_cells=8, n_probe=4).collect()

    # contract: <= k ranked neighbors per query, ranks contiguous from 1
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))

    # recall@3 against exact: probing half the cells must find most
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"recall@3 {recall:.2f} too low"


def test_ivf_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    a = sorted(map(tuple, ivf_topk(q, emb, dim=64, k=3).collect()))
    b = sorted(map(tuple, ivf_topk(q, emb, dim=64, k=3).collect()))
    assert a == b


def test_ivf_salted_cells_identical_results(spark):
    """max_cell salting repartitions hot cells but queries probe every
    salt, so the candidate set — and the exact top-k output — is
    unchanged."""
    import numpy as np
    from pyspark.sql import functions as F

    from apache_beam_spark.similarity.knn import ivf_topk

    rng = np.random.RandomState(3)
    # skewed corpus: half the vectors cluster near one direction
    hub = rng.standard_normal(16)
    rows = []
    for i in range(200):
        v = hub + 0.1 * rng.standard_normal(16) if i % 2 else rng.standard_normal(16)
        rows.append((i, v.tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 20)
    base = sorted(map(tuple, ivf_topk(q, df, dim=16, k=3, n_cells=8,
                                      n_probe=3).collect()))
    salted = sorted(map(tuple, ivf_topk(q, df, dim=16, k=3, n_cells=8,
                                        n_probe=3, max_cell=20).collect()))
    assert base == salted


def test_ivf_with_distributed_kmeans_quantizer(spark):
    """kmeans_fit output feeds ivf_topk(centroids=...): full-corpus
    coarse quantizer training without a driver-side sample."""
    from apache_beam_spark.similarity.kmeans import kmeans_fit
    from apache_beam_spark.similarity.knn import brute_force_topk, ivf_topk
    from apache_beam_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    cents = kmeans_fit(emb, k=8, n_iter=3)
    q = emb.filter("vec_id < 20")
    got = ivf_topk(q, emb, dim=64, k=3, n_cells=8, n_probe=4,
                   centroids=cents).collect()
    assert {r["query_id"] for r in got} == set(range(20))
    # recall sanity vs exact: most top-1 neighbors found
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(q, emb, k=1).collect()}
    approx_top1 = {(r["query_id"], r["neighbor_id"])
                   for r in got if r["rank"] == 1}
    assert len(exact & approx_top1) >= 12
