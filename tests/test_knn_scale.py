"""Scale-path regressions for the ANN module (VERDICT r1 items 2+3):

- embedding_near_dup_pairs must generate candidates via banded LSH
  (no cross join in the plan) and still find every planted near-dup.
- brute_force_topk_blas broadcast_side="queries" (corpus streams,
  per-partition top-k + exact merge) must equal the corpus-broadcast
  mode on a multi-partition corpus.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from apache_beam_spark.plans import plan_string
from apache_beam_spark.similarity.knn import (
    brute_force_topk,
    brute_force_topk_blas,
    embedding_near_dup_pairs,
)


@pytest.fixture(scope="module")
def emb_df(spark):
    """120 random 16-dim vectors + 10 planted near-dup partners."""
    rng = np.random.RandomState(7)
    base = rng.standard_normal((120, 16))
    rows = [(i, base[i].tolist()) for i in range(120)]
    for j in range(10):  # ids 200+j are tiny perturbations of j
        noisy = base[j] + 0.05 * rng.standard_normal(16)
        rows.append((200 + j, noisy.tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .repartition(5)


def _exact_pairs(df, threshold):
    from apache_beam_spark.functions.vectors import cosine

    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va__"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb__"))
    return (a.crossJoin(F.broadcast(b))
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.round(cosine(F.col("__va__"), F.col("__vb__")), 6).alias("sim"))
            .filter(F.col("sim") >= threshold))


def test_near_dup_lsh_matches_exact(spark, emb_df):
    got = sorted((r["id_a"], r["id_b"], r["sim"])
                 for r in embedding_near_dup_pairs(emb_df, threshold=0.9).collect())
    want = sorted((r["id_a"], r["id_b"], r["sim"])
                  for r in _exact_pairs(emb_df, 0.9).collect())
    assert len(want) >= 10          # the planted pairs exist
    assert got == want


def test_near_dup_plan_has_no_cross_join(spark, emb_df):
    plan = plan_string(embedding_near_dup_pairs(emb_df, threshold=0.9))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_near_dup_group_col_mines_within_group_only(spark, emb_df):
    """group_col folds the group into the bucket key: within-group
    near-dup pairs are found, cross-group pairs are excluded — the
    SemDeDup in-cell shape (VERDICT r2 item 1)."""
    # everyone in group 0 except the planted partners (200+j), which
    # land in group 1 — so every planted pair becomes cross-group
    split = emb_df.withColumn(
        "cell", (F.col("vec_id") >= 200).cast("int"))
    cross = embedding_near_dup_pairs(
        split, threshold=0.9, group_col="cell", vec_col="embedding")
    assert cross.count() == 0
    # same group for all -> identical to the ungrouped result
    same = split.withColumn("cell", F.lit(0))
    got = sorted((r["id_a"], r["id_b"], r["sim"])
                 for r in embedding_near_dup_pairs(
                     same, threshold=0.9, group_col="cell").collect())
    want = sorted((r["id_a"], r["id_b"], r["sim"])
                  for r in _exact_pairs(emb_df, 0.9).collect())
    assert got == want and len(got) >= 10


def test_near_dup_group_bucket_width_capped(spark):
    """A degenerate group of > max_bucket identical vectors must NOT
    explode into O(n^2) pairs: buckets above the cap are dropped, so
    in-cell pair width stays bounded (minhash max_bucket discipline)."""
    n = 40
    rows = [(i, [1.0] * 8, 0) for i in range(n)]        # one hot cell
    rows += [(100, [1.0, -1.0] * 4, 1), (101, [1.0, -1.0] * 4, 1)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cell int")
    got = embedding_near_dup_pairs(
        df, threshold=0.9, group_col="cell", max_bucket=10)
    # the 40-wide degenerate bucket (> max_bucket=10) contributes no
    # pairs; the small healthy cell still yields its pair
    assert sorted(map(tuple, got.select("id_a", "id_b").collect())) == [(100, 101)]


def test_semantic_dedup_plan_no_cell_cartesian(spark, emb_df):
    """semantic_dedup's pair mining must not contain a raw all-pairs
    join keyed only on the cell id (the r2 quadratic shape): the
    grouped miner's plan has no cartesian/BNL join and carries the
    max_bucket size filter (bounded in-cell pair width); the full
    query plan (post components) stays cartesian-free too."""
    import __spark_entry__ as entry

    grouped = embedding_near_dup_pairs(
        emb_df.withColumn("cell", (F.col("vec_id") % 4).cast("int")),
        threshold=0.9, group_col="cell", max_bucket=10000)
    miner_plan = plan_string(grouped)
    assert "CartesianProduct" not in miner_plan
    assert "BroadcastNestedLoopJoin" not in miner_plan
    # the max_bucket size filter proves banded-bucket mining is live
    assert "size(ids" in miner_plan

    df = entry.queries()["semantic_dedup"](spark, "/root/testdata/sf0.001")
    plan = plan_string(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_blas_queries_broadcast_equals_corpus_broadcast(spark, emb_df):
    q = emb_df.filter(F.col("vec_id") < 20)
    a = brute_force_topk_blas(q, emb_df, k=3, broadcast_side="corpus")
    b = brute_force_topk_blas(q, emb_df, k=3, broadcast_side="queries")
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    # and both equal the Column-HOF reference implementation
    ref = sorted(map(tuple, brute_force_topk(q, emb_df, k=3).collect()))
    assert rows_a == ref


def test_blas_bad_side_rejected(spark, emb_df):
    with pytest.raises(ValueError, match="broadcast_side"):
        brute_force_topk_blas(emb_df, emb_df, broadcast_side="both")


def test_blas_auto_picks_mode_by_size(spark, emb_df):
    """VERDICT r2 item 7: the default mode comes from Catalyst's size
    estimate, not the caller's flag — a corpus over the broadcast cap
    auto-selects the streaming (queries-broadcast) path, a small one
    the corpus-broadcast path, and auto's results match the exact
    reference either way."""
    from apache_beam_spark.similarity.knn import (
        _choose_broadcast_side, _plan_size_bytes)

    est = _plan_size_bytes(emb_df)
    assert est is not None and est > 0
    assert _choose_broadcast_side(emb_df, max_broadcast_bytes=est + 1) == "corpus"
    assert _choose_broadcast_side(emb_df, max_broadcast_bytes=est - 1) == "queries"

    q = emb_df.filter(F.col("vec_id") < 10)
    forced_stream = brute_force_topk_blas(
        q, emb_df, k=3, max_broadcast_bytes=1)  # auto -> queries mode
    ref = sorted(map(tuple, brute_force_topk(q, emb_df, k=3).collect()))
    assert sorted(map(tuple, forced_stream.collect())) == ref
