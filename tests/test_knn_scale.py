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
