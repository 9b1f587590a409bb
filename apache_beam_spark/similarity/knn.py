"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — a broadcast nested-loop of
(queries x corpus) with all math in Column higher-order functions.
Correct at any scale where the corpus fits broadcast OR the cross
product is partition-parallel (Spark shuffles neither side fully; the
small side broadcasts).

Scale path: random-hyperplane LSH (sign bits of dot with fixed random
planes) buckets vectors; top-k runs within multi-probe buckets — turns
O(N*M) into O(N*M/2^bits) at a small recall cost.  An IVF variant is the
same shape with learned centroids (k-means) instead of random planes.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from apache_beam_spark.functions.vectors import cosine, dot, normalize


def brute_force_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                     query_id: str = "vec_id", corpus_id: str = "vec_id",
                     vec_col: str = "embedding", self_exclude: bool = True) -> DataFrame:
    """(query_id, neighbor_id, sim, rank): exact cosine top-k.

    The corpus side is broadcast (must be the smaller side); ranking is a
    per-query bounded heap via row_number window.
    """
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv__"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv__"))
    joined = q.crossJoin(F.broadcast(c))
    if self_exclude:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.select(
        "query_id", "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def brute_force_topk_blas(queries: DataFrame, corpus: DataFrame, k: int = 5,
                          query_id: str = "vec_id", corpus_id: str = "vec_id",
                          vec_col: str = "embedding",
                          self_exclude: bool = True) -> DataFrame:
    """Exact cosine top-k via block matrix multiply — the scale path for
    brute force.

    The corpus is collected once to a dense float64 matrix and shipped
    in the task closure (broadcast); every Arrow batch of queries then
    runs ONE BLAS gemm (Q x D @ D x N) and a per-row argpartition.
    Identical results to ``brute_force_topk`` (same rounding, same
    neighbor-id tiebreak) at ~100x the throughput: the per-pair work is
    a fused multiply-add in native code instead of an interpreted
    higher-order Column function.

    At 100 TB the corpus side must fit an executor (~1e6 x 1024 f32 =
    4 GB); beyond that, shard the corpus and union the per-shard top-k
    (sims are absolute, so a k-way merge of per-shard winners is exact).
    """
    import numpy as np

    rows = corpus.select(F.col(corpus_id).alias("id"), F.col(vec_col).alias("v")).collect()
    ids = np.array([r["id"] for r in rows], dtype=np.int64)
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    def fn(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["__qv__"]), dtype=np.float64)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            sims = qn @ mat_n.T                      # one gemm per batch
            out_q, out_n, out_s, out_r = [], [], [], []
            for qi, qid in enumerate(pdf["query_id"]):
                s = sims[qi]
                mask = ids != qid if self_exclude else np.ones(len(ids), bool)
                cand = np.nonzero(mask)[0]
                # bounded selection, then exact (sim desc, id asc) order
                take = min(k, len(cand))
                top = cand[np.argpartition(-s[cand], take - 1)[:take]]
                order = np.lexsort((ids[top], -s[top]))
                for r, j in enumerate(top[order], start=1):
                    out_q.append(qid); out_n.append(ids[j])
                    out_s.append(round(float(s[j]), 6)); out_r.append(r)
            yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n,
                                "sim": out_s, "rank": out_r})

    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv__"))
    return q.mapInPandas(fn, "query_id bigint, neighbor_id bigint, sim double, rank int")


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_bits)]


def _lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = (dot(vec, p) > 0).cast("bigint")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
             n_bits: int = 8, query_id: str = "vec_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding", self_exclude: bool = True,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket (single-probe).

    Equi-join on bucket replaces the cross join — the shuffle is by
    bucket id, each bucket ~N/2^n_bits vectors.  Recall < 1; raise via
    fewer bits or multi-probe.
    """
    planes = _hyperplanes(dim, n_bits, seed)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv__"),
        _lsh_bucket(F.col(vec_col), planes).alias("__b__"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv__"),
        _lsh_bucket(F.col(vec_col), planes).alias("__b__"),
    )
    joined = q.join(c, on="__b__")
    if self_exclude:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.select(
        "query_id", "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _kmeans(sample, n_cells: int, iters: int = 10, seed: int = 42):
    """Driver-side Lloyd's k-means over a (normalized) sample — the IVF
    coarse quantizer.  numpy only; seeded; returns (n_cells, dim)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)          # cosine = dot (normalized)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) or 1.0)
    return cent


def ivf_topk(queries: DataFrame, corpus: DataFrame, dim: int, k: int = 5,
             n_cells: int = 16, n_probe: int = 4,
             query_id: str = "vec_id", corpus_id: str = "vec_id",
             vec_col: str = "embedding", self_exclude: bool = True,
             sample_size: int = 10000, seed: int = 42) -> DataFrame:
    """IVF approximate top-k: k-means cells as the coarse index.

    Corpus vectors live in their nearest-centroid cell; each query
    probes its ``n_probe`` nearest cells — the equi-join on cell id
    replaces the cross join, scanning ~``n_probe/n_cells`` of the
    corpus.  Same output contract as ``lsh_topk`` (recall < 1).

    At 100 TB: centroids are tiny (n_cells x dim floats) and broadcast;
    the cell assignment is one BLAS argmax pass; the candidate join
    shuffles by cell id, so cell balance (k-means, vs LSH's random
    cuts) is what keeps partitions even.
    """
    import numpy as np

    sample = np.array(
        [r[0] for r in corpus.select(vec_col).limit(sample_size).collect()],
        dtype=np.float64)
    cent = _kmeans(sample, n_cells, seed=seed)

    def assign(df: DataFrame, id_alias: str, vec_alias: str, probes: int) -> DataFrame:
        def fn(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.array(list(pdf[vec_alias]), dtype=np.float64)
                vn = v / np.linalg.norm(v, axis=1, keepdims=True)
                sims = vn @ cent.T
                top = np.argsort(-sims, axis=1)[:, :probes]
                out = pdf.loc[pdf.index.repeat(probes)].copy()
                out["__cell__"] = top.ravel()
                yield out

        return df.mapInPandas(
            fn, f"{id_alias} bigint, {vec_alias} array<double>, __cell__ int")

    q = assign(queries.select(F.col(query_id).alias("query_id"),
                              F.col(vec_col).alias("__qv__")),
               "query_id", "__qv__", n_probe)
    c = assign(corpus.select(F.col(corpus_id).alias("neighbor_id"),
                             F.col(vec_col).alias("__cv__")),
               "neighbor_id", "__cv__", 1)
    joined = q.join(c, on="__cell__")
    if self_exclude:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    sims = joined.select(
        "query_id", "neighbor_id",
        cosine(F.col("__qv__"), F.col("__cv__")).alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va__"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb__"))
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("__va__"), F.col("__vb__")).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", F.round("sim", 6).alias("sim"))
    )
