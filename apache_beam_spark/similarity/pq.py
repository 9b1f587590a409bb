"""Product quantization (PQ) for compressed-domain ANN.

The memory-scale path for similarity search: each d-dim float vector
is split into ``m`` subspaces and every subspace is quantized to one
of ``ksub`` codebook centroids, so a 64-dim float32 vector (256 B)
becomes ``m`` small codes (8 B at m=8 — 32x compression).  Search runs
entirely in the compressed domain via asymmetric distance computation
(ADC): per query, an ``m x ksub`` lookup table of exact
query-subvector -> centroid distances; a corpus row's approximate
distance is ``m`` table lookups summed, never touching the raw vector.

Design for 100 TB:
- TRAIN is driver-side numpy k-means per subspace over a bounded
  sample (codebooks are ``m * ksub * dsub`` floats — KBs), exactly the
  IVF coarse-quantizer pattern (`knn.py::_kmeans`).
- ENCODE is one narrow Arrow-batched pass (`mapInPandas`, per-subspace
  vectorized argmin); the output (id, m codes) is what a 100 TB
  deployment persists — the raw vectors never need to be scanned
  again for search.
- SEARCH broadcasts the query LUTs (nq * m * ksub doubles) in the
  task closure, computes the full ``nq x batch`` ADC matrix per batch
  with numpy fancy-indexing, and emits only per-batch top-k
  candidates; a final window rank over ``batches * nq * k`` candidate
  rows (tiny) gives the exact compressed-domain top-k.  No shuffle
  touches anything row-count-sized but the encoded scan itself.
- DETERMINISM: k-means is seeded; argmin ties take the lowest code;
  final rank ties take the lowest neighbor id — with a FIXED codebook
  the whole pipeline is reproducible in SQL (see `embed_pq_fixed`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pq_train(corpus: DataFrame, dim: int, m: int = 8, ksub: int = 16,
             vec_col: str = "embedding", sample_size: int = 10000,
             iters: int = 10, seed: int = 42):
    """Per-subspace k-means codebooks from a bounded driver sample:
    returns ``m x ksub x (dim/m)`` (list-of-list-of-list)."""
    import numpy as np

    assert dim % m == 0, "dim must divide evenly into m subspaces"
    dsub = dim // m
    sample = np.array(
        [r[0] for r in corpus.select(vec_col).limit(sample_size).collect()],
        dtype=np.float64)
    rng = np.random.RandomState(seed)
    books = []
    for s in range(m):
        xs = sample[:, s * dsub:(s + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(ksub, len(xs)),
                             replace=False)].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append([list(map(float, row)) for row in cent])
    return books


def pq_encode(df: DataFrame, codebooks, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): nearest codebook entry per subspace,
    ties to the lowest code.  One narrow vectorized pass."""
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)      # m x ksub x dsub
    m, _, dsub = cb.shape
    pts = df.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            codes = np.empty((x.shape[0], m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * dsub:(s + 1) * dsub]
                d2 = ((xs[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = d2.argmin(axis=1)       # first (lowest) code
            yield pd.DataFrame({"id": pdf["id"],
                                "codes": list(map(list, codes))})

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    return (parallelize_narrow(pts)
            .mapInPandas(fn, schema="id bigint, codes array<int>")
            .withColumnRenamed("id", id_col))


def pq_topk(queries: DataFrame, corpus: DataFrame, codebooks, k: int = 5,
            query_id: str = "vec_id", corpus_id: str = "vec_id",
            vec_col: str = "embedding",
            self_exclude: bool = True) -> DataFrame:
    """Compressed-domain ADC top-k: (query_id, neighbor_id, rank, adc).

    ``adc`` is the approximate squared euclidean distance; rank is
    ascending-distance with neighbor-id tiebreak.  The query set is
    collected to the driver (bounded — LUTs are nq*m*ksub doubles) and
    shipped in the closure; the corpus pass scans CODES only."""
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    qrows = queries.select(F.col(query_id).alias("qid"),
                           F.col(vec_col).cast("array<double>")
                           .alias("v")).collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qx = np.array([r["v"] for r in qrows], dtype=np.float64)
    # LUT[q, s, j] = ||q_s - cb[s, j]||^2  (exact query side — the A in ADC)
    lut = np.empty((len(qids), m, ksub), dtype=np.float64)
    for s in range(m):
        qs = qx[:, s * dsub:(s + 1) * dsub]
        lut[:, s, :] = ((qs[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)

    enc = pq_encode(corpus, codebooks, id_col=corpus_id, vec_col=vec_col)

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # B x m
            ids = pdf[corpus_id].to_numpy()
            dist = np.zeros((len(qids), codes.shape[0]))
            for s in range(m):
                dist += lut[:, s, codes[:, s]]
            if self_exclude:
                dist[qids[:, None] == ids[None, :]] = np.inf
            kk = min(k, codes.shape[0])
            # tie-aware candidate cut (ADVICE r6): keep EVERY row whose
            # distance ties the kk-th, not argpartition's arbitrary
            # boundary pick — an equal-distance lower-id candidate must
            # survive the batch so the global id-tiebreak window (the
            # determinism contract) ever sees it.
            thresh = np.partition(dist, kk - 1, axis=1)[:, kk - 1:kk]
            keep = np.isfinite(dist) & (dist <= thresh)
            qi, ci = np.nonzero(keep)
            yield pd.DataFrame({
                "query_id": qids[qi],
                "neighbor_id": ids[ci],
                "adc": dist[qi, ci],
            })

    cand = enc.mapInPandas(
        fn, schema="query_id bigint, neighbor_id bigint, adc double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adc"))
