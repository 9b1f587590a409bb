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
- IVF-PQ (`ivfpq_encode`/`ivfpq_topk`) is the tier above the flat
  scan: at 100 TB even reading every CODE row is the bottleneck, so
  codes live in coarse k-means cells and a query ADC-scans only its
  ``n_probe`` nearest cells' codes against residual LUTs —
  ~n_probe/n_cells of the corpus read, recall < 1 like `ivf_topk`.
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


def ivfpq_encode(df: DataFrame, centroids, codebooks,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """IVF-PQ index rows ``(id, cell, codes array<int>)``: nearest
    coarse centroid (euclidean, ties to the lowest cell id), then PQ
    codes of the RESIDUAL ``v - centroid[cell]`` (Jegou et al., TPAMI
    2011 — the residual carries far less variance than the raw vector,
    so the same ksub codes quantize it better).  One narrow vectorized
    pass; this frame is what a 100 TB deployment persists."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)    # C x d
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
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
            cell = d2.argmin(axis=1)                  # first (lowest) cell
            res = x - cent[cell]
            codes = np.empty((x.shape[0], m), dtype=np.int32)
            for s in range(m):
                rs = res[:, s * dsub:(s + 1) * dsub]
                sd2 = ((rs[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
                codes[:, s] = sd2.argmin(axis=1)      # first (lowest) code
            yield pd.DataFrame({"id": pdf["id"],
                                "cell": cell.astype(np.int32),
                                "codes": list(map(list, codes))})

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    return (parallelize_narrow(pts)
            .mapInPandas(fn, schema="id bigint, cell int, codes array<int>")
            .withColumnRenamed("id", id_col))


def ivfpq_topk(queries: DataFrame, corpus: DataFrame, centroids, codebooks,
               k: int = 5, n_probe: int = 2,
               query_id: str = "vec_id", corpus_id: str = "vec_id",
               vec_col: str = "embedding",
               self_exclude: bool = True) -> DataFrame:
    """IVF-PQ ADC top-k — the 100 TB tier above the flat PQ scan:
    corpus codes live in coarse cells, each query probes its
    ``n_probe`` nearest cells (ties to the lowest cell id) and ADC-
    scans ONLY those cells' codes against a per-(query, cell)
    RESIDUAL lookup table — ~``n_probe/n_cells`` of the corpus read
    instead of all of it, recall < 1 exactly like ``ivf_topk`` vs the
    brute-force scan.  Output contract matches ``pq_topk``:
    (query_id, neighbor_id, rank, adc), rank ascending-adc with
    neighbor-id tiebreak; with FIXED centroids + codebooks the whole
    pipeline is deterministic and value-oracled in SQL
    (``embed_ivfpq_fixed``)."""
    import numpy as np

    cent = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    n_probe = min(n_probe, len(cent))   # probing "all cells" is legal
    qrows = queries.select(F.col(query_id).alias("qid"),
                           F.col(vec_col).cast("array<double>")
                           .alias("v")).collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qx = np.array([r["v"] for r in qrows], dtype=np.float64)
    qd2 = ((qx[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd2, axis=1, kind="stable")[:, :n_probe]  # nq x P
    # residual LUT per (query, probe): ||(q - cent[cell])_s - cb[s,j]||^2
    lut = np.empty((len(qids), n_probe, m, ksub), dtype=np.float64)
    for p in range(n_probe):
        qr = qx - cent[probes[:, p]]
        for s in range(m):
            rs = qr[:, s * dsub:(s + 1) * dsub]
            lut[:, p, s, :] = ((rs[:, None, :]
                                - cb[s][None, :, :]) ** 2).sum(-1)
    # cell -> [(query_index, probe_index)] for the scan side
    probing: dict = {}
    for qi in range(len(qids)):
        for p in range(n_probe):
            probing.setdefault(int(probes[qi, p]), []).append((qi, p))

    enc = ivfpq_encode(corpus, centroids, codebooks,
                       id_col=corpus_id, vec_col=vec_col)

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            codes = np.array(list(pdf["codes"]), dtype=np.int64)
            ids = pdf[corpus_id].to_numpy()
            # per query: candidates from its probed cells in this batch
            cand_q: dict = {}
            for cell in np.unique(cells):
                watchers = probing.get(int(cell))
                if not watchers:
                    continue
                rows = np.nonzero(cells == cell)[0]
                ccodes, cids = codes[rows], ids[rows]
                for qi, p in watchers:
                    dist = np.zeros(len(rows))
                    for s in range(m):
                        dist += lut[qi, p, s, ccodes[:, s]]
                    if self_exclude:
                        dist[cids == qids[qi]] = np.inf
                    cand_q.setdefault(qi, []).append((cids, dist))
            out_q, out_n, out_d = [], [], []
            for qi, parts in cand_q.items():
                cids = np.concatenate([c for c, _ in parts])
                dist = np.concatenate([d for _, d in parts])
                kk = min(k, len(cids))
                # tie-aware boundary cut (same contract as pq_topk)
                thresh = np.partition(dist, kk - 1)[kk - 1]
                keep = np.isfinite(dist) & (dist <= thresh)
                out_q.append(np.full(keep.sum(), qids[qi]))
                out_n.append(cids[keep])
                out_d.append(dist[keep])
            if out_q:
                yield pd.DataFrame({
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "adc": np.concatenate(out_d),
                })

    cand = enc.mapInPandas(
        fn, schema="query_id bigint, neighbor_id bigint, adc double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "adc"))


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
