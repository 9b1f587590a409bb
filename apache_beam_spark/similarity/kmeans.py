"""Distributed Lloyd's k-means over an embedding column.

The clustering stage of a training-data pipeline (topic bucketing,
IVF coarse quantizer training, diversity sampling).  The reference has
no clustering transform; pipelines hand-roll it with per-key combines —
here it is a first-class, deterministic operator.

Design for 100 TB:
- ASSIGNMENT is an Arrow-batched gemm (`mapInPandas`): the k x dim
  centroid matrix is tiny and ships in the task closure; each batch
  computes all point->centroid distances in one BLAS call.  No
  interpreted per-row HOFs, no shuffle.
- UPDATE is posexplode(vec) -> groupBy(cluster, dim).sum() — hash
  aggregation with map-side partial combine, so the shuffle carries
  only ``partitions x k x dim`` partial sums, never the data.  The
  k x dim result is collected to the driver (tiny) to build the next
  round's closure.
- DETERMINISM: initial centroids are the vectors of the k smallest
  ids (explicit, reproducible seed); iteration count is fixed (no
  data-dependent convergence test), so results are stable across
  cluster sizes up to float-sum ordering.
- An empty cluster keeps its previous centroid (standard Lloyd fix).

Each iteration is one job: scan -> gemm assign -> partial-agg shuffle
of k*dim*partitions rows.  ``n_iter`` is typically <= 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit(df: DataFrame, k: int = 8, n_iter: int = 5,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Run fixed-iteration Lloyd's; return the k x dim centroid list
    (list of list[float], cluster id = list index).

    The result plugs straight into ``similarity.knn.ivf_topk(
    centroids=...)`` as a coarse quantizer trained on the FULL corpus
    (vs ivf's default driver-side sample) — the right trade when the
    corpus no longer fits a driver sample."""
    import numpy as np

    pts = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    init = pts.orderBy("id").limit(k).collect()
    cents = np.array([r["v"] for r in init], dtype=np.float64)

    for _ in range(n_iter):
        assigned = _assign(pts, cents)
        sums = (
            assigned.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()          # empty cluster -> keep old centroid
        counts = {}
        for r in sums:
            counts[(r["cluster"], r["dim"])] = (r["s"], r["n"])
        for (c, d), (s, n) in counts.items():
            new[c, d] = s / n
        cents = new
    return [list(map(float, row)) for row in cents]


def _assign(pts: DataFrame, cents) -> DataFrame:
    """(id, v) -> (id, v, cluster): argmin_c ||v - cent_c||^2 via one
    gemm per Arrow batch; ties break to the lowest cluster id."""

    def fn(batches):
        import numpy as np
        import pandas as pd

        c = np.asarray(cents, dtype=np.float64)
        c_sq = (c * c).sum(axis=1)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 constant per row
            d = -2.0 * (x @ c.T) + c_sq
            pdf = pdf.copy()
            pdf["cluster"] = d.argmin(axis=1).astype("int32")
            yield pdf

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    schema = "id bigint, v array<double>, cluster int"
    return parallelize_narrow(
        pts.select("id", F.col("v").cast("array<double>").alias("v"))) \
        .mapInPandas(fn, schema=schema)


def kmeans_assign(df: DataFrame, centroids, id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  keep_vec: bool = False) -> DataFrame:
    """Label every row with its nearest centroid: (id_col, cluster).

    ``keep_vec=True`` also returns the vector (as array<double> — the
    exact float->double widening of the input): the gemm stage already
    carries it, so a consumer that needs (id, cluster, vec) — e.g.
    SemDeDup's in-cell miner — skips a join back onto the corpus
    (optimization r13, guide §2.4)."""
    pts = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    out = _assign(pts, centroids)
    if keep_vec:
        return out.select(F.col("id").alias(id_col), "cluster",
                          F.col("v").alias(vec_col))
    return out.select(F.col("id").alias(id_col), "cluster")


def kmeans(df: DataFrame, k: int = 8, n_iter: int = 5,
           id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Fit + assign in one call: DataFrame(id_col, cluster)."""
    cents = kmeans_fit(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)
    return kmeans_assign(df, cents, id_col=id_col, vec_col=vec_col)
