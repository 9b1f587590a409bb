"""Distributed PCA over an embedding column.

The whitening / dimensionality-reduction stage of a training-data
pipeline (shrink crawl embeddings before ANN or clustering, drop the
low-variance tail, decorrelate features for cosine search).  The
reference has no linear-algebra transform; pipelines hand-roll the
moment aggregation with per-key combines — here it is a first-class
operator with the classic tall-skinny-matrix shape.

Design for 100 TB:
- The only pass over the data computes the MOMENTS (count, sum vector,
  X^T X scatter matrix) as an Arrow-batched gemm per partition
  (`mapInPandas`): each batch contributes one ``d x d`` float64 gram
  via a single BLAS call, partitions emit ONE partial row each, and
  the driver reduces ``num_partitions`` partials (O(P * d^2) bytes,
  independent of row count).  No shuffle at all — the reduce IS the
  collect, exactly the combiner-lifting shape Combine.globally uses.
- The eigendecomposition runs on the driver on the tiny ``d x d``
  covariance (d is an embedding width, 64-4096; O(d^3) is microseconds
  to seconds and data-independent).  For d beyond ~10k a randomized
  range sketch would replace it; out of scope while embeddings are
  narrow.
- PROJECTION is a second gemm pass: ``(x - mean) @ components.T`` per
  Arrow batch with the k x d component matrix shipped in the task
  closure.  Narrow, no shuffle, scales linearly.
- DETERMINISM: component signs are canonicalized (the largest-|coord|
  entry of each component is made positive), so results are stable
  across partitionings up to float-sum ordering; eigh on the reduced
  covariance is a single driver call, not an iterative distributed
  loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def embedding_moments(df: DataFrame, id_col: str = "vec_id",
                      vec_col: str = "embedding"):
    """One pass: return ``(n, mean, scatter)`` where ``mean`` is the
    d-vector of column means and ``scatter = X^T X`` (numpy float64).

    One partial row per partition (n, sum-vector, flattened gram),
    reduced on the driver — O(partitions * d^2), never O(rows)."""
    import numpy as np

    pts = df.select(F.col(vec_col).cast("array<double>").alias("v"))

    def fn(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s = None
        g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            gram = x.T @ x
            g = gram if g is None else g + gram
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "g": [g.ravel().tolist()]})

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    parts = parallelize_narrow(pts).mapInPandas(
        fn, schema="n bigint, s array<double>, g array<double>").collect()
    if not parts:
        raise ValueError("embedding_moments: empty input")
    n = sum(r["n"] for r in parts)
    s = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    return n, s / n, g


def covariance_long(df: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Population covariance matrix in long form: (i, j, cov), 1-based
    indices to match SQL ``generate_subscripts``.  ``d^2`` rows.

    The scan+gram is the distributed pass above; materializing the
    d x d result as a DataFrame is a model artifact (like k-means
    centroids), not a data-sized operation."""
    spark = df.sparkSession
    n, mean, scatter = embedding_moments(df, id_col, vec_col)
    cov = scatter / n - mean[:, None] * mean[None, :]
    d = cov.shape[0]
    rows = [(i + 1, j + 1, float(cov[i, j]))
            for i in range(d) for j in range(d)]
    return spark.createDataFrame(rows, "i int, j int, cov double")


@dataclass
class PCAModel:
    mean: list            # d
    components: list      # k x d, rows = principal axes, variance-desc
    explained_variance: list   # k eigenvalues

    def as_numpy(self):
        import numpy as np

        return (np.asarray(self.mean, dtype=np.float64),
                np.asarray(self.components, dtype=np.float64))


def pca_fit(df: DataFrame, k: int = 8, id_col: str = "vec_id",
            vec_col: str = "embedding") -> PCAModel:
    """Fit top-k principal components from the one-pass moments.

    Signs are canonicalized: each component's largest-|coordinate|
    entry is flipped positive, so the model (and any projection) is
    deterministic regardless of eigh's sign convention."""
    import numpy as np

    n, mean, scatter = embedding_moments(df, id_col, vec_col)
    cov = scatter / n - mean[:, None] * mean[None, :]
    vals, vecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T                  # k x d
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return PCAModel(mean=mean.tolist(),
                    components=[r.tolist() for r in comps],
                    explained_variance=[float(vals[i]) for i in order])


def pca_project(df: DataFrame, model: PCAModel, id_col: str = "vec_id",
                vec_col: str = "embedding",
                long_form: bool = False) -> DataFrame:
    """Project rows onto the model's components.

    Wide form: (id_col, proj array<double>).  Long form: (id_col,
    comp int 0-based, value double) — n*k rows, explode-free (built in
    the same Arrow batch as the gemm)."""
    mean, comps = model.as_numpy()
    pts = df.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("v"))

    def fn(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(list(pdf["v"]), dtype=np.float64)
            p = (x - mean) @ comps.T          # batch x k
            if long_form:
                kk = p.shape[1]
                yield pd.DataFrame({
                    "id": np.repeat(pdf["id"].to_numpy(), kk),
                    "comp": np.tile(np.arange(kk, dtype=np.int32),
                                    p.shape[0]),
                    "value": p.ravel(),
                })
            else:
                yield pd.DataFrame({"id": pdf["id"],
                                    "proj": list(map(list, p))})

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    schema = ("id bigint, comp int, value double" if long_form
              else "id bigint, proj array<double>")
    out = parallelize_narrow(pts).mapInPandas(fn, schema=schema)
    return out.withColumnRenamed("id", id_col)


def pca(df: DataFrame, k: int = 8, id_col: str = "vec_id",
        vec_col: str = "embedding", long_form: bool = False) -> DataFrame:
    """Fit + project in one call."""
    model = pca_fit(df, k=k, id_col=id_col, vec_col=vec_col)
    return pca_project(df, model, id_col=id_col, vec_col=vec_col,
                       long_form=long_form)
