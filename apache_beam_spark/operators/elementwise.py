"""Element-wise operators.

Reference: ``ParDo`` (``transforms/ParDo.java:432``) is the universal
per-element primitive (1→N outputs, multi-output tags, side inputs);
``MapElements``/``FlatMapElements``/``Filter`` etc. are sugar over it
(``transforms/MapElements.java:74``, ``FlatMapElements.java``,
``Filter.java:31``).

Spark-first lowering: when the user supplies Column expressions we stay
entirely JVM-side inside whole-stage codegen.  Arbitrary Python logic
falls back to Arrow-batched ``mapInPandas`` (bundle-at-a-time, mirroring
the reference's @StartBundle/@FinishBundle granularity —
``transforms/DoFn.java:506,581``) — never row-at-a-time UDFs in a hot
path.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.pipeline import PCollection, PTransform
from apache_beam_spark.plans.caching import cache_scoped


class Map(PTransform):
    """1→1 mapping (reference ``MapElements.java:74``).

    ``Map({"out": col_expr, ...})`` — project to named Column
    expressions (fast path, codegen).
    ``Map(fn, schema=...)`` — arbitrary pandas-batch function
    ``pdf -> pdf`` via ``mapInPandas`` (slow path).
    """

    def __init__(self, cols: Optional[dict[str, Union[Column, str]]] = None,
                 fn: Optional[Callable] = None, schema=None, keep: bool = False):
        self.cols, self.fn, self.schema, self.keep = cols, fn, schema, keep

    def expand(self, pcoll: PCollection) -> PCollection:
        if self.cols is not None:
            exprs = [
                (F.expr(c) if isinstance(c, str) else c).alias(name)
                for name, c in self.cols.items()
            ]
            if self.keep:
                df = pcoll.df.select("*", *exprs)
            else:
                df = pcoll.df.select(*exprs)
            return pcoll._with_df(df)
        assert self.fn is not None and self.schema is not None

        def _map_batches(it):
            for pdf in it:
                yield self.fn(pdf)

        return pcoll._with_df(pcoll.df.mapInPandas(_map_batches, schema=self.schema))


class FlatMap(PTransform):
    """1→N (reference ``FlatMapElements.java``).

    Column fast path: provide an array-producing expression that is
    exploded.  Python fallback: ``mapInPandas`` with an expanding fn.
    """

    def __init__(self, array_col: Optional[Union[Column, str]] = None, alias: str = "value",
                 fn: Optional[Callable] = None, schema=None, keep: bool = False):
        self.array_col, self.alias, self.fn, self.schema, self.keep = array_col, alias, fn, schema, keep

    def expand(self, pcoll: PCollection) -> PCollection:
        if self.array_col is not None:
            col = F.expr(self.array_col) if isinstance(self.array_col, str) else self.array_col
            ex = F.explode(col).alias(self.alias)
            df = pcoll.df.select("*", ex) if self.keep else pcoll.df.select(ex)
            return pcoll._with_df(df)
        assert self.fn is not None and self.schema is not None

        def _fm(it):
            for pdf in it:
                yield self.fn(pdf)

        return pcoll._with_df(pcoll.df.mapInPandas(_fm, schema=self.schema))


class Filter(PTransform):
    """Keep elements matching a predicate (reference ``Filter.java:52``;
    comparison shortcuts lessThan/greaterThan/equal ``:77,108,195`` are
    just Column comparisons here)."""

    def __init__(self, predicate: Union[Column, str]):
        self.predicate = predicate

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll._with_df(pcoll.df.filter(self.predicate))


class ParDo(PTransform):
    """General DoFn with optional multi-output (reference
    ``ParDo.java:432``; ``withOutputTags:632``).

    ``fn``: pandas-batch function ``pdf -> pdf`` whose output schema may
    include a ``tag`` column; ``outputs()`` on the result then filters
    per tag (multi-output = one tagged DF, cached, filtered — SURVEY §2.1).
    Side inputs (reference ``View.java``): pass small dicts/values via
    closure; for DataFrame side inputs use ``Join`` with broadcast.
    """

    def __init__(self, fn: Callable, schema, tags: Optional[list[str]] = None):
        self.fn, self.schema, self.tags = fn, schema, tags

    def expand(self, pcoll: PCollection) -> PCollection:
        def _run(it):
            for pdf in it:
                yield self.fn(pdf)

        df = pcoll.df.mapInPandas(_run, schema=self.schema)
        if self.tags:
            # scoped lifecycle (plans/caching.py): a long-lived driver
            # releases tag fan-out caches at its scope boundary instead
            # of pinning them for the session's lifetime
            df = cache_scoped(df)
        return pcoll._with_df(df)


def multi_output(pcoll: PCollection, tags: list[str], tag_col: str = "tag") -> dict[str, PCollection]:
    """Split a tagged PCollection into per-tag outputs (reference
    ``PCollectionTuple``/``TupleTag`` — ``values/PCollectionTuple.java``)."""
    cached = pcoll._with_df(cache_scoped(pcoll.df))
    return {t: cached._with_df(cached.df.filter(F.col(tag_col) == t).drop(tag_col)) for t in tags}


class Keys(PTransform):
    """reference ``transforms/Keys.java:52``"""

    def __init__(self, key: str = "key"):
        self.key = key

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll._with_df(pcoll.df.select(self.key))


class Values(PTransform):
    """reference ``transforms/Values.java:52``"""

    def __init__(self, value: str = "value"):
        self.value = value

    def expand(self, pcoll: PCollection) -> PCollection:
        return pcoll._with_df(pcoll.df.select(self.value))


class KvSwap(PTransform):
    """reference ``transforms/KvSwap.java:56``"""

    def __init__(self, key: str = "key", value: str = "value"):
        self.key, self.value = key, value

    def expand(self, pcoll: PCollection) -> PCollection:
        df = pcoll.df.select(
            F.col(self.value).alias(self.key), F.col(self.key).alias(self.value)
        )
        return pcoll._with_df(df)


class WithKeys(PTransform):
    """Attach a key column (reference ``transforms/WithKeys.java:66``)."""

    def __init__(self, key_expr: Union[Column, str], name: str = "key"):
        self.key_expr, self.name = key_expr, name

    def expand(self, pcoll: PCollection) -> PCollection:
        col = F.expr(self.key_expr) if isinstance(self.key_expr, str) else self.key_expr
        return pcoll._with_df(pcoll.df.withColumn(self.name, col))


class ToStringOp(PTransform):
    """reference ``transforms/ToString.java`` — elements():43 / kvs():52."""

    def __init__(self, cols: Optional[list[str]] = None, sep: str = ",", alias: str = "str"):
        self.cols, self.sep, self.alias = cols, sep, alias

    def expand(self, pcoll: PCollection) -> PCollection:
        cols = self.cols or pcoll.df.columns
        df = pcoll.df.select(
            F.concat_ws(self.sep, *[F.col(c).cast("string") for c in cols]).alias(self.alias)
        )
        return pcoll._with_df(df)


class Regex:
    """Regex transform family (reference ``transforms/Regex.java`` —
    matches:51-105 / find / replaceAll / replaceFirst / split).
    All lower to native regexp functions (JVM, codegen)."""

    @staticmethod
    def matches(col: str, pattern: str, group: int = 0, alias: str = "match") -> PTransform:
        class _M(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                df = (
                    pcoll.df.filter(F.col(col).rlike(pattern))
                    .select(F.regexp_extract(F.col(col), pattern, group).alias(alias))
                )
                return pcoll._with_df(df)

        return _M()

    @staticmethod
    def find(col: str, pattern: str, alias: str = "match") -> PTransform:
        class _F(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                df = (
                    pcoll.df.select(F.regexp_extract(F.col(col), pattern, 0).alias(alias))
                    .filter(F.col(alias) != "")
                )
                return pcoll._with_df(df)

        return _F()

    @staticmethod
    def replace_all(col: str, pattern: str, replacement: str, alias: Optional[str] = None) -> PTransform:
        class _R(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                out = alias or col
                return pcoll._with_df(
                    pcoll.df.withColumn(out, F.regexp_replace(F.col(col), pattern, replacement))
                )

        return _R()

    @staticmethod
    def matches_kv(col: str, pattern: str, key_group: int = 1,
                   value_group: int = 2, key_alias: str = "key",
                   value_alias: str = "value") -> PTransform:
        """Regex.matchesKV (Regex.java:137): rows whose column matches
        the pattern become (key_group, value_group) pairs; non-matching
        rows are dropped (the reference emits nothing for them)."""
        class _KV(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                k = F.regexp_extract(F.col(col), pattern, key_group)
                v = F.regexp_extract(F.col(col), pattern, value_group)
                df = (pcoll.df.filter(F.col(col).rlike(pattern))
                      .withColumn(key_alias, k)
                      .withColumn(value_alias, v))
                return pcoll._with_df(df)

        return _KV()

    @staticmethod
    def replace_first(col: str, pattern: str, replacement: str,
                      alias: Optional[str] = None) -> PTransform:
        """Regex.replaceFirst (Regex.java:646): only the first match is
        replaced — Java regexp_replace replaces all, so anchor the
        pattern to a single occurrence via a lazy prefix group."""
        class _RF(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                out = alias or col
                df = pcoll.df.withColumn(out, F.regexp_replace(
                    F.col(col), f"^((?s:.*?)){pattern}",
                    f"$1{replacement}"))
                return pcoll._with_df(df)

        return _RF()

    @staticmethod
    def split(col: str, pattern: str, alias: str = "token", drop_empty: bool = True) -> PTransform:
        class _S(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                df = pcoll.df.select(F.explode(F.split(F.col(col), pattern)).alias(alias))
                if drop_empty:
                    df = df.filter(F.col(alias) != "")
                return pcoll._with_df(df)

        return _S()


def with_dead_letters(df, fn, output_schema: str, error_schema: str = "error string, row string"):
    """Dead-letter pattern: per-row Python processing where failures
    become a SIDE OUTPUT instead of failing the job (the reference's
    multi-output ParDo error-handling idiom, e.g. DebuggingWordCount's
    side outputs — ``transforms/ParDo.java:632`` withOutputTags).

    ``fn(row_dict) -> dict`` (raise to reject).  Returns (ok_df,
    errors_df); errors carry the exception text and the stringified
    input row.  Arrow-batched; the tag column is the multi-output
    encoding, filtered into two frames off one cached pass.
    """
    import json as _json
    from typing import Iterator as _It

    import pandas as _pd
    from pyspark.sql import functions as _F

    tagged_schema = f"__ok__ boolean, payload string"

    def mapper(batches: "_It[_pd.DataFrame]") -> "_It[_pd.DataFrame]":
        for pdf in batches:
            oks, payloads = [], []
            for row in pdf.to_dict("records"):
                try:
                    payloads.append(_json.dumps(fn(row)))
                    oks.append(True)
                except Exception as e:  # noqa: BLE001 - the whole point
                    payloads.append(_json.dumps(
                        {"error": f"{type(e).__name__}: {e}", "row": repr(row)}))
                    oks.append(False)
            yield _pd.DataFrame({"__ok__": oks, "payload": payloads})

    tagged = cache_scoped(df.mapInPandas(mapper, tagged_schema))
    ok = tagged.filter("__ok__").select(
        _F.from_json("payload", output_schema).alias("r")).select("r.*")
    errors = tagged.filter("NOT __ok__").select(
        _F.from_json("payload", error_schema).alias("r")).select("r.*")
    return ok, errors


class Reshuffle(PTransform):
    """Redistribute + stable-input barrier (reference
    ``transforms/Reshuffle.java:49,54``).  In Spark: ``repartition`` —
    fault-tolerance/stable-input is native, so this is purely a
    data-distribution hint (e.g. before a skewed expensive ParDo)."""

    def __init__(self, num_partitions: Optional[int] = None, *cols: str):
        self.num_partitions, self.cols = num_partitions, cols

    def expand(self, pcoll: PCollection) -> PCollection:
        if self.cols and self.num_partitions:
            df = pcoll.df.repartition(self.num_partitions, *self.cols)
        elif self.cols:
            df = pcoll.df.repartition(*self.cols)
        elif self.num_partitions:
            df = pcoll.df.repartition(self.num_partitions)
        else:
            df = pcoll.df.repartition(pcoll.df.sparkSession.sparkContext.defaultParallelism)
        return pcoll._with_df(df)


class Partition:
    """Split one PCollection into N by a partition expression (reference
    ``transforms/Partition.java:95``).  N filters over one cached DF."""

    @staticmethod
    def by(pcoll: PCollection, n: int, index_expr: Union[Column, str]) -> list[PCollection]:
        col = F.expr(index_expr) if isinstance(index_expr, str) else index_expr
        cached = cache_scoped(pcoll.df.withColumn("__part__", col % n))
        return [
            pcoll._with_df(cached.filter(F.col("__part__") == i).drop("__part__"))
            for i in range(n)
        ]
