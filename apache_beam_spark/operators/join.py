"""Join operators.

Reference: all joins are key-equality joins built on CoGroupByKey —
``Join.{inner,left,right,full}OuterJoin``
(``sdks/java/extensions/join-library/.../Join.java:48,94,147,201``), plus
the side-input broadcast pattern (``transforms/View.java:216`` asMap used
in e.g. ``examples/java8/.../GameStats.java:122-142``).

Spark-first: native equi-joins, with Catalyst choosing
broadcast-hash/sort-merge/shuffled-hash (+ AQE skew splitting).  We add
``broadcast=`` to force the small-dim broadcast the reference could only
get via hand-rolled side inputs, and expose ``left_semi``/``left_anti``
(absent as reference operators but expressible — SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from apache_beam_spark.pipeline import PCollection, PTransform


class _Join(PTransform):
    def __init__(self, right: PCollection, on: Union[str, Sequence[str], Column],
                 how: str, broadcast_right: bool = False,
                 null_value: Optional[dict] = None):
        self.right, self.on, self.how = right, on, how
        self.broadcast_right = broadcast_right
        self.null_value = null_value or {}

    def expand(self, pcoll: PCollection) -> PCollection:
        right_df = self.right.df
        if self.broadcast_right:
            right_df = F.broadcast(right_df)
        on = self.on if not isinstance(self.on, str) else [self.on]
        df = pcoll.df.join(right_df, on=on, how=self.how)
        # reference Join.leftOuterJoin takes an explicit null-value
        # placeholder (Join.java:94) — express as coalesce.
        for col, default in self.null_value.items():
            df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
        return pcoll._with_df(df)


class Join:
    """reference ``Join.java`` factory surface."""

    @staticmethod
    def inner(right: PCollection, on, broadcast: bool = False) -> PTransform:
        return _Join(right, on, "inner", broadcast)

    @staticmethod
    def left_outer(right: PCollection, on, null_value: Optional[dict] = None,
                   broadcast: bool = False) -> PTransform:
        return _Join(right, on, "left", broadcast, null_value)

    @staticmethod
    def right_outer(right: PCollection, on, null_value: Optional[dict] = None,
                    broadcast: bool = False) -> PTransform:
        return _Join(right, on, "right", broadcast, null_value)

    @staticmethod
    def full_outer(right: PCollection, on, null_value: Optional[dict] = None,
                   broadcast: bool = False) -> PTransform:
        return _Join(right, on, "full", broadcast, null_value)

    @staticmethod
    def semi(right: PCollection, on, broadcast: bool = False) -> PTransform:
        return _Join(right, on, "left_semi", broadcast)

    @staticmethod
    def anti(right: PCollection, on, broadcast: bool = False) -> PTransform:
        return _Join(right, on, "left_anti", broadcast)


def side_input_map(pcoll: PCollection, key: str, value: str,
                   max_rows: int = 100_000) -> dict:
    """Materialize a small PCollection as a driver-side map (reference
    ``View.asMap`` ``transforms/View.java:216``).  Only for genuinely
    small inputs — larger than ``max_rows`` raises, steering to a
    broadcast join."""
    from apache_beam_spark.operators.views import guarded_collect

    return {r[key]: r[value]
            for r in guarded_collect(pcoll.df.select(key, value), max_rows)}


def salted_join(left, right, on: str, n_salts: int = 16,
                how: str = "inner"):
    """Skew-proof equi-join for a manually-known-skewed key: the big
    (left) side gets a deterministic salt ``pmod(xxhash64(all left
    cols), n)`` and the small-but-hot (right) side is replicated n ways,
    so one hot key spreads over ``n_salts`` tasks instead of one
    straggler.

    Use when AQE's skew split (enabled by default here —
    ``spark.sql.adaptive.skewJoin``) can't help: AQE splits by
    post-shuffle partition SIZE, which misses logical skew that fits a
    partition but dominates downstream per-row work.  Right-side
    replication costs n x |right| rows — right must be the small side.
    ``how``: inner or left (right outer would need dedup of the
    replicated null-extensions).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    ldf = getattr(left, "df", left)
    rdf = getattr(right, "df", right)
    l = ldf.withColumn(
        "__salt__",
        F.pmod(F.xxhash64(*[F.col(c) for c in ldf.columns]),
               F.lit(n_salts)).cast("int"))
    r = rdf.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))) \
        .withColumn("__salt__", F.col("__salt__").cast("int"))
    out = l.join(r, on=[on, "__salt__"], how=how).drop("__salt__")
    if hasattr(left, "_with_df"):
        return left._with_df(out)
    return out
