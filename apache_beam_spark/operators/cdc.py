"""Change-data-capture materialization: upsert merge and SCD2 history.

Beyond-reference operators for the ingestion edge of a training-data
/ analytics lake: a base snapshot plus a change stream (insert/update/
delete rows carrying a sequence number) materialized either as the
new snapshot (latest-wins upsert, Delta ``MERGE`` / Flink upsert-kafka
semantics) or as a type-2 slowly-changing-dimension history with
validity intervals.

100 TB shape: everything is keyed by the merge key — the
latest-change window, the anti join against the base, and the union
all shuffle ONCE on that key (co-partitioned); no driver-side state,
no global ordering.  Ties on the sequence column are broken by an
explicit tiebreak column — merges must be deterministic or two runs
of the same changelog diverge.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _require_keys(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """NULL merge keys make the anti join silently double-apply (NULL
    never equals NULL) — fail in-plan instead (filter, not a dropped
    projection, so pruning can't remove it)."""
    out = df
    for k in keys:
        out = out.filter(
            F.when(F.col(k).isNull(),
                   F.raise_error(F.lit(
                       f"cdc: NULL merge key {k!r}; filter or coalesce "
                       "before merging")).cast("boolean"))
            .otherwise(F.lit(True)))
    return out


def latest_changes(changes: DataFrame, keys: Sequence[str], seq_col: str,
                   tiebreak: Optional[str] = None) -> DataFrame:
    """One row per key: the change with the highest (seq, tiebreak)."""
    changes = _require_keys(changes, keys)
    order = [F.col(seq_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = W.partitionBy(*keys).orderBy(*order)
    return (changes.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1).drop("__rn__"))


def apply_changes(base: DataFrame, changes: DataFrame, keys: Sequence[str],
                  seq_col: str, op_col: str = "op", delete_op: str = "D",
                  tiebreak: Optional[str] = None) -> DataFrame:
    """Latest-wins upsert merge: the new snapshot after applying the
    changelog to ``base``.

    * keys present only in ``base`` pass through;
    * keys whose latest change is an upsert take the change row;
    * keys whose latest change is ``delete_op`` disappear.

    ``changes`` must carry the base schema plus ``op_col``; ``base``
    rows never need an op column.  Exactly one shuffle key (the merge
    key) across the window, anti join, and union.
    """
    keys = list(keys)
    latest = latest_changes(changes, keys, seq_col, tiebreak)
    surviving = base.join(latest.select(*keys), on=keys, how="left_anti")
    upserts = latest.filter(F.col(op_col) != delete_op).drop(op_col)
    return surviving.unionByName(upserts)


def scd2_history(changes: DataFrame, keys: Sequence[str], seq_col: str,
                 tiebreak: Optional[str] = None,
                 valid_from: str = "valid_from",
                 valid_to: str = "valid_to",
                 current_col: str = "is_current") -> DataFrame:
    """Type-2 dimension from a changelog: each change becomes a version
    row valid from its sequence value until the next change of the same
    key (NULL = still current).  One keyed shuffle (the lead window)."""
    order = [F.col(seq_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = W.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(seq_col)).over(w)
    return (changes
            .withColumn(valid_from, F.col(seq_col))
            .withColumn(valid_to, nxt)
            .withColumn(current_col, nxt.isNull()))


def derive_changes(old: DataFrame, new: DataFrame, keys: Sequence[str],
                   op_col: str = "op") -> DataFrame:
    """Snapshot diff -> changelog (the inverse of ``apply_changes``):
    compare two versions of a table by key and emit insert/update/
    delete rows — 'I'/'U' rows carry the NEW values, 'D' rows the old
    key's last values.  One full-outer join on the key; value
    comparison is struct equality over the non-key columns (NULL-safe).

    Law (tested): ``apply_changes(old, derive_changes(old, new))``
    reproduces ``new`` exactly.
    """
    keys = list(keys)
    old = _require_keys(old, keys)
    new = _require_keys(new, keys)
    vcols = [c for c in new.columns if c not in keys]
    if vcols != [c for c in old.columns if c not in keys]:
        raise ValueError("old and new must share a schema")
    o = old.select(*keys, F.struct(*vcols).alias("__old__"))
    nw = new.select(*keys, F.struct(*vcols).alias("__new__"))
    j = o.join(nw, on=keys, how="full_outer")
    changed = (
        j.withColumn(
            op_col,
            F.when(F.col("__old__").isNull(), F.lit("I"))
            .when(F.col("__new__").isNull(), F.lit("D"))
            .when(~F.col("__old__").eqNullSafe(F.col("__new__")),
                  F.lit("U")))
        .filter(F.col(op_col).isNotNull()))
    carried = F.coalesce(F.col("__new__"), F.col("__old__"))
    return changed.select(
        *keys, *[carried.getField(c).alias(c) for c in vcols], op_col)
