"""Declarative data-quality constraints over a DataFrame.

Beyond-reference operator (the reference leaves validation to user
DoFns): a rule list — not-null, unique, value range, set membership,
regex, referential integrity — evaluated in ONE pass plus one
aggregation per structural rule, returning a violations report; or
enforced in-plan (``raise_error`` on first violation, the
``global_percent_rank`` NULL-guard pattern).

100 TB shape: row-level rules fold into a single projection over the
scan (one pass, no shuffle, count via partial agg); ``unique`` is one
keyed count; ``foreign_key`` is a broadcast-or-shuffle left anti join
on the key only.  Nothing collects.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One constraint; ``kind`` in {not_null, range, isin, regex,
    unique, foreign_key, custom}."""

    name: str
    kind: str
    column: str = ""
    lo: Optional[float] = None
    hi: Optional[float] = None
    values: Optional[tuple] = None
    pattern: Optional[str] = None
    ref: Optional[DataFrame] = None
    ref_column: Optional[str] = None
    predicate: Optional[Column] = None  # custom: True = OK


def not_null(name: str, column: str) -> Rule:
    return Rule(name, "not_null", column)


def in_range(name: str, column: str, lo: float, hi: float) -> Rule:
    return Rule(name, "range", column, lo=lo, hi=hi)


def isin(name: str, column: str, values: Sequence) -> Rule:
    return Rule(name, "isin", column, values=tuple(values))


def matches(name: str, column: str, pattern: str) -> Rule:
    return Rule(name, "regex", column, pattern=pattern)


def unique(name: str, column: str) -> Rule:
    return Rule(name, "unique", column)


def foreign_key(name: str, column: str, ref: DataFrame,
                ref_column: str) -> Rule:
    return Rule(name, "foreign_key", column, ref=ref, ref_column=ref_column)


def custom(name: str, predicate: Column) -> Rule:
    return Rule(name, "custom", predicate=predicate)


def _row_violation(rule: Rule) -> Column:
    """True when the ROW violates the rule (row-level kinds only).
    NULL comparisons follow SQL semantics: a NULL value violates only
    not_null — range/isin/regex pass NULLs through (compose with
    not_null to forbid them), matching the usual DQ-tool contract."""
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        return c.isNotNull() & ~c.between(rule.lo, rule.hi)
    if rule.kind == "isin":
        return c.isNotNull() & ~c.isin(list(rule.values))
    if rule.kind == "regex":
        return c.isNotNull() & ~c.rlike(rule.pattern)
    if rule.kind == "custom":
        return ~F.coalesce(rule.predicate, F.lit(False))
    raise ValueError(f"not a row-level rule: {rule.kind}")


_ROW_KINDS = {"not_null", "range", "isin", "regex", "custom"}


def check_constraints(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Violations report: one row per rule —
    ``(rule, kind, n_violations)`` — rule order preserved via the
    report union, values independent of it.

    All row-level rules share ONE scan (a single agg of conditional
    counts); each ``unique`` adds one keyed agg; each ``foreign_key``
    one anti join.  Report frames are tiny (len(rules) rows).
    """
    if not rules:
        raise ValueError("at least one rule required")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("duplicate rule names")
    # names are interpolated into a selectExpr stack() as SQL literals
    # AND as bare agg aliases — restrict to identifiers so a space/
    # dash/quote can't become a parse error or injected SQL
    bad_names = [n for n in names
                 if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", n or "")]
    if bad_names:
        raise ValueError(
            f"rule names must be identifiers ([A-Za-z_][A-Za-z0-9_]*), "
            f"got: {bad_names}")
    spark = df.sparkSession

    reports: list[DataFrame] = []
    row_rules = [r for r in rules if r.kind in _ROW_KINDS]
    if row_rules:
        aggs = [F.sum(_row_violation(r).cast("bigint")).alias(r.name)
                for r in row_rules]
        wide = df.agg(*aggs)
        stack = ", ".join(f"'{r.name}', '{r.kind}', {r.name}"
                          for r in row_rules)
        reports.append(wide.selectExpr(
            f"stack({len(row_rules)}, {stack}) AS (rule, kind, n_violations)"))
    for r in rules:
        if r.kind == "unique":
            dups = (df.groupBy(r.column)
                    .agg(F.count(F.lit(1)).alias("__n__"))
                    .filter(F.col("__n__") > 1)
                    .agg(F.coalesce(F.sum("__n__"), F.lit(0))
                         .alias("n_violations")))
            reports.append(dups.select(
                F.lit(r.name).alias("rule"), F.lit(r.kind).alias("kind"),
                F.col("n_violations")))
        elif r.kind == "foreign_key":
            orphans = (df.select(F.col(r.column).alias("__k__"))
                       .filter(F.col("__k__").isNotNull())
                       .join(r.ref.select(
                           F.col(r.ref_column).alias("__k__")).distinct(),
                           on="__k__", how="left_anti")
                       .agg(F.count(F.lit(1)).alias("n_violations")))
            reports.append(orphans.select(
                F.lit(r.name).alias("rule"), F.lit(r.kind).alias("kind"),
                F.col("n_violations")))
        elif r.kind not in _ROW_KINDS:
            raise ValueError(f"unknown rule kind: {r.kind}")

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out


def enforce_constraints(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Fail-fast mode for row-level rules: the returned frame raises
    in-plan on the first violating row (no silent bad data downstream —
    the reference's user-DoFn throw, as a Column).  Structural rules
    (unique/foreign_key) need their own aggregation; use
    ``check_constraints`` for those."""
    bad = [r for r in rules if r.kind not in _ROW_KINDS]
    if bad:
        raise ValueError(
            f"enforce_constraints is row-level only; got {[r.kind for r in bad]}")
    out = df
    for r in rules:
        # a FILTER, not a dropped projection — Catalyst column pruning
        # would optimize away a raise_error column nobody reads
        out = out.filter(
            F.when(_row_violation(r),
                   F.raise_error(F.lit(f"DQ violation: {r.name}"))
                   .cast("boolean"))
            .otherwise(F.lit(True)))
    return out
