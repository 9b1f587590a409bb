from __future__ import annotations

import hashlib

from apache_beam_spark.operators.mixing import cap_tokens_per_source


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_budget_keeps_hash_ordered_prefix(spark):
    df = _mk(spark, [(i, "a", "w " * 4) for i in range(10)])  # 4 tokens each
    out = cap_tokens_per_source(df, budgets={}, default_budget=12).collect()
    # 12-token budget = exactly the first 3 docs in md5(id) order
    expect = sorted(range(10), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:3]
    assert sorted(r.doc_id for r in out) == sorted(expect)
    assert max(r.cum_tokens for r in out) == 12


def test_zero_budget_drops_source(spark):
    df = _mk(spark, [(1, "a", "x y"), (2, "b", "x y")])
    out = cap_tokens_per_source(df, budgets={"a": 0}, default_budget=100).collect()
    assert [r.doc_id for r in out] == [2]


def test_matches_flat_window_semantics(spark):
    """The 256-bucket two-phase prefix sum must equal the naive
    single-partition running sum."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window as W
    from apache_beam_spark.functions.text import word_tokens

    df = _mk(spark, [(i, f"s{i % 3}", "tok " * (1 + i % 7)) for i in range(60)])
    got = {r.doc_id: r.cum_tokens
           for r in cap_tokens_per_source(df, {}, 10**9).collect()}
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    flat = df.select(
        "doc_id",
        F.sum(F.size(word_tokens(F.col("text"))).cast("bigint")).over(
            W.partitionBy("source").orderBy(h, F.col("doc_id"))
            .rowsBetween(W.unboundedPreceding, 0)).alias("cum"))
    want = {r.doc_id: r.cum for r in flat.collect()}
    assert got == want


def test_budget_invariants_randomized(spark):
    """Property: per source, (a) kept tokens never exceed the budget,
    (b) the kept set is a PREFIX of the hash order — the first excluded
    doc would not have fit."""
    import hashlib

    rows = [(i, f"s{i % 4}", "w " * (1 + (i * 7) % 13)) for i in range(120)]
    df = _mk(spark, rows)
    budgets = {"s0": 37, "s1": 0, "s2": 10_000}
    out = cap_tokens_per_source(df, budgets, default_budget=55).collect()
    ntok = {i: 1 + (i * 7) % 13 for i, _, _ in rows}
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    order = {s: sorted((i for i, src, _ in rows if src == s),
                       key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
             for s in ("s0", "s1", "s2", "s3")}
    for s in ("s0", "s2", "s3"):
        budget = budgets.get(s, 55)
        kept = {r.doc_id for r in by_src.get(s, [])}
        total = sum(ntok[i] for i in kept)
        assert total <= budget
        # prefix property + maximality
        run = 0
        for i in order[s]:
            if run + ntok[i] <= budget:
                assert i in kept, (s, i)
                run += ntok[i]
            else:
                assert i not in kept, (s, i)
                break
    assert "s1" not in by_src
