"""Sequence packing (operators/packing.py): first-fit recurrence,
budget respected, determinism across partition layouts."""

from __future__ import annotations

from apache_beam_spark.operators.packing import pack_greedy


def _pack(spark, sizes, cap, n_shards=1):
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pack_greedy(df, capacity=cap, n_shards=n_shards).collect()
    return {r["doc_id"]: (r["shard"], r["bin"]) for r in out}


def test_first_fit_sequence(spark):
    # cap 10: [4,5] fit; 6 overflows -> bin 1; 12 oversized -> own bin
    got = _pack(spark, [4, 5, 6, 12, 1], cap=10)
    assert [got[i][1] for i in range(5)] == [0, 0, 1, 2, 3]


def test_oversized_first_row_keeps_bin_zero(spark):
    got = _pack(spark, [99, 1], cap=10)
    assert [got[i][1] for i in range(2)] == [0, 1]


def test_budget_respected_per_bin(spark):
    import collections
    sizes = [3, 9, 2, 8, 5, 5, 5, 1, 10, 4]
    rows = [(i, s) for i, s in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    out = pack_greedy(df, capacity=10, n_shards=2).collect()
    fill = collections.Counter()
    for r in out:
        fill[(r["shard"], r["bin"])] += r["n_chars"]
    # every bin with >1 member respects the cap (a single oversized
    # row may exceed it by construction)
    members = collections.Counter((r["shard"], r["bin"]) for r in out)
    for key, tot in fill.items():
        if members[key] > 1:
            assert tot <= 10


def test_deterministic_across_input_partitioning(spark):
    sizes = list(range(1, 40))
    rows = [(i, s) for i, s in enumerate(sizes)]
    a = pack_greedy(spark.createDataFrame(rows, "doc_id long, n_chars long")
                    .repartition(16), capacity=17, n_shards=4).collect()
    b = pack_greedy(spark.createDataFrame(rows, "doc_id long, n_chars long")
                    .coalesce(1), capacity=17, n_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
