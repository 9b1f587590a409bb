from __future__ import annotations

from apache_beam_spark.operators.shuffle import epoch_shuffle


def test_partition_of_rows_and_dense_positions(spark):
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, seed=1).collect()
    assert len(out) == 200 and len({r.doc_id for r in out}) == 200
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))


def test_seed_changes_permutation_reproducibly(spark):
    df = spark.range(100).withColumnRenamed("id", "doc_id")
    a = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, seed=1).collect()}
    b = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, seed=2).collect()}
    c = {(r.doc_id, r.shard, r.pos) for r in epoch_shuffle(df, seed=1).collect()}
    assert a == c
    assert a != b


def test_shard_prefix_preserves_global_order(spark):
    """(shard, pos) must enumerate the same permutation as one global
    sort by the seeded key — the shard is a PREFIX of that key."""
    import hashlib

    df = spark.range(64).withColumnRenamed("id", "doc_id")
    out = sorted(epoch_shuffle(df, seed=3).collect(),
                 key=lambda r: (r.shard, r.pos))
    want = sorted(range(64),
                  key=lambda i: (hashlib.md5(f"3:{i}".encode()).hexdigest(), i))
    assert [r.doc_id for r in out] == want
