"""Connected components (dedup/components.py): correctness on known
graph shapes, singleton handling, and iteration/convergence behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_spark.dedup.components import connected_components, dup_clusters


def _cc(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "id long") if nodes else None
    out = connected_components(e, nodes=n, **kw)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_diameter(spark):
    # a 9-node path needs several propagation rounds (diameter 8)
    got = _cc(spark, [(i, i + 1) for i in range(1, 9)])
    assert set(got.values()) == {1} and len(got) == 9


def test_singletons_from_node_universe(spark):
    got = _cc(spark, [(1, 2)], nodes=[1, 2, 3, 4])
    assert got == {1: 1, 2: 1, 3: 3, 4: 4}


def test_edge_listed_both_directions_ok(spark):
    got = _cc(spark, [(1, 2), (2, 1), (2, 3)])
    assert set(got.values()) == {1}


def test_dup_clusters_representative(spark):
    pairs = spark.createDataFrame([(5, 9), (9, 7)], "id_a long, id_b long")
    ids = spark.createDataFrame([(x,) for x in (1, 5, 7, 9)], "doc_id long")
    out = dup_clusters(pairs, ids)
    rows = {r["doc_id"]: r["component"] for r in out.collect()}
    assert rows == {1: 1, 5: 5, 7: 5, 9: 5}
    kept = [d for d, c in rows.items() if d == c]
    assert sorted(kept) == [1, 5]


def test_no_edges(spark):
    e = spark.createDataFrame([], "src long, dst long")
    n = spark.createDataFrame([(1,), (2,)], "id long")
    out = connected_components(e, nodes=n)
    assert {r["node"]: r["comp"] for r in out.collect()} == {1: 1, 2: 2}


def test_two_phase_matches_hash_min(spark):
    from apache_beam_spark.dedup.components import connected_components_two_phase

    edges = [(1, 2), (2, 3), (10, 11), (11, 12), (3, 10), (20, 21)]
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in range(1, 25)], "id long")
    got = {r["node"]: r["comp"]
           for r in connected_components_two_phase(e, nodes=n).collect()}
    exp = {r["node"]: r["comp"]
           for r in connected_components(e, nodes=n).collect()}
    assert got == exp


def test_two_phase_long_chain(spark):
    """A 64-node path: hash-min needs ~63 rounds; two-phase must
    converge well inside its O(log^2 n) bound (max_iter=12 suffices)."""
    from apache_beam_spark.dedup.components import connected_components_two_phase

    e = spark.createDataFrame([(i, i + 1) for i in range(64)],
                              "src long, dst long")
    got = connected_components_two_phase(e, max_iter=12).collect()
    assert len(got) == 65 and {r["comp"] for r in got} == {0}


def test_containment_finds_subsumed_doc(spark):
    """A short doc whose shingles all appear in a long doc is flagged
    with containment 1.0; the reverse direction is not."""
    from apache_beam_spark.dedup.ngram import ngram_containment_pairs

    long = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    short = "gamma delta epsilon zeta"
    other = "one two three four five six seven"
    df = spark.createDataFrame(
        [(1, long), (2, short), (3, other)], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["containment"]
           for r in ngram_containment_pairs(df, threshold=0.8).collect()}
    assert got == {(2, 1): 1.0}
