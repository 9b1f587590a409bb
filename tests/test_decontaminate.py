from __future__ import annotations

import pytest

from apache_beam_spark.dedup.decontaminate import decontaminate


@pytest.fixture(scope="module")
def frames(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),   # exact bench copy
            (1, "the quick brown fox sleeps under the warm sun"), # partial overlap
            (2, "completely unrelated words about query engines"),
            (3, "hi"),                                            # shorter than k
        ],
        ["doc_id", "text"],
    )
    bench = corpus.filter("doc_id = 0")
    return corpus, bench


def test_exact_copy_fully_contaminated(frames):
    corpus, bench = frames
    rows = {r.doc_id: r for r in decontaminate(corpus, bench, shingle_k=3).collect()}
    assert rows[0].contamination == 1.0 and rows[0].contaminated
    assert rows[2].n_matched == 0 and not rows[2].contaminated


def test_partial_overlap_counts(frames):
    corpus, bench = frames
    rows = {r.doc_id: r for r in decontaminate(corpus, bench, shingle_k=3).collect()}
    # doc 1 shares exactly "the quick brown" and "quick brown fox"
    assert rows[1].n_matched == 2
    assert rows[1].n_grams == 7
    assert not rows[1].contaminated


def test_short_doc_single_gram(frames):
    corpus, bench = frames
    rows = {r.doc_id: r for r in decontaminate(corpus, bench, shingle_k=3).collect()}
    assert rows[3].n_grams == 1 and rows[3].n_matched == 0


def test_shuffle_benchmark_path_matches_broadcast(frames):
    corpus, bench = frames
    a = sorted(map(tuple, decontaminate(corpus, bench, shingle_k=3,
                                        broadcast_benchmark=True).collect()))
    b = sorted(map(tuple, decontaminate(corpus, bench, shingle_k=3,
                                        broadcast_benchmark=False).collect()))
    assert a == b
