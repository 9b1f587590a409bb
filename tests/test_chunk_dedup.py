from __future__ import annotations

from apache_beam_spark.dedup.chunks import chunk_dedup


def test_repeated_passage_removed_keep_first(spark):
    boiler = "one two three four five"
    df = spark.createDataFrame(
        [
            (0, boiler + " unique tail words here now"),
            (1, boiler + " different continuation of text"),
            (2, "totally fresh content with no overlap"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in chunk_dedup(df, chunk_words=5).collect()}
    # doc 0 keeps both chunks; doc 1 loses the boilerplate chunk
    assert out[0].n_chunks == 2 and out[0].n_kept == 2
    assert out[1].n_chunks == 2 and out[1].n_kept == 1
    assert out[1].text_dedup == "different continuation of text"
    assert out[2].n_kept == out[2].n_chunks


def test_within_doc_repetition_dedupes(spark):
    df = spark.createDataFrame(
        [(7, "spam spam spam spam spam spam spam spam spam spam")],
        ["doc_id", "text"],
    )
    r = chunk_dedup(df, chunk_words=5).first()
    # two identical 5-word chunks: the second is a duplicate of the first
    assert (r.n_chunks, r.n_kept) == (2, 1)
    assert r.text_dedup == "spam spam spam spam spam"


def test_empty_text_dropped(spark):
    df = spark.createDataFrame([(1, ""), (2, "some words")], ["doc_id", "text"])
    rows = chunk_dedup(df, chunk_words=3).collect()
    assert [r.doc_id for r in rows] == [2]
