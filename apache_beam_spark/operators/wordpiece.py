"""Distributed WordPiece tokenizer primitives — the third tokenizer
family next to BPE (``operators/bpe.py``) and unigram-LM
(``operators/unigram.py``).

WordPiece (Schuster & Nakajima, ICASSP 2012; the BERT tokenizer)
ENCODES by greedy longest-match-first: from each word position take
the LONGEST vocabulary piece matching the remaining prefix
(word-internal pieces carry the ``##`` continuation marker); if any
position has no match the whole word becomes one ``[UNK]`` token —
the all-or-nothing rule HuggingFace tokenizers implement.  TRAINING
is merge-based like BPE but scores candidate pairs by LIKELIHOOD GAIN
``count(ab) / (count(a) * count(b))`` instead of raw frequency
(merging frequent-but-independent pairs is worthless; merging pairs
that co-occur beyond chance is what raises corpus likelihood).

Distribution strategy (the shared tokenizer spine):

* the corpus collapses to the DISTINCT-WORD frame in one shuffle agg;
  per-word encode/train work runs once per distinct word;
* the greedy encode is a pure-Column fold (no Python) against a
  ``create_map`` literal — and, above ``_MAX_LITERAL_PIECES`` pieces,
  a broadcast-dict vectorized mapInPandas twin (the production-
  vocabulary regime, plan size constant in vocab), pinned equal;
* each training ROUND is one symbol-count + one pair-count partial
  agg over the vocabulary frame plus a bounded driver argmax — the
  BPE loop with a ratio score (one merge per round: the ratio score
  has no disjoint-batch exactness theorem, so batching is not
  offered).

``wordpiece_token_counts`` is value-oracled via a DuckDB recursive
CTE replaying the same greedy walk; the trainer is pinned
round-by-round against a sequential reference in
tests/test_wordpiece.py.

Reference anchor: the reference repo has no tokenizer operator; this
is training-data-pipeline surface (SURVEY §8 extras) on its
Combine-per-key shapes (sdks/java/core/.../Combine.java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import word_tokens

#: continuation marker for word-internal pieces (the BERT convention)
_CONT = "##"
#: same plan-literal ceiling as the unigram scorer: above this many
#: pieces the encode switches to the broadcast-dict mapInPandas twin
_MAX_LITERAL_PIECES = 512
#: hard word-length cap, mirroring operators/unigram.py
_MAX_WORD_LEN = 4096


def _vocab_map(vocab) -> Column:
    """create_map literal piece -> 1 (membership; values unused)."""
    return F.create_map(*[F.lit(x) for p in sorted(vocab)
                          for x in (p, 1)])


def _greedy_counts_col(word: Column, vocab) -> Column:
    """Pure-Column greedy longest-match token count for one word:
    struct fold over at most length(word) steps; returns
    struct(n_tokens int, is_unk int).  A word with any unmatched
    position is ONE [UNK] token (is_unk = 1)."""
    mp = _vocab_map(vocab)
    # longest RAW span any piece can match (continuation pieces spell
    # '##' + span)
    max_span = max((len(p[2:]) if p.startswith(_CONT) else len(p)
                    for p in vocab), default=1)
    n = F.when(F.length(word) <= _MAX_WORD_LEN, F.length(word)) \
        .otherwise(F.raise_error(F.concat(
            F.lit(f"wordpiece: word longer than {_MAX_WORD_LEN} chars: "),
            F.substring(word, 1, 64), F.lit("..."))))

    def step(acc, _):
        pos, cnt, failed = acc["pos"], acc["n"], acc["failed"]

        def hit(k):
            raw = word.substr(pos + 1, k)
            piece = F.when(pos == 0, raw).otherwise(
                F.concat(F.lit(_CONT), raw))
            return F.when(F.element_at(mp, piece).isNotNull(), k)

        ks = F.sequence(F.lit(1), F.least(F.lit(max_span),
                                          F.greatest(F.length(word) - pos,
                                                     F.lit(1))))
        k_star = F.array_max(F.filter(F.transform(ks, hit),
                                      lambda x: x.isNotNull()))
        active = (~failed) & (pos < F.length(word))
        return F.when(~active, acc).otherwise(
            F.when(k_star.isNull(),
                   F.struct(pos.alias("pos"), cnt.alias("n"),
                            F.lit(True).alias("failed")))
            .otherwise(F.struct((pos + k_star).alias("pos"),
                                (cnt + 1).alias("n"),
                                F.lit(False).alias("failed"))))

    init = F.struct(F.lit(0).alias("pos"), F.lit(0).alias("n"),
                    F.lit(False).alias("failed"))
    out = F.aggregate(F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                      init, step)
    return F.struct(
        F.when(out["failed"], F.lit(1)).otherwise(out["n"])
        .cast("int").alias("n_tokens"),
        F.when(out["failed"], F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("is_unk"))


def _greedy_word_py(word: str, vocab: set, max_span: int) -> tuple:
    """Python twin of the greedy fold: (n_tokens, is_unk)."""
    if len(word) > _MAX_WORD_LEN:
        raise ValueError(f"wordpiece: word longer than {_MAX_WORD_LEN} "
                         f"chars: {word[:64]}...")
    pos, n = 0, 0
    while pos < len(word):
        k = None
        for span in range(min(max_span, len(word) - pos), 0, -1):
            piece = word[pos:pos + span] if pos == 0 \
                else _CONT + word[pos:pos + span]
            if piece in vocab:
                k = span
                break
        if k is None:
            return 1, 1          # whole word -> [UNK]
        pos += k
        n += 1
    return n, 0


def _per_word_bc(dw: DataFrame, vocab) -> DataFrame:
    """Broadcast-mode greedy scoring: (word, n_tokens, is_unk)."""
    vset = set(vocab)
    bc = dw.sparkSession.sparkContext.broadcast(vset)
    max_span = max((len(p[2:]) if p.startswith(_CONT) else len(p)
                    for p in vset), default=1)

    def score(batches):
        import pandas as pd

        vs = bc.value
        for pdf in batches:
            res = [_greedy_word_py(w, vs, max_span) for w in pdf["word"]]
            yield pd.DataFrame({"word": pdf["word"],
                                "n_tokens": [r[0] for r in res],
                                "is_unk": [r[1] for r in res]})

    return dw.mapInPandas(score, "word string, n_tokens int, is_unk int")


def wordpiece_token_counts(df: DataFrame, vocab, *,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           max_literal_pieces: int = _MAX_LITERAL_PIECES
                           ) -> DataFrame:
    """Per-document WordPiece token count and [UNK]-word count under a
    FIXED vocabulary (iterable of pieces; word-internal pieces spelled
    with the ``##`` prefix) — the tokenizer-APPLICATION side, value-
    oracled via a DuckDB recursive CTE replaying the same greedy
    longest-match walk (``wordpiece_token_counts`` in __spark_entry__).

    At or below ``max_literal_pieces`` the walk is a pure-Column fold
    with the vocabulary as a plan literal; above it, a broadcast-set
    mapInPandas twin (plan size constant in vocabulary — BERT vocabs
    are 30k pieces), pinned equal in tests/test_wordpiece.py.

    Returns (id_col, n_tokens, n_unk_words); empty docs report (0, 0).
    """
    vocab = set(vocab)   # materialize: generators must not exhaust
    wpd = df.select(F.col(id_col),
                    F.explode_outer(word_tokens(F.col(text_col)))
                    .alias("word"))
    dw = wpd.select("word").where(F.col("word").isNotNull()).distinct()
    if len(vocab) > max_literal_pieces:
        dw = _per_word_bc(dw, vocab)
    else:
        dw = (dw.withColumn("r", _greedy_counts_col(F.col("word"),
                                                    vocab))
              .select("word", F.col("r.n_tokens").alias("n_tokens"),
                      F.col("r.is_unk").alias("is_unk")))
    return (wpd.join(dw, "word", "left")
            .groupBy(id_col)
            .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long")
                 .alias("n_tokens"),
                 F.coalesce(F.sum("is_unk"), F.lit(0)).cast("long")
                 .alias("n_unk_words")))


#: the reported token for all-or-nothing failures
_UNK = "[UNK]"


def _greedy_pieces_col(word: Column, vocab) -> Column:
    """array<string> of the greedy segmentation's pieces (## markers
    included); a failed word yields ['[UNK]'] — the walk twin of
    ``_greedy_counts_col``."""
    mp = _vocab_map(vocab)
    max_span = max((len(p[2:]) if p.startswith(_CONT) else len(p)
                    for p in vocab), default=1)
    n = F.when(F.length(word) <= _MAX_WORD_LEN, F.length(word)) \
        .otherwise(F.raise_error(F.concat(
            F.lit(f"wordpiece: word longer than {_MAX_WORD_LEN} chars: "),
            F.substring(word, 1, 64), F.lit("..."))))

    def step(acc, _):
        pos, ps, failed = acc["pos"], acc["ps"], acc["failed"]

        def hit(k):
            raw = word.substr(pos + 1, k)
            piece = F.when(pos == 0, raw).otherwise(
                F.concat(F.lit(_CONT), raw))
            return F.when(F.element_at(mp, piece).isNotNull(), k)

        ks = F.sequence(F.lit(1), F.least(F.lit(max_span),
                                          F.greatest(F.length(word) - pos,
                                                     F.lit(1))))
        k_star = F.array_max(F.filter(F.transform(ks, hit),
                                      lambda x: x.isNotNull()))
        raw = word.substr(pos + 1, k_star)
        piece = F.when(pos == 0, raw).otherwise(
            F.concat(F.lit(_CONT), raw))
        active = (~failed) & (pos < F.length(word))
        return F.when(~active, acc).otherwise(
            F.when(k_star.isNull(),
                   F.struct(pos.alias("pos"), ps.alias("ps"),
                            F.lit(True).alias("failed")))
            .otherwise(F.struct((pos + k_star).alias("pos"),
                                F.concat(ps, F.array(piece)).alias("ps"),
                                F.lit(False).alias("failed"))))

    init = F.struct(F.lit(0).alias("pos"),
                    F.array().cast("array<string>").alias("ps"),
                    F.lit(False).alias("failed"))
    out = F.aggregate(F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                      init, step)
    return F.when(out["failed"], F.array(F.lit(_UNK))).otherwise(out["ps"])


def _greedy_pieces_py(word: str, vocab: set, max_span: int) -> list:
    """Python twin of ``_greedy_pieces_col`` (broadcast mode)."""
    if len(word) > _MAX_WORD_LEN:
        raise ValueError(f"wordpiece: word longer than {_MAX_WORD_LEN} "
                         f"chars: {word[:64]}...")
    pos, ps = 0, []
    while pos < len(word):
        k = None
        for span in range(min(max_span, len(word) - pos), 0, -1):
            piece = word[pos:pos + span] if pos == 0 \
                else _CONT + word[pos:pos + span]
            if piece in vocab:
                k = span
                break
        if k is None:
            return [_UNK]
        ps.append(word[pos:pos + k] if pos == 0
                  else _CONT + word[pos:pos + k])
        pos += k
    return ps


def wordpiece_piece_counts(df: DataFrame, vocab, *,
                           text_col: str = "text",
                           max_literal_pieces: int = _MAX_LITERAL_PIECES
                           ) -> DataFrame:
    """Corpus-weighted piece USAGE counts under a FIXED vocabulary:
    how often each piece (or '[UNK]', once per unmatched word) appears
    in the greedy segmentation — the unigram_piece_counts analog, and
    the aggregate a WordPiece-vocabulary pruning pass consumes.  The
    walk runs once per DISTINCT word; counts are exact int64.
    Value-oracled (`wordpiece_piece_counts` in __spark_entry__) by
    extending the greedy recursive CTE with the piece list.  Returns
    (piece, cnt)."""
    vocab = set(vocab)
    wv = (df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))
    if len(vocab) > max_literal_pieces:
        bc = df.sparkSession.sparkContext.broadcast(vocab)
        max_span = max((len(p[2:]) if p.startswith(_CONT) else len(p)
                        for p in vocab), default=1)

        def walk(batches):
            import pandas as pd

            vs = bc.value
            for pdf in batches:
                yield pd.DataFrame({
                    "word": pdf["word"],
                    "ps": [_greedy_pieces_py(w, vs, max_span)
                           for w in pdf["word"]]})

        segs = wv.join(wv.select("word").mapInPandas(
            walk, "word string, ps array<string>"), "word")
    else:
        segs = wv.select(
            "cnt", _greedy_pieces_col(F.col("word"), vocab).alias("ps"))
    # explode_outer + null guard: see unigram_piece_counts — a plain
    # explode invites a size() filter below the word agg
    return (segs.select(F.explode_outer("ps").alias("piece"), "cnt")
            .where(F.col("piece").isNotNull())
            .groupBy("piece").agg(F.sum("cnt").alias("cnt")))


def _symbolize(word: Column) -> Column:
    """WordPiece initial symbols: first char bare, rest ##-prefixed."""
    chars = F.regexp_extract_all(word, F.lit("(.)"), 1)
    return F.transform(chars, lambda c, i: F.when(i == 0, c)
                       .otherwise(F.concat(F.lit(_CONT), c)))


def _merge_symbol(a: str, b: str) -> str:
    """Merged symbol string: b's continuation marker is interior and
    drops (a keeps its own prefix, bare or ##)."""
    return a + (b[len(_CONT):] if b.startswith(_CONT) else b)


def wordpiece_train(df: DataFrame, *, n_merges: int = 10,
                    text_col: str = "text") -> DataFrame:
    """Learn ``n_merges`` WordPiece merges; returns
    (rank, a, b, merged, score_num, score_den) in merge order, where
    the selection score is ``score_num / score_den`` =
    ``pair_count / (count(a) * count(b))`` (the likelihood-gain rule —
    BPE's argmax with a normalized numerator).  Returning the exact
    integer numerator/denominator keeps the artifact float-free.

    Each ROUND: one symbol-count agg + one pair-count agg over the
    (checkpointed) vocabulary frame, the score computed DISTRIBUTED
    (two joins against the symbol-count frame — strategy left to AQE),
    a BOUNDED driver pull of the top 256 candidates by float score,
    and the argmax decided within that window by exact
    cross-multiplied fraction comparison (python ints).  The float
    ranking only selects the window; the one theoretical gap — more
    than 256 exact-DISTINCT rationals collapsing to the same double at
    the window boundary — cannot occur for the integer counts real
    corpora produce.  One merge per round: the ratio score
    changes non-locally after every merge, so the BPE disjoint-batch
    exactness argument does not port.  Pinned round-by-round against a
    sequential reference in tests/test_wordpiece.py."""
    spark = df.sparkSession
    wv = (df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
          .select("cnt", _symbolize(F.col("word")).alias("syms"))
          .localCheckpoint())
    merges = []
    while len(merges) < n_merges:
        syms_df = (wv.select(F.explode("syms").alias("s"), "cnt")
                   .groupBy("s").agg(F.sum("cnt").alias("c")))
        shifted = F.slice(F.col("syms"), 2,
                          F.greatest(F.size("syms") - 1, F.lit(0)))
        pairs = F.filter(
            F.zip_with(F.col("syms"), shifted,
                       lambda a, b: F.struct(a.alias("a"), b.alias("b"))),
            lambda p: p["b"].isNotNull())
        cand = (wv.select(F.explode(pairs).alias("p"), "cnt")
                .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
                .agg(F.sum("cnt").alias("pc"))
                .join(syms_df.select(F.col("s").alias("a"),
                                     F.col("c").alias("ca")), "a")
                .join(syms_df.select(F.col("s").alias("b"),
                                     F.col("c").alias("cb")), "b")
                .withColumn("score", F.col("pc") / (F.col("ca") * F.col("cb")))
                .orderBy(F.col("score").desc(), "a", "b")
                .limit(256).collect())
        if not cand:
            break
        # exact argmax within the pulled window: pc1*den2 > pc2*den1
        best = None
        for r in cand:
            a, b, pc = r["a"], r["b"], int(r["pc"])
            den = int(r["ca"]) * int(r["cb"])
            if best is None:
                best = (a, b, pc, den)
                continue
            lhs = pc * best[3]
            rhs = best[2] * den
            if lhs > rhs or (lhs == rhs and (a, b) < (best[0], best[1])):
                best = (a, b, pc, den)
        a, b, pc, den = best
        merges.append((len(merges), a, b, _merge_symbol(a, b), pc, den))
        merged_lit = F.lit(_merge_symbol(a, b))
        # one array-level rewrite: left-to-right via a fold that joins
        # (prev, cur) == (a, b) into the merged symbol
        def apply_merge(syms):
            def step(acc, s):
                out, prev = acc["out"], acc["prev"]
                return F.when(
                    prev.isNotNull() & (prev == F.lit(a)) & (s == F.lit(b)),
                    F.struct(F.concat(out, F.array(merged_lit)).alias("out"),
                             F.lit(None).cast("string").alias("prev"))
                ).otherwise(F.struct(
                    F.when(prev.isNotNull(), F.concat(out, F.array(prev)))
                    .otherwise(out).alias("out"),
                    s.alias("prev")))

            init = F.struct(F.array().cast("array<string>").alias("out"),
                            F.lit(None).cast("string").alias("prev"))
            folded = F.aggregate(syms, init, step)
            return F.when(folded["prev"].isNotNull(),
                          F.concat(folded["out"], F.array(folded["prev"]))
                          ).otherwise(folded["out"])

        wv = wv.select("cnt", apply_merge(F.col("syms")).alias("syms")) \
               .localCheckpoint()
    return spark.createDataFrame(
        merges,
        "rank int, a string, b string, merged string, "
        "score_num long, score_den long")
