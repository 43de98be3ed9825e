"""Unigram-LM subword tokenizer — distributed Viterbi-EM training
(Kudo, "Subword Regularization", ACL 2018 §3; the SentencePiece unigram
model) made cross-engine EXACT, the companion of the BPE trainer in
``datapipe.bpe``:

* piece scores are integer micro-nat log-probs (``round(ln(c/T)*1e6)``,
  the corpus log convention), so every Viterbi DP score is an integer
  SUM — no float chain to drift;
* the E-step is HARD (Viterbi) EM: each word's single best segmentation
  by (score DESC, segmentation-string ASC) — the lexicographic tiebreak
  makes the argmax total and engine-portable, and carrying the
  segmentation string through the DP removes backtracking entirely;
* the M-step recounts pieces from the best segmentations (integer
  word-frequency-weighted sums), re-scores, and prunes to the vocab
  budget by (count DESC, piece ASC) — single-character pieces are never
  pruned, so every word stays segmentable (the SentencePiece character
  fallback, enforced structurally instead of at encode time).

Shape at scale: training runs on the DISTINCT-WORD frame (vocabulary-
sized, not corpus-sized — the corpus is touched once for word counts,
the ``datapipe.bpe`` discipline). The vocabulary is driver/broadcast-
sized by construction (<= seed_size rows); the per-word DP is the one
inherently sequential recurrence (like rpn_seq's PREV) and runs inside
Arrow ``mapInPandas`` batches, parallel across words. Each EM round is
one broadcast-joined scan of the word frame plus vocab-sized
aggregates.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from rrdtool_1_x_spark.datapipe.mat import materialize


def word_frame(
    df: DataFrame,
    text_col: str = "text",
    max_word_len: int = 16,
) -> DataFrame:
    """Distinct words with corpus frequencies — the training input.
    Words longer than ``max_word_len`` are EXCLUDED (documented cap:
    the DP cost per word is length x max_piece; production picks the
    cap to cover its character distribution)."""
    w = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("word")
    return (
        df.select(w)
        .filter(
            (F.col("word") != "") & (F.length("word") <= max_word_len)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def seed_vocab(
    words: DataFrame,
    max_piece: int = 4,
    seed_size: int = 128,
) -> list[tuple[str, int]]:
    """Seed pieces: every substring of length 1..max_piece of every
    word, counted occurrence x word frequency; the top ``seed_size`` by
    (count DESC, piece ASC) UNION all single characters (which can
    never be dropped). Returns [(piece, count)] sorted by that rule —
    driver-sized by construction."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)), i ->"
        f" transform(sequence(1, least({int(max_piece)},"
        " length(word) - i + 1)), l -> substring(word, i, l))))"
    )
    counts = (
        words.select(F.col("freq"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    rows = counts.orderBy(
        F.desc("cnt"), F.asc("piece")
    ).limit(int(seed_size)).collect()
    top = [(r["piece"], int(r["cnt"])) for r in rows]
    have = {p for p, _ in top}
    chars = (
        counts.filter(F.length("piece") == 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .collect()
    )
    top += [
        (r["piece"], int(r["cnt"])) for r in chars if r["piece"] not in have
    ]
    return sorted(top, key=lambda pc: (-pc[1], pc[0]))


def _round_half_away(v: float) -> int:
    """Half-away-from-zero — the rounding BOTH engines' round() uses
    (Spark HALF_UP, DuckDB round); Python's builtin round() is
    half-to-even and would diverge on exact .5 ties."""
    return int(math.floor(abs(v) + 0.5)) * (1 if v >= 0 else -1)


def _scores(vocab_counts: list[tuple[str, int]]) -> dict[str, int]:
    """Integer micro-nat log-probs from counts: round(ln(c/T)*1e6) with
    half-away-from-zero rounding — each one correctly-rounded double op
    of exact integers, the same convention as unigram_logprob so the
    oracle reproduces it."""
    total = sum(c for _, c in vocab_counts)
    return {
        p: _round_half_away(math.log(c / total) * 1e6)
        for p, c in vocab_counts
        if c > 0
    }


_SEG_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("freq", LongType()),
        StructField("seg", StringType()),
        StructField("n_pieces", LongType()),
        StructField("score", LongType()),
    ]
)


def viterbi_segment(
    words: DataFrame,
    scores: dict[str, int],
    max_piece: int = 4,
) -> DataFrame:
    """Best segmentation per word under the piece scores: DP over
    positions, candidates (dp[j] + score(word[j:i])), picked by
    (score DESC, seg-string ASC). Returns (word, freq, seg, n_pieces,
    score); a word containing a character absent from the model (can
    only happen if the caller bypassed the single-char guarantee) gets
    seg = NULL.

    Arrow-batched mapInPandas with the broadcast score dict — the DP is
    the inherently sequential per-word recurrence; parallel across
    words, vocabulary-sized input frame."""
    spark = words.sparkSession
    b = spark.sparkContext.broadcast(dict(scores))
    mp = int(max_piece)

    def run(batches):
        import pandas as pd

        sc = b.value
        for pdf in batches:
            out = {"word": [], "freq": [], "seg": [], "n_pieces": [],
                   "score": []}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                # dp[i] = (neg-ish int score, seg string) for prefix i
                dp: list[tuple[int, str] | None] = [None] * (n + 1)
                dp[0] = (0, "")
                for i in range(1, n + 1):
                    best = None
                    for l in range(1, min(mp, i) + 1):
                        j = i - l
                        if dp[j] is None:
                            continue
                        s = sc.get(word[j:i])
                        if s is None:
                            continue
                        seg = (
                            dp[j][1] + " " + word[j:i]
                            if dp[j][1]
                            else word[j:i]
                        )
                        cand = (dp[j][0] + s, seg)
                        if best is None or (
                            cand[0] > best[0]
                            or (cand[0] == best[0] and cand[1] < best[1])
                        ):
                            best = cand
                    dp[i] = best
                out["word"].append(word)
                out["freq"].append(int(freq))
                if dp[n] is None:
                    out["seg"].append(None)
                    out["n_pieces"].append(0)
                    out["score"].append(0)
                else:
                    out["seg"].append(dp[n][1])
                    out["n_pieces"].append(dp[n][1].count(" ") + 1)
                    out["score"].append(int(dp[n][0]))
            yield pd.DataFrame(out)

    return words.select("word", "freq").mapInPandas(run, _SEG_SCHEMA)


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    max_piece: int = 4,
    seed_size: int = 128,
    vocab_size: int = 48,
    n_iter: int = 2,
    max_word_len: int = 16,
) -> list[tuple[str, int, int]]:
    """Viterbi-EM training loop. Returns the final vocabulary as
    [(piece, count, logp_micro)] sorted by (count DESC, piece ASC) —
    counts are the last E-step's Viterbi piece counts, logp the
    resulting scores. Driver holds only the vocab list; each round is
    one word-frame scan."""
    words = word_frame(df, text_col, max_word_len).transform(materialize)
    vocab = seed_vocab(words, max_piece, seed_size)
    for it in range(int(n_iter)):
        scores = _scores(vocab)
        seg = viterbi_segment(words, scores, max_piece)
        counted = (
            seg.filter(F.col("seg").isNotNull())
            .select("freq", F.explode(F.split("seg", " ")).alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()
        )
        new_counts = {r["piece"]: int(r["cnt"]) for r in counted}
        # single chars survive even at count 0 (segmentability); other
        # unused pieces drop; then prune to the budget by (cnt, piece),
        # chars exempt
        merged = [
            (p, new_counts.get(p, 0))
            for p, _ in vocab
            if len(p) == 1 or new_counts.get(p, 0) > 0
        ]
        merged.sort(key=lambda pc: (-pc[1], pc[0]))
        multi_budget = int(vocab_size) - sum(
            1 for p, _ in merged if len(p) == 1
        )
        kept, taken = [], 0
        for p, c in merged:
            if len(p) == 1:
                kept.append((p, c))
            elif taken < multi_budget:
                kept.append((p, c))
                taken += 1
        # zero-count single chars get a floor count of 1 so ln() exists
        vocab = sorted(
            [(p, max(c, 1)) for p, c in kept],
            key=lambda pc: (-pc[1], pc[0]),
        )
    scores = _scores(vocab)
    return [(p, c, scores[p]) for p, c in vocab]


def unigram_doc_stats(
    df: DataFrame,
    model: list[tuple[str, int, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Per-document tokenizer statistics under a trained model:
    (id, n_words, n_pieces, logp_micro_sum) — the unigram-LM analogue
    of BPE fertility plus a document log-likelihood quality signal.
    Each DISTINCT word segments once (vocabulary-sized DP), documents
    join against that frame — the corpus is never DP-scanned."""
    scores = {p: s for p, _, s in model}
    toks = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("word")
    doc_words = (
        df.select(F.col(id_col), toks)
        .filter(
            (F.col("word") != "") & (F.length("word") <= max_word_len)
        )
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    words = doc_words.groupBy("word").agg(
        F.sum("m").alias("freq")
    )
    # unsegmentable words (possible only when the supplied model does
    # not cover a character — a model trained elsewhere) are DROPPED,
    # matching the oracle's DP which never emits them; including them
    # at score 0 would silently inflate the log-likelihood
    seg = viterbi_segment(words, scores, max_piece).filter(
        F.col("seg").isNotNull()
    ).select("word", "n_pieces", "score")
    return (
        doc_words.join(seg, "word")
        .groupBy(id_col)
        .agg(
            F.sum("m").cast("long").alias("n_words"),
            F.sum(F.col("m") * F.col("n_pieces")).cast("long").alias(
                "n_pieces"
            ),
            F.sum(F.col("m") * F.col("score")).cast("long").alias(
                "logp_micro_sum"
            ),
        )
    )


_NBEST_SCHEMA = StructType(
    [
        StructField("word", StringType()),
        StructField("freq", LongType()),
        StructField("rank", LongType()),
        StructField("seg", StringType()),
        StructField("score", LongType()),
    ]
)


def viterbi_nbest(
    words: DataFrame,
    scores: dict[str, int],
    max_piece: int = 4,
    nbest: int = 2,
) -> DataFrame:
    """N-best segmentations per word — the machinery subword
    regularization (Kudo 2018 §4) samples from, deterministic: each
    prefix keeps its ``nbest`` best (score DESC, seg ASC) partials and
    extends them (a segmentation string encodes its path uniquely, so
    beam entries never collide). Ties beyond the beam width resolve by
    the beam rule itself — the oracle mirrors the truncation layer by
    layer, so the result is engine-exact even in pathological
    equal-score ties. Returns (word, freq, rank, seg, score) with
    rank 1..nbest (fewer when a word has fewer segmentations)."""
    spark = words.sparkSession
    b = spark.sparkContext.broadcast(dict(scores))
    mp, nb = int(max_piece), int(nbest)

    def run(batches):
        import pandas as pd

        sc = b.value
        for pdf in batches:
            out = {"word": [], "freq": [], "rank": [], "seg": [],
                   "score": []}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                n = len(word)
                dp: list[list[tuple[int, str]]] = [[] for _ in range(n + 1)]
                dp[0] = [(0, "")]
                for i in range(1, n + 1):
                    cands = []
                    for l in range(1, min(mp, i) + 1):
                        j = i - l
                        s = sc.get(word[j:i])
                        if s is None:
                            continue
                        for ps, pseg in dp[j]:
                            seg = (
                                pseg + " " + word[j:i] if pseg else word[j:i]
                            )
                            cands.append((ps + s, seg))
                    cands.sort(key=lambda t: (-t[0], t[1]))
                    dp[i] = cands[:nb]
                for r, (s, seg) in enumerate(dp[n], start=1):
                    out["word"].append(word)
                    out["freq"].append(int(freq))
                    out["rank"].append(r)
                    out["seg"].append(seg)
                    out["score"].append(int(s))
            yield pd.DataFrame(out)

    return words.select("word", "freq").mapInPandas(run, _NBEST_SCHEMA)
