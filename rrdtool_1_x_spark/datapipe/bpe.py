"""Byte-pair-encoding tokenizer induction and application.

``train_bpe`` is the distributed form of Sennrich et al. 2016 ("Neural
Machine Translation of Rare Words with Subword Units", arXiv:1508.07909):
count words once, then iterate — most frequent adjacent symbol pair →
merge everywhere — on the VOCABULARY frame, never the corpus.
``bpe_encode`` applies a trained merge list to documents (Arrow-batched;
the per-word merge loop is the same greedy rank-priority algorithm every
BPE tokenizer runs).

Shape at scale: the corpus is touched exactly once (the word-count
shuffle, map-side combinable). Every training iteration runs two
vocabulary-sized operations — an adjacent-pair aggregation (explode +
groupBy, map-side combinable) and a map-only merge fold — plus ONE
driver-side scalar (the argmax pair). A 100 TB corpus with a 100M-word
vocabulary costs 100M-row jobs per merge, exactly the published
map-reduce BPE shape; lineage is truncated with localCheckpoint so the
iteration count never deepens the plan.

Driver-oracled since round 7: the 20 merge rounds unroll as DuckDB CTE
layers (__spark_entry__._bpe_chain_ctes), and encode rides on the
rank-priority-greedy ≡ rank-ordered-fold equivalence, so both entries
carry full value-hash gates; the Sennrich worked example and
idempotence/round-trip tests in tests/test_datapipe.py pin the algorithm
independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker (Sennrich's formulation)


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    return (
        df.select(F.explode(toks).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )


def _char_symbols(w) -> "F.Column":
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: F.substring(w, i, 1)
    )
    return F.concat(chars, F.array(F.lit(END)))


def train_bpe(
    df: DataFrame,
    num_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list [(left, right), ...] (rank = position).

    Ties on pair count break deterministically to the lexicographically
    smallest (left, right). Stops early when the best pair drops below
    ``min_pair_count`` (merging hapax pairs memorizes noise).
    """
    state = _word_counts(df, text_col).select(
        "_c", _char_symbols(F.col("_w")).alias("_s")
    )
    # vocabulary-sized: safe to keep pinned across iterations
    state = state.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for r in range(num_merges):
        pairs = state.select(
            "_c",
            F.explode(
                F.zip_with(
                    F.col("_s"),
                    F.slice(F.col("_s"), 2, F.greatest(F.size("_s") - 1, F.lit(1))),
                    lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                )
            ).alias("_p"),
        ).filter(F.col("_p.b").isNotNull())
        best = (
            pairs.groupBy("_p.a", "_p.b")
            .agg(F.sum("_c").alias("_n"))
            .orderBy(F.desc("_n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["_n"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        # greedy left-to-right in-word merge: fold each symbol array,
        # fusing x onto the accumulator tail when (tail, x) == (a, b).
        # "aaa" under (a,a) correctly gives [aa, a] — the fused tail "aa"
        # no longer equals "a", exactly the serial tokenizer's behavior.
        merged = F.aggregate(
            F.col("_s"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.lit(a + b)),
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        state = state.select("_c", merged.alias("_s"))
        if (r + 1) % checkpoint_every == 0:
            state = state.localCheckpoint(eager=True)
    return merges


def merges_frame(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The trained merge list as a (rank, left, right, merged) table —
    the persistable tokenizer artifact."""
    rows = [(i, a, b, a + b) for i, (a, b) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-priority BPE of one word — the standard serial loop
    every BPE tokenizer applies (lowest-rank merge first, repeat)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best_rank, best_i = rk, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a trained merge list: returns
    ``(id, n_pieces, pieces)`` where pieces is the per-document subword
    sequence (flattened across words, each word ending in </w>).

    Arrow-batched map over the corpus (mapInPandas) with the merge ranks
    broadcast in the closure — no shuffle; weak-scales with executors.
    A per-batch word cache exploits Zipf: each DISTINCT word in the batch
    is merged once.
    """
    import re

    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    id_ddl = df.schema[id_col].dataType.simpleString()
    # ASCII-whitespace split, NOT str.split(): the trainer tokenizes with
    # Java-regex \s+ (F.split), which matches only [ \t\n\x0B\f\r] — while
    # Python str.split() also splits on unicode whitespace (NBSP,
    # \x1c-\x1f, U+2028...). A document containing those would tokenize
    # differently here than in train_bpe. One residual engine/oracle gap
    # remains: RE2's \s is [\t\n\f\r ] WITHOUT \x0B while Java's includes
    # it, so a vertical tab splits engine-side but not oracle-side — that
    # (like every \s+ oracle in the repo) rides on the corpus being
    # verified free of C0 controls. Python str.lower() can also diverge
    # from SQL lower() on exotic case mappings; the split set is the
    # load-bearing part for the pieces_sig gate.
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def encode(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            out_pieces = []
            for text in pdf[text_col]:
                pieces: list[str] = []
                for w in _ws.split((text or "").lower()):
                    if not w:
                        continue
                    got = cache.get(w)
                    if got is None:
                        got = cache[w] = _encode_word(w, ranks)
                    pieces.extend(got)
                out_pieces.append(pieces)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_pieces": [len(p) for p in out_pieces],
                    "pieces": out_pieces,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        encode, f"{id_col} {id_ddl}, n_pieces long, pieces array<string>"
    )


def bpe_fertility(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Tokenizer fertility report — the standard tokenizer-fit metric
    (pieces per word, chars per piece) per corpus group under a trained
    merge list. High pieces-per-word on a source means the vocabulary
    fits it badly (over-segmentation → more sequence positions per byte
    of text); the number drives vocab-size and merge-count decisions
    before a large training run.

    Returns ``(group, n_pieces, n_words, n_chars, pieces_per_word,
    chars_per_piece)``.

    Shape at scale: one Arrow-batched encode scan (``bpe_encode``) plus
    one map-only word/char count, joined on the doc id and rolled up to
    group-sized output — corpus-linear, no corpus-wide key."""
    enc = bpe_encode(df, merges, id_col, text_col).select(
        id_col, F.col("n_pieces").cast("long").alias("_np")
    )
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = df.select(
        F.col(id_col),
        F.col(group_col),
        F.size(toks).cast("long").alias("_nw"),
        F.length(F.col(text_col)).cast("long").alias("_nc"),
    )
    return (
        base.join(enc, id_col)
        .groupBy(group_col)
        .agg(
            F.sum("_np").alias("n_pieces"),
            F.sum("_nw").alias("n_words"),
            F.sum("_nc").alias("n_chars"),
            F.round(
                F.sum("_np").cast("double") / F.sum("_nw"), 6
            ).alias("pieces_per_word"),
            F.round(
                F.sum("_nc").cast("double") / F.sum("_np"), 6
            ).alias("chars_per_piece"),
        )
    )
