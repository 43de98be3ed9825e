"""Benchmark decontamination: flag training documents that overlap an
evaluation set.

The standard contamination check (used for every serious pretraining run):
a training document is contaminated if it shares too many n-grams with any
benchmark item. Exact-match n-gram overlap — the conservative, explainable
rule — not fuzzy similarity: eval leakage is judged on verbatim content.

Scale shape: explode both sides to (id, ngram) rows, DISTINCT per side,
join on the n-gram, count matches per (doc, bench) pair. The benchmark side
is small (eval sets are thousands of items, the corpus is billions) — the
n-gram join broadcasts the benchmark side, so the corpus is never shuffled:
the whole check is a map-side join over the corpus scan plus one
aggregation on (doc_id, bench_id) pairs that actually overlap. Documents
with zero overlap never produce a row at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ngram_frame(df: DataFrame, id_col: str, text_col: str, n: int, out_id: str) -> DataFrame:
    """(out_id, ngram) distinct word n-grams, built from the token array
    with transform over indices (no per-row window needed — the array is
    already in document order).

    Per-document uniqueness comes from ``array_distinct`` BEFORE the
    explode — a map-side dedup inside the scan task — never from
    ``.distinct()`` after it, which would shuffle every exploded n-gram
    row of the corpus just to remove within-document repeats. The rows
    are already unique across documents by construction (the id is part
    of the row), so the map-side dedup is complete and the corpus-side
    claim of the contamination join ("the corpus is never shuffled")
    actually holds."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    pre = df.select(F.col(id_col).alias(out_id), toks.alias("_toks"))
    grams = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - n),
            lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", "_toks")))
    return pre.select(
        out_id, F.explode(F.array_distinct(grams)).alias("ngram")
    )


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap_frac: float = 0.5,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(doc_id, bench_id, overlap_ngrams, bench_ngrams, overlap_frac) for
    every (document, benchmark item) pair whose shared distinct-n-gram count
    reaches ``min_overlap_frac`` of the benchmark item's n-grams.

    The fraction is measured against the BENCHMARK side (the question is
    "is this eval item inside the training doc", not the reverse). The
    benchmark n-gram table is broadcast — the corpus scan is never
    shuffled; only overlapping (doc, bench) pairs reach the aggregation.
    """
    dg = _ngram_frame(docs, doc_id_col, doc_text_col, n, "doc_id")
    bg = _ngram_frame(benchmark, bench_id_col, bench_text_col, n, "bench_id")
    bsz = bg.groupBy("bench_id").agg(F.count("*").alias("bench_ngrams"))
    overlap = (
        dg.join(F.broadcast(bg), "ngram")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("overlap_ngrams"))
    )
    return (
        overlap.join(F.broadcast(bsz), "bench_id")
        .withColumn(
            "overlap_frac",
            F.col("overlap_ngrams") / F.col("bench_ngrams"),
        )
        .filter(F.col("overlap_frac") >= min_overlap_frac)
        .select("doc_id", "bench_id", "overlap_ngrams", "bench_ngrams", "overlap_frac")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap_frac: float = 0.5,
    doc_id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """Drop contaminated documents: anti-join the corpus against the
    contaminated id set. The pair table is tiny (only overlapping pairs),
    so the anti-join broadcasts — the clean path is one corpus scan."""
    bad = contamination_pairs(
        docs, benchmark, n=n, min_overlap_frac=min_overlap_frac,
        doc_id_col=doc_id_col, **kw,
    ).select(F.col("doc_id").alias(doc_id_col)).distinct()
    return docs.join(F.broadcast(bad), doc_id_col, "left_anti")


def vocab_top_ngrams(
    docs: DataFrame,
    n: int = 1,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    by: str | None = None,
) -> DataFrame:
    """Corpus vocabulary: the top-``k`` n-grams by document frequency
    (ties broken lexicographically), optionally per ``by`` group (e.g.
    per language — the seed of a per-language tokenizer vocab).

    Document frequency (distinct docs containing the gram), not raw count:
    df is the robust signal for vocab/boilerplate work and the distinct
    explode is exactly the shape the dedup stack already shuffles.
    Partial aggregation (map-side combine) does the heavy lifting; the
    top-k window only sees one row per distinct gram.
    """
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_text"),
        *([F.col(by).alias("_by")] if by else []),
    )
    grams = _ngram_frame(base, "_id", "_text", n, "doc_id")
    if by:
        grams = grams.join(base.select(F.col("_id").alias("doc_id"), "_by"), "doc_id")
        counted = grams.groupBy("_by", "ngram").agg(
            F.count("*").alias("doc_freq")
        )
        w = Window.partitionBy("_by").orderBy(F.desc("doc_freq"), F.asc("ngram"))
        return (
            counted.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("_by").alias(by), "ngram", "doc_freq", "rank")
        )
    counted = grams.groupBy("ngram").agg(F.count("*").alias("doc_freq"))
    # top-k via orderBy+limit (TakeOrdered: per-partition heaps, no
    # single-partition window over the whole vocabulary); the rank window
    # then runs over k rows only
    top = counted.orderBy(F.desc("doc_freq"), F.asc("ngram")).limit(k)
    w = Window.orderBy(F.desc("doc_freq"), F.asc("ngram"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "ngram", "doc_freq", "rank"
    )
