"""Composed corpus-curation pipeline: the end-to-end pass a training-data
pipeline runs before tokenization, built from the datapipe components as
ONE declarative plan.

Stages run sequentially on survivors, the order every production pipeline
uses (cheap row-local filters first, pairwise work last, on the smallest
possible set):

1. quality    — composite heuristic score (textstats.quality_metrics)
                below threshold → ``low_quality``
2. exact      — md5 text groups keep the smallest doc id →
                ``exact_dup`` for the rest
3. near-dup   — MinHash-LSH pairs + exact-Jaccard verify on the exact
                representatives, connected components keep the smallest
                member → ``near_dup`` for the rest
4. decontam   — n-gram overlap against a benchmark set (fraction of the
                BENCHMARK item's n-grams) → ``contaminated``
5. ``kept``

Output: one row per input document, (doc_id, verdict) — the disposition
report; downstream consumers join verdict == 'kept' back to the corpus.

Scale shape: stage 1 is map-only; stage 2 one map-side-combinable
aggregation; stage 3 runs on exact representatives only with banded LSH
+ hot-bucket caps (no all-pairs anywhere — see dedup.py); stage 4
broadcasts the benchmark n-gram table into the survivor scan. The
verdict union is five slim (doc_id, verdict) frames; anti-joins against
keeper sets stay broadcastable because each drop set is a small fraction
of the corpus (and AQE re-plans when it is not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.dedup import (
    duplicate_groups,
    minhash_near_duplicates,
)
from rrdtool_1_x_spark.datapipe.decontam import contamination_pairs
from rrdtool_1_x_spark.datapipe.textstats import quality_metrics


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.55,
    min_tokens: int = 0,
    max_tokens: int | None = None,
    nd_kwargs: dict | None = None,
    contam_n: int = 8,
    contam_threshold: float = 0.5,
) -> DataFrame:
    """(doc_id, verdict) disposition for every input document.

    ``benchmark``: (bench_id, text) eval items to decontaminate against
    (None skips stage 4). A document that IS a benchmark item (same id)
    is not flagged for matching itself. ``min_tokens``/``max_tokens`` are
    the Gopher-style length rule folded into the quality stage.
    ``nd_kwargs`` forwards to minhash_near_duplicates (thresholds, bands,
    bucket caps)."""
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    # 1. quality — round(6) BEFORE the compare so the cut is stable under
    # any float-op ordering (the score is pure row-local math, but the
    # threshold must not sit inside another engine's last ulp)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    q = quality_metrics(base).select(
        "doc_id", "text",
        F.round("quality_score", 6).alias("q"),
        toks.alias("tc"),
    )
    bad = (
        (F.col("q") < quality_threshold)
        | F.col("q").isNull()
        | (F.col("tc") < min_tokens)
    )
    if max_tokens is not None:
        bad = bad | (F.col("tc") > max_tokens)
    low = q.filter(bad).select("doc_id")
    qk = q.filter(~bad).select("doc_id", "text")

    # 2. exact dedup among quality survivors
    keepers = (
        qk.groupBy(F.md5(F.col("text").cast("binary")).alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    reps = qk.join(keepers, "doc_id")  # representatives carry text forward
    exact_dup = qk.join(keepers, "doc_id", "left_anti").select("doc_id")

    # 3. near-dup on representatives; drop non-minimal group members
    pairs = minhash_near_duplicates(reps, **(nd_kwargs or {}))
    groups = duplicate_groups(pairs)
    near_dup = groups.filter(F.col("doc_id") != F.col("group_id")).select("doc_id")
    surv = reps.join(near_dup, "doc_id", "left_anti")

    # 4. decontamination of the remaining set
    if benchmark is not None:
        contam = (
            contamination_pairs(
                surv, benchmark, n=contam_n, min_overlap_frac=contam_threshold
            )
            .filter(F.col("doc_id") != F.col("bench_id"))
            .select("doc_id")
            .distinct()
        )
    else:
        contam = surv.select("doc_id").limit(0)
    kept = surv.select("doc_id").join(contam, "doc_id", "left_anti")

    verdict = lambda df, v: df.select("doc_id", F.lit(v).alias("verdict"))
    return (
        verdict(low, "low_quality")
        .unionByName(verdict(exact_dup, "exact_dup"))
        .unionByName(verdict(near_dup, "near_dup"))
        .unionByName(verdict(contam, "contaminated"))
        .unionByName(verdict(kept, "kept"))
    )


def curation_report(dispositions: DataFrame) -> DataFrame:
    """One row per verdict: (verdict, docs, frac of corpus)."""
    total = dispositions.count()
    return (
        dispositions.groupBy("verdict")
        .agg(F.count("*").alias("docs"))
        .withColumn("frac", F.round(F.col("docs") / F.lit(float(total)), 6))
    )
