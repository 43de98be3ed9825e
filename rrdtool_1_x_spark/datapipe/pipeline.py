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
broadcasts the benchmark n-gram table into the survivor scan. Each
stage materializes a slim ids-only frame once (localCheckpoint), and
the final disposition is one scan of doc ids left-joined against those
sets with a CASE by stage precedence — fresh-run cost is flat in job
overhead at toy scale and corpus-linear beyond (10x data ≈ 1.1x wall
at the local sweep).
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

from rrdtool_1_x_spark.datapipe.mat import materialize


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

    # Each stage runs ONCE into an eagerly materialized SLIM (ids-only)
    # frame; the final disposition is one scan of doc ids against those
    # sets. A fully lazy five-branch union re-evaluates each branch's
    # whole upstream per branch (the quality regex pass up to 5x, the LSH
    # chain twice): measured fresh-run cost 36 s vs 13 s at the 10x sweep.
    # Checkpointed frames carry ids (+ one hash) only, so materialization
    # stays negligible at corpus scale.

    # 1. quality — round(6) BEFORE the compare so the cut is stable under
    # any float-op ordering (the score is pure row-local math, but the
    # threshold must not sit inside another engine's last ulp)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    q = quality_metrics(base).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("h"),
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
    # one quality pass feeds both the low set and the survivors' hashes
    marked = q.select("doc_id", "h", bad.alias("bad")).transform(materialize)

    # 2. exact dedup among quality survivors, FUSED: one per-hash
    # aggregate produces (h, keeper id); the disposition join below reads
    # the exact_dup verdict straight off it (doc_id != _keep), so the old
    # separate anti-join + low/exact flag-join branches are gone — two
    # joins and one corpus id scan fewer per run.
    kmin = (
        marked.filter(~F.col("bad"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("_keep"))
        .transform(materialize)
    )
    keepers = kmin.select(F.col("_keep").alias("doc_id"))

    # 3. near-dup on representatives; drop non-minimal group members.
    # reps re-reads the raw text by keeper id — a plain column scan, NOT
    # a repeat of the quality pass
    # MATERIALIZE the representative set before the signature stage: the
    # interpreted-HOF minhash projection evaluated directly above the
    # lazy broadcast join ran 44 s vs 0.8 s over the materialized rows at
    # the 10x sweep (56x — the expensive shingle/md5 expressions evaluate
    # against joined rows instead of a clean columnar batch). This is the
    # same contract write_band_index and the streaming curation sink use:
    # the deduped text set is materialized once, linear in the corpus.
    # _spread: AQE coalesces the small-bytes materialized frame to ~1
    # partition, and the interpreted minhash projection downstream is
    # per-row CPU — without it the signature pass runs on one core
    from rrdtool_1_x_spark.datapipe.dedup import _spread

    reps = _spread(base.join(keepers, "doc_id").transform(materialize))
    # stage 2 already collapsed exact duplicates and reps is materialized,
    # so the generic entrypoint's internal collapse window (another
    # corpus shuffle) is skipped
    pairs = minhash_near_duplicates(
        reps, **{"collapse_exact": False, **(nd_kwargs or {})}
    )
    groups = duplicate_groups(pairs)
    # no checkpoint here: duplicate_groups already returns a projection
    # over ITS final materialized label frame, so the two consumers
    # (surv_ids and the disposition join) re-run only a cheap filter —
    # an extra eager barrier was one more job for no saved work
    near_dup = groups.filter(F.col("doc_id") != F.col("group_id")).select(
        "doc_id"
    )
    surv_ids = keepers.join(near_dup, "doc_id", "left_anti")

    # 4. decontamination of the remaining set (single consumer — the
    # disposition join below computes it exactly once; no barrier needed)
    if benchmark is not None:
        contam = (
            contamination_pairs(
                base.join(surv_ids, "doc_id"), benchmark,
                n=contam_n, min_overlap_frac=contam_threshold,
            )
            .filter(F.col("doc_id") != F.col("bench_id"))
            .select("doc_id")
            .distinct()
        )
    else:
        contam = surv_ids.select("doc_id").limit(0)

    # disposition: marked already carries every doc id, its text hash and
    # the quality flag — ONE hash-keyed left join attaches the exact-stage
    # keeper (AQE-skew-splittable; a viral hash is one kmin row) and two
    # id-keyed joins attach the near-dup/contam sets. Precedence is
    # unchanged: bad wins first (a null-text doc has a null h that never
    # matches kmin, but tc < 0 already made it bad); exact_dup ⟺ survivor
    # whose id is not its hash group's keeper (kmin always matches a
    # survivor's h, so _keep is non-null there); near_dup ⊆ keepers and
    # contam ⊆ survivors, both disjoint from the earlier verdicts.
    flag = lambda s, name: s.select("doc_id", F.lit(True).alias(name))
    out = (
        marked.join(kmin, "h", "left")
        .join(flag(near_dup, "_nd"), "doc_id", "left")
        .join(flag(contam, "_ct"), "doc_id", "left")
    )
    verdict = (
        F.when(F.col("bad"), "low_quality")
        .when(F.col("doc_id") != F.col("_keep"), "exact_dup")
        .when(F.col("_nd"), "near_dup")
        .when(F.col("_ct"), "contaminated")
        .otherwise("kept")
    )
    return out.select("doc_id", verdict.alias("verdict"))


def curation_report(dispositions: DataFrame) -> DataFrame:
    """One row per verdict: (verdict, docs, frac of corpus)."""
    total = dispositions.count()
    return (
        dispositions.groupBy("verdict")
        .agg(F.count("*").alias("docs"))
        .withColumn("frac", F.round(F.col("docs") / F.lit(float(total)), 6))
    )
