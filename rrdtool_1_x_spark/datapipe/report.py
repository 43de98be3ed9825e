"""Corpus-level reporting — the "data card" numbers a training-data
release ships with (docs/tokens/chars, composition shares, duplication
rate, length distribution).

Everything is a small aggregate over one slim per-document projection;
the output is long-format ``(metric, value)`` so new metrics never change
the schema. All ratios follow the repo's cross-engine determinism
conventions: exact integer counts, IEEE single divisions, and entropy
terms integer-quantized before the (order-free) sum.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.mat import materialize


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    source_col: str = "source",
    id_col: str = "doc_id",
    persist: bool = True,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """One-pass corpus report: ``(metric, value)`` rows.

    Metrics: ``n_docs``, ``n_tokens``, ``n_chars``, ``n_langs``,
    ``n_sources``, ``mean_doc_tokens``, ``median_doc_tokens``
    (nearest-rank lower median — exact, not interpolated),
    ``exact_dup_rate`` (1 - distinct md5(text) / docs),
    ``source_entropy_nats`` (Shannon entropy of the document-count
    distribution over sources; per-source terms quantized to 1e-6 before
    the sum so the total is order-independent), and one
    ``lang_share:<lang>`` row per language.

    Shape at scale: the per-document projection (two small strings + three
    integers + one hash per doc) is computed once and persisted — it feeds
    five independent aggregates and Spark would otherwise rescan the
    corpus for each (BASELINE.md broadcast-boundary lesson). The median
    comes from a token-count histogram (groupBy on the count value — at
    most max-doc-length distinct rows), NOT a global sort or a large
    limit(): the cumulative window runs over the tiny histogram only.
    """
    toks = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        )
    ).cast("long")
    slim = df.select(
        F.col(id_col),
        F.col(lang_col).alias("_lang"),
        F.col(source_col).alias("_src"),
        toks.alias("_tk"),
        F.length(F.col(text_col)).cast("long").alias("_ch"),
        F.md5(F.col(text_col).cast("binary")).alias("_h"),
    )
    if persist:
        # NOTE: unlike the domain-sized persists elsewhere, this frame is
        # corpus-sized (one slim row per doc). Long-lived sessions that
        # produce many cards should pass `unpersist_handle=[]` — the
        # persisted frame is appended to it so the caller can
        # `.unpersist()` after consuming the report (a Python attribute
        # on the returned frame would be lost on the first chained
        # transformation); persist=False trades 4 extra corpus scans for
        # zero cache footprint.
        slim = slim.persist(StorageLevel.MEMORY_AND_DISK)
        if unpersist_handle is not None:
            unpersist_handle.append(slim)

    tot = slim.agg(
        F.count("*").alias("_n"),
        F.sum("_tk").alias("_t"),
        F.sum("_ch").alias("_c"),
        F.countDistinct("_h").alias("_u"),
        F.countDistinct("_lang").alias("_nl"),
        F.countDistinct("_src").alias("_ns"),
    )

    def _m(name, col):
        return F.struct(F.lit(name).alias("metric"), col.cast("double").alias("value"))

    base = tot.select(
        F.explode(
            F.array(
                _m("n_docs", F.col("_n")),
                _m("n_tokens", F.col("_t")),
                _m("n_chars", F.col("_c")),
                _m("n_langs", F.col("_nl")),
                _m("n_sources", F.col("_ns")),
                _m(
                    "mean_doc_tokens",
                    F.round(F.col("_t") / F.col("_n").cast("double"), 6),
                ),
                _m(
                    "exact_dup_rate",
                    F.round(
                        F.lit(1.0) - F.col("_u") / F.col("_n").cast("double"),
                        6,
                    ),
                ),
            )
        ).alias("_s")
    ).select("_s.metric", "_s.value")

    # nearest-rank lower median from the token-count histogram: the
    # cumulative window orders the (distinct token count)-sized histogram,
    # never the corpus
    hist = slim.groupBy("_tk").agg(F.count("*").alias("_cnt"))
    cum = hist.withColumn(
        "_cum",
        F.sum("_cnt").over(
            Window.orderBy("_tk").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    median = (
        cum.crossJoin(F.broadcast(tot.select("_n")))
        .filter(F.col("_cum") >= F.ceil(F.col("_n") / 2))
        .agg(F.min("_tk").alias("_med"))
        .select(
            F.lit("median_doc_tokens").alias("metric"),
            F.col("_med").cast("double").alias("value"),
        )
    )

    langs = (
        slim.groupBy("_lang")
        .agg(F.count("*").alias("_cnt"))
        .crossJoin(F.broadcast(tot.select("_n")))
        .select(
            F.concat(F.lit("lang_share:"), F.col("_lang")).alias("metric"),
            F.round(F.col("_cnt") / F.col("_n").cast("double"), 6).alias(
                "value"
            ),
        )
    )

    ent = (
        slim.groupBy("_src")
        .agg(F.count("*").alias("_cnt"))
        .crossJoin(F.broadcast(tot.select("_n")))
        .select(
            F.round(
                F.log(F.col("_cnt") / F.col("_n").cast("double"))
                * (F.col("_cnt") / F.col("_n").cast("double"))
                * 1e6
            )
            .cast("long")
            .alias("_q")
        )
        .agg(
            F.round(-F.sum("_q") / 1e6, 6).cast("double").alias("value")
        )
        .select(F.lit("source_entropy_nats").alias("metric"), "value")
    )

    return base.unionByName(median).unionByName(langs).unionByName(ent)


def histogram_quantiles(
    df: DataFrame,
    value: Column,
    qs: list[float] = (0.25, 0.5, 0.75, 0.9),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT nearest-rank quantiles [per group] via a value histogram —
    the scale-safe form for integer-valued measures (token counts,
    lengths, quantized scores): the cumulative window runs over the
    DISTINCT-VALUE histogram (bounded by the value range), never a
    row-per-record sort, and nearest-rank avoids the interpolation-float
    hazards of percentile()/quantile_cont across engines.

    Returns one row per group: ``(*group_cols, n, p<q*100>...)``.
    """
    groups = list(group_cols or [])
    hist = (
        df.select(*groups, value.alias("_v"))
        .groupBy(*groups, "_v")
        .agg(F.count("*").alias("_c"))
    )
    part = Window.partitionBy(*groups)
    wcum = part.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    # group total as a window sum over the SAME partition the cumulative
    # sum already shuffled on: no second aggregate, no join (which would
    # also silently drop NULL group keys under null-unsafe equality)
    cum = hist.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
        "_n", F.sum("_c").over(part)
    )
    aggs = [F.first("_n").alias("n")]
    for q in qs:
        rank = F.ceil(F.lit(float(q)) * F.col("_n"))
        aggs.append(
            F.min(F.when(F.col("_cum") >= rank, F.col("_v"))).alias(
                f"p{int(round(q * 100))}"
            )
        )
    return cum.groupBy(*groups).agg(*aggs)


def source_overlap(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Pairwise n-gram Jaccard between corpus groups (sources, dumps,
    snapshots) — the mixture-design profiling question: how much of
    source A's content is already in source B? Crawl snapshots overlap
    enormously; mixing weights (and dedup order) should know it.

    Per group, the DISTINCT n-token shingle set; for every unordered
    group pair: ``(n_a, n_b, n_common, jaccard)`` with
    ``jaccard = n_common / (n_a + n_b - n_common)`` rounded 1e-6 (counts
    are exact integers, one division — engine-exact). Pairs that share
    nothing still appear (jaccard 0).

    Shape at scale: shingling is map-only inside the scan; ONE
    (group, shingle) distinct shuffle; the pair expansion is a self-join
    keyed on the shingle whose fan-out per shingle is bounded by
    groups^2 — independent of corpus size; group sizes are a
    groups-sized aggregate, broadcast onto the groups^2/2 pair grid.
    """
    from rrdtool_1_x_spark.datapipe.dedup import _shingle_array

    # NULL text contributes nothing on either engine (Spark's concat_ws
    # would turn it into a "" shingle while SQL's array_to_string keeps
    # NULL — filtering aligns both and is the sensible semantics anyway)
    gs = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(group_col).alias("_g"),
            F.explode(_shingle_array(F.col(text_col), n)).alias("_s"),
        )
        .distinct()
    )
    sizes = gs.groupBy("_g").agg(F.count(F.lit(1)).alias("_n"))
    inter = (
        gs.alias("a")
        .join(gs.alias("b"), F.col("a._s") == F.col("b._s"))
        .filter(F.col("a._g") < F.col("b._g"))
        .groupBy(F.col("a._g").alias("_ga"), F.col("b._g").alias("_gb"))
        .agg(F.count(F.lit(1)).alias("_ni"))
    )
    grid = (
        sizes.alias("x")
        .crossJoin(F.broadcast(sizes.alias("y")))
        .filter(F.col("x._g") < F.col("y._g"))
        .select(
            F.col("x._g").alias("_ga"),
            F.col("y._g").alias("_gb"),
            F.col("x._n").alias("n_a"),
            F.col("y._n").alias("n_b"),
        )
    )
    return (
        grid.join(inter, ["_ga", "_gb"], "left")
        .select(
            F.col("_ga").alias("src_a"),
            F.col("_gb").alias("src_b"),
            "n_a",
            "n_b",
            F.coalesce(F.col("_ni"), F.lit(0)).cast("long").alias("n_common"),
            F.round(
                F.coalesce(F.col("_ni"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("_ni"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )


def cluster_keywords(
    docs: DataFrame,
    assignments: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    cell_col: str = "cell",
) -> DataFrame:
    """Per-cluster keyword extraction: the top-``k`` terms of each
    embedding-space cell by cluster-level tf-idf — what a corpus curator
    reads to NAME the clusters a no-model pipeline discovers (domain
    discovery, mixture design, targeted pruning all start from "what IS
    cluster 7"). tf = term occurrences inside the cell's documents;
    idf = ln((C+1)/(cells_containing_term+1)) over the C cells, so terms
    shared by every cluster (stopwords, boilerplate) rank below terms
    that single out this one.

    Integer-quantized score (tf x 1e-6-snapped idf) with ties on the
    term string — deterministic under any partitioning. Returns
    (cell, rank, term, tf, tfidf).

    Shape at scale: one (cell, term) aggregation after a doc-keyed join
    of the token explode against the assignment frame (both map-side
    combinable); the idf side is vocabulary-sized; the final top-k
    window partitions by cell over vocabulary-sized input. No stage
    touches a corpus-wide key.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    e = docs.select(F.col(id_col), F.explode(toks).alias("term")).join(
        assignments.select(F.col(id_col), F.col(cell_col).alias("_cell")),
        id_col,
    )
    # materialized once: tf feeds the cell-width aggregate, the cell
    # count AND the scoring join — each consumer otherwise re-runs the
    # token explode + assignment join (which itself re-runs the
    # embedding-space cell assignment upstream)
    tf = (
        e.groupBy("_cell", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(materialize)
    )
    cw = tf.groupBy("term").agg(F.count(F.lit(1)).alias("_cw"))
    nc = tf.select("_cell").distinct().agg(F.count(F.lit(1)).alias("_nc"))
    scored = (
        tf.join(cw, "term")
        .crossJoin(F.broadcast(nc))
        .select(
            "_cell",
            "term",
            "tf",
            (
                F.col("tf")
                * F.round(
                    F.log(
                        (F.col("_nc") + 1).cast("double") / (F.col("_cw") + 1)
                    )
                    * 1e6
                ).cast("long")
            ).alias("_s"),
        )
    )
    w = Window.partitionBy("_cell").orderBy(
        F.desc("_s"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_cell").alias(cell_col),
            "rank",
            "term",
            "tf",
            F.round(F.col("_s") / 1e6, 6).alias("tfidf"),
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Snapshot delta report — the pipeline-ops answer to "what changed
    between yesterday's corpus and today's": per group, counts of
    documents ADDED (id only in new), REMOVED (id only in old),
    CHANGED (same id, different content hash) and UNCHANGED. The change
    test is md5(text) equality, so a reordered or re-partitioned
    delivery of identical content diffs as unchanged.

    Shape at scale: both sides project to (id, group, content-hash) in
    the scan — text never shuffles — then ONE full-outer join on the id
    and a per-group combinable count. Group attribution: a changed or
    unchanged doc counts under the NEW snapshot's group (re-sourcing a
    doc shows as its new home); removed docs count under the old one."""
    # presence markers are explicit per-side flags, NOT hash nullability:
    # a row whose text is NULL still EXISTS in its snapshot (it must
    # classify as changed/unchanged, never as added/removed)
    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_go"),
        F.md5(F.col(text_col).cast("binary")).alias("_ho"),
        F.lit(1).alias("_po"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(group_col).alias("_gn"),
        F.md5(F.col(text_col).cast("binary")).alias("_hn"),
        F.lit(1).alias("_pn"),
    )
    j = o.join(n, "_id", "full_outer")
    grp = F.coalesce(F.col("_gn"), F.col("_go"))
    status = (
        F.when(F.col("_po").isNull(), F.lit("added"))
        .when(F.col("_pn").isNull(), F.lit("removed"))
        .when(F.col("_ho").eqNullSafe(F.col("_hn")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(grp.alias(group_col), status.alias("_st"))
        .groupBy(group_col)
        .agg(
            F.sum(F.when(F.col("_st") == "added", 1).otherwise(0))
            .cast("long")
            .alias("n_added"),
            F.sum(F.when(F.col("_st") == "removed", 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
            F.sum(F.when(F.col("_st") == "changed", 1).otherwise(0))
            .cast("long")
            .alias("n_changed"),
            F.sum(F.when(F.col("_st") == "unchanged", 1).otherwise(0))
            .cast("long")
            .alias("n_unchanged"),
        )
    )
