"""Lexical retrieval over a document corpus: BM25 ranking and
reciprocal-rank fusion.

These are the query-side complement to the dedup/curation operators: a
training-data pipeline uses BM25 both to mine retrieval training pairs
(DPR/Contriever hard negatives come from a BM25 index) and to audit what
a corpus can answer. RRF (Cormack et al., SIGIR 2009) is the standard
zero-tuning way to combine a lexical ranking with a second ranking.

Numeric convention (shared with textstats.tfidf_top_terms): every
ln()-derived weight is quantized to a 1e-6 integer BEFORE entering
arithmetic, so scores are exact BIGINTs and rankings are
bit-deterministic across engines and partitionings. Double expressions
(the BM25 length norm) are written with the identical literal/op order
as the DuckDB oracle so both engines evaluate the same IEEE-754 tree.

Shape at scale (the part that must survive 100 TB):
- term statistics are ONE exploded (doc, term) aggregation with map-side
  combine — the only corpus-sized shuffle;
- doc length rides the same frame as ``sum(tf) over (partition by doc)``
  (no second join against the corpus);
- the query-term table is vocabulary-top-K-sized and broadcast —
  scoring is a broadcast hash join inside the scan, never a shuffle on
  the hot query terms;
- top-k per query is a window over the (query x matched-doc) frame,
  which is query-bounded, not corpus-bounded, after the semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.mat import materialize

from .textstats import _tokens

# BM25 constants (Robertson-Walker Okapi defaults). Written as the
# exact literals the oracle SQL uses: k1+1 = 2.2, 1-b = 0.25.
_K1 = 1.2
_K1P1 = 2.2
_B = 0.75
_ONE_MINUS_B = 0.25


def _term_stats(df: DataFrame, id_col: str, text_col: str):
    """(tf frame with per-doc length, df-count frame, N scalar frame).

    tf: (id, term, tf, dl) — dl computed as sum(tf) over the doc
    partition so no second pass over the corpus is needed.
    """
    toks = F.filter(_tokens(F.col(text_col)), lambda t: t != "")
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # materialized once: tf feeds the df-count aggregate, the avgdl
    # aggregate and the scoring join in every caller, and each consumer
    # otherwise re-runs the corpus explode + aggregation + dl window
    # (the frame is the size of its own aggregation shuffle)
    tf = tf.withColumn(
        "dl", F.sum("tf").over(Window.partitionBy(id_col))
    ).transform(materialize)
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfc"))
    nd = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return tf, dfc, nd


def derive_queries(
    dfc: DataFrame,
    n_queries: int = 6,
    terms_per_query: int = 2,
    skip_top: int = 20,
) -> DataFrame:
    """Deterministic query set mined from the corpus itself: rank terms
    by document frequency (desc, term asc), skip the ``skip_top``
    ubiquitous head terms (their idf carries no signal), then assign the
    next ``n_queries * terms_per_query`` terms round-robin to queries.

    Returns (query_id, term, dfc). The candidate pull is an
    ``orderBy().limit()`` — Spark executes that as a partial top-k per
    partition + tiny final merge, never a global sort of the vocabulary.
    """
    take = skip_top + n_queries * terms_per_query
    cand = dfc.orderBy(F.col("dfc").desc(), F.col("term").asc()).limit(take)
    w = Window.orderBy(F.col("dfc").desc(), F.col("term").asc())
    return (
        cand.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") > skip_top)
        .select(
            ((F.col("_r") - skip_top - 1) % n_queries).alias("query_id"),
            "term",
            "dfc",
        )
    )


def _bm25_scored(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_queries: int,
    terms_per_query: int,
):
    """(query_id, id, s) exact-integer BM25 scores for every
    (derived query, matching doc) pair, plus the tf frame for reuse."""
    tf, dfc, nd = _term_stats(df, id_col, text_col)
    q = derive_queries(dfc, n_queries, terms_per_query)
    avg = tf.select(id_col, "dl").distinct().agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    # idf quantized to 1e-6 BIGINT; the length norm likewise. The norm's
    # double tree `0.25 + 0.75 * dl / avgdl` is literal-identical to the
    # oracle so both engines fold the same IEEE sequence.
    scored = (
        tf.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(avg))
        .select(
            "query_id",
            F.col(id_col),
            (
                F.round(
                    F.log(
                        (F.col("n_docs") - F.col("dfc") + 0.5)
                        / (F.col("dfc") + 0.5)
                        + 1.0
                    )
                    * 1e6
                ).cast("long")
                * F.round(
                    F.lit(1e6)
                    * (F.col("tf") * _K1P1)
                    / (
                        F.col("tf")
                        + _K1
                        * (
                            F.lit(_ONE_MINUS_B)
                            + F.lit(_B) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ).cast("long")
            ).alias("_w"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("_w").alias("s"))
    )
    return scored, q


def bm25_topk(
    df: DataFrame,
    k: int = 10,
    n_queries: int = 6,
    terms_per_query: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-``k`` documents per derived query
    (Robertson & Zaragoza 2009 eq. 3.15; k1=1.2, b=0.75, the
    ``ln((N-df+0.5)/(df+0.5)+1)`` non-negative idf variant Lucene uses).

    Returns (query_id, rank, doc_id, bm25) where bm25 is the exact
    integer score rescaled to its float value (idf and length-norm are
    each 1e-6-quantized, so the product carries scale 1e-12).
    """
    scored, _ = _bm25_scored(df, id_col, text_col, n_queries, terms_per_query)
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            id_col,
            F.round(F.col("s") / F.lit(1e12), 6).alias("bm25"),
        )
    )


def rrf_fuse(
    df: DataFrame,
    k: int = 10,
    depth: int = 20,
    rrf_k: int = 60,
    n_queries: int = 6,
    terms_per_query: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
    of two retrievers over the same derived queries: BM25 and smoothed
    TF-IDF (the textstats convention, ln((N+1)/(df+1))). Each retriever
    contributes its top-``depth`` list; fused score is
    ``sum(round(1e6 / (60 + rank)))`` over the lists containing the doc
    — integer-exact, standard RRF with K=60.

    Returns (query_id, rank, doc_id, rrf). Scale shape: both rankings
    come off the SAME (doc, term) aggregate (one corpus shuffle total);
    the fusion join is over two query-bounded top-``depth`` frames.
    """
    tf, dfc, nd = _term_stats(df, id_col, text_col)
    q = derive_queries(dfc, n_queries, terms_per_query)
    avg = tf.select(id_col, "dl").distinct().agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl")
    )
    base = (
        tf.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(nd))
        .crossJoin(F.broadcast(avg))
    )
    bm = (
        base.select(
            "query_id",
            F.col(id_col),
            (
                F.round(
                    F.log(
                        (F.col("n_docs") - F.col("dfc") + 0.5)
                        / (F.col("dfc") + 0.5)
                        + 1.0
                    )
                    * 1e6
                ).cast("long")
                * F.round(
                    F.lit(1e6)
                    * (F.col("tf") * _K1P1)
                    / (
                        F.col("tf")
                        + _K1
                        * (
                            F.lit(_ONE_MINUS_B)
                            + F.lit(_B) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ).cast("long")
            ).alias("_w"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("_w").alias("s"))
    )
    ti = (
        base.select(
            "query_id",
            F.col(id_col),
            (
                F.col("tf")
                * F.round(
                    F.log(
                        (F.col("n_docs") + 1).cast("double")
                        / (F.col("dfc") + 1)
                    )
                    * 1e6
                ).cast("long")
            ).alias("_w"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("_w").alias("s"))
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col(id_col).asc()
    )
    r1 = (
        bm.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= depth)
        .select("query_id", id_col, "r1")
    )
    r2 = (
        ti.withColumn("r2", F.row_number().over(w1))
        .filter(F.col("r2") <= depth)
        .select("query_id", id_col, "r2")
    )
    fused = (
        r1.join(r2, ["query_id", id_col], "full_outer")
        .select(
            "query_id",
            id_col,
            (
                F.coalesce(
                    F.round(F.lit(1e6) / (F.lit(rrf_k) + F.col("r1"))).cast(
                        "long"
                    ),
                    F.lit(0).cast("long"),
                )
                + F.coalesce(
                    F.round(F.lit(1e6) / (F.lit(rrf_k) + F.col("r2"))).cast(
                        "long"
                    ),
                    F.lit(0).cast("long"),
                )
            ).alias("s"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            id_col,
            F.round(F.col("s") / F.lit(1e6), 6).alias("rrf"),
        )
    )


# ------------------------------------------------------------------
# Persisted + incremental BM25 index — the fourth persisted index next
# to the MinHash band, SimHash block, and line-dedup registries. The
# Lucene-shaped layout: postings carry the per-doc length norm inline
# (Lucene's "norms"), corpus statistics are a 1-row frame, the term
# dictionary is vocabulary-sized.
# ------------------------------------------------------------------

_POSTINGS_BUCKETS = 64


def _postings(df: DataFrame, id_col: str, text_col: str):
    """(term, id, tf, dl) for one corpus/batch — dl denormalized onto
    every posting row so query-time scoring never joins the corpus."""
    tf, dfc, _ = _term_stats(df, id_col, text_col)
    return tf, dfc


def write_bm25_index(
    df: DataFrame, path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Persist BM25 state for append-only maintenance.

    Layout: ``{path}/postings`` (term, id, tf, dl) partitioned by a
    64-way term-hash bucket so a query prunes its scan to the buckets
    holding its terms; ``{path}/terms`` (term, dfc) — the vocabulary-
    sized dictionary; ``{path}/stats`` one row
    (n_docs, n_docs_tok, sum_dl) — exact integers, so avgdl recomputed
    at query time is bit-identical to the batch computation.

    ``append_bm25_index`` then tokenizes ONLY new batches: an append to
    a 100 TB-indexed corpus costs the batch explode, a vocabulary-sized
    dictionary merge, and a parquet append — never a corpus rescan.
    """
    tf, dfc = _postings(df, id_col, text_col)
    (
        tf.withColumn(
            "p_bucket", F.pmod(F.xxhash64("term"), F.lit(_POSTINGS_BUCKETS))
        )
        .write.mode("overwrite")
        .partitionBy("p_bucket")
        .parquet(f"{path}/postings")
    )
    dfc.write.mode("overwrite").parquet(f"{path}/terms")
    dl = tf.select(id_col, "dl").distinct()
    stats = df.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        dl.agg(
            F.count(F.lit(1)).alias("n_docs_tok"),
            F.sum("dl").alias("sum_dl"),
        )
    )
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def append_bm25_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Append a batch of NEW documents (append-only ids) to a
    ``write_bm25_index`` index. Postings append as new parquet files in
    their term buckets; the term dictionary and the 3-integer stats row
    merge additively, so index-then-append equals one-shot indexing
    exactly (df counts and length sums are associative)."""
    spark = new_docs.sparkSession
    tf, dfc = _postings(new_docs, id_col, text_col)
    (
        tf.withColumn(
            "p_bucket", F.pmod(F.xxhash64("term"), F.lit(_POSTINGS_BUCKETS))
        )
        .write.mode("append")
        .partitionBy("p_bucket")
        .parquet(f"{path}/postings")
    )
    merged = (
        spark.read.parquet(f"{path}/terms")
        .unionByName(dfc)
        .groupBy("term")
        .agg(F.sum("dfc").alias("dfc"))
        .localCheckpoint(eager=True)  # pinned before overwriting its input
    )
    merged.write.mode("overwrite").parquet(f"{path}/terms")
    old = spark.read.parquet(f"{path}/stats").first()
    dl = tf.select(id_col, "dl").distinct()
    batch = (
        new_docs.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(
            dl.agg(
                F.count(F.lit(1)).alias("n_docs_tok"),
                F.sum("dl").alias("sum_dl"),
            )
        )
        .first()
    )
    spark.createDataFrame(
        [
            (
                old.n_docs + batch.n_docs,
                old.n_docs_tok + (batch.n_docs_tok or 0),
                old.sum_dl + (batch.sum_dl or 0),
            )
        ],
        "n_docs long, n_docs_tok long, sum_dl long",
    ).write.mode("overwrite").parquet(f"{path}/stats")


def query_bm25_index(
    spark,
    path: str,
    k: int = 10,
    n_queries: int = 6,
    terms_per_query: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-``k`` per derived query straight off a persisted index —
    no corpus access. Identical integer scoring to :func:`bm25_topk`
    (avgdl is recomputed from the exact integer stats, so the double is
    bit-identical), hence the same oracle.

    Scale shape: the query terms (a handful) resolve to their hash
    buckets driver-side, and the postings scan prunes to those
    partitions (``p_bucket IN (...)`` is partition pruning, not a
    filter over 100 TB); the per-bucket scan then broadcast-joins the
    query-term table.
    """
    terms = spark.read.parquet(f"{path}/terms")
    q = derive_queries(terms, n_queries, terms_per_query)
    # query-sized collect: the term list IS the query, a handful of rows
    q_rows = q.collect()
    buckets = sorted(
        {
            r["_b"]
            for r in spark.createDataFrame(
                [(t.term,) for t in q_rows], "term string"
            )
            .select(
                F.pmod(F.xxhash64("term"), F.lit(_POSTINGS_BUCKETS)).alias(
                    "_b"
                )
            )
            .collect()
        }
    )
    qdf = F.broadcast(
        spark.createDataFrame(
            [(r.query_id, r.term, r.dfc) for r in q_rows],
            "query_id int, term string, dfc long",
        )
    )
    st = spark.read.parquet(f"{path}/stats").first()
    avgdl_df = spark.createDataFrame(
        [(st.n_docs, float(st.sum_dl) / st.n_docs_tok)],
        "n_docs long, avgdl double",
    )
    postings = spark.read.parquet(f"{path}/postings").filter(
        F.col("p_bucket").isin(buckets)
    )
    scored = (
        postings.join(qdf, "term")
        .crossJoin(F.broadcast(avgdl_df))
        .select(
            "query_id",
            F.col(id_col),
            (
                F.round(
                    F.log(
                        (F.col("n_docs") - F.col("dfc") + 0.5)
                        / (F.col("dfc") + 0.5)
                        + 1.0
                    )
                    * 1e6
                ).cast("long")
                * F.round(
                    F.lit(1e6)
                    * (F.col("tf") * _K1P1)
                    / (
                        F.col("tf")
                        + _K1
                        * (
                            F.lit(_ONE_MINUS_B)
                            + F.lit(_B) * F.col("dl") / F.col("avgdl")
                        )
                    )
                ).cast("long")
            ).alias("_w"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("_w").alias("s"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            id_col,
            F.round(F.col("s") / F.lit(1e12), 6).alias("bm25"),
        )
    )


def phrase_search(
    df: DataFrame,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search over a POSITIONAL postings list — the IR
    surface BM25's bag-of-words postings cannot answer (Lucene keeps
    positions in its postings for exactly this): token n-grams must
    match contiguously, so "slow hash batch" only hits documents where
    the three terms are adjacent in order. Returns one row per
    (phrase, matching doc): ``(phrase, id, n_hits, first_pos)``
    (first_pos is the 1-based token position of the first occurrence).

    Each phrase resolves as a chain of self-joins over the postings:
    term_i's postings joined on (doc, pos = pos0 + i). Every join side
    is first FILTERED to one term — term-posting-sized, not
    corpus-sized — and the join keys are (doc, pos), so fan-out is
    bounded by per-doc term frequency; AQE picks broadcast sides when a
    term is rare. The postings build itself is the usual corpus-linear
    explode."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    post = (
        df.select(F.col(id_col), F.posexplode(toks).alias("_p", "term"))
        .select(id_col, (F.col("_p") + 1).alias("pos"), "term")
    )
    out = None
    for phrase in phrases:
        terms = phrase.split()
        cur = post.filter(F.col("term") == terms[0]).select(
            F.col(id_col), F.col("pos").alias("p0")
        )
        for i, t in enumerate(terms[1:], start=1):
            nxt = post.filter(F.col("term") == t).select(
                F.col(id_col), F.col("pos").alias(f"p{i}")
            )
            cur = cur.join(
                nxt,
                (cur[id_col] == nxt[id_col])
                & (nxt[f"p{i}"] == cur["p0"] + i),
            ).select(cur[id_col], "p0")
        hits = (
            cur.groupBy(id_col)
            .agg(
                F.count(F.lit(1)).alias("n_hits"),
                F.min("p0").alias("first_pos"),
            )
            .select(F.lit(phrase).alias("phrase"), id_col, "n_hits", "first_pos")
        )
        out = hits if out is None else out.unionByName(hits)
    return out
