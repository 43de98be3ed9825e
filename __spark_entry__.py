"""Driver contract for the PySpark rrdtool-1.x engine.

``queries()`` exposes one entry per implemented operator family from
SURVEY.md §2, each running the real engine operators
(rrdtool_1_x_spark.*) over the driver's parquet tables; ``oracle_sql()``
holds the equivalent ANSI SQL for DuckDB.

Conventions shared by both sides so value-hashes match:
* the `events` table is pre-aggregated to one row per (event_type, ts)
  (strictly increasing timestamps per series, the reference's update rule);
* timestamps are epoch-second doubles (microsecond fraction preserved);
* every float output is round(x, 6); column names are lowercase.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators.cdp import consolidate
from rrdtool_1_x_spark.operators.dst import with_rates
from rrdtool_1_x_spark.operators.fetch import reduce_data
from rrdtool_1_x_spark.operators.pdp import pdp_table
from rrdtool_1_x_spark.operators.vdef import vdef
from rrdtool_1_x_spark.rpn import RpnContext, compile_rpn

STEP = 3600.0  # PDP step over events (1h grid)
HB = 7200.0  # heartbeat
CDP_N = 4  # PDPs per CDP (4h rollup)
XFF = 0.5
KEYS = ("series_id",)


# ---------------------------------------------------------------- engine side


_SAMPLES_CACHE: dict[tuple[str, str], DataFrame] = {}


def _samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # normalize `ts` to epoch-second doubles regardless of the physical
    # parquet type: the driver has shipped both TIMESTAMP(NANOS) (which Spark
    # reads as long under legacy.parquet.nanosAsLong) and timestamp[us]
    # (read as TIMESTAMP_NTZ). DuckDB's epoch(ts) treats naive timestamps as
    # UTC, so NTZ is converted under an explicit UTC session timezone.
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SAMPLES_CACHE:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        ts_type = dict(ev.dtypes)["ts"]
        if ts_type.startswith("timestamp"):
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            t = (
                F.unix_micros(F.col("ts").cast("timestamp_ltz")).cast("double")
                / F.lit(1e6)
            ).alias("ts")
        else:  # legacy nanos-as-long: truncate to micros (nanos overflow double)
            t = (F.expr("ts DIV 1000").cast("double") / F.lit(1e6)).alias("ts")
        _SAMPLES_CACHE[key] = (
            ev.select("event_type", t, "value")
            .groupBy("event_type", "ts")
            .agg(F.avg("value").alias("value"))
            .select(F.col("event_type").alias("series_id"), "ts", "value")
            .cache()
        )
    return _SAMPLES_CACHE[key]


_TBL_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def _hold_app_persist(spark, sf_dir: str, tag: str, handle: list) -> None:
    """Register a corpus-sized persist handle under an app-scoped key:
    at most ONE cached frame per (application, sf_dir, tag) survives —
    any prior handle for the same key is unpersisted first, so repeat
    invocations (bench loops, memo bypasses) can never stack cached
    corpora. Shared by every entry whose operator persists a
    corpus-derived frame (datacard's slim projection, nb_classify's
    (doc, bucket) counts)."""
    if not handle:
        return
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    old = _TBL_CACHE.get(key)
    if old is not None and old is not handle[0]:
        old.unpersist()
    _TBL_CACHE[key] = handle[0]


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as exact integer MICROSECONDS (`tus`) — the asof /
    range join gates need exact timestamp comparisons; float epoch
    seconds would tie matches to rounding. Same physical-type dance as
    _samples (TIMESTAMP_NTZ under UTC vs legacy nanos-as-long)."""
    key = (spark.sparkContext.applicationId, sf_dir, "events_us")
    if key not in _TBL_CACHE:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(ev.dtypes)["ts"].startswith("timestamp"):
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            t = F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("tus")
        else:
            t = F.expr("ts DIV 1000").cast("long").alias("tus")
        _TBL_CACHE[key] = ev.select(
            "event_id", t, "user_id", "event_type", "value"
        ).cache()
    return _TBL_CACHE[key]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table via the balanced reader: the driver writes each table
    as ONE single-row-group parquet file, which a scan cannot split — every
    map-heavy text operator would run on one core. The balanced read
    repartitions tiny inputs to the session parallelism and is a no-op on
    multi-row-group (cluster-scale) inputs. Safe here: all document-side
    pipelines are per-row maps or integer/min aggregates, so partition
    order never reaches the hash gate."""
    from rrdtool_1_x_spark.io import read_parquet_balanced

    key = (spark.sparkContext.applicationId, sf_dir, "documents")
    if key not in _TBL_CACHE:
        _TBL_CACHE[key] = read_parquet_balanced(
            spark, f"{sf_dir}/documents.parquet"
        )
    return _TBL_CACHE[key]


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings table via the balanced reader (see _docs)."""
    from rrdtool_1_x_spark.io import read_parquet_balanced

    key = (spark.sparkContext.applicationId, sf_dir, "embeddings")
    if key not in _TBL_CACHE:
        _TBL_CACHE[key] = read_parquet_balanced(
            spark, f"{sf_dir}/embeddings.parquet"
        )
    return _TBL_CACHE[key]


_PDP_CACHE: dict[tuple[str, str], DataFrame] = {}


def _pdp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDP table over events — cached per (session, sf_dir): every
    rrdtool-family query derives from it, so materializing it once is the
    engine-level analogue of the reference's fetch-dedup cache
    (src/rrd_graph.c:973-987)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PDP_CACHE:
        p = pdp_table(_samples(spark, sf_dir), int(STEP), "GAUGE", HB, keys=KEYS)
        _PDP_CACHE[key] = p.select(
            "series_id", "ts", F.round("value", 6).alias("value")
        ).cache()
    return _PDP_CACHE[key]


def _cdp(spark: SparkSession, sf_dir: str, cf: str) -> DataFrame:
    # exact=True → fixed-point summation, bitwise identical across engines
    c = consolidate(
        _pdp(spark, sf_dir), int(STEP), CDP_N, cf, XFF, keys=KEYS, exact=True
    )
    return c.select("series_id", "ts", F.round("value", 6).alias("value"))


def _pad_grid(pdp: DataFrame) -> DataFrame:
    b = pdp.groupBy("series_id").agg(
        (F.min("ts") / STEP).cast("long").alias("lo"),
        (F.max("ts") / STEP).cast("long").alias("hi"),
    )
    grid = b.select(
        "series_id", F.explode(F.sequence("lo", "hi")).alias("e")
    ).select("series_id", (F.col("e") * STEP).alias("ts"))
    return grid.join(pdp, ["series_id", "ts"], "left")


def q_pdp_gauge(spark, sf_dir):
    """PDP normalization (SURVEY §2.2): GAUGE rates onto the 1h step grid."""
    return _pdp(spark, sf_dir).orderBy("series_id", "ts")


def q_counter_rate(spark, sf_dir):
    """DST COUNTER rate conversion (SURVEY §2.2) over a cumulative counter."""
    s = _samples(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("ts")
    counter = s.withColumn("value", F.sum("value").over(w))
    r = with_rates(counter, "COUNTER", HB, keys=KEYS)
    return (
        r.filter(F.col("rate").isNotNull())
        .select("series_id", "ts", F.round("rate", 6).alias("rate"))
        .orderBy("series_id", "ts")
    )


def _q_cdp(cf):
    def q(spark, sf_dir):
        return _cdp(spark, sf_dir, cf).orderBy("series_id", "ts")

    q.__doc__ = f"CDP consolidation {cf} with xff (SURVEY §2.2)"
    return q


def q_reduce_avg(spark, sf_dir):
    """rrd_reduce_data re-consolidation to 2x step (SURVEY §2.7).

    Same windowing as operators.fetch.reduce_data; the mean uses fixed-point
    summation so the value is bitwise reproducible (see cdp.consolidate
    exact mode)."""
    p = _pdp(spark, sf_dir)
    new_step = STEP * 2
    win = (F.ceil(F.col("ts") / F.lit(new_step)) * F.lit(new_step)).alias("ts")
    s = F.sum(F.round(F.col("value") * F.lit(1e6)).cast("long"))
    n = F.count("value")
    v = F.floor((s * 2 + n).cast("double") / (n * 2).cast("double")).cast("double") / F.lit(1e6)
    out = p.groupBy("series_id", win).agg(v.alias("value"))
    return out.select("series_id", "ts", "value").orderBy("series_id", "ts")


def q_vdef_max(spark, sf_dir):
    """VDEF MAXIMUM with extremum timestamp (SURVEY §2.6)."""
    v = vdef(_pdp(spark, sf_dir), "MAXIMUM", keys=KEYS)
    return v.select(
        "series_id", F.round("value", 6).alias("value"), F.col("when").alias("when_ts")
    ).orderBy("series_id")


def q_vdef_stats(spark, sf_dir):
    """VDEF AVERAGE / STDEV(population) / TOTAL (SURVEY §2.6).

    Exact-arithmetic formulation: sums run over fixed-point integers in
    decimal(38,0) (≙ DuckDB HUGEINT) so the statistics are bitwise
    reproducible across engines and partitionings."""
    p = _pdp(spark, sf_dir)
    x = F.round(F.col("value") * F.lit(1e6)).cast("decimal(38,0)")
    agg = p.groupBy("series_id").agg(
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.count("value").alias("n"),
    )
    n = F.col("n").cast("double")
    s1d = F.col("s1").cast("double")
    avg_v = (
        F.floor((F.col("s1") * 2 + F.col("n")).cast("double") / (n * 2)).cast("double")
        / F.lit(1e6)
    )
    var_scaled = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double") / (n * n)
    stdev_v = F.sqrt(var_scaled) / F.lit(1e6)
    total_v = s1d / F.lit(1e6) * F.lit(STEP)
    return agg.select(
        "series_id",
        avg_v.alias("avg_v"),
        F.round(stdev_v, 6).alias("stdev_v"),
        F.round(total_v, 4).alias("total_v"),
    ).orderBy("series_id")


def q_vdef_percentile(spark, sf_dir):
    """VDEF PERCENTNAN 95 — nearest-rank (SURVEY §2.6)."""
    v = vdef(_pdp(spark, sf_dir), "PERCENTNAN", param=95.0, keys=KEYS)
    return v.select("series_id", F.round("value", 6).alias("value")).orderBy("series_id")


def q_vdef_lslslope(spark, sf_dir):
    """VDEF least-squares slope over step index (SURVEY §2.6), exact-integer
    sums for cross-engine bit-stability."""
    p = _pdp(spark, sf_dir)
    w = Window.partitionBy("series_id").orderBy("ts")
    xi = (F.row_number().over(w) - 1).cast("long")
    xv = F.round(F.col("value") * F.lit(1e6)).cast("long")
    d = p.select("series_id", xi.alias("xi"), xv.alias("xv"))
    agg = d.groupBy("series_id").agg(
        F.count("*").alias("cnt"),
        F.sum("xi").alias("sx"),
        F.sum(F.col("xi") * F.col("xi")).alias("sxx"),
        F.sum(F.col("xi") * F.col("xv")).alias("sxy"),
        F.sum("xv").alias("sy"),
    )
    num = (F.col("sx") * F.col("sy") - F.col("cnt") * F.col("sxy")).cast("double")
    den = (F.col("sx") * F.col("sx") - F.col("cnt") * F.col("sxx")).cast("double")
    return agg.select(
        "series_id", F.round(num / den / F.lit(1e6), 6).alias("value")
    ).orderBy("series_id")


def q_rpn_chain(spark, sf_dir):
    """CDEF RPN chain UN/IF + MIN + POW over the padded grid (SURVEY §2.5)."""
    g = _pad_grid(_pdp(spark, sf_dir))
    ctx = RpnContext(ts=F.col("ts"), step=STEP, keys=KEYS)
    expr = compile_rpn("v,UN,0,v,IF,100,MIN,2,POW", {"v": F.col("value")}, ctx)
    return g.select("series_id", "ts", F.round(expr, 6).alias("value")).orderBy(
        "series_id", "ts"
    )


def q_trend(spark, sf_dir):
    """TRENDNAN 3h sliding mean over the padded grid (SURVEY §2.5).

    Same window semantics as the RPN TRENDNAN op (rows-between, unknown
    skipped, unknown until the window fills), with fixed-point summation
    for cross-engine bit-stability."""
    g = _pad_grid(_pdp(spark, sf_dir))
    w = Window.partitionBy("series_id").orderBy("ts")
    wr = w.rowsBetween(-2, 0)
    s = F.sum(F.round(F.col("value") * F.lit(1e6)).cast("long")).over(wr)
    n = F.count("value").over(wr)
    tv = F.floor((s * 2 + n).cast("double") / (n * 2).cast("double")).cast("double") / F.lit(1e6)
    out = g.select(
        "series_id",
        "ts",
        F.when(F.row_number().over(w) >= 3, tv).alias("value"),
    )
    return out.filter(F.col("value").isNotNull()).orderBy("series_id", "ts")


def q_shift_week(spark, sf_dir):
    """SHIFT: as-of self-join one week back (SURVEY §2.4)."""
    c = _cdp(spark, sf_dir, "AVERAGE")
    prev = c.select(
        "series_id", (F.col("ts") + F.lit(604800.0)).alias("ts"), F.col("value").alias("value_prev_week")
    )
    out = c.join(prev, ["series_id", "ts"])
    return out.select("series_id", "ts", "value", "value_prev_week").orderBy("series_id", "ts")


def q_xport_pivot(spark, sf_dir):
    """xport multi-column alignment: one column per series (SURVEY §2.1/2.4)."""
    c = _cdp(spark, sf_dir, "AVERAGE")
    out = (
        c.groupBy("ts")
        .pivot("series_id", ["click", "error", "purchase", "signup", "view"])
        .agg(F.first("value"))
    )
    return out.select(
        "ts",
        *[F.col(t).alias(t) for t in ["click", "error", "purchase", "signup", "view"]],
    ).orderBy("ts")


def q_first_last(spark, sf_dir):
    """rrd_first / rrd_last / row count per series (SURVEY §2.1)."""
    p = _pdp(spark, sf_dir)
    return (
        p.groupBy("series_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("series_id")
    )


def q_align_outer(spark, sf_dir):
    """Multi-DEF time alignment: two series full-outer joined on the grid
    (SURVEY §2.4)."""
    p = _pdp(spark, sf_dir)
    a = p.filter(F.col("series_id") == "click").select("ts", F.col("value").alias("click_v"))
    b = p.filter(F.col("series_id") == "view").select("ts", F.col("value").alias("view_v"))
    return a.join(b, "ts", "outer").select("ts", "click_v", "view_v").orderBy("ts")


# --- data-pipeline operators (beyond the reference; first-class per the brief)


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on text, keep lowest doc_id."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.md5(F.col("text").cast("binary")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("copies"))
        .orderBy("text_hash")
    )


def q_text_stats(spark, sf_dir):
    """Text quality metrics: token count, alpha/digit ratios."""
    d = _docs(spark, sf_dir)
    # count, don't materialize: regexp_count(\s+)+1 == size(split(\s+))
    # (split size = separator matches + 1, including the empty-string edge),
    # and length - count(non-class) == length(regexp_replace(non-class, ''))
    # — same integers as the DuckDB oracle, no token array / rebuilt string
    toks = F.regexp_count(F.trim(F.col("text")), F.lit(r"\s+")) + F.lit(1)
    alpha = (
        F.length("text") - F.regexp_count(F.col("text"), F.lit("[^A-Za-z]"))
    ) / F.col("n_chars")
    digit = (
        F.length("text") - F.regexp_count(F.col("text"), F.lit("[^0-9]"))
    ) / F.col("n_chars")
    return d.select(
        "doc_id",
        toks.alias("token_cnt"),
        F.round(alpha, 6).alias("alpha_ratio"),
        F.round(digit, 6).alias("digit_ratio"),
    ).orderBy("doc_id")


_STOPWORDS = ("the", "and", "of", "to", "in", "a", "is", "that", "it", "for")


def q_stopword_density(spark, sf_dir):
    """English stopword density — language-ID heuristic feature."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.lower("text"), r"\s+")
    hits = F.size(F.filter(toks, lambda x: x.isin(*_STOPWORDS)))
    return d.select(
        "doc_id",
        "lang",
        F.round(hits / F.size(toks), 6).alias("stopword_density"),
    ).orderBy("doc_id")


_MINHASH_SEEDS = ("s0:", "s1:", "s2:", "s3:")


def q_minhash_sig(spark, sf_dir):
    """MinHash signatures over 3-token shingles (md5-based, 4 hashes).

    Entirely map-side: shingles are a per-document array transform and each
    seed's minimum folds over that array (array_min) — no shuffle at all.
    With the balanced reader splitting the tiny input across cores, the
    sf0.1 sweep runs this in ~0.7 s (vs 16 s when the whole corpus mapped
    on one core and each shingle re-split the text — see _shingle_array)."""
    from rrdtool_1_x_spark.datapipe.dedup import _shingle_array

    d = _docs(spark, sf_dir)
    # docs with >=3 tokens: full 3-token shingles; shorter docs keep the
    # single partial shingle built from what's there (zip-based build —
    # the split is evaluated O(1) times per doc, not once per shingle)
    grams = _shingle_array(F.col("text"), 3)
    # project the shingle array FIRST: sibling expressions re-evaluate per
    # output column otherwise
    g = d.select("doc_id", grams.alias("_sh"))
    # NOTE: the hash lambda MUST take exactly one parameter. A defaulted
    # second param (`lambda s, seed=seed: ...`) makes PySpark pass the
    # (element, index) form, silently replacing the seed with the shingle's
    # array position and collapsing the hash family to one function.
    def _seed_hash(seed):
        return lambda s: F.md5(F.concat(F.lit(seed), s).cast("binary"))

    sigs = [
        F.array_min(F.transform(F.col("_sh"), _seed_hash(seed))).alias(f"sig{i}")
        for i, seed in enumerate(_MINHASH_SEEDS)
    ]
    return g.select("doc_id", *sigs).orderBy("doc_id")


def q_quality(spark, sf_dir):
    """Text quality scoring (datapipe.textstats.quality_metrics)."""
    from rrdtool_1_x_spark.datapipe.textstats import quality_metrics

    d = _docs(spark, sf_dir)
    out = quality_metrics(d)
    return out.select(
        "doc_id",
        F.round("alpha_ratio", 6).alias("alpha_ratio"),
        F.round("digit_ratio", 6).alias("digit_ratio"),
        F.round("upper_ratio", 6).alias("upper_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    ).orderBy("doc_id")


def q_lang_guess(spark, sf_dir):
    """Stopword-density language ID (datapipe.textstats.language_scores)."""
    from rrdtool_1_x_spark.datapipe.textstats import language_scores

    d = _docs(spark, sf_dir)
    out = language_scores(d)
    return out.select(
        "doc_id",
        "lang",
        F.round("score_en", 6).alias("score_en"),
        F.round("score_de", 6).alias("score_de"),
        F.round("score_fr", 6).alias("score_fr"),
        F.round("score_es", 6).alias("score_es"),
        "lang_guess",
    ).orderBy("doc_id")


def q_hw_predict(spark, sf_dir):
    """Holt-Winters prediction over the events PDP grid (operators.hw).
    Sequential recurrence — the oracle replays it as a DuckDB recursive CTE
    carrying (a, b, k, seasonal[], deviation[], violation-ring[]) state."""
    from rrdtool_1_x_spark.operators.hw import hw_predict

    p = _pdp(spark, sf_dir)
    out = hw_predict(
        p, alpha=0.1, beta=0.0035, gamma=0.1, period=24,
        keys=KEYS, step=STEP,
    )
    return (
        out.filter(F.col("prediction").isNotNull())
        .select("series_id", "ts", F.round("prediction", 6).alias("prediction"),
                "failures")
        .orderBy("series_id", "ts")
    )


def q_simhash(spark, sf_dir):
    """SimHash fingerprints (datapipe.dedup.simhash) in the portable md5
    hash mode — bit-reproducible in any engine with md5 + integer bit ops,
    so the DuckDB oracle hash-gates it."""
    from rrdtool_1_x_spark.datapipe.dedup import simhash

    d = _docs(spark, sf_dir)
    return simhash(d, hash_fn="md5").orderBy("doc_id")


def q_media_features(spark, sf_dir):
    """Multimodal plumbing end-to-end (datapipe.multimodal): synthesize a
    media table from documents, Arrow-batched mapInPandas decode+pool, one
    row per (doc, feature index) — the deterministic stub codec makes the
    whole path hash-gateable against SQL byte math."""
    from rrdtool_1_x_spark.datapipe.multimodal import extract_features, synthesize_media

    d = _docs(spark, sf_dir)
    feats = extract_features(synthesize_media(spark, d), feat_dim=64)
    pre = feats.select("doc_id", F.col("feat").alias("_f"))
    return (
        pre.select("doc_id", F.posexplode("_f").alias("feat_idx", "_v"))
        .select(
            "doc_id",
            F.col("feat_idx").cast("long").alias("feat_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("feat_val"),
        )
        .orderBy("doc_id", "feat_idx")
    )


def q_media_decode(spark, sf_dir):
    """REAL codec end-to-end (datapipe.codecs): encode each document's
    first 256 utf-8 bytes as an actual PNG (16x16 gray, zlib'd IDAT) and an
    actual 8-bit PCM WAV, then decode with strict=True — only the stdlib
    PNG/WAV decoders can produce these rows (the fake path raises). The
    oracle recomputes the decoded signal from the raw text bytes: pixel_i =
    byte_i/255 for PNG, sample_i = (byte_i-128)/128 for WAV."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_features,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    img = extract_features(synthesize_media_real(spark, d, "image"), 64, strict=True)
    aud = extract_features(synthesize_media_real(spark, d, "audio"), 64, strict=True)
    pre = img.unionByName(aud).select("doc_id", "kind", F.col("feat").alias("_f"))
    return (
        pre.select("doc_id", "kind", F.posexplode("_f").alias("feat_idx", "_v"))
        .select(
            "doc_id",
            "kind",
            F.col("feat_idx").cast("long").alias("feat_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("feat_val"),
        )
        .orderBy("doc_id", "kind", "feat_idx")
    )


def q_media_probe(spark, sf_dir):
    """Header metadata extraction from REAL encoded bytes
    (datapipe.multimodal.probe_media): per-doc dimensions/rates derived
    from doc_id are encoded into actual PNG IHDR / WAV fmt chunks, and the
    probe must read them back from the binary payloads — the oracle knows
    the mapping, the Spark side only sees bytes."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        probe_media,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    img = synthesize_media_real(spark, d, "image", var_dims=True)
    aud = synthesize_media_real(spark, d, "audio", var_dims=True)
    out = probe_media(img.unionByName(aud))
    return out.select(
        "doc_id",
        "kind",
        "mime",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
    ).orderBy("doc_id", "kind")


def q_media_resize(spark, sf_dir):
    """Image resize through REAL codec cycles (datapipe.multimodal.
    resize_images): encode text bytes as 16x16 PNG, nearest-neighbor
    resize to 8x8 (re-encoded PNG), strict-decode and emit the 64 pixels.
    Nearest-neighbor picks source pixel (2y, 2x), so the oracle reads
    byte 32y+2x of the padded payload."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_features,
        resize_images,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    small = resize_images(synthesize_media_real(spark, d, "image"), 8, 8)
    feats = extract_features(small, feat_dim=64, strict=True)
    return (
        feats.select("doc_id", F.posexplode("feat").alias("pix_idx", "_v"))
        .select(
            "doc_id",
            F.col("pix_idx").cast("long").alias("pix_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("pix_val"),
        )
        .orderBy("doc_id", "pix_idx")
    )


def q_media_frames(spark, sf_dir):
    """Audio frame-sampling through REAL codec cycles (sample_audio_frames):
    8-bit PCM WAV -> keep every 4th frame re-encoded as 16-bit PCM ->
    strict decode. int16 quantization of (b-128)/128 * 32768 is exact
    ((b-128)*256 is an integer), so sample i == (byte[4i]-128)/128."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_features,
        sample_audio_frames,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    strided = sample_audio_frames(synthesize_media_real(spark, d, "audio"), 4)
    feats = extract_features(strided, feat_dim=64, strict=True)
    return (
        feats.select("doc_id", F.posexplode("feat").alias("frame_idx", "_v"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("frame_val"),
        )
        .orderBy("doc_id", "frame_idx")
    )


def q_media_jpeg(spark, sf_dir):
    """REAL baseline-JPEG codec end-to-end (datapipe.jpeg): each doc's
    first 64 text bytes paint an 8x8 grid of flat 8x8 blocks (64x64 px),
    encoded at quality 100 — all-ones quant tables make block-flat content
    reconstruct bit-exactly, including through the 4:2:0 color path when
    R=G=B. resize_images(8,8) picks pixel (8y,8x) = block (y,x) = byte
    8y+x, so the strict-decoded 64 pixels ARE the source bytes — only a
    working Huffman+IDCT+subsampling pipeline can produce these rows."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_features,
        resize_images,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    outs = []
    for kind in ("jpeg", "jpeg_rgb"):
        small = resize_images(synthesize_media_real(spark, d, kind), 8, 8)
        outs.append(extract_features(small, feat_dim=64, strict=True))
    pre = outs[0].unionByName(outs[1]).select("doc_id", "kind", F.col("feat").alias("_f"))
    return (
        pre.select("doc_id", "kind", F.posexplode("_f").alias("pix_idx", "_v"))
        .select(
            "doc_id",
            "kind",
            F.col("pix_idx").cast("long").alias("pix_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("pix_val"),
        )
        .orderBy("doc_id", "kind", "pix_idx")
    )


def q_media_video(spark, sf_dir):
    """Video frame-sampling through a REAL multi-frame container
    (datapipe.gif animation): 4 frames of 8x8 gray (bytes 64f..64f+63),
    per-frame delays 2+(doc_id+f)%5 cs, strided every 2nd frame losslessly
    (index-level LZW re-encode, dropped delays folded forward), then
    per-frame pooled features (extract_frame_features). Kept frame k maps
    to source frame 2k: pixel j = byte[128k+j], delay = d(2k)+d(2k+1)."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_frame_features,
        sample_video_frames,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    strided = sample_video_frames(synthesize_media_real(spark, d, "video"), 2)
    feats = extract_frame_features(strided, feat_dim=64, strict=True)
    return (
        feats.select(
            "doc_id", "frame_idx", "delay_cs", F.posexplode("feat").alias("feat_idx", "_v")
        )
        .select(
            "doc_id",
            F.col("frame_idx").cast("long").alias("frame_idx"),
            F.col("delay_cs").cast("long").alias("delay_cs"),
            F.col("feat_idx").cast("long").alias("feat_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("feat_val"),
        )
        .orderBy("doc_id", "frame_idx", "feat_idx")
    )


def q_media_probe2(spark, sf_dir):
    """Header probes for the round-5 codecs: JPEG SOF dims via a real
    marker-segment walk, GIF logical-screen dims + frame count + total
    GCE delay via a sub-block walk (no LZW decode), BMP info-header dims.
    The oracle knows the doc_id → fixture mapping; the probe only sees
    the encoded bytes."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        probe_media,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    u = synthesize_media_real(spark, d, "jpeg")
    for kind in ("gif", "bmp", "video"):
        u = u.unionByName(synthesize_media_real(spark, d, kind))
    return (
        probe_media(u)
        .select(
            "doc_id",
            "kind",
            "mime",
            F.col("width").cast("long").alias("width"),
            F.col("height").cast("long").alias("height"),
            F.col("n_samples").cast("long").alias("n_frames"),
            F.col("duration_ms").cast("long").alias("duration_ms"),
        )
        .orderBy("doc_id", "kind")
    )


def q_media_flac(spark, sf_dir):
    """REAL FLAC codec end-to-end (datapipe.flac): text bytes become
    16-bit samples (byte-128)*256, Rice/fixed-predictor coded in 64-sample
    blocks, then strict-decoded — sample i is exactly (byte_i-128)/128,
    the same byte math as the 8-bit WAV gate but through a genuinely
    compressed bitstream (Huffman-free Rice coding, CRC-8/16 verified)."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_features,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    feats = extract_features(synthesize_media_real(spark, d, "flac"), 64, strict=True)
    return (
        feats.select("doc_id", F.posexplode("feat").alias("feat_idx", "_v"))
        .select(
            "doc_id",
            F.col("feat_idx").cast("long").alias("feat_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("feat_val"),
        )
        .orderBy("doc_id", "feat_idx")
    )


def q_media_g711(spark, sf_dir):
    """G.711 mu-law WAV end-to-end (datapipe.codecs formats 7/6): text
    bytes are used verbatim as mu-law codes, strict-decoded through the
    companding expansion — sample i = mulaw_decode(byte_i)/32768, integer
    bit math the oracle recomputes exactly."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        extract_features,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    feats = extract_features(synthesize_media_real(spark, d, "g711"), 64, strict=True)
    return (
        feats.select("doc_id", F.posexplode("feat").alias("feat_idx", "_v"))
        .select(
            "doc_id",
            F.col("feat_idx").cast("long").alias("feat_idx"),
            F.round(F.col("_v").cast("double"), 6).alias("feat_val"),
        )
        .orderBy("doc_id", "feat_idx")
    )


def q_seq_pack(spark, sf_dir):
    """Concat-and-chunk sequence packing (datapipe.sampling.
    pack_sequences): whitespace token counts, one EOD separator per doc,
    64-token sequences — one row per (sequence, document) overlap with
    exact split points. The stream offset is one window cumsum; the
    per-sequence fan-out is F.sequence/explode, all JVM-side."""
    from rrdtool_1_x_spark.datapipe.sampling import pack_sequences

    d = _docs(spark, sf_dir)
    return pack_sequences(d, seq_len=64, eod_tokens=1).orderBy(
        "seq_idx", "doc_id"
    )


def q_media_ahash(spark, sf_dir):
    """Perceptual average-hash over real decoded pixels (datapipe.
    multimodal.image_ahash): PNG fixtures → grayscale → 8x8 nearest
    neighbor → bit i set iff pixel > the 8x8 mean. The mean's divisor is
    a power of two, so the threshold compare is exact and the oracle
    rebuilds the signed 64-bit hash from the fixture bytes directly."""
    from rrdtool_1_x_spark.datapipe.multimodal import (
        image_ahash,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    out = image_ahash(synthesize_media_real(spark, d, "image"), strict=True)
    return out.select(
        "doc_id", "kind", "ahash", F.col("n_dark").cast("long").alias("n_dark")
    ).orderBy("doc_id")


def q_image_near_dup(spark, sf_dir):
    """Image near-dup end-to-end: consecutive docs share an image (both
    encode the even partner's text bytes), real PNG decode → average-hash
    → the generic pigeonhole signature banding
    (datapipe.dedup.signature_near_duplicates) at hamming 0. The oracle
    recomputes every hash from the partner bytes and self-joins on
    equality — collisions beyond the planted pairs match too."""
    from rrdtool_1_x_spark.datapipe.dedup import signature_near_duplicates
    from rrdtool_1_x_spark.datapipe.multimodal import (
        image_ahash,
        synthesize_media_real,
    )

    d = _docs(spark, sf_dir)
    partner = d.select(
        "doc_id", (F.col("doc_id") - F.col("doc_id") % 2).alias("_src")
    )
    src_txt = d.select(F.col("doc_id").alias("_src"), "text")
    paired = partner.join(src_txt, "_src").select("doc_id", "text")
    sig = image_ahash(synthesize_media_real(spark, paired, "image"), strict=True)
    pairs = signature_near_duplicates(
        sig, sig_col="ahash", max_hamming=0, blocks=4, max_bucket_size=None
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    ).orderBy("id_a", "id_b")


def q_ann_cosine_top10(spark, sf_dir):
    """Brute-force cosine top-10 against the lowest-id embedding."""
    e = _emb(spark, sf_dir)
    qv = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    j = e.crossJoin(F.broadcast(qv)).filter(F.col("vec_id") != F.col("qid"))
    a = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    b = F.transform(F.col("qe"), lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    sim = F.round(dot / (na * nb), 6)
    out = j.select("vec_id", sim.alias("cos_sim"))
    # top-k via orderBy+limit (TakeOrdered: per-partition heaps) — an
    # unpartitioned rank window here would funnel every scored corpus row
    # through one partition; the rank window runs over the 10 survivors
    top = out.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)
    w = Window.orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "cos_sim", "rank")
        .orderBy("rank")
    )


_ND_KW = dict(num_hashes=8, bands=4, shingle_len=3, jaccard_threshold=0.5)
_ND_CACHE: dict[tuple[str, str], DataFrame] = {}
_IVF_MODEL_CACHE: dict[tuple[str, str, str], list] = {}


def _near_dup(spark, sf_dir):
    """MinHash-LSH near-dup pairs, shared by the pair/group/report queries —
    cached per (session, sf_dir) so the shingle→signature→band pipeline runs
    once, not once per consuming query."""
    from rrdtool_1_x_spark.datapipe.dedup import minhash_near_duplicates

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ND_CACHE:
        d = _docs(spark, sf_dir)
        _ND_CACHE[key] = minhash_near_duplicates(d, **_ND_KW).cache()
    return _ND_CACHE[key]


def q_near_dup_pairs(spark, sf_dir):
    """MinHash+LSH near-duplicate pairs with exact Jaccard verification
    (datapipe.dedup.minhash_near_duplicates): 8 md5 minhashes, 4 bands of 2,
    candidates only within band buckets."""
    out = _near_dup(spark, sf_dir)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_domain_stats(spark, sf_dir):
    """Corpus domain inventory (datapipe.pii.domain_stats): URL hosts
    extracted in-scan and aggregated to (domain, url_cnt, doc_cnt) — the
    C4 blocklist-analysis measurements. The synthetic corpus is URL-free,
    so deterministic doc_id-derived URLs over 7+3 distinct domains are
    injected (the oracle builds identical strings)."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id").cast("string")
    enriched = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.repeat(
                F.concat(
                    F.lit(" see https://site"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.org/p/"),
                    did,
                ),
                (F.col("doc_id") % 2).cast("int"),
            ),
            F.repeat(
                F.concat(
                    F.lit(" img http://cdn"),
                    (F.col("doc_id") % 3).cast("string"),
                    F.lit(".example.net/a.png"),
                ),
                (F.col("doc_id") % 3).cast("int"),
            ),
        ).alias("text"),
    )
    from rrdtool_1_x_spark.datapipe.pii import domain_stats

    return domain_stats(enriched).orderBy("domain")


def q_gopher_rep(spark, sf_dir):
    """Full Gopher repetition table (datapipe.textstats.gopher_repetition;
    Rae et al. 2021 Table A1): top-{2,3,4}-gram position shares and
    duplicated-{5..10}-gram position shares per document. Nine n-gram
    families built in-scan, one explode, two doc-keyed aggregations."""
    from rrdtool_1_x_spark.datapipe.textstats import gopher_repetition

    return gopher_repetition(_docs(spark, sf_dir)).orderBy("doc_id")


def q_dedup_best(spark, sf_dir):
    """Quality-aware dedup disposition (datapipe.dedup.
    best_quality_representatives): each near-dup component keeps its
    highest-quality member (ties to lowest id) — the RefinedWeb/CCNet
    representative rule; full-corpus (doc, group, rep, keep) rows."""
    from rrdtool_1_x_spark.datapipe.dedup import best_quality_representatives

    pairs = _near_dup(spark, sf_dir).select("id_a", "id_b")
    out = best_quality_representatives(_docs(spark, sf_dir), pairs)
    return out.orderBy("doc_id")


def _lines_enriched(doc_id, text, punct: bool):
    """Deterministic line structure for the line-level cleaning gates: the
    synthetic corpus is single-line, so tokens are regrouped into 6-word
    lines (the oracle builds identical strings). With ``punct`` the lines
    get C4-style terminal punctuation on a (doc_id + line) schedule, plus
    javascript / lorem-ipsum / brace marker lines on doc_id residues so
    every C4 rule fires on a known subset."""
    toks = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")
    nlines = F.ceil(F.size(toks) / F.lit(6)).cast("int")
    if punct:
        def mk(i):
            tail = (
                F.when((doc_id + i) % 7 == 0, F.lit(""))
                .when((doc_id + i) % 5 == 0, F.lit("!"))
                .otherwise(F.lit("."))
            )
            return F.concat(F.array_join(F.slice(toks, i * 6 + 1, 6), " "), tail)
    else:
        def mk(i):
            return F.array_join(F.slice(toks, i * 6 + 1, 6), " ")
    return toks, F.transform(F.sequence(F.lit(0), nlines - 1), mk)


def q_c4_clean(spark, sf_dir):
    """C4 cleaning heuristics (datapipe.clean.c4_line_filter; Raffel et
    al. 2020 §2.2): line keep-rules (terminal punctuation, >=5 words, no
    javascript) and page drop-rules (<3 surviving lines, lorem ipsum,
    curly brace) over the deterministically line-structured corpus."""
    from rrdtool_1_x_spark.datapipe.clean import c4_line_filter

    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    _, lines = _lines_enriched(did, F.col("text"), punct=True)
    lines = (
        F.when(
            did % 11 == 0,
            F.concat(
                F.array(F.lit("please enable javascript to view this page.")),
                lines,
            ),
        ).otherwise(lines)
    )
    lines = (
        F.when(
            did % 13 == 0,
            F.concat(
                lines, F.array(F.lit("lorem ipsum dolor sit amet consectetur."))
            ),
        ).otherwise(lines)
    )
    lines = (
        F.when(
            did % 17 == 0,
            F.concat(
                lines, F.array(F.lit("if (x) { return y; } end of sample."))
            ),
        ).otherwise(lines)
    )
    enriched = d.select("doc_id", F.array_join(lines, "\n").alias("text"))
    return c4_line_filter(enriched).orderBy("doc_id")


def _line_dedup_input(spark, sf_dir):
    """Boilerplate-injected line-structured corpus shared by the
    line_dedup and line_index_topup gates (newsletter banner on doc_id%3,
    copyright footer on %5 — exercises cross-document removal)."""
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    _, lines = _lines_enriched(did, F.col("text"), punct=False)
    banner = F.lit("subscribe to our newsletter for daily updates")
    footer = F.lit("all rights reserved copyright two thousand")
    lines = (
        F.when(did % 3 == 0, F.concat(F.array(banner), lines)).otherwise(lines)
    )
    lines = (
        F.when(did % 5 == 0, F.concat(lines, F.array(footer))).otherwise(lines)
    )
    return d.select("doc_id", F.array_join(lines, "\n").alias("text"))


def q_line_dedup(spark, sf_dir):
    """Corpus-wide line dedup (datapipe.clean.line_dedup; Wenzek et al.
    2020 §3): first corpus occurrence of every line survives. Boilerplate
    lines are injected on doc_id residues (newsletter banner on %3,
    copyright footer on %5) so the cross-document removal path is
    exercised, not just intra-document repeats."""
    from rrdtool_1_x_spark.datapipe.clean import line_dedup

    return line_dedup(_line_dedup_input(spark, sf_dir)).orderBy("doc_id")


def q_line_index_topup(spark, sf_dir):
    """Incremental line-dedup index (datapipe.clean.write_line_index /
    append_line_dedup): index the low-id half, append the high-id half;
    the first half's cleaned rows ∪ the append's cleaned rows must equal
    the one-shot corpus line_dedup — the oracle is line_dedup's SQL
    verbatim (id-ordered appends make the composition exact)."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.clean import (
        append_line_dedup,
        line_dedup,
        write_line_index,
    )

    enriched = _line_dedup_input(spark, sf_dir)
    cut = int(enriched.agg(F.max("doc_id")).first()[0]) // 2
    first = enriched.filter(F.col("doc_id") <= cut)
    second = enriched.filter(F.col("doc_id") > cut)
    path = tempfile.mkdtemp(prefix="lineidx_")
    write_line_index(first, path)
    initial = line_dedup(first)
    appended = append_line_dedup(second, path)
    return initial.unionByName(appended).orderBy("doc_id")


def q_html_extract(spark, sf_dir):
    """HTML → text extraction (datapipe.clean.extract_html_text): the
    corpus rebuilt as deterministic HTML — nav-div boilerplate, <p> per
    6-word line, entity suffixes on (doc_id+i)%5, <br> splits on %4,
    script/style/comment blocks on doc_id residues — then extracted back
    to newline-structured text (the oracle builds identical markup and
    mirrors the regex chain)."""
    from rrdtool_1_x_spark.datapipe.clean import extract_html_text

    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    _, lines = _lines_enriched(did, F.col("text"), punct=False)
    paras = F.transform(
        lines,
        lambda x, i: F.concat(
            F.lit("<p>"),
            x,
            F.when(
                (did + i) % 5 == 0, F.lit(" Tom &amp; Jerry &lt;3")
            ).otherwise(F.lit("")),
            F.when(
                (did + i) % 4 == 0, F.lit("<br>line break bit")
            ).otherwise(F.lit("")),
            F.lit("</p>"),
        ),
    )
    html = F.concat(
        F.lit('<div class="nav"><a href="/">home &amp; start</a></div>'),
        F.when(
            did % 7 == 0,
            F.lit('<script type="text/javascript">var s=1;</script>'),
        ).otherwise(F.lit("")),
        F.array_join(paras, ""),
        F.when(did % 11 == 0, F.lit("<style>.x{color:red}</style>")).otherwise(
            F.lit("")
        ),
        F.when(did % 13 == 0, F.lit("<!-- hidden -->")).otherwise(F.lit("")),
    )
    enriched = d.select("doc_id", html.alias("html"))
    return extract_html_text(enriched).orderBy("doc_id")


def q_temperature_mix(spark, sf_dir):
    """Temperature-scaled domain mixing table (datapipe.sampling.
    temperature_mix; the mT5/Pile multi-source sampling rule at
    alpha = 0.5): per-source token counts, raw share, sqrt-tempered mix
    weight and effective epochs — sqrt and division are IEEE-correctly-
    rounded so the chain is bit-exact across engines."""
    from rrdtool_1_x_spark.datapipe.sampling import temperature_mix

    return temperature_mix(_docs(spark, sf_dir), domain_col="source").orderBy(
        "domain"
    )


def q_datacard(spark, sf_dir):
    """Corpus data-card report (datapipe.report.corpus_datacard): long-
    format (metric, value) summary — doc/token/char counts, composition
    shares, exact-dup rate, nearest-rank median length, source entropy.
    One persisted slim projection feeds five independent aggregates.

    The slim projection is corpus-sized, so its persist handle is held in
    an app-scoped registry: one cached frame per (application, sf_dir),
    and any prior handle for the same key is unpersisted first — repeat
    invocations (bench loops) can never accumulate cached corpora even if
    the DataFrame memo is bypassed."""
    from rrdtool_1_x_spark.datapipe.report import corpus_datacard

    handle: list = []
    card = corpus_datacard(_docs(spark, sf_dir), unpersist_handle=handle)
    _hold_app_persist(spark, sf_dir, "datacard_slim", handle)
    return card.orderBy("metric")


def q_asof_join(spark, sf_dir):
    """Backward as-of join (operators.asof.asof_join; pandas merge_asof /
    kdb aj semantics): every click matched to the user's latest view
    within 10 minutes — tag+union+window plan, ONE shuffle on the user
    key, no join node, so hot users cost a window partition rather than
    a range-join fanout."""
    from rrdtool_1_x_spark.operators.asof import asof_join

    ev = _events_us(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "tus"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        "tus",
        F.col("value").alias("view_value"),
    )
    return asof_join(
        clicks, views, ts_col="tus", by=["user_id"],
        tolerance=600_000_000,
    ).orderBy("event_id")


def q_range_join(spark, sf_dir):
    """Point-in-interval join (operators.asof.range_join): clicks inside
    the 5-minute window after each error, per user — intervals explode to
    the 1-minute buckets they overlap so the theta join plans as an
    equi-join on (user, bucket) + residual filter."""
    from rrdtool_1_x_spark.operators.asof import range_join

    ev = _events_us(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "tus"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("tus").alias("start_us"),
        (F.col("tus") + F.lit(300_000_000)).alias("end_us"),
    )
    return range_join(
        clicks, errors, ts_col="tus", by=["user_id"],
        bucket=60_000_000,
    ).select("user_id", "error_id", "click_id", "tus", "start_us").orderBy(
        "error_id", "click_id"
    )


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (operators.sessions.session_stats): a new
    session per user when the inter-event gap exceeds 30 minutes —
    lag + running sum over one key-partitioned window, one shuffle."""
    from rrdtool_1_x_spark.operators.sessions import session_stats

    ev = _events_us(spark, sf_dir)
    return session_stats(
        ev.select("user_id", "tus"), ts_col="tus", by=["user_id"],
        gap=1_800_000_000,
    ).orderBy("user_id", "session_idx")


def q_winnow_stream(spark, sf_dir):
    """Streaming winnow-index maintenance (streaming.datapipe_stream
    .start_winnow_stream): the documents table as a 3-batch file
    stream, each micro-batch fingerprinting only itself and appending
    to the stored (doc, fp) frame — set-union merge, replay absorbed by
    the read-side distinct. The drained index's match report must equal
    the one-shot winnow_overlap (the oracle, verbatim)."""
    import shutil
    import tempfile

    from rrdtool_1_x_spark.datapipe.textstats import winnow_index_overlap
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_winnow_stream,
    )

    work = tempfile.mkdtemp(prefix="winnowstream_")
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    src = f"{work}/in"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(2).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_winnow_stream(stream, f"{work}/idx", f"{work}/ck", k=4, w=4)
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("winnow_stream drain exceeded 600s")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return winnow_index_overlap(
        spark, f"{work}/idx", min_shared=3, max_fp_docs=64
    ).orderBy("id_a", "id_b")


_UNIGRAM_MODEL_CACHE: dict = {}


def _unigram_model(spark, sf_dir):
    """Train-once-per-(session, dataset) unigram-LM tokenizer model —
    the offline artifact discipline of the PQ/IVF caches."""
    key = (spark.sparkContext.applicationId, sf_dir, "unitok")
    if key not in _UNIGRAM_MODEL_CACHE:
        from rrdtool_1_x_spark.datapipe.unigram_tok import train_unigram

        _UNIGRAM_MODEL_CACHE[key] = train_unigram(
            _docs(spark, sf_dir),
            max_piece=4,
            seed_size=128,
            vocab_size=48,
            n_iter=2,
            max_word_len=16,
        )
    return _UNIGRAM_MODEL_CACHE[key]


def q_span_corrupt(spark, sf_dir):
    """T5-style span corruption (datapipe.sampling.span_corrupt; Raffel
    et al. JMLR 2020 §3.1.4): deterministic hash-drawn mask spans
    (~15% of tokens), sentinel-substituted inputs and sentinel-prefixed
    targets — the denoising-objective constructor, reproducible across
    runs/engines/retries. Gate hash-checks the full corrupted/target
    strings per document."""
    from rrdtool_1_x_spark.datapipe.sampling import span_corrupt

    return span_corrupt(_docs(spark, sf_dir)).orderBy("doc_id")


def q_script_mix(spark, sf_dir):
    """Unicode-script composition screen (datapipe.textstats
    .script_mix): the ASCII corpus is deterministically enriched —
    every 17th doc gets its 'o's replaced by Cyrillic 'о' (the
    homoglyph-stuffing shape) — and the per-doc script counts, dominant
    script and mixed flag must classify them exactly."""
    from rrdtool_1_x_spark.datapipe.textstats import script_mix

    d = _docs(spark, sf_dir)
    enriched = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 17 == 0,
            F.regexp_replace(F.col("text"), "o", "о"),
        ).otherwise(F.col("text")).alias("text"),
    )
    return script_mix(enriched).orderBy("doc_id")


def q_corpus_diff(spark, sf_dir):
    """Snapshot delta report (datapipe.report.corpus_diff): the NEW
    snapshot is derived deterministically from documents — %11 docs
    removed, %13 texts mutated, 5 shifted-id docs added — and the diff
    must classify every id exactly. Text never shuffles (content-hash
    projection in the scan); one full-outer join on the id."""
    from rrdtool_1_x_spark.datapipe.report import corpus_diff

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    kept = d.filter(F.col("doc_id") % 11 != 0)
    mutated = kept.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(F.col("text"), F.lit(" v2")),
        ).otherwise(F.col("text")).alias("text"),
    )
    added = d.orderBy("doc_id").limit(5).select(
        (F.col("doc_id") + 2000000).alias("doc_id"),
        F.lit("newsrc").alias("source"),
        F.col("text"),
    )
    new = mutated.unionByName(added)
    return corpus_diff(d, new).orderBy("source")


def q_unigram_nbest(spark, sf_dir):
    """Deterministic 2-best Viterbi segmentations per word under the
    trained unigram model (datapipe.unigram_tok.viterbi_nbest) — the
    n-best machinery subword regularization samples from (Kudo 2018
    §4); beam truncation mirrored layer-by-layer in the oracle so even
    pathological score ties agree cross-engine."""
    from rrdtool_1_x_spark.datapipe.unigram_tok import (
        viterbi_nbest,
        word_frame,
    )

    model = _unigram_model(spark, sf_dir)
    scores = {p: s for p, _, s in model}
    words = word_frame(_docs(spark, sf_dir))
    return viterbi_nbest(words, scores, max_piece=4, nbest=2).orderBy(
        "word", "rank"
    )


def q_lsh_pr(spark, sf_dir):
    """LSH banding quality audit (datapipe.dedup.lsh_precision_recall):
    measured precision/recall of the 8-hash/4-band candidate set
    against the EXACT-Jaccard >= 0.5 ground truth (sparse shared-
    shingle all-pairs — the source_overlap-style audit tier), with the
    S-curve theoretical collision probability at the threshold beside
    the measured numbers. Same banding parameters as near_dup_pairs."""
    from rrdtool_1_x_spark.datapipe.dedup import lsh_precision_recall

    # the audit runs on a deterministic 1/3 slice — its own doctrine
    # ("all-pairs truth on samples at scale"): the mechanism is fully
    # exercised, the quadratic truth join stays sample-sized
    return lsh_precision_recall(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 0),
        num_hashes=8,
        bands=4,
        shingle_len=3,
        jaccard_threshold=0.5,
        max_bucket_size=512,
    )


def q_unigram_vocab(spark, sf_dir):
    """Unigram-LM subword tokenizer training (datapipe.unigram_tok
    .train_unigram; Kudo ACL 2018, the SentencePiece unigram model as
    hard-EM): substring seed vocab -> 2 Viterbi-EM rounds with integer
    micro-nat scores and the (score DESC, segmentation ASC) tiebreak ->
    prune to 48 pieces (single chars never drop — the character
    fallback enforced structurally). The ENTIRE training run is
    hash-gated: the oracle re-derives seed, both EM rounds (16 DP
    layers each as materialized CTEs) and the prune in SQL."""
    model = _unigram_model(spark, sf_dir)
    return spark.createDataFrame(
        model, "piece string, cnt long, logp_micro long"
    ).orderBy(F.desc("cnt"), F.asc("piece"))


def q_unigram_segment(spark, sf_dir):
    """Per-document stats under the trained unigram tokenizer
    (datapipe.unigram_tok.unigram_doc_stats): words, pieces (the
    fertility analogue) and the exact integer document log-likelihood —
    each DISTINCT word segments once, documents join that frame."""
    from rrdtool_1_x_spark.datapipe.unigram_tok import unigram_doc_stats

    model = _unigram_model(spark, sf_dir)
    return unigram_doc_stats(_docs(spark, sf_dir), model).orderBy("doc_id")


def q_kn_heldout(spark, sf_dir):
    """HELD-OUT Kneser-Ney scoring (datapipe.textstats.kneser_ney_bigram
    with train_df): the model trains on the hash-split train docs
    (u01 < 0.8) and scores the val docs — the fixed-scorer deployment
    shape of CCNet-style LM filtering (self-trained scoring leaks the
    scored text into its own model). Unseen-pair bigrams score through
    KN's backoff mass; bigrams whose w1/w2 the model never saw are
    counted in oov_bigrams instead of the mean."""
    from rrdtool_1_x_spark.datapipe.sampling import hash_u01
    from rrdtool_1_x_spark.datapipe.textstats import kneser_ney_bigram

    d = _docs(spark, sf_dir)
    u = hash_u01(F.col("doc_id"), "split")
    train = d.filter(u < 0.8)
    val = d.filter(~(u < 0.8))
    out = kneser_ney_bigram(val, train_df=train)
    return out.select(
        "doc_id",
        F.round("kn_logprob", 6).alias("kn_logprob"),
        "bigram_cnt",
        "oov_bigrams",
    ).orderBy("doc_id")


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix (operators.sessions
    .event_transitions): within-session consecutive event-type pairs,
    (from, to, n, p) with p an exact integer ratio — the one-step
    conditional view session_paths unrolls into n-step sequences."""
    from rrdtool_1_x_spark.operators.sessions import event_transitions

    ev = _events_us(spark, sf_dir)
    return event_transitions(
        ev, ts_col="tus", by=["user_id"], gap=1_800_000_000
    ).orderBy("from_type", "to_type")


def q_event_paths(spark, sf_dir):
    """Behavioral path mining (operators.sessions.session_paths): every
    3-step event-type sequence inside a 30-minute session, counted
    corpus-wide — funnel DISCOVERY (which paths actually happen) next
    to `funnel`'s hypothesis check. Within-session order is (ts, event
    id), deterministic under timestamp ties."""
    from rrdtool_1_x_spark.operators.sessions import session_paths

    ev = _events_us(spark, sf_dir)
    return session_paths(
        ev, n=3, ts_col="tus", by=["user_id"], gap=1_800_000_000
    ).orderBy(F.desc("n_occurrences"), F.asc("path"))


def q_phrase_search(spark, sf_dir):
    """Positional-postings exact phrase search (datapipe.retrieval.
    phrase_search): term postings carry positions, phrases resolve as
    (doc, pos+i) join chains over term-filtered posting sets — the IR
    surface bag-of-words BM25 cannot answer."""
    from rrdtool_1_x_spark.datapipe.retrieval import phrase_search

    return phrase_search(
        _docs(spark, sf_dir),
        ["slow hash batch", "table table key", "fast table value"],
    ).orderBy("phrase", "doc_id")


def q_funnel(spark, sf_dir):
    """Ordered funnel signup -> view -> click -> purchase within 7 days
    (operators.funnel.funnel): greedy-earliest stage matching as one
    filtered min-aggregate per stage joined on the user key — k tiny
    frames, no raw-event window, no per-key collection."""
    from rrdtool_1_x_spark.operators.funnel import funnel

    ev = _events_us(spark, sf_dir)
    return funnel(
        ev,
        ["signup", "view", "click", "purchase"],
        by="user_id",
        within=604_800_000_000,
    ).orderBy("user_id")


def q_retention(spark, sf_dir):
    """Weekly cohort retention matrix (operators.sessions.
    cohort_retention): users cohorted by first-activity week; per
    (cohort, offset) the active count and retention share — two
    combinable aggregates + a broadcast join on the tiny cohort axis."""
    from rrdtool_1_x_spark.operators.sessions import cohort_retention

    ev = _events_us(spark, sf_dir)
    return cohort_retention(
        ev.select("user_id", "tus"), ts_col="tus", by="user_id"
    ).orderBy("cohort", "offset")


def q_event_rollup(spark, sf_dir):
    """Hierarchical ROLLUP aggregate over events (Spark relational
    rollup == SQL GROUP BY ROLLUP): (event_type, user bucket) ->
    (event_type) -> grand total in one pass — Catalyst expands the
    grouping sets, partial aggregation stays map-side combinable."""
    ev = _events_us(spark, sf_dir)
    return (
        ev.withColumn("user_bucket", F.expr("user_id div 10"))
        .rollup("event_type", "user_bucket")
        .agg(
            F.count("*").alias("n_events"),
            # exact integer cents before the sum: a float fold's result
            # depends on partitioning order; the integer sum does not
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0,
                6,
            ).alias("value_sum"),
        )
        .orderBy("event_type", "user_bucket")
    )


def q_shard_epoch(spark, sf_dir):
    """Deterministic epoch shuffle + fixed-size shards
    (datapipe.sampling.shard_epoch): md5(seed:id) permutation ranked by
    the exact distributed two-level prefix-count (the pack_sequences
    machinery — never a single-partition global window), shard =
    rank DIV 64."""
    from rrdtool_1_x_spark.datapipe.sampling import shard_epoch

    return shard_epoch(_docs(spark, sf_dir), shard_size=64).orderBy(
        "doc_id"
    )


def q_scd2(spark, sf_dir):
    """Type-2 slowly-changing-dimension merge (operators.scd.scd2_merge,
    Kimball SCD2) over the customer dimension: one full-outer join of
    the open slice with the update batch — changed rows close + reopen,
    no-op updates pass through, brand-new keys insert. Exercises all
    four paths: %7 keys change segment, %11 keys send a no-op update,
    5 synthetic keys are brand-new."""
    from rrdtool_1_x_spark.operators.scd import scd2_merge

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_nationkey",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
    )
    upd_change = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("_v2")).alias("c_mktsegment"),
        "c_nationkey",
        F.lit(1000).cast("long").alias("ts"),
    )
    upd_noop = cust.filter(
        (F.col("c_custkey") % 7 != 0) & (F.col("c_custkey") % 11 == 0)
    ).select(
        "c_custkey", "c_mktsegment", "c_nationkey",
        F.lit(1000).cast("long").alias("ts"),
    )
    upd_new = cust.orderBy("c_custkey").limit(5).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.col("c_nationkey"),
        F.lit(1000).cast("long").alias("ts"),
    )
    out = scd2_merge(
        dim,
        upd_change.unionByName(upd_noop).unionByName(upd_new),
        key="c_custkey",
        attrs=["c_mktsegment", "c_nationkey"],
    )
    return out.orderBy("c_custkey", "valid_from", "valid_to")


def q_dq_checks(spark, sf_dir):
    """Declarative data-quality report (datapipe.dq): predicate
    expectations, key uniqueness, referential integrity over the star
    schema + corpus — the dbt-test surface. Each check is one combinable
    aggregate or an anti-join against a broadcastable key set."""
    from rrdtool_1_x_spark.datapipe.dq import (
        check_predicate,
        check_ref,
        check_unique,
        dq_report,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = _docs(spark, sf_dir)
    return dq_report(
        [
            check_unique("orders_pk_unique", orders, ["o_orderkey"]),
            check_unique("customer_pk_unique", cust, ["c_custkey"]),
            check_ref(
                "orders_custkey_fk", orders, "o_custkey", cust, "c_custkey"
            ),
            check_ref(
                "lineitem_orderkey_fk", li, "l_orderkey", orders, "o_orderkey"
            ),
            check_predicate(
                "lineitem_quantity_range",
                li,
                ~F.col("l_quantity").between(1, 50),
            ),
            check_predicate(
                "orders_totalprice_positive",
                orders,
                F.col("o_totalprice") <= 0,
            ),
            check_predicate(
                "documents_text_nonempty",
                docs,
                F.length(F.trim(F.col("text"))) == 0,
            ),
        ]
    ).orderBy("check")


def q_json_props(spark, sf_dir):
    """Schema-on-read JSON extraction (operators.sessions.
    json_field_stats): typed $.k pulled out of the semi-structured
    props column per event type — get_json_object stays JVM-side in
    whole-stage codegen (no UDF), one combinable aggregation."""
    from rrdtool_1_x_spark.operators.sessions import json_field_stats

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "props"
    )
    return json_field_stats(ev, field="k").orderBy("event_type")


def q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve (datapipe.textstats.vocab_coverage):
    the share of token positions the top-k words cover, k in
    {10, 100, 1000} — the Zipf measurement behind vocabulary sizing.
    Distributed TakeOrdered top-k; no global sort."""
    from rrdtool_1_x_spark.datapipe.textstats import vocab_coverage

    return vocab_coverage(_docs(spark, sf_dir), ks=(10, 100, 1000)).orderBy(
        "k"
    )


def q_mad_outlier(spark, sf_dir):
    """Per-user robust outlier report (operators.sessions.
    robust_outliers): nearest-rank median + MAD over exact integer
    cents, outlier = |x - med| > 3*MAD — the heavy-tail-proof anomaly
    screen. All-integer, so the full report hash-gates."""
    from rrdtool_1_x_spark.operators.sessions import robust_outliers

    ev = _events_us(spark, sf_dir)
    return robust_outliers(ev, thresh=3).orderBy("user_id")


def q_label_prop(spark, sf_dir):
    """k-NN label propagation from a broadcastable seed set
    (datapipe.similarity.knn_label_propagation): every embedding takes
    the majority label of its 5 nearest labeled seeds by int8 cosine —
    the semi-supervised auto-labeling pass behind curation classifiers.
    The seed set is FIXED-SIZE (the 50 smallest-md5 labeled vectors,
    the corpus sampling convention) — seeds are human annotations, they
    do not grow with the corpus, and a corpus-fraction seed set would
    turn the scoring scan quadratic (measured 88x at 10x before this
    was pinned). One corpus-linear scoring scan."""
    from rrdtool_1_x_spark.datapipe.similarity import knn_label_propagation

    e = _emb(spark, sf_dir)
    seeds = (
        e.filter(F.col("label").isNotNull())
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(50)
    )
    out = knn_label_propagation(e, seeds, k=5)
    lab = e.select("vec_id", "label")
    return (
        out.join(lab, "vec_id")
        .select(
            "vec_id",
            "pred_label",
            "votes",
            "label",
            F.when(F.col("pred_label") == F.col("label"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("correct"),
        )
        .orderBy("vec_id")
    )


def q_hll_distinct(spark, sf_dir):
    """Per-source approximate distinct-token counts via a bit-exact
    HyperLogLog (datapipe.sketch.hll_distinct; Flajolet et al. 2007):
    md5-derived 32-bit hashes, 512 integer-max registers, the harmonic
    sum computed as an exact dyadic rational — the whole sketch is
    deterministic across engines and partitionings. exact=True adds the
    true count and relative error for the audit."""
    from rrdtool_1_x_spark.datapipe.sketch import hll_distinct

    d = _docs(spark, sf_dir)
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        )
    ).alias("tok")
    e = d.select("source", toks)
    return hll_distinct(e, F.col("tok"), ["source"], exact=True).orderBy(
        "source"
    )


def q_cms_topk(spark, sf_dir):
    """Heavy-hitter audit via a Count-Min sketch (datapipe.sketch.
    cms_table/cms_estimate; Cormode & Muthukrishnan 2005): 4x1024
    integer counters over md5 hashes — exact integer sums, order-free,
    engine-exact; the top-20 exact tokens are point-queried and the
    CM overcount (always >= 0) reported."""
    from rrdtool_1_x_spark.datapipe.sketch import cms_estimate, cms_table

    d = _docs(spark, sf_dir)
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        )
    ).alias("tok")
    e = d.select(toks)
    sketch = cms_table(e, F.col("tok"))
    cand = (
        e.groupBy("tok")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("tok"))
        .limit(20)
    )
    return (
        cms_estimate(sketch, cand, "tok")
        .select(
            "tok",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("n_exact"), F.asc("tok"))
    )


def q_split_leak(spark, sf_dir):
    """Train/val/test leakage audit (datapipe.decontam.split_leakage):
    hash_split assignment composed with exact-copy pairs (md5 groups) and
    MinHash-LSH near-duplicates; only pairs crossing the split boundary
    survive — the report an eval split must pass to be trusted."""
    from rrdtool_1_x_spark.datapipe.decontam import split_leakage

    return (
        split_leakage(
            _docs(spark, sf_dir), {"train": 0.8, "val": 0.1, "test": 0.1}
        )
        .select(
            "id_a",
            "split_a",
            "id_b",
            "split_b",
            F.round("jaccard", 6).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


def q_mix_sample(spark, sf_dir):
    """One materialized epoch of the temperature mixture (datapipe.
    sampling.apply_mixture): per-domain repetition factor = epochs from
    temperature_mix, stochastically rounded per document by the
    deterministic hash draw — identical row multiset on every engine."""
    from rrdtool_1_x_spark.datapipe.sampling import apply_mixture

    return (
        apply_mixture(_docs(spark, sf_dir))
        .select("doc_id", "source", "copy")
        .orderBy("doc_id", "copy")
    )


def q_tok_quantiles(spark, sf_dir):
    """Per-language exact token-count quantiles (datapipe.report.
    histogram_quantiles): nearest-rank from a value histogram — the
    cumulative window covers distinct token counts, never the corpus, and
    nearest-rank sidesteps cross-engine interpolation floats."""
    from rrdtool_1_x_spark.datapipe.report import histogram_quantiles

    d = _docs(spark, sf_dir)
    tk = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        )
    ).cast("long")
    return histogram_quantiles(
        d.select("lang", tk.alias("tk")), F.col("tk"), [0.25, 0.5, 0.75, 0.9],
        ["lang"],
    ).orderBy("lang")


def q_dsir_weight(spark, sf_dir):
    """DSIR importance log-weights (datapipe.sampling.dsir_logweights; Xie
    et al. 2023): hashed-unigram bucket distributions for the target
    (lang = 'en') vs the raw corpus, per-document sum of quantized bucket
    log-ratios."""
    from rrdtool_1_x_spark.datapipe.sampling import dsir_logweights

    d = _docs(spark, sf_dir)
    return dsir_logweights(d, F.col("lang") == F.lit("en")).orderBy("doc_id")


def q_ppl_bucket(spark, sf_dir):
    """CCNet head/middle/tail quality buckets (datapipe.textstats.
    perplexity_buckets; Wenzek et al. 2020 §4.3): tercile cutoffs of the
    self-trained interpolated bigram LM score, broadcast as two scalars —
    no global sort."""
    from rrdtool_1_x_spark.datapipe.textstats import perplexity_buckets

    return perplexity_buckets(_docs(spark, sf_dir)).orderBy("doc_id")


def q_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (datapipe.textstats.
    tfidf_top_terms): integer-quantized smoothed idf so the ranking key is
    exact; ties broken by term string."""
    from rrdtool_1_x_spark.datapipe.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3).orderBy(
        "doc_id", "rank"
    )


def q_pq_topk(spark, sf_dir):
    """Product-quantization ADC top-10 (datapipe.similarity.pq_codebook /
    pq_encode / pq_topk; Jégou et al. TPAMI 2011): 8 subspaces x 16 codes
    over int8-quantized 64-dim embeddings — the compressed-domain scan
    reads 4-byte codes instead of 256-byte float vectors. All-integer
    distances, bit-deterministic ranking; queries = the two lowest
    vec_ids (same convention as ivf_topk)."""
    from rrdtool_1_x_spark.datapipe.similarity import pq_topk

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return pq_topk(
        e, q, k=10, m=8, codes=16, codebook=_pq_book(spark, sf_dir, e)
    ).orderBy("query_id", "rank")


def _pq_book(spark, sf_dir, e):
    """PQ codebooks are the offline training artifact — train once per
    (session, dataset) like the IVF centroid model, score many times."""
    from rrdtool_1_x_spark.datapipe.similarity import pq_codebook

    key = (spark.sparkContext.applicationId, sf_dir, "pqbook")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = pq_codebook(e, m=8, codes=16)
    return _IVF_MODEL_CACHE[key]


def q_nb_classify(spark, sf_dir):
    """Hashed multinomial Naive Bayes language classifier
    (datapipe.textstats.hashed_nb_classify) — the fasttext-shaped linear
    scorer curation pipelines gate documents with, trained on the corpus
    lang labels and applied back to every document. Integer-quantized
    log-weights make the argmax bit-exact; ties to the smallest label.
    This corpus's lang labels are textually signal-free (one shared
    vocabulary), so NB collapses to the class prior — the gate pins the
    exact training+scoring mechanism; learning is pinned by the
    separable-vocabulary pytest."""
    from rrdtool_1_x_spark.datapipe.textstats import hashed_nb_classify

    handle: list = []
    out = hashed_nb_classify(
        _docs(spark, sf_dir), n_buckets=1024, unpersist_handle=handle
    )
    _hold_app_persist(spark, sf_dir, "nb_db", handle)
    return out.orderBy("doc_id")


def q_dedup_stream(spark, sf_dir):
    """Streaming exact dedup (streaming.datapipe_stream.start_dedup_stream):
    the documents table split into 3 micro-batches, drained through a
    checkpointed dropDuplicates on the content hash; the emitted set must
    equal the batch SELECT DISTINCT md5(text) — arrival order cannot leak
    into the result because only the key survives the projection."""
    import tempfile

    from rrdtool_1_x_spark.streaming.datapipe_stream import start_dedup_stream

    work = tempfile.mkdtemp(prefix="dedupstream_")
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    src = f"{work}/in"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(2).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_dedup_stream(stream, f"{work}/out", f"{work}/ck")
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("dedup_stream drain exceeded 600s")
    # the drain is complete: the corpus-sized source copy and the
    # checkpoint are dead weight — only the (distinct-hash-sized) sink
    # backs the returned frame
    import shutil

    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return spark.read.parquet(f"{work}/out").orderBy("h")


def q_stream_join(spark, sf_dir):
    """Watermarked stream-stream interval join
    (streaming.joins.start_interval_join_stream): clicks joined to the
    same user's views within the previous 10 minutes, as two live
    streams. Inner stream-stream join is exact relational semantics, so
    the drained sink must equal the batch interval join (the oracle).
    The gate drains in ONE availableNow micro-batch — the watermark only
    advances BETWEEN batches, so nothing is ever late and the equality is
    deterministic; the multi-batch late-drop semantics (the state
    eviction that makes this bounded at 100 TB/day) are pinned separately
    in tests/test_streaming.py."""
    import tempfile

    from rrdtool_1_x_spark.streaming.joins import start_interval_join_stream

    work = tempfile.mkdtemp(prefix="streamjoin_")
    ev = _events_us(spark, sf_dir)
    ts = F.timestamp_micros(F.col("tus"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        ts.alias("ts"),
        F.col("tus").alias("cts_us"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        ts.alias("ts"),
        F.col("tus").alias("vts_us"),
    )
    for name, df in (("c", clicks), ("v", views)):
        for i in range(3):
            df.filter(F.col(df.columns[0]) % 3 == i).coalesce(1).write.mode(
                "append"
            ).parquet(f"{work}/in_{name}")
    cs = spark.readStream.schema(
        "click_id bigint, user_id bigint, ts timestamp, cts_us bigint"
    ).parquet(f"{work}/in_c")
    vs = spark.readStream.schema(
        "view_id bigint, user_id bigint, ts timestamp, vts_us bigint"
    ).parquet(f"{work}/in_v")
    q = start_interval_join_stream(
        cs, vs, f"{work}/out", f"{work}/ck", interval="10 minutes"
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("stream_join drain exceeded 600s")
    import shutil

    shutil.rmtree(f"{work}/in_c", ignore_errors=True)
    shutil.rmtree(f"{work}/in_v", ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return (
        spark.read.parquet(f"{work}/out")
        .select("click_id", "view_id", "user_id", "cts_us", "vts_us")
        .orderBy("click_id", "view_id")
    )


def q_stream_join_ooo(spark, sf_dir):
    """stream_join's multi-batch OUT-OF-ORDER drain: the same interval
    join, but each side arrives as two waves with the LATER time half
    FIRST (maxFilesPerTrigger=1, so the join state sees genuinely
    shuffled arrival across micro-batches). The watermark is set beyond
    the fixture span, so nothing is evicted and the drained sink must
    equal the batch interval join EXACTLY — pinning arrival-order
    independence of the stream-stream join state the way dedup_stream
    pins it for dropDuplicates. (The watermark EVICTION of truly late
    rows is pinned separately in tests/test_streaming.py — eviction
    depends on batch boundaries, which no cross-engine oracle can see.)
    """
    import shutil
    import tempfile

    from rrdtool_1_x_spark.streaming.joins import start_interval_join_stream

    work = tempfile.mkdtemp(prefix="streamjoinooo_")
    ev = _events_us(spark, sf_dir)
    lo, hi = ev.agg(F.min("tus"), F.max("tus")).first()
    mid = (int(lo) + int(hi)) // 2
    ts = F.timestamp_micros(F.col("tus"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        ts.alias("ts"),
        F.col("tus").alias("cts_us"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        ts.alias("ts"),
        F.col("tus").alias("vts_us"),
    )
    # wave 0 = later half of event time, wave 1 = earlier half. The
    # file source orders candidates by MODIFICATION TIME, and two
    # back-to-back writes can tie on coarse-mtime filesystems (falling
    # back to arbitrary part-file-name order) — so each wave's files
    # get an explicit utime: wave 0 strictly older, guaranteeing the
    # backward-in-time replay this gate exists to exercise.
    import glob as _glob
    import os as _os
    import time as _time

    now = _time.time()
    for name, df, tcol in (("c", clicks, "cts_us"), ("v", views, "vts_us")):
        for wave, pred in enumerate(
            (F.col(tcol) > mid, F.col(tcol) <= mid)
        ):
            df.filter(pred).coalesce(1).write.mode("append").parquet(
                f"{work}/in_{name}"
            )
            stamp = now - 600 + wave * 120
            for f in _glob.glob(f"{work}/in_{name}/*.parquet"):
                if _os.stat(f).st_mtime > stamp:
                    _os.utime(f, (stamp, stamp))
    cs = (
        spark.readStream.schema(
            "click_id bigint, user_id bigint, ts timestamp, cts_us bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/in_c")
    )
    vs = (
        spark.readStream.schema(
            "view_id bigint, user_id bigint, ts timestamp, vts_us bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{work}/in_v")
    )
    q = start_interval_join_stream(
        cs,
        vs,
        f"{work}/out",
        f"{work}/ck",
        interval="10 minutes",
        watermark="3650 days",
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("stream_join_ooo drain exceeded 600s")
    shutil.rmtree(f"{work}/in_c", ignore_errors=True)
    shutil.rmtree(f"{work}/in_v", ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return (
        spark.read.parquet(f"{work}/out")
        .select("click_id", "view_id", "user_id", "cts_us", "vts_us")
        .orderBy("click_id", "view_id")
    )


def q_diverse_sample(spark, sf_dir):
    """Cluster-balanced diversity sampling (datapipe.similarity.
    diverse_sample): 5 deterministic draws per IVF cell — the coverage
    sampler that keeps every embedding-space region represented where a
    uniform sample over-draws dense regions. Shares the session's IVF
    model artifact."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        diverse_sample,
        ivf_centroid_model,
    )

    e = _emb(spark, sf_dir)
    mkey = (spark.sparkContext.applicationId, sf_dir, "ivfmodel")
    if mkey not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[mkey] = ivf_centroid_model(e, nlist=16)
    return diverse_sample(
        e, per_cell=5, model=_IVF_MODEL_CACHE[mkey]
    ).orderBy("cell", "cell_rank")


def q_source_overlap(spark, sf_dir):
    """Cross-source 5-gram Jaccard matrix (datapipe.report.source_overlap):
    the mixture-design profiling op — how much of each source's distinct
    n-gram set the others already carry. All 190 unordered source pairs,
    zero-overlap pairs included."""
    from rrdtool_1_x_spark.datapipe.report import source_overlap

    return source_overlap(_docs(spark, sf_dir), n=5).orderBy(
        "src_a", "src_b"
    )


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining (datapipe.similarity.hard_negative_topk):
    the 5 nearest CROSS-LABEL vectors per query — the contrastive-
    training op that turns an embedding corpus into (anchor, hard
    negative) pairs. Int8-cosine scoring, label filter fused before the
    ranking window, 8 labeled queries."""
    from rrdtool_1_x_spark.datapipe.similarity import hard_negative_topk

    e = _emb(spark, sf_dir)
    q = (
        e.filter(F.col("label").isNotNull())
        .orderBy("vec_id")
        .limit(8)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("query_label"),
            "embedding",
        )
    )
    return hard_negative_topk(e, q, k=5).orderBy("query_id", "rank")


def q_resid_index_topup(spark, sf_dir):
    """Persisted+incremental residual-IVFADC index
    (datapipe.similarity.write_residual_pq_index / append / topk): index
    vec_id % 5 != 0 (model, cell scales AND codebook all frozen on that
    subset), append the % 5 == 0 batch under the frozen artifacts, then
    residual-ADC top-10 off the STORED (id, cell, codes) rows — must
    equal the inline chain whose trained artifacts come from the same
    subset (the oracle restricts its training CTEs with the same
    predicate). Completes the persisted-index family for the residual
    variant."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.similarity import (
        append_residual_pq_index,
        residual_index_topk,
        write_residual_pq_index,
    )

    e = _emb(spark, sf_dir)
    first = e.filter(F.col("vec_id") % 5 != 0)
    second = e.filter(F.col("vec_id") % 5 == 0)
    path = tempfile.mkdtemp(prefix="residx_")
    write_residual_pq_index(first, path, nlist=16, m=8, codes=16)
    append_residual_pq_index(second, path)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return residual_index_topk(spark, path, q, k=10, nprobe=4).orderBy(
        "query_id", "rank"
    )


def _resid_artifacts(spark, sf_dir, e):
    """(model, cell scales, residual codebook) for the residual-IVFADC
    gates — trained once per (session, dataset) like every other offline
    retrieval artifact here."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        residual_cell_scales,
        residual_pq_codebook,
    )

    mkey = (spark.sparkContext.applicationId, sf_dir, "ivfmodel")
    if mkey not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[mkey] = ivf_centroid_model(e, nlist=16)
    model = _IVF_MODEL_CACHE[mkey]
    rkey = (spark.sparkContext.applicationId, sf_dir, "residpq")
    if rkey not in _IVF_MODEL_CACHE:
        scales = residual_cell_scales(e, model)
        book = residual_pq_codebook(e, model, scales, m=8, codes=16)
        _IVF_MODEL_CACHE[rkey] = [model, scales, book]
    return _IVF_MODEL_CACHE[rkey]


def q_ivfpq_residual_topk(spark, sf_dir):
    """Residual-encoded IVFADC (datapipe.similarity.ivfpq_residual_topk;
    Jégou et al. §IV-V proper): PQ codes quantize x - centroid(x) under a
    per-cell scale at int16 resolution; queries score candidates by ADC
    on their own per-cell residual, distances rescaled by cell scale^2
    and rounded to 1e-6 — integer-exact end to end, so the full ranked
    result hash-gates against the oracle."""
    from rrdtool_1_x_spark.datapipe.similarity import ivfpq_residual_topk

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    model, scales, book = _resid_artifacts(spark, sf_dir, e)
    return ivfpq_residual_topk(
        e, q, k=10, nprobe=4, model=model, scales=scales, codebook=book
    ).orderBy("query_id", "rank")


def q_residual_recall(spark, sf_dir):
    """Recall@10 of residual-code IVFADC vs raw-code IVFADC, side by side
    against the int8 exact-cosine baseline (8 queries, same probes) — the
    tolerance question of Jégou §IV made a gated number. On this corpus
    (unit-norm ISOTROPIC synthetic embeddings: best-centroid cosine ~0.3,
    residual norm > vector norm) raw codes measurably win; the residual
    lift appears exactly when the coarse quantizer captures the vector's
    energy — pinned on a tightly-clustered corpus in
    tests/test_datapipe_similarity.py."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _ivfraw_adc_topk,
        _qcos_topk,
        _resid_adc_topk,
        ann_recall,
        multi_method_encode,
    )

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    model, scales, book = _resid_artifacts(spark, sf_dir, e)
    raw_book = _pq_book(spark, sf_dir, e)
    # ONE corpus scan for all three compared methods (was one scan per
    # method, each repeating the centroid-assignment fold and the int8
    # quantization); the per-method scorers read the compact codes off
    # the materialized encode frame. Same expressions per method — the
    # gate's values cannot move.
    from rrdtool_1_x_spark.datapipe.mat import materialize

    enc = multi_method_encode(e, model, scales, raw_book, book).transform(
        materialize
    )
    resid = _resid_adc_topk(
        enc.select("vec_id", "_cell", F.col("codes_res").alias("codes")),
        q, model, scales, book, k=10, nprobe=4, lim=32767,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )
    raw = _ivfraw_adc_topk(
        enc.select("vec_id", "_cell", F.col("codes_raw").alias("codes")),
        q, model, raw_book, k=10, nprobe=4,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )
    exact = _qcos_topk(
        enc.select("vec_id", "qvec", "_na2"), q, k=10,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )
    rr = ann_recall(resid, exact, k=10).select(
        "query_id", "n_exact",
        F.col("n_hit").alias("hit_residual"),
        F.col("recall_at_k").alias("recall_residual"),
    )
    rw = ann_recall(raw, exact, k=10).select(
        "query_id",
        F.col("n_hit").alias("hit_raw"),
        F.col("recall_at_k").alias("recall_raw"),
    )
    return rr.join(rw, "query_id").select(
        "query_id", "n_exact", "hit_residual", "hit_raw",
        "recall_residual", "recall_raw",
    ).orderBy("query_id")


def q_ivfpq_topk(spark, sf_dir):
    """IVFADC-style retrieval (datapipe.similarity.ivfpq_topk; Jégou et
    al. §V): IVF cell pruning (16 cells, 4 probed) + PQ compressed-domain
    scoring (8x16 codes) — the billion-scale recipe. Raw-vector codes
    instead of residuals keep the ranking all-integer and bit-exact."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        ivfpq_topk,
    )

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    mkey = (spark.sparkContext.applicationId, sf_dir, "ivfmodel")
    if mkey not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[mkey] = ivf_centroid_model(e, nlist=16)
    return ivfpq_topk(
        e,
        q,
        k=10,
        nlist=16,
        nprobe=4,
        m=8,
        codes=16,
        model=_IVF_MODEL_CACHE[mkey],
        codebook=_pq_book(spark, sf_dir, e),
    ).orderBy("query_id", "rank")


def q_pq_index_topup(spark, sf_dir):
    """Persisted+incremental PQ index (datapipe.similarity.write_pq_index
    / append_pq_index / pq_index_topk): index vec_id % 5 != 0 (codebook
    frozen on that subset), append the % 5 == 0 batch, then ADC top-10
    off the STORED codes — must equal the inline pq_topk over the full
    corpus under the same codebook. Completes the persisted-index family
    (MinHash bands, SimHash blocks, line hashes, IVF cells, PQ codes)."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.similarity import (
        append_pq_index,
        pq_index_topk,
        write_pq_index,
    )

    e = _emb(spark, sf_dir)
    first = e.filter(F.col("vec_id") % 5 != 0)
    second = e.filter(F.col("vec_id") % 5 == 0)
    path = tempfile.mkdtemp(prefix="pqidx_")
    write_pq_index(first, path, m=8, codes=16)
    append_pq_index(second, path)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return pq_index_topk(spark, path, q, k=10).orderBy("query_id", "rank")


def _pq_exact_encode(e, book):
    """(id, qvec, _na2, codes) in ONE corpus scan — the shared encode of
    the pq-vs-exact comparison gates (pq_recall, rank_metrics): the PQ
    codes derive from the int8 qvec the exact baseline ranks over, so
    one materialized quantization pass feeds both methods (the
    residual_recall multi-method-encode pattern). Expressions identical
    to pq_encode / quantized_topk's corpus side."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _pq_codes_col,
        _qnorm2,
        quantize_embeddings,
    )

    from rrdtool_1_x_spark.datapipe.mat import materialize

    qc = quantize_embeddings(e, "vec_id", "embedding")
    return qc.select(
        "vec_id",
        "qvec",
        _qnorm2("qvec").alias("_na2"),
        _pq_codes_col(book).alias("codes"),
    ).transform(materialize)


def q_pq_recall(spark, sf_dir):
    """Recall@10 of the PQ ADC scan against the int8 brute-force baseline
    (datapipe.similarity.ann_recall) — the quality dial every compressed
    retrieval path is tuned with. Both rankings are integer-exact, so the
    recall number is deterministic across engines."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _pq_adc_topk,
        _qcos_topk,
        ann_recall,
    )

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    # ONE corpus scan feeds both compared methods: the int8 qvec (+ its
    # exact norm) is what the PQ codes derive from anyway, so the codes
    # and the exact ranking read one materialized quantization pass
    # (the residual_recall multi-method-encode pattern).
    enc = _pq_exact_encode(e, _pq_book(spark, sf_dir, e))
    approx = _pq_adc_topk(
        enc.select("vec_id", "codes"), q, _pq_book(spark, sf_dir, e),
        10, "vec_id", "embedding", "query_id",
    )
    exact = _qcos_topk(
        enc.select("vec_id", "qvec", "_na2"), q, k=10,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )
    return ann_recall(approx, exact, k=10).orderBy("query_id")


def q_centroid_classify(spark, sf_dir):
    """Nearest-centroid (Rocchio) classification of every embedding
    (datapipe.similarity.centroid_model/centroid_classify): per-label
    integer centroids over int8-quantized vectors, integer squared-L2
    argmin inlined as one expr — a map-only scan, no join before the
    label attach. The standard nearest-class-mean embedding-space eval."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        centroid_classify,
        centroid_model,
    )

    e = _emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "rocchio")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = centroid_model(e)
    return centroid_classify(e, model=_IVF_MODEL_CACHE[key]).orderBy(
        "vec_id"
    )


def q_kmeans_iter(spark, sf_dir):
    """Lloyd k-means (datapipe.similarity.kmeans_model/kmeans_assign):
    k=8, 3 assign+update rounds over int8-quantized vectors, every step
    integer-exact (md5-rank init, integer-L2 argmin ties-to-lowest,
    round(sum/count) centroid updates, emptied clusters keep their
    centroid) — the full iterative algorithm hash-gates against 3
    unrolled CTE layers. Each round is one map-only corpus scan feeding
    a k*dim-row aggregate."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        kmeans_assign,
        kmeans_model,
    )

    e = _emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "kmeans8x3")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = kmeans_model(e, k=8, n_iter=3)
    return kmeans_assign(e, model=_IVF_MODEL_CACHE[key]).orderBy("vec_id")


def q_kmeans_topup(spark, sf_dir):
    """Persisted k-means model (datapipe.similarity.write_kmeans_model /
    load_kmeans_model): centroids trained on vec_id % 5 != 0, frozen to
    a JSON sidecar, then EVERY vector (old + new batch) assigned under
    the frozen model — appends never relabel history. Oracle restricts
    its training CTEs with the same predicate; scoring runs over
    everything."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.similarity import (
        kmeans_assign,
        kmeans_model,
        load_kmeans_model,
        write_kmeans_model,
    )

    e = _emb(spark, sf_dir)
    first = e.filter(F.col("vec_id") % 5 != 0)
    path = tempfile.mkdtemp(prefix="kmeans_")
    write_kmeans_model(kmeans_model(first, k=8, n_iter=3), path)
    return kmeans_assign(e, model=load_kmeans_model(path)).orderBy("vec_id")


def q_ann_int8_topk(spark, sf_dir):
    """Int8-quantized cosine top-10 (datapipe.similarity.quantize_embeddings
    + quantized_topk) against the lowest-id embedding: integer dot
    products / integer norms — bit-deterministic with no pinned fold; the
    4x-smaller-scan path for corpus-scale retrieval."""
    from rrdtool_1_x_spark.datapipe.similarity import quantized_topk

    e = _emb(spark, sf_dir)
    qv = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    out = quantized_topk(
        e, qv, k=11, query_id_col="qid"
    ).filter(F.col("vec_id") != F.col("qid"))
    w = Window.orderBy(F.desc("qcos_sim"), F.asc("vec_id"))
    return (
        out.select("vec_id", F.round("qcos_sim", 6).alias("qcos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
    )


def q_ann_int4_topk(spark, sf_dir):
    """Int4-quantized cosine top-10 (quantize_embeddings qmax=7): the
    8x-compression retrieval tier — 2 components/byte packed on disk,
    integer dots so the ranking stays bit-deterministic. Same query
    shape as ann_int8_topk."""
    from rrdtool_1_x_spark.datapipe.similarity import quantized_topk

    e = _emb(spark, sf_dir)
    qv = e.orderBy("vec_id").limit(1).select(
        F.col("vec_id").alias("qid"), F.col("embedding")
    )
    out = quantized_topk(
        e, qv, k=11, query_id_col="qid", qmax=7
    ).filter(F.col("vec_id") != F.col("qid"))
    w = Window.orderBy(F.desc("qcos_sim"), F.asc("vec_id"))
    return (
        out.select("vec_id", F.round("qcos_sim", 6).alias("qcos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .orderBy("rank")
    )


def q_trunc_rerank(spark, sf_dir):
    """Two-stage truncated-dimension retrieval (datapipe.similarity.
    truncated_rerank_topk; the Matryoshka adaptive-retrieval pattern):
    corpus-wide ranking over the first 16 of 64 dims (4x less vector IO
    in the only full pass), exact int8 re-rank of the 50 survivors —
    both stages integer-deterministic, composition hash-gated."""
    from rrdtool_1_x_spark.datapipe.similarity import truncated_rerank_topk

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return truncated_rerank_topk(
        e, q, k=10, prefix_dims=16, candidates=50
    ).orderBy("query_id", "rank")


def q_int4_recall(spark, sf_dir):
    """Recall@10 of the int4 scan against the int8 baseline
    (datapipe.similarity.ann_recall over two quantized_topk rankings,
    both integer-deterministic): the measured quality cost of the
    8x-compression tier — the number that decides whether int4 is
    acceptable for a first-stage retrieval pass."""
    from rrdtool_1_x_spark.datapipe.mat import materialize
    from rrdtool_1_x_spark.datapipe.similarity import (
        _int8_qvec,
        _qcos_topk,
        _qnorm2,
        ann_recall,
    )

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    # ONE corpus scan quantizes BOTH tiers (the per-vector scale is
    # qmax-independent, so q4/q8 share the _v/_scale projection); the
    # two rankings read the materialized frame. Expressions identical
    # to quantize_embeddings at each qmax — the recall cannot move.
    vd = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    staged = e.select(
        F.col("vec_id"),
        vd.alias("_v"),
        F.array_max(F.transform(vd, lambda x: F.abs(x))).alias("_scale"),
    )
    enc = staged.select(
        "vec_id",
        _int8_qvec(F.col("_v"), F.col("_scale"), 7).alias("_q4"),
        _int8_qvec(F.col("_v"), F.col("_scale"), 127).alias("_q8"),
    ).select(
        "vec_id", "_q4", "_q8",
        _qnorm2("_q4").alias("_n4"), _qnorm2("_q8").alias("_n8"),
    ).transform(materialize)
    approx = _qcos_topk(
        enc.select("vec_id", F.col("_q4").alias("qvec"),
                   F.col("_n4").alias("_na2")),
        q, k=10, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", qmax=7,
    )
    exact = _qcos_topk(
        enc.select("vec_id", F.col("_q8").alias("qvec"),
                   F.col("_n8").alias("_na2")),
        q, k=10, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )
    return ann_recall(approx, exact, k=10).orderBy("query_id")


def q_dup_groups(spark, sf_dir):
    """Near-dup connected components via distributed label propagation
    (datapipe.dedup.duplicate_groups): (doc_id, group_id = min id in
    component)."""
    from rrdtool_1_x_spark.datapipe.dedup import duplicate_groups

    return duplicate_groups(_near_dup(spark, sf_dir)).orderBy("doc_id")


def q_softdedup_weights(spark, sf_dir):
    """SoftDeDup reweighting (datapipe.dedup.soft_dedup_weights; He et
    al. 2024, arXiv:2407.06654): keep every near-duplicate but weight
    each component's members by 1000000 DIV size — the
    keep-information-drop-redundancy alternative to hard removal, with
    integer weights that feed priority_sample directly. Rides the same
    verified LSH-pair + label-propagation chain as dup_groups."""
    from rrdtool_1_x_spark.datapipe.dedup import soft_dedup_weights

    return soft_dedup_weights(
        _docs(spark, sf_dir), _near_dup(spark, sf_dir)
    ).orderBy("doc_id")


def q_dedup_report(spark, sf_dir):
    """Corpus dedup-rate report: one row of keep-one-per-group accounting."""
    from rrdtool_1_x_spark.datapipe.dedup import duplicate_groups

    d = _docs(spark, sf_dir)
    groups = duplicate_groups(_near_dup(spark, sf_dir))
    g = groups.groupBy("group_id").agg(F.count("*").alias("_sz"))
    stats = g.agg(
        F.count("*").alias("dup_groups"), F.sum("_sz").alias("dup_docs")
    )
    total = d.agg(F.count("*").alias("total_docs"))
    removed = F.col("dup_docs") - F.col("dup_groups")
    return total.crossJoin(stats).select(
        "total_docs",
        "dup_docs",
        "dup_groups",
        removed.alias("docs_removed"),
        (F.col("total_docs") - removed).alias("docs_kept"),
        F.round(removed / F.col("total_docs"), 6).alias("dup_rate"),
    )


def _emb_scan(spark, sf_dir):
    """embeddings with scan-native partitioning — for the Arrow-kernel ANN
    queries the per-row cost is a batched GEMM, so the balanced reader's
    repartition (a crutch for interpreted per-row folds on one-row-group
    files) only adds per-task Python overhead; at cluster scale the scan
    splits natively and this is the same plan."""
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def q_embed_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, LSH-confined then exactly verified
    (datapipe.similarity.embedding_near_duplicates; Arrow in-bucket GEMM
    kernel with exact-fold guard band — bit-identical to the fold path)."""
    from rrdtool_1_x_spark.datapipe.similarity import embedding_near_duplicates

    e = _emb_scan(spark, sf_dir)
    out = embedding_near_duplicates(
        e, threshold=0.35, dim=64, num_planes=4, num_tables=3
    )
    return out.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    ).orderBy("id_a", "id_b")


def q_lsh_topk(spark, sf_dir):
    """ANN scale path: random-hyperplane LSH bucketed top-10
    (datapipe.similarity.lsh_bucketed_topk) for the two lowest-id vectors."""
    from rrdtool_1_x_spark.datapipe.similarity import lsh_bucketed_topk

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = lsh_bucketed_topk(
        e, q, k=10, dim=64, num_planes=6, num_tables=2
    )
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


def q_ivf_topk(spark, sf_dir):
    """ANN scale path #2: IVF cell-probe top-10
    (datapipe.similarity.ivf_topk) for the two lowest-id vectors — nearest
    of 16 md5-selected centroid cells per vector, 4 probed cells per query.
    The centroid model is trained in one TakeOrdered job and inlined as
    literals, so corpus assignment is a shuffle-free map."""
    from rrdtool_1_x_spark.datapipe.similarity import ivf_centroid_model, ivf_topk

    e = _emb_scan(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # the centroid model is the offline "training" artifact of an IVF
    # index — train once per (session, dataset) like a persisted index
    # would, probe many times
    key = (spark.sparkContext.applicationId, sf_dir, "ivfmodel")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = ivf_centroid_model(e, nlist=16)
    out = ivf_topk(e, q, k=10, nlist=16, nprobe=4, model=_IVF_MODEL_CACHE[key])
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


_SW_CACHE: dict[tuple[str, str], DataFrame] = {}


def q_weighted_jaccard(spark, sf_dir):
    """DF-weighted Jaccard rerank of the near-dup pairs
    (datapipe.dedup.weighted_jaccard_pairs): rare shingles count more than
    boilerplate; integer idf-quantized weights keep it deterministic. The
    corpus shingle-weight table is materialized once per session like the
    other shared inputs."""
    from rrdtool_1_x_spark.datapipe.dedup import (
        shingle_weight_frame,
        weighted_jaccard_pairs,
    )

    d = _docs(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _SW_CACHE:
        _SW_CACHE[key] = shingle_weight_frame(d, shingle_len=3).cache()
    pairs = _near_dup(spark, sf_dir).select("id_a", "id_b")
    out = weighted_jaccard_pairs(pairs, d, shingle_len=3, shingle_weights=_SW_CACHE[key])
    return out.select(
        "id_a", "id_b", F.round("wjaccard", 6).alias("wjaccard")
    ).orderBy("id_a", "id_b")


def q_repetition(spark, sf_dir):
    """Gopher-style repetition quality rules (datapipe.textstats.
    repetition_metrics): duplicate-line fraction + top word-bigram share,
    the public boilerplate/spam filters for training corpora."""
    from rrdtool_1_x_spark.datapipe.textstats import repetition_metrics

    d = _docs(spark, sf_dir)
    out = repetition_metrics(d)
    return out.select(
        "doc_id",
        F.round("dup_line_frac", 6).alias("dup_line_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    ).orderBy("doc_id")


def q_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprint (winnowing lite) in the portable
    md5 mode (datapipe.textstats.rolling_fingerprint)."""
    from rrdtool_1_x_spark.datapipe.textstats import rolling_fingerprint

    d = _docs(spark, sf_dir)
    return rolling_fingerprint(d, window=8, hash_fn="md5").orderBy("doc_id")


_GRAPH_MASK = 60.0  # error values above this plot as unknown (gap exercise)


def _graph_plots(spark, sf_dir):
    """Shared data_proc invocation for the graph_stack / graph_scale pair:
    AREA click / STACK masked-error / STACK purchase / LINE const /
    TICK signup over the pivoted 4h AVERAGE rollup."""
    from rrdtool_1_x_spark.plans.graph import GraphElement, data_proc

    c = _cdp(spark, sf_dir, "AVERAGE")
    wide = (
        c.groupBy("ts")
        .pivot("series_id", ["click", "error", "purchase", "signup"])
        .agg(F.first("value"))
        .withColumn(
            "error_m",
            F.when(F.col("error") <= _GRAPH_MASK, F.col("error")),
        )
    )
    return data_proc(
        wide,
        [
            GraphElement("AREA", "click", legend="click_area"),
            GraphElement("STACK", "error_m", legend="error_stack"),
            GraphElement("STACK", "purchase", legend="purchase_stack"),
            GraphElement("LINE", 50.0, legend="baseline"),
            GraphElement("TICK", "signup", legend="signup_tick"),
        ],
    )


def q_graph_stack(spark, sf_dir):
    """Graph data_proc value resolution (src/rrd_graph.c:1365-1471): stacked
    AREA chain with an unknown gap that keeps the paint base, a constant
    LINE, and a TICK."""
    plots, _ = _graph_plots(spark, sf_dir)
    return plots.select(
        "ts",
        *[
            F.round(n, 6).alias(n)
            for n in [
                "click_area",
                "error_stack",
                "purchase_stack",
                "baseline",
                "signup_tick",
            ]
        ],
    ).orderBy("ts")


def q_graph_scale(spark, sf_dir):
    """Graph autoscale bounds from data_proc (TICK and skipscale excluded)."""
    _, scale = _graph_plots(spark, sf_dir)
    return scale.select(
        F.round("value_min", 6).alias("value_min"),
        F.round("value_max", 6).alias("value_max"),
    )


def q_simhash_near_dup(spark, sf_dir):
    """Banded SimHash near-duplicate pairs (datapipe.dedup.
    simhash_near_duplicates): pigeonhole blocking over 4 16-bit blocks —
    lossless for hamming <= 3 — then one bit_count per candidate pair."""
    from rrdtool_1_x_spark.datapipe.dedup import simhash_near_duplicates

    d = _docs(spark, sf_dir)
    out = simhash_near_duplicates(d, max_hamming=3, blocks=4, hash_fn="md5")
    return out.select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")


def q_decontam_overlap(spark, sf_dir):
    """Benchmark decontamination (datapipe.decontam.contamination_pairs):
    8-gram exact-overlap pairs against a benchmark derived from every 50th
    document; the benchmark n-gram table is broadcast so the corpus scan is
    never shuffled."""
    from rrdtool_1_x_spark.datapipe.decontam import contamination_pairs

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = contamination_pairs(d, bench, n=8, min_overlap_frac=0.5)
    return out.select(
        "doc_id",
        "bench_id",
        "overlap_ngrams",
        "bench_ngrams",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    ).orderBy("doc_id", "bench_id")


def q_bloom_decontam(spark, sf_dir):
    """Bloom-prefiltered decontamination (datapipe.decontam.
    bloom_contamination_pairs): corpus n-grams probe a broadcast 64 Kbit
    md5 bitset (map-only), only survivors join the real benchmark table —
    no false negatives, so the output (and oracle) is IDENTICAL to
    decontam_overlap; only the plan changes."""
    from rrdtool_1_x_spark.datapipe.decontam import bloom_contamination_pairs

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    out = bloom_contamination_pairs(d, bench, n=8, min_overlap_frac=0.5)
    return out.select(
        "doc_id",
        "bench_id",
        "overlap_ngrams",
        "bench_ngrams",
        F.round("overlap_frac", 6).alias("overlap_frac"),
    ).orderBy("doc_id", "bench_id")


def q_hash_split(spark, sf_dir):
    """Deterministic train/val/test assignment (datapipe.sampling.hash_split):
    md5-keyed, map-only, stable under appends/retries/repartitioning."""
    from rrdtool_1_x_spark.datapipe.sampling import hash_split

    d = _docs(spark, sf_dir)
    out = hash_split(d, {"train": 0.8, "val": 0.1, "test": 0.1})
    return out.select("doc_id", "split").orderBy("doc_id")


def q_harmonic(spark, sf_dir):
    """HyperBall harmonic centrality (datapipe.graph.hyperball_harmonic;
    Boldi & Vigna 2014 — the algorithm behind CommonCrawl's published
    domain ranking) on the citation graph: one bit-exact HLL per node,
    balls grown by register-max along in-edges for 3 rounds, harmonic =
    Σ (|B_r|-|B_{r-1}|)/r over the deterministic estimates — the whole
    approximation hash-gates."""
    from rrdtool_1_x_spark.datapipe.graph import (
        domain_link_edges,
        hyperball_harmonic,
    )

    edges = domain_link_edges(_docs_url_variants(spark, sf_dir))
    return hyperball_harmonic(edges, n_iter=3).orderBy("node")


def q_triangles(spark, sf_dir):
    """Per-node triangle counts on the domain co-citation graph
    (datapipe.graph.cocitation_edges + triangle_counts; Suri &
    Vassilvitskii degree orientation): wedge build + wedge close as two
    shuffle joins, every triangle counted once at its smallest-rank
    vertex — the clustering-structure measurement for link graphs."""
    from rrdtool_1_x_spark.datapipe.graph import (
        cocitation_edges,
        domain_link_edges,
        triangle_counts,
    )

    edges = cocitation_edges(
        domain_link_edges(_docs_url_variants(spark, sf_dir))
    )
    return triangle_counts(edges).orderBy("node")


def q_cdc_dedup(spark, sf_dir):
    """Content-defined-chunking storage dedup report
    (datapipe.dedup.cdc_blocks / cdc_dedup_report; LBFS/FastCDC
    family): boundaries where the 4-token window hash starts with a
    zero nibble, block-hash dedup accounting — how much smaller the
    corpus gets under content-addressed storage."""
    from rrdtool_1_x_spark.datapipe.dedup import cdc_dedup_report

    return cdc_dedup_report(_docs(spark, sf_dir))


def q_group_split(spark, sf_dir):
    """Leakage-safe train/val/test split (datapipe.sampling.
    leakage_safe_split): every near-dup connected component is keyed by
    its representative (min id), so a whole dup group lands in one
    split by construction — the assignment that makes the split_leak
    audit come back empty for the exact/near-dup channel. Same md5
    assignment rule as hash_split, keyed on the representative."""
    from rrdtool_1_x_spark.datapipe.sampling import leakage_safe_split

    d = _docs(spark, sf_dir)
    out = leakage_safe_split(
        d, _near_dup(spark, sf_dir), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.orderBy("doc_id")


def q_stratified_sample(spark, sf_dir):
    """Per-language stratified sample of 20 docs in deterministic hash order
    (datapipe.sampling.stratified_sample)."""
    from rrdtool_1_x_spark.datapipe.sampling import stratified_sample

    d = _docs(spark, sf_dir)
    out = stratified_sample(d, ["lang"], 20)
    return out.select("doc_id", "lang").orderBy("doc_id")


def q_token_budget(spark, sf_dir):
    """Token-budget data mixing (datapipe.sampling.token_budget_sample):
    fill per-language token quotas in deterministic hash order — one
    shuffle on the group key, running totals via a window."""
    from rrdtool_1_x_spark.datapipe.sampling import token_budget_sample

    d = _docs(spark, sf_dir).withColumn(
        "token_cnt", F.size(F.split(F.trim("text"), r"\s+")).cast("long")
    )
    out = token_budget_sample(
        d, {"en": 2000, "de": 1000, "fr": 1500}, group_col="lang"
    )
    return out.select("doc_id", "lang", "token_cnt", "tokens_before").orderBy(
        "doc_id"
    )


def q_vocab_top(spark, sf_dir):
    """Corpus vocabulary: top-50 unigrams by document frequency
    (datapipe.decontam.vocab_top_ngrams)."""
    from rrdtool_1_x_spark.datapipe.decontam import vocab_top_ngrams

    d = _docs(spark, sf_dir)
    return vocab_top_ngrams(d, n=1, k=50).orderBy("rank")


def _pii_enriched(d):
    """documents text + deterministic doc_id-derived PII spans (the corpus
    itself is PII-free synthetic prose): doc_id%3 emails, doc_id%2 URLs,
    one IP, (doc_id+1)%2 phone numbers — so every count column varies and
    the redactor rewrites real matches. The oracle builds the identical
    string with || and repeat()."""
    did = F.col("doc_id").cast("string")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.repeat(
                F.concat(F.lit(" user"), did, F.lit("@mail.example.com")),
                (F.col("doc_id") % 3).cast("int"),
            ),
            F.repeat(
                F.concat(F.lit(" see http://ex.org/p/"), did),
                (F.col("doc_id") % 2).cast("int"),
            ),
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7"),
            F.repeat(
                F.lit(" call +1-555-0142 now"),
                ((F.col("doc_id") + 1) % 2).cast("int"),
            ),
        ).alias("text"),
    )


_CURATE_MIN_TOKENS = 40
_CURATE_QTHR = 0.55


def q_curate(spark, sf_dir):
    """Composed corpus curation (datapipe.pipeline.curate_corpus): quality
    + length rule → exact dedup → MinHash-LSH near-dup components →
    benchmark decontamination, one (doc_id, verdict) row per document."""
    from rrdtool_1_x_spark.datapipe.pipeline import curate_corpus

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return curate_corpus(
        d, benchmark=bench,
        quality_threshold=_CURATE_QTHR, min_tokens=_CURATE_MIN_TOKENS,
        nd_kwargs=_ND_KW,
    ).orderBy("doc_id")


def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction (datapipe.pii): per-class hit counts on
    the raw text and the md5 of the sequentially-redacted rewrite."""
    from rrdtool_1_x_spark.datapipe.pii import pii_metrics, redact_pii

    d = _pii_enriched(_docs(spark, sf_dir))
    out = redact_pii(pii_metrics(d))
    return out.select(
        "doc_id", "url_cnt", "email_cnt", "ipv4_cnt", "phone_cnt",
        "pii_total", F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"),
    ).orderBy("doc_id")


def q_unigram_logprob(spark, sf_dir):
    """Self-trained unigram-LM quality score (datapipe.textstats
    .unigram_logprob): mean token log-probability under the corpus's own
    unigram distribution — the cheap perplexity proxy."""
    from rrdtool_1_x_spark.datapipe.textstats import unigram_logprob

    d = _docs(spark, sf_dir)
    out = unigram_logprob(d)
    return out.select(
        "doc_id",
        F.round("unigram_logprob", 6).alias("unigram_logprob"),
        "token_cnt",
    ).orderBy("doc_id")


# --- library-only surfaces promoted to oracle gates (round 4): the
# incremental index append paths, the persisted-IVF probe path, the xport
# text formatter, and the daemon FETCH wire format. Each reuses an existing
# oracle (append composition / probe equivalence) or gets a printf oracle.


def q_band_index_topup(spark, sf_dir):
    """Incremental MinHash band index (datapipe.dedup.write_band_index /
    append_band_index): index the low-id half, append the high-id half;
    initial pairs ∪ the append's new pairs must equal the one-shot corpus
    pipeline — the oracle is near_dup_pairs' SQL verbatim."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.dedup import (
        append_band_index,
        minhash_near_duplicates,
        write_band_index,
    )

    d = _docs(spark, sf_dir)
    cut = int(d.agg(F.max("doc_id")).first()[0]) // 2
    first = d.filter(F.col("doc_id") <= cut)
    second = d.filter(F.col("doc_id") > cut)
    path = tempfile.mkdtemp(prefix="bandidx_")
    write_band_index(
        first, path, num_hashes=_ND_KW["num_hashes"], bands=_ND_KW["bands"],
        shingle_len=_ND_KW["shingle_len"],
    )
    initial = minhash_near_duplicates(first, **_ND_KW)
    new = append_band_index(
        second, path, num_hashes=_ND_KW["num_hashes"], bands=_ND_KW["bands"],
        shingle_len=_ND_KW["shingle_len"],
        jaccard_threshold=_ND_KW["jaccard_threshold"],
    )
    out = initial.select("id_a", "id_b", "jaccard").unionByName(
        new.select("id_a", "id_b", "jaccard")
    )
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")


def q_simhash_index_topup(spark, sf_dir):
    """Incremental SimHash index (datapipe.dedup.write_simhash_index /
    append_simhash_index): same split-append composition as the band index;
    the oracle is simhash_near_dup's SQL verbatim."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.dedup import (
        append_simhash_index,
        simhash_near_duplicates,
        write_simhash_index,
    )

    d = _docs(spark, sf_dir)
    cut = int(d.agg(F.max("doc_id")).first()[0]) // 2
    first = d.filter(F.col("doc_id") <= cut)
    second = d.filter(F.col("doc_id") > cut)
    path = tempfile.mkdtemp(prefix="simidx_")
    write_simhash_index(first, path, blocks=4, hash_fn="md5")
    initial = simhash_near_duplicates(first, max_hamming=3, blocks=4, hash_fn="md5")
    new = append_simhash_index(
        second, path, max_hamming=3, blocks=4, hash_fn="md5"
    )
    out = initial.select("id_a", "id_b", "hamming").unionByName(
        new.select("id_a", "id_b", "hamming")
    )
    return out.orderBy("id_a", "id_b")


def q_ivf_indexed_topk(spark, sf_dir):
    """Persisted-IVF probe path (datapipe.similarity.write_ivf_index /
    ivf_topk_indexed): the corpus written cell-partitioned, probes pruned
    at file-listing time — must return exactly what the inline ivf_topk
    (and its SQL oracle) returns."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        ivf_topk_indexed,
        write_ivf_index,
    )

    e = _emb_scan(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "ivfmodel")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = ivf_centroid_model(e, nlist=16)
    model = _IVF_MODEL_CACHE[key]
    path = tempfile.mkdtemp(prefix="ivfidx_") + "/index"
    write_ivf_index(e, path, model)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk_indexed(spark, path, q, model, k=10, nprobe=4)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
    ).orderBy("query_id", "rank")


def q_xport_fmt(spark, sf_dir):
    """The xport separated-values formatter itself (xport.to_csv ≙
    rrd_xport_format_sv, src/rrd_xport.c:614-706): the %.7e / "NaN" cell
    strings for a two-column window, parsed back as strings so the oracle
    (DuckDB printf) checks the exact formatted text."""
    from rrdtool_1_x_spark import xport as xp
    from rrdtool_1_x_spark.plans.graph import QueryResult

    c = _cdp(spark, sf_dir, "AVERAGE")
    both = c.filter(F.col("series_id").isin("click", "view"))
    wide = both.groupBy("ts").pivot("series_id", ["click", "view"]).agg(
        F.first("value")
    )
    lo, hi = both.agg(F.min("ts"), F.max("ts")).first()
    res = QueryResult(
        frame=wide, legends=["click", "view"], scalars={}, prints=[],
        start=int(lo), end=int(hi), step=int(_CDP_RES),
    )
    text = xp.to_csv(res)
    rows = []
    for line in text.splitlines()[1:]:  # header dropped
        t, a, b = line.rstrip("\r").split(",")
        rows.append((int(t), a.strip('"'), b.strip('"')))
    return spark.createDataFrame(
        rows, "ts long, click string, view string"
    ).orderBy("ts")


def q_xport_sink(spark, sf_dir):
    """The DISTRIBUTED xport CSV sink (xport.write_csv): executors render
    range-partitioned ordered text parts; concatenating them in name order
    must reproduce the driver-side formatter's exact rows — the oracle is
    xport_fmt's printf SQL verbatim."""
    import os
    import tempfile

    from rrdtool_1_x_spark import xport as xp
    from rrdtool_1_x_spark.plans.graph import QueryResult

    c = _cdp(spark, sf_dir, "AVERAGE")
    both = c.filter(F.col("series_id").isin("click", "view"))
    wide = both.groupBy("ts").pivot("series_id", ["click", "view"]).agg(
        F.first("value")
    )
    lo, hi = both.agg(F.min("ts"), F.max("ts")).first()
    res = QueryResult(
        frame=wide, legends=["click", "view"], scalars={}, prints=[],
        start=int(lo), end=int(hi), step=int(_CDP_RES),
    )
    out_dir = tempfile.mkdtemp(prefix="xsink_")
    xp.write_csv(res, out_dir)
    rows = []
    for p in sorted(os.listdir(f"{out_dir}/rows")):
        if not p.startswith("part-"):
            continue
        with open(f"{out_dir}/rows/{p}") as f:
            for line in f:
                t, a, b = line.rstrip("\r\n").split(",")
                rows.append((int(t), a.strip('"'), b.strip('"')))
    return spark.createDataFrame(
        rows, "ts long, click string, view string"
    ).orderBy("ts")


def q_daemon_fetch(spark, sf_dir):
    """The rrdcached FETCH wire format end-to-end (streaming.daemon
    DaemonServer/_fetch, src/rrd_daemon.c:2196-2206): the click series is
    ingested into a store, served over a real TCP socket, and the daemon's
    text rows parsed back — the oracle recomputes the padded PDP grid."""
    import tempfile

    from rrdtool_1_x_spark.catalog import DSDef, RRADef
    from rrdtool_1_x_spark.catalog import create as create_def
    from rrdtool_1_x_spark.sources.store import DatasetStore
    from rrdtool_1_x_spark.streaming.daemon import (
        DaemonClient,
        DaemonServer,
        IngestDaemon,
    )
    from rrdtool_1_x_spark.streaming.ingest import StreamingIngest

    s = _samples(spark, sf_dir).filter(F.col("series_id") == "click")
    pdp = _pdp(spark, sf_dir).filter(F.col("series_id") == "click")
    lo, hi = pdp.agg(F.min("ts"), F.max("ts")).first()
    dataset = create_def(
        "click", step=int(STEP),
        ds=[DSDef(name="v", dst="GAUGE", heartbeat=int(HB))],
        rra=[RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=200_000)],
        start=int(lo) - 1,
    )
    path = tempfile.mkdtemp(prefix="dstore_") + "/click"
    store = DatasetStore.create(spark, path, dataset)
    store.update(
        s.select("series_id", F.lit("v").alias("ds_name"), "ts", "value")
    )
    srv = DaemonServer(IngestDaemon(StreamingIngest(store), write_interval=1e9))
    srv.start()
    try:
        with DaemonClient(f"127.0.0.1:{srv.address[1]}") as c:
            # start/end land mid-step so the plan aligns to exactly
            # (lo - step, hi]: rows lo..hi inclusive
            _, _, _, _, rows = c.fetch(
                "click", "AVERAGE", int(lo) - int(STEP), int(hi) - 1
            )
    finally:
        srv.stop()
    import math

    parsed = [
        (float(t), None if math.isnan(v["v"]) else v["v"]) for t, v in rows
    ]
    # round in Spark (HALF_UP, like the oracle's round()) — Python's round
    # is banker's and diverges on ties
    return (
        spark.createDataFrame(parsed, "ts double, value double")
        .select("ts", F.round("value", 6).alias("value"))
        .orderBy("ts")
    )


def q_sql_source(spark, sf_dir):
    """The sql// pseudo-path source end-to-end (sources.external.
    sql_def_frame ≙ rrd_fetch_fn_libdbi, src/rrd_fetch_libdbi.c:446-786):
    a registered driver serves the click series' raw readings, the engine
    buckets them into hourly bins with the five derived columns; the
    oracle recomputes the same bucketing in SQL. Per-bin cardinality is
    tiny, so the float sums agree at the shared round(6)."""
    from rrdtool_1_x_spark.sources.external import (
        SQL_DRIVERS,
        parse_sql_path,
        sql_def_frame,
    )

    # the scaled-sweep corpora suffix the series ids (click_0, ...): pin
    # the lexicographically-first click series so the query works at any
    # replication factor while matching the oracle's 'click' at sf gates
    sid = (
        _samples(spark, sf_dir)
        .filter(F.col("series_id").startswith("click"))
        .agg(F.min("series_id"))
        .first()[0]
    )

    def drv(s, spec, start, end):
        base = _samples(s, sf_dir).filter(F.col("series_id") == sid)
        return base.select("ts", "value").filter(
            (F.col("ts") > start) & (F.col("ts") < end)
        )

    SQL_DRIVERS["entry_events"] = drv
    s = _samples(spark, sf_dir).filter(F.col("series_id") == sid)
    lo, hi = s.agg(F.min("ts"), F.max("ts")).first()
    spec = parse_sql_path("sql//entry_events/rrdminstepsize=3600//t/ts/v")
    out, *_ = sql_def_frame(spark, spec, int(lo), int(hi), 3600)
    return out.select(
        "ts",
        F.round("min", 6).alias("min_v"),
        F.round("avg", 6).alias("avg_v"),
        F.round("max", 6).alias("max_v"),
        F.col("count").alias("cnt"),
        F.round("sigma", 6).alias("sigma_v"),
    ).orderBy("ts")


def q_sql_derive(spark, sf_dir):
    """The sql// ``:derive`` flag (rate-from-counter conversion before
    bucketing, src/rrd_fetch_libdbi.c:660-700) through the bucketed-lag
    plan: the window partitions by time bucket with an exact boundary-row
    stitch instead of one global ORDER BY. Oracle recomputes the same lag
    arithmetic with SQL window functions."""
    from rrdtool_1_x_spark.sources.external import (
        SQL_DRIVERS,
        parse_sql_path,
        sql_def_frame,
    )

    # the scaled-sweep corpora suffix the series ids (click_0, ...): pin
    # the lexicographically-first click series so the query works at any
    # replication factor while matching the oracle's 'click' at sf gates
    sid = (
        _samples(spark, sf_dir)
        .filter(F.col("series_id").startswith("click"))
        .agg(F.min("series_id"))
        .first()[0]
    )

    def drv(s, spec, start, end):
        base = _samples(s, sf_dir).filter(F.col("series_id") == sid)
        return base.select("ts", "value").filter(
            (F.col("ts") > start) & (F.col("ts") < end)
        )

    SQL_DRIVERS["entry_events"] = drv
    s = _samples(spark, sf_dir).filter(F.col("series_id") == sid)
    lo, hi = s.agg(F.min("ts"), F.max("ts")).first()
    spec = parse_sql_path(
        "sql//entry_events/rrdminstepsize=3600/rrdderivemaxstep=86400//t/ts/v/derive"
    )
    out, *_ = sql_def_frame(spark, spec, int(lo), int(hi), 3600)
    return out.select(
        "ts",
        F.round("min", 6).alias("min_v"),
        F.round("avg", 6).alias("avg_v"),
        F.round("max", 6).alias("max_v"),
        F.col("count").alias("cnt"),
        F.round("sigma", 6).alias("sigma_v"),
    ).orderBy("ts")


def q_cb_source(spark, sf_dir):
    """The cb// callback source (sources.external.CallbackRegistry ≙
    rrd_fetch_cb_register, src/rrd_fetch_cb.c:8-150): a registered
    callable synthesizes a deterministic series for the requested range;
    the oracle is the same arithmetic over generate_series."""
    from rrdtool_1_x_spark.sources.external import CALLBACKS, fetch_pseudo

    def cb(s, start, end, step):
        n = (end - start) // step
        return s.range(n).select(
            F.lit("cb").alias("series_id"),
            F.lit("v").alias("ds_name"),
            (F.lit(float(start)) + (F.col("id") + 1) * step).cast("double").alias("ts"),
            F.round(
                F.sin(F.col("id") / F.lit(7.0)) * 100 + F.col("id") % 13, 6
            ).alias("value"),
        )

    CALLBACKS.register("cb//entry_sensor", cb)
    frame, *_ = fetch_pseudo(
        spark, "cb//entry_sensor", "v", 1_000_000, 1_086_400, 300
    )
    return frame.select("ts", F.col("value")).orderBy("ts")


# ------------------------------------------------------------------ contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → PDP normalize → 4h AVERAGE rollup → RPN chain."""
    sf_dir = "/root/testdata/sf0.001"
    c = _cdp(spark, sf_dir, "AVERAGE")
    ctx = RpnContext(ts=F.col("ts"), step=STEP * CDP_N, keys=KEYS)
    expr = compile_rpn("v,UN,0,v,IF,1.1,*", {"v": F.col("value")}, ctx)
    return c.select("series_id", "ts", F.round(expr, 6).alias("value")).orderBy(
        "series_id", "ts"
    )


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (datapipe.similarity.semantic_deduplicate; Abbas et al.
    2023): embedding-cluster-confined semantic dedup — every vector
    assigned to its nearest md5-sampled centroid cell, dropped iff a
    lower-id cellmate clears cosine 0.2. Assignment is a shuffle-free map
    over inlined centroid literals; the quadratic work never leaves a
    cell (Arrow per-cell GEMM with exact-fold guard band)."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ivf_centroid_model,
        semantic_deduplicate,
    )

    e = _emb_scan(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "ivfmodel")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = ivf_centroid_model(e, nlist=16)
    out = semantic_deduplicate(
        e, threshold=0.2, nlist=16, model=_IVF_MODEL_CACHE[key]
    )
    return out.orderBy("vec_id")


def q_bpe_tokens(spark, sf_dir):
    """BPE-pre-tokenizer counting (datapipe.textstats.bpe_token_stats):
    the GPT-2 split rule's piece count per document next to the
    whitespace count and the chars-per-token compression signal.
    Map-only — two regexp_count projections inside the scan."""
    from rrdtool_1_x_spark.datapipe.textstats import bpe_token_stats

    return bpe_token_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def q_bigram_logprob(spark, sf_dir):
    """Interpolated bigram-LM quality score (datapipe.textstats
    .bigram_logprob): mean log P(w2|w1) = 0.75*c12/c1 + 0.25*c2/N under
    the corpus's own counts — the transition-aware rung above the
    unigram proxy; integer-quantized for order-independence."""
    from rrdtool_1_x_spark.datapipe.textstats import bigram_logprob

    out = bigram_logprob(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.round("bigram_logprob", 6).alias("bigram_logprob"),
        "bigram_cnt",
    ).orderBy("doc_id")


def _rot_emb(spark, sf_dir):
    """Hadamard-rotated embeddings (integer-exact), cached like the other
    offline artifacts: rotate once per (session, dataset), query many."""
    from rrdtool_1_x_spark.datapipe.similarity import hadamard_rotate

    key = (spark.sparkContext.applicationId, sf_dir, "rotemb")
    if key not in _TBL_CACHE:
        r = hadamard_rotate(_emb(spark, sf_dir))
        _TBL_CACHE[key] = r.select(
            "vec_id", F.col("rvec").alias("embedding")
        ).cache()
    return _TBL_CACHE[key]


def q_sketch_stream(spark, sf_dir):
    """Streaming HLL maintenance (streaming.datapipe_stream
    .start_sketch_stream): the documents table as a 3-batch file stream,
    each micro-batch max-merging its register frame into the stored
    sketch through foreachBatch — after the drain the stored registers
    EQUAL the batch one-shot sketch (merge idempotence), so the oracle is
    hll_index_topup's estimate SQL."""
    import shutil
    import tempfile

    from rrdtool_1_x_spark.datapipe.sketch import hll_index_distinct
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_sketch_stream,
    )

    work = tempfile.mkdtemp(prefix="sketchstream_")
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    src = f"{work}/in"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(2).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .select(
            "source",
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("tok"),
        )
    )
    q = start_sketch_stream(
        stream, f"{work}/regs", f"{work}/ck", "tok", ["source"]
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("sketch_stream drain exceeded 600s")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return hll_index_distinct(spark, f"{work}/regs").orderBy("source")


def q_logq_stream(spark, sf_dir):
    """Streaming quantile-sketch maintenance (streaming.datapipe_stream
    .start_quantile_stream): per-doc token counts as a 3-batch file
    stream, each micro-batch summing its bucket counts into the stored
    sketch through foreachBatch snapshot commits (snap_<batch_id>
    recomputed from its predecessor — idempotent under at-least-once
    replay, unlike a naive read-add-overwrite). The drained sketch
    EQUALS the batch one-shot and the oracle is logq_quantiles' SQL
    verbatim. Closes the quantile member under streams the way
    sketch_stream closes HLL."""
    import shutil
    import tempfile

    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        quantile_stream_quantiles,
        start_quantile_stream,
    )

    work = tempfile.mkdtemp(prefix="logqstream_")
    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    src = f"{work}/in"
    for i in range(3):
        docs.filter(F.col("doc_id") % 3 == i).coalesce(2).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, source string, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
        .select(
            "source",
            F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
            .cast("long")
            .alias("v"),
        )
    )
    q = start_quantile_stream(
        stream, f"{work}/sk", f"{work}/ck", "v", ["source"]
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("logq_stream drain exceeded 600s")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return quantile_stream_quantiles(spark, f"{work}/sk").orderBy("source")


def q_cms_index_topup(spark, sf_dir):
    """Persisted+incremental Count-Min table (datapipe.sketch
    .write_cms_table / append_cms_table / cms_index_estimate): counters
    merge ADDITIVELY (the linearity the CM guarantee rests on), so
    index-then-append equals the one-shot sketch and the oracle is
    cms_topk's SQL verbatim."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.sketch import (
        append_cms_table,
        cms_index_estimate,
        write_cms_table,
    )

    d = _docs(spark, sf_dir)
    toks = F.explode(
        F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        )
    ).alias("tok")
    e = d.select("doc_id", toks)
    cut = int(d.agg(F.max("doc_id")).first()[0]) // 2
    path = tempfile.mkdtemp(prefix="cmsidx_")
    write_cms_table(e.filter(F.col("doc_id") <= cut), path, F.col("tok"))
    append_cms_table(e.filter(F.col("doc_id") > cut), path, F.col("tok"))
    cand = (
        e.groupBy("tok")
        .agg(F.count("*").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("tok"))
        .limit(20)
    )
    return (
        cms_index_estimate(spark, path, cand, "tok")
        .select(
            "tok",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("n_exact"), F.asc("tok"))
    )


def q_hll_index_topup(spark, sf_dir):
    """Persisted+incremental HLL registers (datapipe.sketch
    .write_hll_registers / append_hll_registers / hll_index_distinct):
    index the low-id docs' tokens, append the high-id batch, estimate
    from the stored registers — register max-merge is idempotent and
    associative, so index-then-append equals the one-shot sketch; the
    oracle is hll_distinct's estimate SQL."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.sketch import (
        append_hll_registers,
        hll_index_distinct,
        write_hll_registers,
    )

    d = _docs(spark, sf_dir)
    e = d.select(
        "doc_id", "source",
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    cut = int(d.agg(F.max("doc_id")).first()[0]) // 2
    path = tempfile.mkdtemp(prefix="hllidx_")
    write_hll_registers(
        e.filter(F.col("doc_id") <= cut), path, F.col("tok"), ["source"]
    )
    append_hll_registers(
        e.filter(F.col("doc_id") > cut), path, F.col("tok"), ["source"]
    )
    return hll_index_distinct(spark, path).orderBy("source")


def q_kmv_index_topup(spark, sf_dir):
    """Persisted+incremental KMV synopsis (datapipe.sketch
    .write_kmv_synopsis / append_kmv_synopsis / kmv_index_distinct):
    index the low-id docs' shingles, append the high-id batch, query the
    stored synopses — the KMV merge theorem makes index-then-append equal
    the one-shot build, so the oracle is kmv_distinct's SQL verbatim."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.dedup import _shingle_array
    from rrdtool_1_x_spark.datapipe.sketch import (
        append_kmv_synopsis,
        kmv_index_distinct,
        write_kmv_synopsis,
    )

    d = _docs(spark, sf_dir)
    sh = d.select(
        "doc_id", "source",
        F.explode(_shingle_array(F.col("text"), 3)).alias("s"),
    )
    cut = int(d.agg(F.max("doc_id")).first()[0]) // 2
    path = tempfile.mkdtemp(prefix="kmvidx_")
    write_kmv_synopsis(
        sh.filter(F.col("doc_id") <= cut), path, F.col("s"), ["source"]
    )
    append_kmv_synopsis(
        sh.filter(F.col("doc_id") > cut), path, F.col("s"), ["source"]
    )
    return kmv_index_distinct(spark, path).orderBy("source")


def q_rot_pq_topk(spark, sf_dir):
    """Rotated product quantization (datapipe.similarity.hadamard_rotate
    + pq_topk): the deterministic structured-rotation member of the OPQ
    family (Ge et al. CVPR 2013) — H·D over int8-quantized vectors mixes
    every coordinate into every subspace before the 8x16 PQ; rotation is
    integer-exact so the full ADC ranking hash-gates."""
    from rrdtool_1_x_spark.datapipe.similarity import pq_codebook, pq_topk

    rc = _rot_emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "rotpqbook")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = pq_codebook(rc, m=8, codes=16)
    q = rc.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return pq_topk(
        rc, q, k=10, m=8, codes=16, codebook=_IVF_MODEL_CACHE[key]
    ).orderBy("query_id", "rank")


def q_rot_pq_recall(spark, sf_dir):
    """Recall@10 of the rotated-PQ ADC scan vs the int8 brute-force
    baseline — both sides over the rotated frame (H·D preserves the
    cosine ranking exactly: dots scale by dim, norms by sqrt(dim)).
    Honest regime note (BASELINE.md): on these isotropic synthetic
    embeddings raw PQ edges out the rotation; rotation wins 1.5x when
    variance concentrates in few dimensions (pytest-pinned), the Ge et
    al. precondition."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ann_recall,
        pq_topk,
        quantized_topk,
    )

    rc = _rot_emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "rotpqbook")
    if key not in _IVF_MODEL_CACHE:
        from rrdtool_1_x_spark.datapipe.similarity import pq_codebook

        _IVF_MODEL_CACHE[key] = pq_codebook(rc, m=8, codes=16)
    q = rc.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    approx = pq_topk(
        rc, q, k=10, m=8, codes=16, codebook=_IVF_MODEL_CACHE[key]
    )
    exact = quantized_topk(rc, q, k=10, query_id_col="query_id")
    return ann_recall(approx, exact, k=10).orderBy("query_id")


def _opq_emb(spark, sf_dir):
    """OPQ-allocated embeddings: the learned variance-balancing
    permutation trained once per (session, dataset) — offline model
    artifact like the IVF/PQ models — applied as a map-only gather."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        opq_dim_allocation,
        opq_permute,
    )

    key = (spark.sparkContext.applicationId, sf_dir, "opqemb")
    if key not in _TBL_CACHE:
        e = _emb(spark, sf_dir)
        mkey = (spark.sparkContext.applicationId, sf_dir, "opqperm")
        if mkey not in _IVF_MODEL_CACHE:
            _IVF_MODEL_CACHE[mkey] = opq_dim_allocation(e, m=8)
        _TBL_CACHE[key] = opq_permute(e, _IVF_MODEL_CACHE[mkey]).cache()
    return _TBL_CACHE[key]


def q_opq_topk(spark, sf_dir):
    """Optimized product quantization, learned-allocation member
    (datapipe.similarity.opq_dim_allocation + opq_permute + pq_topk; Ge
    et al. CVPR 2013 §4.2 eigenvalue allocation under a diagonal
    covariance model): per-dimension exact integer corpus variances,
    snake-dealt into subspaces so quantization error balances, then the
    standard 8x16 ADC chain over the permuted frame. The permutation is
    an orthogonal transform and all arithmetic stays integer, so the
    full LEARNED pipeline — training statistics included — hash-gates
    against the DuckDB oracle."""
    from rrdtool_1_x_spark.datapipe.similarity import pq_codebook, pq_topk

    pe = _opq_emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "opqbook")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = pq_codebook(pe, m=8, codes=16)
    q = pe.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return pq_topk(
        pe, q, k=10, m=8, codes=16, codebook=_IVF_MODEL_CACHE[key]
    ).orderBy("query_id", "rank")


def q_opq_recall(spark, sf_dir):
    """Recall@10 of the OPQ-allocated ADC scan vs the int8 brute-force
    baseline, both over the permuted frame (a permutation preserves the
    cosine ranking exactly, so the exact side equals the unrotated
    truth). Regime note (BASELINE.md): allocation is a no-op-cost win
    when the corpus concentrates variance in adjacent dimensions (the
    pytest-pinned regime); on isotropic synthetic embeddings it ties
    raw PQ — it can never do worse than a random layout because the
    layout is balanced BY the measured variances."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        ann_recall,
        pq_codebook,
        pq_topk,
        quantized_topk,
    )

    pe = _opq_emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "opqbook")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = pq_codebook(pe, m=8, codes=16)
    q = pe.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    approx = pq_topk(
        pe, q, k=10, m=8, codes=16, codebook=_IVF_MODEL_CACHE[key]
    )
    exact = quantized_topk(pe, q, k=10, query_id_col="query_id")
    return ann_recall(approx, exact, k=10).orderBy("query_id")


def q_opq_ivfpq_topk(spark, sf_dir):
    """The composed retrieval stack: OPQ learned allocation -> IVF cell
    probe -> PQ ADC scoring (datapipe.similarity.opq_permute +
    ivfpq_topk) — the full FAISS-style OPQ,IVF,PQ index expressed as
    dataflow, every stage integer-exact so the composition hash-gates
    end-to-end. Pins that the learned layout composes with cell pruning
    (at 100 TB: permute once at ingest, then IVFADC scans only probed
    cells' 4-byte codes)."""
    from rrdtool_1_x_spark.datapipe.similarity import ivfpq_topk

    pe = _opq_emb(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, "opqbook")
    if key not in _IVF_MODEL_CACHE:
        from rrdtool_1_x_spark.datapipe.similarity import pq_codebook

        _IVF_MODEL_CACHE[key] = pq_codebook(pe, m=8, codes=16)
    q = pe.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return ivfpq_topk(
        pe, q, k=10, m=8, codes=16, codebook=_IVF_MODEL_CACHE[key]
    ).orderBy("query_id", "rank")


def q_rank_metrics(spark, sf_dir):
    """Ranked-retrieval eval triple (datapipe.similarity.ranking_metrics;
    Järvelin & Kekäläinen TOIS 2002): recall@10 / MRR@10 / NDCG@10 of
    the PQ ADC ranking against the int8 brute-force baseline. Position
    discounts are Python-precomputed micro-unit integers inlined in
    BOTH plans, so the DCG sums are exact and each metric is one
    correctly-rounded division."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        _pq_adc_topk,
        _qcos_topk,
        ranking_metrics,
    )

    e = _emb(spark, sf_dir)
    q = e.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    # one shared corpus quantization pass for both methods — see
    # _pq_exact_encode
    enc = _pq_exact_encode(e, _pq_book(spark, sf_dir, e))
    approx = _pq_adc_topk(
        enc.select("vec_id", "codes"), q, _pq_book(spark, sf_dir, e),
        10, "vec_id", "embedding", "query_id",
    )
    exact = _qcos_topk(
        enc.select("vec_id", "qvec", "_na2"), q, k=10,
        id_col="vec_id", vec_col="embedding", query_id_col="query_id",
    )
    return ranking_metrics(approx, exact, k=10).orderBy("query_id")


def q_opq_index_topup(spark, sf_dir):
    """Frozen OPQ model + append (the pq_index_topup discipline applied
    to the LEARNED member): allocation AND codebook train only on the
    initially-indexed subset (vec_id % 5 != 0); appended vectors are
    permuted and encoded under that frozen model, so the topped-up scan
    equals the oracle that re-derives training from the same subset.
    Pins the offline-train / online-append contract for learned
    quantizers."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        opq_dim_allocation,
        opq_permute,
        pq_codebook,
        pq_topk,
    )

    e = _emb(spark, sf_dir)
    mkey = (spark.sparkContext.applicationId, sf_dir, "opqsubmodel")
    if mkey not in _IVF_MODEL_CACHE:
        base = e.filter(F.col("vec_id") % 5 != 0)
        perm = opq_dim_allocation(base, m=8)
        book = pq_codebook(opq_permute(base, perm), m=8, codes=16)
        _IVF_MODEL_CACHE[mkey] = (perm, book)
    perm, book = _IVF_MODEL_CACHE[mkey]
    pe = opq_permute(e, perm)
    q = pe.orderBy("vec_id").limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return pq_topk(pe, q, k=10, m=8, codes=16, codebook=book).orderBy(
        "query_id", "rank"
    )


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-shingle estimate per source (datapipe.sketch
    .kmv_distinct; Beyer et al. SIGMOD 2007): k=128 smallest 60-bit
    md5 hashes, est = (k-1)*2^60/h_k — the mergeable distinct sketch
    that, unlike HLL, also supports intersection algebra."""
    from rrdtool_1_x_spark.datapipe.dedup import _shingle_array
    from rrdtool_1_x_spark.datapipe.sketch import kmv_distinct

    d = _docs(spark, sf_dir)
    sh = d.select(
        "source", F.explode(_shingle_array(F.col("text"), 3)).alias("s")
    )
    return kmv_distinct(sh, F.col("s"), ["source"]).orderBy("source")


def q_kmv_overlap(spark, sf_dir):
    """Pairwise source overlap estimated from KMV synopses alone
    (datapipe.sketch.kmv_source_overlap; Beyer et al. §4 rho estimator):
    union/intersection/Jaccard per source pair from groups²·k synopsis
    rows — constant in corpus size, the scalable companion of the exact
    `source_overlap` shingle-join matrix."""
    from rrdtool_1_x_spark.datapipe.dedup import _shingle_array
    from rrdtool_1_x_spark.datapipe.sketch import kmv_source_overlap

    d = _docs(spark, sf_dir)
    sh = d.select(
        "source", F.explode(_shingle_array(F.col("text"), 3)).alias("s")
    )
    return kmv_source_overlap(sh, F.col("s"), "source").orderBy(
        "src_a", "src_b"
    )


def q_zorder_events(spark, sf_dir):
    """Z-order (Morton) clustering key (datapipe.layout.zorder_expr):
    bit-interleave of the bucketized (user_id, event-minute) pair — the
    Delta/Iceberg Z-ORDER layout key that makes parquet min/max stats
    prune 2-D range queries. First 50 events in z-order; all shift/mask
    integer arithmetic, engine-portable."""
    from rrdtool_1_x_spark.datapipe.layout import zorder_expr

    ev = _events_us(spark, sf_dir)
    z = zorder_expr("(user_id & 1023)", "((tus DIV 60000000) & 1023)", bits=10)
    return (
        ev.select(
            "event_id",
            "user_id",
            F.expr("(tus DIV 60000000) & 1023").alias("minute_b"),
            z.alias("zval"),
        )
        .orderBy("zval", "event_id")
        .limit(50)
    )


def q_hilbert_events(spark, sf_dir):
    """Hilbert-curve clustering key (datapipe.layout.with_hilbert): the
    same (user_id, event-minute) bucket pair as zorder_events, indexed
    along the order-10 Hilbert curve instead of Morton — no quadrant
    jumps, so 2-D boxes splinter into fewer key intervals at the same
    bit budget (rowgroup pruning measured in BASELINE.md). The per-level
    rotate/flip recurrence is unrolled into codegen projections (one per
    curve level); the oracle runs the identical recurrence as a
    recursive CTE."""
    from rrdtool_1_x_spark.datapipe.layout import with_hilbert

    ev = _events_us(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.expr("(tus DIV 60000000) & 1023").alias("minute_b"),
    )
    return (
        with_hilbert(ev, "(user_id & 1023)", "minute_b", 10, "hval")
        .orderBy("hval", "event_id")
        .limit(50)
    )


def q_source_kl(spark, sf_dir):
    """Per-source unigram KL divergence from the corpus (datapipe
    .textstats.source_kl_divergence) — the domain-drift monitor DoReMi-
    style reweighting reads. Laplace-smoothed over the corpus vocab,
    micro-nat integer logs (the unigram_logprob convention), absent-
    token mass in closed form so groups only pay for tokens they
    contain; the exact integer numerator kl_micro rides along so the
    gate pins arithmetic, not float folding."""
    from rrdtool_1_x_spark.datapipe.textstats import source_kl_divergence

    return source_kl_divergence(_docs(spark, sf_dir)).orderBy("source")


def q_shard_balance(spark, sf_dir):
    """Weight-balanced shard packing (datapipe.sampling.balanced_shards;
    LPT/snake-deal, Graham 1969): documents ranked by (token count
    DESC, id) snake-dealt into 16 shards. Gate output is the per-shard
    packing digest (n_docs, total/min/max tokens) — any assignment
    deviation moves a shard total."""
    from rrdtool_1_x_spark.datapipe.sampling import balanced_shards

    d = _docs(spark, sf_dir)
    wd = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    out = balanced_shards(wd, num_shards=16, weight_col="n_tokens")
    return (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("weight").cast("long").alias("total_tokens"),
            F.min("weight").alias("min_tokens"),
            F.max("weight").alias("max_tokens"),
        )
        .orderBy("shard")
    )


def q_winnow_index_topup(spark, sf_dir):
    """Persisted winnowing index + append (datapipe.textstats
    .write_winnow_index / append_winnow_index / winnow_index_overlap):
    fingerprints from docs with doc_id % 5 != 0, the % 5 == 0 batch
    appended — winnowing is per-document so the merge law is set UNION
    and the topped-up index's match report equals the one-shot
    winnow_overlap verbatim (the oracle)."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.textstats import (
        append_winnow_index,
        winnow_index_overlap,
        write_winnow_index,
    )

    d = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="winnowidx_")
    write_winnow_index(d.filter(F.col("doc_id") % 5 != 0), path, k=4, w=4)
    append_winnow_index(d.filter(F.col("doc_id") % 5 == 0), path, k=4, w=4)
    return winnow_index_overlap(
        spark, path, min_shared=3, max_fp_docs=64
    ).orderBy("id_a", "id_b")


def q_logq_quantiles(spark, sf_dir):
    """Relative-error quantile sketch (datapipe.sketch.logq_sketch /
    logq_quantiles; the binary-bucket member of the DDSketch family,
    Masson et al. VLDB 2019): per-source p50/p90/p99 of document token
    counts off a <= ~1k-bucket frame — 16 sub-buckets per octave, 1/16
    one-sided relative error, bucket index from integer bit arithmetic
    (length(bin(v))), never a float log. Completes the persisted sketch
    algebra: distinct (HLL/KMV), frequency (CMS), quantiles (this)."""
    from rrdtool_1_x_spark.datapipe.sketch import logq_quantiles, logq_sketch

    d = _docs(spark, sf_dir)
    wd = d.select(
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("v"),
    )
    sk = logq_sketch(wd, F.col("v"), ["source"])
    return logq_quantiles(sk, group_cols=["source"]).orderBy("source")


def q_logq_index_topup(spark, sf_dir):
    """Persisted quantile sketch + append (datapipe.sketch
    .write_logq_sketch / append_logq_sketch / logq_index_quantiles):
    build from docs with doc_id % 5 != 0, fold in the % 5 == 0 batch —
    bucket-count ADDITION is exact linearity, so the topped-up index
    answers identically to the one-shot sketch (oracle =
    logq_quantiles' SQL verbatim)."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.sketch import (
        append_logq_sketch,
        logq_index_quantiles,
        write_logq_sketch,
    )

    d = _docs(spark, sf_dir)
    wd = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("v"),
    )
    path = tempfile.mkdtemp(prefix="logqidx_")
    write_logq_sketch(
        wd.filter(F.col("doc_id") % 5 != 0), path, F.col("v"), ["source"]
    )
    append_logq_sketch(
        wd.filter(F.col("doc_id") % 5 == 0), path, F.col("v"), ["source"]
    )
    return logq_index_quantiles(spark, path).orderBy("source")


def q_rouge_pairs(spark, sf_dir):
    """Clipped bigram P/R/F1 pair scoring (datapipe.textstats
    .ngram_f1_pairs; ROUGE-2 / BLEU modified precision): every 13th doc
    scored against its own first-2/3 truncated copy (high recall-side
    overlap — the partial eval-copy shape) AND against the NEXT 13th
    doc's truncated copy (the unrelated control). The neighbor pairing
    rides a row_number over the ~40-row selection frame, never the
    corpus."""
    from rrdtool_1_x_spark.datapipe.textstats import ngram_f1_pairs

    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    sel = d.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        F.lower(F.trim(F.col("text"))).alias("orig"),
        F.concat_ws(
            " ",
            F.slice(
                toks,
                1,
                F.greatest(
                    F.expr("(2 * size(split(lower(trim(text)), '\\\\s+')))"
                           " DIV 3"),
                    F.lit(1),
                ),
            ),
        ).alias("cut"),
    )
    w = Window.orderBy("doc_id")
    rk = sel.withColumn("_r", F.row_number().over(w))
    nxt = rk.select(
        (F.col("_r") - 1).alias("_r"),
        F.col("doc_id").alias("_nid"),
        F.col("cut").alias("_ncut"),
    )
    both = rk.join(nxt, "_r")  # row r paired with row r+1
    pairs = (
        sel.select(
            F.col("doc_id").alias("id_a"),
            F.col("orig").alias("text_a"),
            F.col("doc_id").alias("id_b"),
            F.col("cut").alias("text_b"),
        )
        .unionByName(
            both.select(
                F.col("doc_id").alias("id_a"),
                F.col("orig").alias("text_a"),
                F.col("_nid").alias("id_b"),
                F.col("_ncut").alias("text_b"),
            )
        )
    )
    return ngram_f1_pairs(pairs, n=2).orderBy("id_a", "id_b")


def q_priority_sample(spark, sf_dir):
    """Priority sampling (datapipe.sampling.priority_sample; Duffield,
    Lund & Thorup JACM 2007): per-source bottom-8 by floor-quantized
    inverse priority (h+1) DIV n_tokens — the length-biased document
    draw a token-budget mix samples with. All-BIGINT ranking, so the
    learned sample hash-gates exactly."""
    from rrdtool_1_x_spark.datapipe.sampling import priority_sample

    d = _docs(spark, sf_dir)
    wd = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.lower(F.trim(F.col("text"))), r"\s+"))
        .cast("long")
        .alias("n_tokens"),
    )
    return (
        priority_sample(
            wd, k=8, weight_col="n_tokens", strata_cols=["source"]
        )
        .select("source", "doc_id", "n_tokens", "prio_rank")
        .orderBy("source", "prio_rank")
    )


def q_winnow_fp(spark, sf_dir):
    """Winnowing fingerprints (datapipe.textstats.winnow_fingerprints;
    Schleimer/Wilkerson/Aiken SIGMOD 2003, the MOSS algorithm): 4-token
    gram hashes, window 4, rightmost-min selection. Gate output is the
    per-document fingerprint-set digest (count, mod-p sum, min, max over
    the 60-bit fps) — any deviation in the tie rule or window bounds
    changes selected sets and breaks the digest."""
    from rrdtool_1_x_spark.datapipe.textstats import winnow_fingerprints

    fp = winnow_fingerprints(_docs(spark, sf_dir), k=4, w=4)
    p = F.lit(1000000007)
    return (
        fp.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fp"),
            (F.sum(F.col("fp") % p) % p).cast("long").alias("fp_mod_sum"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
        .orderBy("doc_id")
    )


def q_winnow_overlap(spark, sf_dir):
    """MOSS match report (datapipe.textstats.winnow_overlap): document
    pairs sharing >= 3 winnowing fingerprints — local plagiarism
    evidence the per-doc global-min fingerprint cannot give. Hot
    fingerprints (> 64 docs) are dropped before the self-join (the LSH
    hot-bucket cap discipline)."""
    from rrdtool_1_x_spark.datapipe.textstats import winnow_overlap

    return winnow_overlap(
        _docs(spark, sf_dir), k=4, w=4, min_shared=3, max_fp_docs=64
    ).orderBy("id_a", "id_b")


def q_edit_near_dup(spark, sf_dir):
    """Edit-distance near-duplicate pairs (datapipe.dedup
    .edit_near_duplicates): prefix-blocked candidates (24 chars, 256-cap)
    then Levenshtein within a 20%-of-length budget, over the corpus
    deterministically enriched with suffix-variant copies — the
    character-exact verifier the shingle-based dedup tier can't express."""
    from rrdtool_1_x_spark.datapipe.dedup import edit_near_duplicates

    d = _docs(spark, sf_dir)
    variants = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" v"), (F.col("doc_id") % 3).cast("string")
        ).alias("text"),
    )
    enriched = d.select("doc_id", "text").unionByName(variants)
    return edit_near_duplicates(enriched).orderBy("id_a", "id_b")


def q_minhash_decontam(spark, sf_dir):
    """Fuzzy decontamination (datapipe.decontam
    .minhash_contamination_pairs): MinHash-estimated Jaccard between the
    corpus and a truncated-copy benchmark (every 17th doc cut to its
    first 2/3 of tokens — the paraphrased/partial eval-copy shape exact
    n-gram overlap misses); LSH band candidates, signature-agreement
    estimate, flag at >= 0.5."""
    from rrdtool_1_x_spark.datapipe.decontam import minhash_contamination_pairs

    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pre = d.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"), toks.alias("_tk")
    )
    bench = pre.select(
        "bench_id",
        F.concat_ws(
            " ",
            F.slice(
                F.col("_tk"),
                F.lit(1),
                F.greatest(
                    F.floor(F.size("_tk") * 2 / 3).cast("int"), F.lit(1)
                ),
            ),
        ).alias("text"),
    )
    handle: list = []
    out = minhash_contamination_pairs(d, bench, unpersist_handle=handle)
    _hold_app_persist(spark, sf_dir, "mc_sigs", handle)
    return out.orderBy("doc_id", "bench_id")


def q_cluster_keywords(spark, sf_dir):
    """Cluster naming (datapipe.similarity.ivf_assign + datapipe.report
    .cluster_keywords): hashed-embedding IVF cells over raw text, then
    each cell's top-5 terms by cluster-level tf-idf — the profile a
    curator reads to know what an unsupervised cluster IS. Shares the
    cached model with text_semantic_dedup (same featurization, same
    cells)."""
    from rrdtool_1_x_spark.datapipe.report import cluster_keywords
    from rrdtool_1_x_spark.datapipe.similarity import (
        hashed_embedding,
        ivf_assign,
        ivf_centroid_model,
    )

    d = _docs(spark, sf_dir)
    emb = hashed_embedding(d, dim=64).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    key = (spark.sparkContext.applicationId, sf_dir, "textsem")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = ivf_centroid_model(emb, nlist=8)
    assign = ivf_assign(emb, _IVF_MODEL_CACHE[key]).select(
        F.col("vec_id").alias("doc_id"), "cell"
    )
    return cluster_keywords(d, assign, k=5).orderBy("cell", "rank")


def q_decontam_spans(spark, sf_dir):
    """Span-level decontamination (datapipe.decontam
    .remove_contaminated_spans): every 8-token window shared verbatim
    with the truncated-copy benchmark is excised (coverage union), the
    rest of the document survives — the surgical alternative to
    decontaminate()'s whole-doc drop. Benchmark window hashes broadcast;
    detection is a map-side semi join over the corpus scan."""
    from rrdtool_1_x_spark.datapipe.decontam import remove_contaminated_spans

    d = _docs(spark, sf_dir)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    pre = d.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("bench_id"), toks.alias("_tk")
    )
    bench = pre.select(
        "bench_id",
        F.concat_ws(
            " ",
            F.slice(
                F.col("_tk"),
                F.lit(1),
                F.greatest(
                    F.floor(F.size("_tk") * 2 / 3).cast("int"), F.lit(1)
                ),
            ),
        ).alias("text"),
    )
    return remove_contaminated_spans(
        d.select("doc_id", "text"), bench, n=8
    ).orderBy("doc_id")


def q_oov_rate(spark, sf_dir):
    """Common-word coverage filter (datapipe.textstats.oov_rate): share
    of token occurrences absent from the corpus's top-100 vocabulary —
    the CCNet/fastText-prep junk signal. Vocabulary boundary tie-breaks
    on the token string so the gate is deterministic."""
    from rrdtool_1_x_spark.datapipe.textstats import oov_rate

    return oov_rate(_docs(spark, sf_dir), vocab_size=100).orderBy("doc_id")


def q_kn_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM score (datapipe.textstats
    .kneser_ney_bigram; Kneser & Ney 1995): absolute discount D=0.75 with
    the continuation-count backoff distribution — the proper-smoothing
    rung above the fixed-lambda `bigram_logprob`; integer-quantized for
    order-independence."""
    from rrdtool_1_x_spark.datapipe.textstats import kneser_ney_bigram

    out = kneser_ney_bigram(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        F.round("kn_logprob", 6).alias("kn_logprob"),
        "bigram_cnt",
    ).orderBy("doc_id")


def q_text_semantic_dedup(spark, sf_dir):
    """Composition gate: hashed_embedding -> semantic_deduplicate — the
    full no-model semantic-dedup pipeline over raw TEXT (featurize with
    the hashing trick, then SemDeDup over the md5-sampled cells). Proves
    the featurization output plugs into the similarity machinery
    unchanged; the oracle chains both operators' SQL."""
    from rrdtool_1_x_spark.datapipe.similarity import (
        hashed_embedding,
        ivf_centroid_model,
        semantic_deduplicate,
    )

    emb = hashed_embedding(_docs(spark, sf_dir), dim=64).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    key = (spark.sparkContext.applicationId, sf_dir, "textsem")
    if key not in _IVF_MODEL_CACHE:
        _IVF_MODEL_CACHE[key] = ivf_centroid_model(emb, nlist=8)
    out = semantic_deduplicate(
        emb, threshold=0.8, model=_IVF_MODEL_CACHE[key]
    )
    return out.orderBy("vec_id")


_BPE_CACHE: dict[tuple[str, str], list] = {}


def _bpe_merges(spark, sf_dir):
    from rrdtool_1_x_spark.datapipe.bpe import train_bpe

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _BPE_CACHE:
        _BPE_CACHE[key] = train_bpe(_docs(spark, sf_dir), num_merges=20)
    return _BPE_CACHE[key]


def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer induction (datapipe.bpe.train_bpe;
    Sennrich et al. 2016): 20 merges learned from the documents table —
    one corpus word-count shuffle, then vocabulary-sized pair-count +
    merge-fold jobs per iteration. Oracled by unrolling the 20 merge
    rounds as CTE layers (pair-count → thresholded argmax → string-fold
    merge via list_reduce); also pinned by the Sennrich worked-example
    golden in tests/test_datapipe.py."""
    from rrdtool_1_x_spark.datapipe.bpe import merges_frame

    return merges_frame(spark, _bpe_merges(spark, sf_dir)).orderBy("rank")


def q_bpe_encode(spark, sf_dir):
    """Apply the corpus-trained merges (datapipe.bpe.bpe_encode): greedy
    rank-priority subword tokenization, Arrow-batched map with a
    per-batch word cache — no shuffle. pieces_sig fingerprints the whole
    per-document subword sequence, so the oracle checks the actual
    tokenization, not just counts. SQL-expressible because rank-priority
    greedy encoding ≡ applying merges in rank order, each as the same
    left-to-right fold the trainer uses (merge r's components are built
    by merges < r, so later merges can never create an earlier pair)."""
    from rrdtool_1_x_spark.datapipe.bpe import bpe_encode

    out = bpe_encode(_docs(spark, sf_dir), _bpe_merges(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_pieces",
        F.md5(F.concat_ws(" ", "pieces")).alias("pieces_sig"),
    ).orderBy("doc_id")


def q_ngram_diversity(spark, sf_dir):
    """Distinct-n diversity / type-token ratio per source
    (datapipe.textstats.ngram_diversity; Li et al. 2016 distinct-n):
    per (source, n<=3) total vs distinct n-gram positions — the
    template/boilerplate detector. One explode, two combinable
    aggregations."""
    from rrdtool_1_x_spark.datapipe.textstats import ngram_diversity

    return ngram_diversity(_docs(spark, sf_dir), max_n=3).orderBy(
        "source", "n"
    )


def q_fertility(spark, sf_dir):
    """Tokenizer fertility per source (datapipe.bpe.bpe_fertility):
    pieces/word and chars/piece under the corpus-trained 20-merge BPE —
    the tokenizer-fit metric that sizes vocabularies before a training
    run. Oracle reuses the bpe_encode CTE chain aggregated per source."""
    from rrdtool_1_x_spark.datapipe.bpe import bpe_fertility

    return bpe_fertility(
        _docs(spark, sf_dir), _bpe_merges(spark, sf_dir)
    ).orderBy("source")


def q_hash_embed(spark, sf_dir):
    """Feature-hashing document embeddings (datapipe.similarity.
    hashed_embedding; Weinberger et al. 2009): md5-bucketed +-1 token
    counts, L2-normalized — the model-free featurization that plugs into
    the ANN/semantic-dedup operators. Exploded (doc, dim, value) for the
    value-hash gate; one explode + one (doc, bucket) aggregation."""
    from rrdtool_1_x_spark.datapipe.similarity import hashed_embedding

    e = hashed_embedding(_docs(spark, sf_dir), dim=64)
    # posexplode_outer, not posexplode: the embedding array is always
    # exactly dim elements (a transform over sequence(0, dim-1)), so the
    # outer variant is row-identical — but plain posexplode makes the
    # optimizer infer a `size(embedding) > 0` filter below the Generate
    # that INLINES the whole dense-assembly expression (with the L2-norm
    # fold re-evaluated per element twice) just to test a constant-true
    # predicate; measured 4.3 s -> sub-second at sf0.1
    return (
        e.select("doc_id", F.posexplode_outer("embedding").alias("i", "v"))
        .select(
            "doc_id",
            F.col("i").cast("long").alias("i"),
            F.round("v", 6).alias("v"),
        )
        .orderBy("doc_id", "i")
    )


def q_span_dedup(spark, sf_dir):
    """ExactSubstr span removal (datapipe.dedup.remove_duplicate_spans;
    Lee et al. 2022's transformation): every 8-token window hash occurring
    more than once keeps its (lowest doc, lowest position) occurrence and
    is excised everywhere else — the cleaned text per document. One
    hash-keyed shuffle decides canonical occurrences; the mask applies
    inside a per-document array filter."""
    from rrdtool_1_x_spark.datapipe.dedup import remove_duplicate_spans

    return remove_duplicate_spans(_docs(spark, sf_dir), n=8).orderBy("doc_id")


def q_dup_spans(spark, sf_dir):
    """Duplicated n-gram spans (datapipe.dedup.duplicated_ngram_spans;
    Lee et al. 2022): per-doc count/fraction of 8-token windows whose
    hash also occurs in another document — the substring-level dedup
    signal document-level near-dup misses. One hash-keyed aggregation
    chain, corpus-linear."""
    from rrdtool_1_x_spark.datapipe.dedup import duplicated_ngram_spans

    return duplicated_ngram_spans(_docs(spark, sf_dir), n=8).orderBy("doc_id")


def _langid_planted(spark, sf_dir):
    """Planted 3-way multilingual corpus: one shared vocabulary, a
    per-language deterministic character mapping (transliteration-style
    pseudo-languages — whitespace tokenization is identical, only char
    n-grams separate them). Mirrored verbatim in the langid oracle."""
    s = F.lower(F.trim(F.col("text")))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, s)
        .when(F.col("doc_id") % 3 == 1, F.translate(s, "aeiou", "äëïöü"))
        .otherwise(F.translate(s, "aeiount", "аеиоунт"))
        .alias("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("lat"))
        .when(F.col("doc_id") % 3 == 1, F.lit("uml"))
        .otherwise(F.lit("cyr"))
        .alias("lang"),
    )


def q_langid(spark, sf_dir):
    """Trained language ID (datapipe.textstats.langid_nb): hashed
    char-trigram multinomial NB with a train/apply split — the fasttext
    lid.176 shape the CCNet-style curation stack gates on, where
    lang_guess is only the stopword heuristic tier. Trained on the
    doc_id%7==0 seed slice of a planted transliteration corpus and
    applied to the held-out rest; integer micro-nat weights make the
    argmax bit-exact (accuracy vs the heuristic is pinned by pytest)."""
    from rrdtool_1_x_spark.datapipe.textstats import langid_nb

    planted = _langid_planted(spark, sf_dir)
    train = planted.filter(F.col("doc_id") % 7 == 0)
    test = planted.filter(F.col("doc_id") % 7 != 0)
    return langid_nb(train, test, n=3, n_buckets=4096).orderBy("doc_id")


def q_suffix_dedup(spark, sf_dir):
    """Variable-length exact-substring duplicate extents
    (datapipe.dedup.exact_substring_spans) — the suffix-array tier of
    Lee et al. 2022's ExactSubstr dedup: sorted 12-token anchors, a
    window is covered iff its gram repeats corpus-wide (across or
    within docs), consecutive covered anchors merge into maximal
    (span_start, span_len) extents. Planted: doc_id%21==0 docs repeat
    themselves (within-doc tier), other doc_id%9==0 docs share an
    18-token boilerplate tail (cross-doc tier)."""
    from rrdtool_1_x_spark.datapipe.dedup import exact_substring_spans

    boiler = (
        "all rights reserved this corpus is distributed under the open"
        " data license terms apply to every derived work"
    )
    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 21 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.col("text"), F.lit(" " + boiler)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return exact_substring_spans(planted, n=12).orderBy(
        "doc_id", "span_start"
    )


def _suffix_planted(spark, sf_dir):
    """The suffix-dedup planted corpus (q_suffix_dedup's plant, shared
    by the index/stream closures; mirrored in the oracle)."""
    boiler = (
        "all rights reserved this corpus is distributed under the open"
        " data license terms apply to every derived work"
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 21 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .when(
            F.col("doc_id") % 9 == 0,
            F.concat(F.col("text"), F.lit(" " + boiler)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def q_suffix_index_topup(spark, sf_dir):
    """Persisted suffix-dedup anchor index + top-up
    (datapipe.dedup.write_anchor_index / append_anchor_index /
    anchor_index_spans): anchors are per-document, so the merge law is
    set UNION and index-then-append equals the one-shot
    exact_substring_spans EXACTLY for any batch split — the gate
    builds from the doc_id%3!=0 slice, appends the rest, and must
    hash-match the one-shot oracle."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.dedup import (
        anchor_index_spans,
        append_anchor_index,
        write_anchor_index,
    )

    planted = _suffix_planted(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="anchoridx_")
    write_anchor_index(planted.filter(F.col("doc_id") % 3 != 0), work, n=12)
    append_anchor_index(planted.filter(F.col("doc_id") % 3 == 0), work, n=12)
    return anchor_index_spans(spark, work, n=12).orderBy(
        "doc_id", "span_start"
    )


def q_suffix_stream(spark, sf_dir):
    """Streaming anchor-index maintenance
    (streaming.datapipe_stream.start_anchor_stream): the planted corpus
    split into 3 micro-batches, each batch anchored and appended
    (set-union merge, replay absorbed by read-side distinct); the
    drained index's extents must equal the one-shot batch oracle."""
    import shutil
    import tempfile

    from rrdtool_1_x_spark.datapipe.dedup import anchor_index_spans
    from rrdtool_1_x_spark.streaming.datapipe_stream import (
        start_anchor_stream,
    )

    planted = _suffix_planted(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="anchorstream_")
    src = f"{work}/in"
    for i in range(3):
        planted.filter(F.col("doc_id") % 3 == i).coalesce(2).write.mode(
            "append"
        ).parquet(src)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_anchor_stream(stream, f"{work}/idx", f"{work}/ck", n=12)
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("suffix anchor stream drain exceeded 600s")
    shutil.rmtree(src, ignore_errors=True)
    shutil.rmtree(f"{work}/ck", ignore_errors=True)
    return anchor_index_spans(spark, f"{work}/idx", n=12).orderBy(
        "doc_id", "span_start"
    )


def q_suffix_excise(spark, sf_dir):
    """Variable-length exact-substring EXCISION
    (datapipe.dedup.excise_duplicate_extents) — the removal half of Lee
    et al. 2022's ExactSubstr pass: the planted corpus's maximal
    duplicated extents (self-repeats %21, shared boilerplate tails %9)
    are cut from EVERY occurrence, surviving tokens re-join, and the
    full rebuilt strings are hash-gated against a window-SQL oracle.
    Token conservation (n_tokens - removed_tokens survive) is pinned by
    pytest."""
    from rrdtool_1_x_spark.datapipe.dedup import excise_duplicate_extents

    planted = _suffix_planted(spark, sf_dir)
    return excise_duplicate_extents(planted, n=12).orderBy("doc_id")


_CANARIES = ("canary-7fa2bd1e-marker", "canary-d41d8cd9-marker")


def q_canary_scan(spark, sf_dir):
    """Benchmark canary detection (datapipe.decontam.canary_scan):
    exact-substring screen for planted eval-set marker GUIDs (the
    BIG-bench canary convention). Plant: doc_id%23 docs carry canary 1
    once, doc_id%29 docs carry canary 2 twice (doc 0 carries both);
    occurrence counts via the length-difference identity, one corpus
    scan."""
    from rrdtool_1_x_spark.datapipe.decontam import canary_scan

    c1, c2 = _CANARIES
    planted = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 23 == 0, F.lit(" " + c1)).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 29 == 0, F.lit(f" {c2} xyz {c2}")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return canary_scan(planted, list(_CANARIES)).orderBy(
        "doc_id", "canary"
    )


_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def _driver_rounds() -> dict[str, int]:
    """Last driver round that recorded a CORRECTNESS row per query key.

    The driver's correctness sweep windows the FIRST 50 keys of
    ``queries()``; with a 160+ entry registry a full rotation takes 4
    rounds, so ordering must be computed, not hand-maintained. This reads
    the committed ``CORRECTNESS_r*.json`` artifacts next to this file and
    returns {key: latest_round_checked}. Keys absent from every artifact
    (brand-new gates) are simply missing and sort first."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    here = _os.path.dirname(_os.path.abspath(__file__))
    last: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(here, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = _json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for k in rows:
            last[k] = max(last.get(k, 0), rnd)
    return last


def _sweep_order(qs: dict) -> dict:
    """Stalest-first rotation of the registry for the driver's 50-key
    correctness window: never-checked keys first (registration order,
    so new gates this round are verified the same round they land), then
    ascending last-checked round. Deterministic given the committed
    artifacts; STALENESS.md records the resulting table per round."""
    last = _driver_rounds()
    pos = {k: i for i, k in enumerate(qs)}
    ordered = sorted(qs, key=lambda k: (last.get(k, -1), pos[k]))
    return {k: qs[k] for k in ordered}


def _memo(name: str, fn: Callable[[SparkSession, str], DataFrame]):
    """Memoize the constructed DataFrame per (query, session, sf_dir).

    Query construction is driver-side work (py4j round-trips + analysis of
    large literal expressions — the LSH hyperplane arrays alone cost ~1 s
    to analyze); the DAG is immutable, so repeated calls can share it. This
    is the plan-level analogue of the reference's fetch-dedup cache."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, spark.sparkContext.applicationId, sf_dir)
        if key not in _DF_MEMO:
            _DF_MEMO[key] = fn(spark, sf_dir)
        return _DF_MEMO[key]

    wrapped.__name__ = getattr(fn, "__name__", name)
    wrapped.__doc__ = fn.__doc__
    return wrapped


def q_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 per corpus-derived query (datapipe.retrieval.
    bm25_topk; Robertson & Zaragoza 2009 eq. 3.15, Lucene's non-negative
    idf): queries are the df-ranked terms 21-32 assigned round-robin to
    6 two-term queries; idf and length-norm 1e-6-quantized so scores are
    exact BIGINTs."""
    from rrdtool_1_x_spark.datapipe.retrieval import bm25_topk

    return bm25_topk(_docs(spark, sf_dir)).orderBy("query_id", "rank")


def q_rrf_fuse(spark, sf_dir):
    """Reciprocal-rank fusion of BM25 and smoothed-TF-IDF rankings over
    the same derived queries (datapipe.retrieval.rrf_fuse; Cormack et
    al. SIGIR 2009, K=60): both rankings come off one (doc, term)
    aggregate, fused score = sum(round(1e6/(60+rank)))."""
    from rrdtool_1_x_spark.datapipe.retrieval import rrf_fuse

    return rrf_fuse(_docs(spark, sf_dir)).orderBy("query_id", "rank")


def q_pmi_topk(spark, sf_dir):
    """Top-30 adjacent-bigram collocations by PMI with support >= 5
    (datapipe.textstats.pmi_collocations; Church & Hanks 1990),
    1e-6-quantized from an all-BIGINT count ratio."""
    from rrdtool_1_x_spark.datapipe.textstats import pmi_collocations

    return pmi_collocations(_docs(spark, sf_dir)).orderBy(
        F.col("pmi").desc(), "bigram"
    )


def q_chunk_docs(spark, sf_dir):
    """Sliding-window token chunking, 32-token windows advancing by 24
    (datapipe.sampling.chunk_documents) — the LM context-window /
    RAG-indexing preparation step; per-row array arithmetic only."""
    from rrdtool_1_x_spark.datapipe.sampling import chunk_documents

    return chunk_documents(_docs(spark, sf_dir)).orderBy(
        "doc_id", "chunk_id"
    )


def _docs_nfd_enriched(spark, sf_dir):
    """documents with deterministic NFD (decomposed) unicode suffixes —
    the corpus is ASCII, so the NFC gate injects real composition work:
    doc_id%4 selects combining-mark sequences (e+U+0301, i+U+0308,
    A+U+030A, none) plus double spaces for the collapse path. The oracle
    builds the identical strings with chr()."""
    d = _docs(spark, sf_dir)
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.element_at(
                F.array(
                    F.lit("  cafe" + chr(769)),
                    F.lit(" nai" + chr(776) + "ve  story"),
                    F.lit(" A" + chr(778) + "ngstro" + chr(774) + "m"),
                    F.lit(""),
                ),
                (F.col("doc_id") % 4 + 1).cast("int"),
            ),
        ),
    )


def q_text_norm(spark, sf_dir):
    """Unicode NFC + whitespace canonicalization (datapipe.clean.
    normalize_text): Arrow-batched unicodedata NFC vs DuckDB
    nfc_normalize over the NFD-enriched corpus — both implement UAX #15,
    so composed outputs are byte-identical."""
    from rrdtool_1_x_spark.datapipe.clean import normalize_text

    return normalize_text(_docs_nfd_enriched(spark, sf_dir)).orderBy(
        "doc_id"
    )


def _docs_url_variants(spark, sf_dir):
    """documents with one deterministic URL per doc, in one of four
    surface forms (upper-case host + trailing slash / www. prefix /
    utm_ query string / #fragment) that all share a canonical form
    keyed by doc_id%50 — identical strings in the oracle."""
    d = _docs(spark, sf_dir)
    k = (F.col("doc_id") % 50).cast("string")
    variants = F.array(
        F.concat(
            F.lit("https://SITE"), k, F.lit(".example.org/page/"), k,
            F.lit("/"),
        ),
        F.concat(
            F.lit("http://www.site"), k, F.lit(".example.org/page/"), k
        ),
        F.concat(
            F.lit("https://site"), k, F.lit(".example.org/page/"), k,
            F.lit("?utm_source=feed&utm_campaign=x"),
        ),
        F.concat(
            F.lit("https://site"), k, F.lit(".example.org/page/"), k,
            F.lit("#frag"),
        ),
    )
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" ref "),
            F.element_at(variants, (F.col("doc_id") % 4 + 1).cast("int")),
        ),
    )


def q_url_dedup(spark, sf_dir):
    """Canonical-URL deduplication (datapipe.pii.url_canonical_dedup):
    lowercase, strip scheme/www./query/fragment/trailing slash, keep the
    min-doc_id document per canonical URL — the crawl-frontier dedup
    step, over the four-surface-form enriched corpus."""
    from rrdtool_1_x_spark.datapipe.pii import url_canonical_dedup

    return url_canonical_dedup(_docs_url_variants(spark, sf_dir)).orderBy(
        "canon_url"
    )


def q_pagerank_topup(spark, sf_dir):
    """Incremental PageRank (datapipe.graph.pagerank with init_ranks):
    5 cold rounds over the doc_id % 5 != 0 edge subset, ranks persisted
    to parquet, then 2 resumed rounds over the FULL edge set seeded
    from the stored state (new nodes at the uniform base) — the
    edge-append maintenance path that absorbs appends in a couple of
    rounds instead of a cold restart."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.graph import domain_link_edges, pagerank

    d = _docs_url_variants(spark, sf_dir)
    old_edges = domain_link_edges(d.filter(F.col("doc_id") % 5 != 0))
    path = tempfile.mkdtemp(prefix="pr_state_")
    pagerank(old_edges, n_iter=5).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    return pagerank(
        domain_link_edges(d), n_iter=2, init_ranks=stored
    ).orderBy(F.desc("rank_micro"), F.asc("node"))


def q_hits(spark, sf_dir):
    """HITS hubs/authorities (datapipe.graph.hits; Kleinberg 1999) on
    the same citation graph as pagerank — the bipartite case: sources
    score as hubs, domains as authorities. 3 alternating integer rounds
    with DECIMAL(38,0)-carried L1 renormalization, hash-gated against
    unrolled CTE layers."""
    from rrdtool_1_x_spark.datapipe.graph import domain_link_edges, hits

    edges = domain_link_edges(_docs_url_variants(spark, sf_dir))
    return hits(edges, n_iter=3).orderBy("node")


def q_pagerank(spark, sf_dir):
    """Domain-authority PageRank (datapipe.graph.domain_link_edges +
    pagerank): the citation graph document-source → linked domain over
    the URL-enriched corpus, 5 integer-exact power iterations with
    damping 85/100 and uniform dangling-mass redistribution — the
    CCNet/RefinedWeb-style domain quality signal. Ranks are BIGINT
    micro-units, so the full iterative algorithm hash-gates against 5
    unrolled CTE layers."""
    from rrdtool_1_x_spark.datapipe.graph import domain_link_edges, pagerank

    edges = domain_link_edges(_docs_url_variants(spark, sf_dir))
    return pagerank(edges, n_iter=5).orderBy(
        F.desc("rank_micro"), F.asc("node")
    )


def q_bm25_index_topup(spark, sf_dir):
    """Persisted + incremental BM25 index (datapipe.retrieval.
    write_bm25_index / append_bm25_index / query_bm25_index): index the
    low-id half, append the high-id half, answer the derived queries
    straight off the index (bucket-pruned postings scan, no corpus
    access). df counts and length sums merge additively, so the result
    must equal one-shot bm25_topk — the oracle is bm25_topk's SQL
    verbatim."""
    import tempfile

    from rrdtool_1_x_spark.datapipe.retrieval import (
        append_bm25_index,
        query_bm25_index,
        write_bm25_index,
    )

    d = _docs(spark, sf_dir)
    cut = int(d.agg(F.max("doc_id")).first()[0]) // 2
    path = tempfile.mkdtemp(prefix="bm25idx_")
    write_bm25_index(d.filter(F.col("doc_id") <= cut), path)
    append_bm25_index(d.filter(F.col("doc_id") > cut), path)
    return query_bm25_index(spark, path).orderBy("query_id", "rank")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDERING CONTRACT: the driver's correctness sweep windows the FIRST
    # 50 keys. Since r8 the exposed order is COMPUTED by _sweep_order():
    # never-checked keys first (registration order), then ascending
    # last-checked driver round — so new gates are driver-verified the
    # round they land and no entry goes stale longer than the rotation
    # period (ceil(registry/50) rounds). The literal order below is only
    # the registration tiebreak; tools/staleness.py writes the resulting
    # table to STALENESS.md.
    qs = {
        # -- priority 0: r6 RED rows (HUGEINT casts) + r6 no_oracle (BPE
        # CTE oracles) — fixed this round, MUST re-sweep before anything
        # else so the reds cannot survive into another round's window
        "dsir_weight": q_dsir_weight,
        "unigram_logprob": q_unigram_logprob,
        "bigram_logprob": q_bigram_logprob,
        "domain_stats": q_domain_stats,
        "bpe_train": q_bpe_train,
        "bpe_encode": q_bpe_encode,
        # -- priority: new this round (no driver row yet) ---------------
        "kmeans_iter": q_kmeans_iter,
        "kmeans_topup": q_kmeans_topup,
        "pagerank": q_pagerank,
        "pagerank_topup": q_pagerank_topup,
        "hits": q_hits,
        "harmonic": q_harmonic,
        "triangles": q_triangles,
        "group_split": q_group_split,
        "ngram_diversity": q_ngram_diversity,
        "fertility": q_fertility,
        "ann_int4_topk": q_ann_int4_topk,
        "int4_recall": q_int4_recall,
        "trunc_rerank": q_trunc_rerank,
        "label_prop": q_label_prop,
        "mad_outlier": q_mad_outlier,
        "vocab_coverage": q_vocab_coverage,
        "json_props": q_json_props,
        "shard_epoch": q_shard_epoch,
        "cdc_dedup": q_cdc_dedup,
        "event_paths": q_event_paths,
        "phrase_search": q_phrase_search,
        "dq_checks": q_dq_checks,
        "scd2": q_scd2,
        "oov_rate": q_oov_rate,
        "kn_bigram": q_kn_bigram,
        "edit_near_dup": q_edit_near_dup,
        "minhash_decontam": q_minhash_decontam,
        "zorder_events": q_zorder_events,
        "hilbert_events": q_hilbert_events,
        "winnow_fp": q_winnow_fp,
        "winnow_overlap": q_winnow_overlap,
        "priority_sample": q_priority_sample,
        "rouge_pairs": q_rouge_pairs,
        "logq_quantiles": q_logq_quantiles,
        "winnow_index_topup": q_winnow_index_topup,
        "shard_balance": q_shard_balance,
        "source_kl": q_source_kl,
        "logq_index_topup": q_logq_index_topup,
        "kmv_distinct": q_kmv_distinct,
        "kmv_overlap": q_kmv_overlap,
        "rot_pq_topk": q_rot_pq_topk,
        "rot_pq_recall": q_rot_pq_recall,
        "opq_topk": q_opq_topk,
        "opq_recall": q_opq_recall,
        "opq_index_topup": q_opq_index_topup,
        "rank_metrics": q_rank_metrics,
        "opq_ivfpq_topk": q_opq_ivfpq_topk,
        "event_transitions": q_event_transitions,
        "kn_heldout": q_kn_heldout,
        "lsh_pr": q_lsh_pr,
        "corpus_diff": q_corpus_diff,
        "script_mix": q_script_mix,
        "span_corrupt": q_span_corrupt,
        "unigram_vocab": q_unigram_vocab,
        "unigram_segment": q_unigram_segment,
        "unigram_nbest": q_unigram_nbest,
        "winnow_stream": q_winnow_stream,
        "logq_stream": q_logq_stream,
        "kmv_index_topup": q_kmv_index_topup,
        "hll_index_topup": q_hll_index_topup,
        "cms_index_topup": q_cms_index_topup,
        "sketch_stream": q_sketch_stream,
        "decontam_spans": q_decontam_spans,
        "cluster_keywords": q_cluster_keywords,
        "bm25_topk": q_bm25_topk,
        "rrf_fuse": q_rrf_fuse,
        "pmi_topk": q_pmi_topk,
        "chunk_docs": q_chunk_docs,
        "text_norm": q_text_norm,
        "url_dedup": q_url_dedup,
        "bm25_index_topup": q_bm25_index_topup,
        "ivfpq_residual_topk": q_ivfpq_residual_topk,
        "residual_recall": q_residual_recall,
        "nb_classify": q_nb_classify,
        "dedup_stream": q_dedup_stream,
        "stream_join": q_stream_join,
        "stream_join_ooo": q_stream_join_ooo,
        "resid_index_topup": q_resid_index_topup,
        "hard_negatives": q_hard_negatives,
        "source_overlap": q_source_overlap,
        "diverse_sample": q_diverse_sample,
        # -- stalest: last driver row r4
        "band_index_topup": q_band_index_topup,
        "simhash_index_topup": q_simhash_index_topup,
        "ivf_indexed_topk": q_ivf_indexed_topk,
        "xport_fmt": q_xport_fmt,
        "daemon_fetch": q_daemon_fetch,
        "sql_source": q_sql_source,
        "cb_source": q_cb_source,
        # -- last driver row r5
        "pdp_gauge": q_pdp_gauge,
        "counter_rate": q_counter_rate,
        "cdp_avg": _q_cdp("AVERAGE"),
        "cdp_min": _q_cdp("MIN"),
        "cdp_max": _q_cdp("MAX"),
        "cdp_last": _q_cdp("LAST"),
        "reduce_avg": q_reduce_avg,
        "vdef_max": q_vdef_max,
        "vdef_stats": q_vdef_stats,
        "vdef_percentile": q_vdef_percentile,
        "vdef_lslslope": q_vdef_lslslope,
        "rpn_chain": q_rpn_chain,
        "trend": q_trend,
        "shift_week": q_shift_week,
        "xport_pivot": q_xport_pivot,
        "first_last": q_first_last,
        "align_outer": q_align_outer,
        "dedup_exact": q_dedup_exact,
        "text_stats": q_text_stats,
        "stopword_density": q_stopword_density,
        "minhash_sig": q_minhash_sig,
        "ann_cosine_top10": q_ann_cosine_top10,
        "quality": q_quality,
        "lang_guess": q_lang_guess,
        "hw_predict": q_hw_predict,
        "simhash": q_simhash,
        "media_features": q_media_features,
        "media_decode": q_media_decode,
        "media_probe": q_media_probe,
        "media_resize": q_media_resize,
        "media_frames": q_media_frames,
        "media_jpeg": q_media_jpeg,
        "media_video": q_media_video,
        "media_probe2": q_media_probe2,
        "media_flac": q_media_flac,
        "media_g711": q_media_g711,
        "seq_pack": q_seq_pack,
        "media_ahash": q_media_ahash,
        "image_near_dup": q_image_near_dup,
        "near_dup_pairs": q_near_dup_pairs,
        "dup_groups": q_dup_groups,
        "dedup_report": q_dedup_report,
        "embed_near_dup": q_embed_near_dup,
        "lsh_topk": q_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "fingerprint": q_fingerprint,
        "repetition": q_repetition,
        "weighted_jaccard": q_weighted_jaccard,
        "graph_stack": q_graph_stack,
        "graph_scale": q_graph_scale,
        # -- freshest: green in CORRECTNESS_r06.json
        "temperature_mix": q_temperature_mix,
        "pq_topk": q_pq_topk,
        "pq_recall": q_pq_recall,
        "pq_index_topup": q_pq_index_topup,
        "datacard": q_datacard,
        "ivfpq_topk": q_ivfpq_topk,
        "mix_sample": q_mix_sample,
        "split_leak": q_split_leak,
        "hll_distinct": q_hll_distinct,
        "cms_topk": q_cms_topk,
        "bloom_decontam": q_bloom_decontam,
        "tok_quantiles": q_tok_quantiles,
        "centroid_classify": q_centroid_classify,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "sessionize": q_sessionize,
        "funnel": q_funnel,
        "retention": q_retention,
        "event_rollup": q_event_rollup,
        "c4_clean": q_c4_clean,
        "line_dedup": q_line_dedup,
        "ppl_bucket": q_ppl_bucket,
        "tfidf_topk": q_tfidf_topk,
        "line_index_topup": q_line_index_topup,
        "html_extract": q_html_extract,
        "ann_int8_topk": q_ann_int8_topk,
        "pii_scrub": q_pii_scrub,
        "semantic_dedup": q_semantic_dedup,
        "bpe_tokens": q_bpe_tokens,
        "dup_spans": q_dup_spans,
        "span_dedup": q_span_dedup,
        "hash_embed": q_hash_embed,
        "text_semantic_dedup": q_text_semantic_dedup,
        "dedup_best": q_dedup_best,
        "gopher_rep": q_gopher_rep,
        "curate": q_curate,
        "sql_derive": q_sql_derive,
        "xport_sink": q_xport_sink,
        "simhash_near_dup": q_simhash_near_dup,
        "decontam_overlap": q_decontam_overlap,
        "hash_split": q_hash_split,
        "stratified_sample": q_stratified_sample,
        "token_budget": q_token_budget,
        "vocab_top": q_vocab_top,
        "langid": q_langid,
        "suffix_dedup": q_suffix_dedup,
        "suffix_index_topup": q_suffix_index_topup,
        "suffix_stream": q_suffix_stream,
        "suffix_excise": q_suffix_excise,
        "canary_scan": q_canary_scan,
        "softdedup_weights": q_softdedup_weights,
    }
    # curate materializes its stage results eagerly at construction
    # (localCheckpoint inside curate_corpus): memoizing the DataFrame
    # would let repeat bench runs time only the slim disposition tail —
    # every invocation must rebuild so timings carry the full pipeline
    no_memo = {"curate"}
    qs = _sweep_order(qs)
    return {
        k: (fn if k in no_memo else _memo(k, fn)) for k, fn in qs.items()
    }


# -------------------------------------------------------------------- oracle

# Shared CTE: events → per-series strictly-increasing samples → per-step PDP
# (the per-step normalization semantics of src/rrd_update.c:1178-1253; see
# rrdtool_1_x_spark/operators/pdp.py)
_PDP_CTE = f"""
pre AS (
  SELECT event_type AS series_id, epoch(ts)::DOUBLE AS t, avg(value) AS v
  FROM events GROUP BY 1, 2
),
iv AS (
  SELECT series_id, t AS t1, lag(t) OVER w AS t0, v,
         CASE WHEN t - lag(t) OVER w <= {HB} THEN v END AS rate
  FROM pre WINDOW w AS (PARTITION BY series_id ORDER BY t)
),
iv2 AS (
  SELECT *, t1 - t0 AS iv_len,
         (floor(t0/{STEP})+1)*{STEP} AS first_end,
         floor(t1/{STEP})*{STEP} AS occu,
         floor(t1/{STEP}) - floor(t0/{STEP}) AS k,
         CASE WHEN (floor(t0/{STEP})+1)*{STEP} - t0 < {STEP}
              THEN (floor(t0/{STEP})+1)*{STEP} - t0 ELSE 0 END AS l_split
  FROM iv WHERE t0 IS NOT NULL
),
pieces AS (
  SELECT series_id, t0, t1, iv_len, rate, k, l_split, first_end,
         g.e * {STEP} AS step_end,
         least(t1, g.e*{STEP}) - greatest(t0, g.e*{STEP} - {STEP}) AS sec,
         (g.e*{STEP}) <= occu AS is_final
  FROM iv2, LATERAL (
    SELECT unnest(generate_series(CAST(floor(t0/{STEP})+1 AS BIGINT),
                                  CAST(ceil(t1/{STEP}) AS BIGINT))) AS e) g
),
p2 AS (SELECT * FROM pieces WHERE sec > 0),
agg AS (
  SELECT series_id, step_end,
    sum(CASE WHEN rate IS NOT NULL THEN rate*sec ELSE 0 END) AS known_rs,
    sum(CASE WHEN rate IS NULL THEN sec ELSE 0 END) AS unk_sec,
    sum(CASE WHEN rate IS NULL AND NOT is_final THEN sec ELSE 0 END) AS unk_pre,
    sum(sec) AS covered,
    max(CASE WHEN is_final AND (
          CASE WHEN k >= 2 AND l_split > 0 THEN
            CASE WHEN step_end = first_end THEN l_split > {HB}
                 ELSE (iv_len - l_split) > {HB} END
          ELSE iv_len > {HB} END) THEN 1 ELSE 0 END) AS viol,
    max(CASE WHEN is_final THEN 1 ELSE 0 END) AS finalized
  FROM p2 GROUP BY 1, 2
),
pdp AS (
  SELECT series_id, step_end AS ts,
         round(known_rs / ({STEP} - (unk_sec + ({STEP} - covered))), 6) AS value
  FROM agg
  WHERE finalized = 1 AND viol = 0
    AND (unk_pre + ({STEP} - covered)) <= {STEP} / 2.0
    AND ({STEP} - (unk_sec + ({STEP} - covered))) > 0
)"""

_CDP_RES = STEP * CDP_N


def _cdp_cte(agg_expr: str) -> str:
    return f"""WITH {_PDP_CTE},
cdp AS (
  SELECT series_id, ceil(ts/{_CDP_RES})*{_CDP_RES} AS ts,
         {agg_expr} AS v, count(*) AS known
  FROM pdp GROUP BY 1, 2
)
SELECT series_id, ts, round(v, 6) AS value FROM cdp
WHERE ({CDP_N} - known) <= {CDP_N * XFF} AND v IS NOT NULL
ORDER BY series_id, ts"""


_GRID_CTE = f"""
bounds AS (SELECT series_id, CAST(min(ts)/{STEP} AS BIGINT) AS lo,
                  CAST(max(ts)/{STEP} AS BIGINT) AS hi FROM pdp GROUP BY 1),
grid AS (
  SELECT series_id, g.e * {STEP} AS ts
  FROM bounds, LATERAL (SELECT unnest(generate_series(lo, hi)) AS e) g),
padded AS (
  SELECT grid.series_id, grid.ts, pdp.value
  FROM grid LEFT JOIN pdp ON grid.series_id = pdp.series_id AND grid.ts = pdp.ts)"""


def _bpe_merge_fold(src: str) -> str:
    """One greedy left-to-right merge application over a symbol array
    ``s`` (VARCHAR[]), fusing adjacent (m.a, m.b) pairs exactly like the
    Spark trainer's F.aggregate fold (datapipe/bpe.py train_bpe): the
    accumulator is a chr(31)-joined string, the tail element equals m.a
    iff the string ends with sep||m.a (or IS m.a). KNOWN LIMIT: a corpus
    token containing a literal \\x1f would corrupt the string re-split —
    \\s+ does NOT strip \\x1f, so this is an assumption about the corpus
    (verified free of C0 separators), not an invariant; only the ORACLE
    is affected (the engine's array fold needs no separator). m.a IS
    NULL means the round found no pair with count >= 2 (the trainer's
    early stop): pass the array through unchanged."""
    return (
        "CASE WHEN m.a IS NULL THEN s ELSE string_split(list_reduce(s, "
        "(acc, x) -> CASE WHEN (acc = m.a OR ends_with(acc, chr(31) || m.a)) "
        "AND x = m.b THEN left(acc, length(acc) - length(m.a)) || m.a || m.b "
        "ELSE acc || chr(31) || x END), chr(31)) END AS s"
    )


def _bpe_chain_ctes(n: int) -> str:
    """The unrolled BPE training chain as DuckDB CTEs: w0 (corpus word
    counts — the only corpus-sized scan), s0 (char symbols + </w>), then
    per round r: p{r} (vocabulary-sized adjacent-pair counts), b{r}
    (argmax pair with count >= 2, ties lexicographic — the trainer's
    orderBy(desc n, asc a, asc b)), s{r+1} (fold-merge applied to every
    word). MATERIALIZED pins each layer so DuckDB never re-inlines the
    doubly-referenced chain (s{r} feeds both p{r} and s{r+1})."""
    parts = [
        r"""w0 AS MATERIALIZED (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                              x -> x != '')) AS w
    FROM documents) GROUP BY 1)""",
        "s0 AS MATERIALIZED (SELECT w, c,"
        " regexp_extract_all(w, '.') || ['</w>'] AS s FROM w0)",
    ]
    for r in range(n):
        parts.append(
            f"""p{r} AS (SELECT a, b, sum(c) AS n FROM (
  SELECT c, unnest(s[1:len(s)-1]) AS a, unnest(s[2:len(s)]) AS b FROM s{r})
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"b{r} AS MATERIALIZED (SELECT a, b FROM p{r} WHERE n >= 2 "
            f"ORDER BY n DESC, a ASC, b ASC LIMIT 1)"
        )
        parts.append(
            f"s{r + 1} AS MATERIALIZED (SELECT w, c, {_bpe_merge_fold(f's{r}')} "
            f"FROM s{r} LEFT JOIN b{r} m ON TRUE)"
        )
    return ",\n".join(parts)


def _bpe_train_oracle(n: int) -> str:
    union = "\nUNION ALL ".join(f"SELECT {r} AS r, a, b FROM b{r}" for r in range(n))
    return f"""WITH {_bpe_chain_ctes(n)}
SELECT CAST(r AS INT) AS rank, a AS "left", b AS "right", a || b AS merged
FROM ({union}) ORDER BY rank"""


def _bpe_encode_oracle(n: int) -> str:
    """Greedy rank-priority encode ≡ merges applied in rank order (each
    as the training fold): merge r's components only exist after merges
    < r, so applying a later merge can never create an earlier pair —
    the final s{n} layer IS the encoded vocabulary. Reassemble documents
    by joining word positions back and flattening in order; empty docs
    keep n_pieces=0 / md5('') like Spark's concat_ws over []."""
    return rf"""WITH {_bpe_chain_ctes(n)},
dw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                  x -> x != '') AS ws FROM documents),
dpos AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS j FROM dw),
dagg AS (SELECT doc_id, flatten(list(s ORDER BY j)) AS pieces
         FROM dpos JOIN s{n} USING (w) GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(len(a.pieces), 0) AS BIGINT) AS n_pieces,
       md5(array_to_string(coalesce(a.pieces, [])::VARCHAR[], ' ')) AS pieces_sig
FROM documents d LEFT JOIN dagg a USING (doc_id) ORDER BY doc_id"""


def _pr_layer(name: str, prev: str, et: str, ot: str, nt: str) -> str:
    """One integer PageRank power-iteration layer (mirrors
    datapipe.graph.pagerank's update exactly) reading edge table ``et``,
    out-degree table ``ot`` and node-count CTE ``nt``.

    Every rank CTE is MATERIALIZED: each layer references its
    predecessor three times (inflow, dangling, carry), and DuckDB
    inlines plain CTEs per reference — 3^layers copies of the whole
    upstream chain (measured: the 7-layer topup oracle went from
    minutes to sub-second). The SQL twin of the Spark
    localCheckpoint-per-iteration rule."""
    return f"""
{name}_in AS MATERIALIZED (SELECT e.dst AS node,
          CAST(sum((r.r * e.w) // o.wout) AS BIGINT) AS fin
        FROM {et} e JOIN {prev} r ON r.node = e.src
        JOIN {ot} o ON o.src = e.src GROUP BY 1),
{name}_dg AS MATERIALIZED (SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dg
        FROM {prev} r LEFT JOIN {ot} o ON o.src = r.node
        WHERE o.src IS NULL),
{name} AS MATERIALIZED (SELECT n.node,
         CAST((15 * (1000000000000 // k.n)) // 100
              + (85 * coalesce(i.fin, 0)) // 100
              + (85 * (d.dg // k.n)) // 100 AS BIGINT) AS r
       FROM {prev} n LEFT JOIN {name}_in i ON i.node = n.node,
            {name}_dg d, {nt} k)"""


_PR_ENR = r"""enr AS (SELECT doc_id, source,
    text || ' ref ' || CASE doc_id % 4
      WHEN 0 THEN 'https://SITE' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
      WHEN 1 THEN 'http://www.site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
      WHEN 2 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
        || '?utm_source=feed&utm_campaign=x'
      ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
    END AS text
  FROM documents)"""


def _pagerank_topup_oracle() -> str:
    """Two-phase incremental PageRank: 5 cold rounds over the OLD edge
    subset (doc_id % 5 != 0), persisted ranks seed 2 resumed rounds
    over the FULL edge set (new nodes start at the uniform base over
    the CURRENT node count) — mirrors pagerank(init_ranks=...)."""
    old = "".join(
        "," + _pr_layer(f"or{i}", f"or{i - 1}", "eo", "oo", "nno")
        for i in range(1, 6)
    )
    new = "".join(
        "," + _pr_layer(f"fr{i}", f"fr{i - 1}", "edges", "outdeg", "nn")
        for i in range(1, 3)
    )
    return (rf"""
WITH {_PR_ENR},
hx AS (SELECT source AS src,
         regexp_replace(lower(unnest(
           regexp_extract_all(text, 'https?://([^/\s:]+)', 1))),
           '^www\.', '') AS dst
       FROM enr),
hxo AS (SELECT source AS src,
         regexp_replace(lower(unnest(
           regexp_extract_all(text, 'https?://([^/\s:]+)', 1))),
           '^www\.', '') AS dst
       FROM enr WHERE doc_id % 5 != 0),
edges AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
          FROM hx GROUP BY 1, 2),
eo AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
       FROM hxo GROUP BY 1, 2),
no AS (SELECT src AS node FROM eo UNION SELECT dst FROM eo),
oo AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wout FROM eo GROUP BY 1),
nno AS (SELECT CAST(count(*) AS BIGINT) AS n FROM no),
or0 AS (SELECT no.node, CAST(1000000000000 // nno.n AS BIGINT) AS r
        FROM no, nno)"""
        + old
        + """,
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outdeg AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wout
           FROM edges GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
fr0 AS (SELECT n.node,
          coalesce(p.r, CAST(1000000000000 // nn.n AS BIGINT)) AS r
        FROM nodes n LEFT JOIN or5 p ON p.node = n.node, nn)"""
        + new
        + """
SELECT node, r AS rank_micro FROM fr2
ORDER BY rank_micro DESC, node""")


def _kmeans_oracle(train_pred: str = "") -> str:
    """Lloyd k-means oracle: md5-rank init, integer-L2 argmin (ties to
    the lowest cluster), round(sum/count) integer centroid updates,
    emptied clusters keep their previous centroid (the coalesce), final
    scoring pass emits (vec_id, cluster, dist).

    ``train_pred``: optional predicate restricting TRAINING (init +
    the three update rounds) to a subset — the persisted-model gate
    freezes centroids on the initially-modeled rows while scoring runs
    over everything."""
    tw = f"WHERE {train_pred}" if train_pred else ""
    layers = []
    for i in range(1, 4):
        layers.append(f"""
sc{i} AS (SELECT qt.vec_id, cl.cluster,
         list_sum(list_transform(range(1, 65),
            j -> (qt.q[j] - cl.cv[j]) * (qt.q[j] - cl.cv[j]))) AS dd
       FROM qt CROSS JOIN cl{i - 1} cl),
a{i} AS (SELECT vec_id, cluster FROM (
         SELECT vec_id, cluster,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dd ASC, cluster ASC) AS rn
         FROM sc{i}) _ WHERE rn = 1),
up{i} AS (SELECT a.cluster, ii.i AS pos,
         CAST(round(CAST(sum(qt.q[ii.i]) AS DOUBLE) / count(*)) AS BIGINT)
           AS c
       FROM a{i} a JOIN qt USING (vec_id)
       CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ii
       GROUP BY 1, 2),
ce{i} AS (SELECT p.cluster, p.pos, coalesce(u.c, p.c) AS c
       FROM ce{i - 1} p LEFT JOIN up{i} u USING (cluster, pos)),
cl{i} AS (SELECT cluster, list(c ORDER BY pos) AS cv FROM ce{i}
       GROUP BY 1)""")
    return ("""
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
qt AS (SELECT vec_id, q FROM qv """ + tw + """),
c0 AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS cluster, q
       FROM qt QUALIFY cluster < 8),
ce0 AS (SELECT cluster, ii.i AS pos, q[ii.i] AS c
        FROM c0 CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ii),
cl0 AS (SELECT cluster, list(c ORDER BY pos) AS cv FROM ce0 GROUP BY 1),"""
        + ",".join(layers)
        + """,
scF AS (SELECT qv.vec_id, cl.cluster,
          list_sum(list_transform(range(1, 65),
             j -> (qv.q[j] - cl.cv[j]) * (qv.q[j] - cl.cv[j]))) AS dd
        FROM qv CROSS JOIN cl3 cl)
SELECT vec_id, CAST(cluster AS INT) AS cluster, CAST(dd AS BIGINT) AS dist
FROM (SELECT vec_id, cluster, dd,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dd ASC, cluster ASC) AS rn
      FROM scF) _ WHERE rn = 1 ORDER BY vec_id""")


def _bpe_fertility_oracle(n: int) -> str:
    """The bpe_encode chain aggregated per source: pieces/word and
    chars/piece — counts are exact integer sums (cast back to BIGINT,
    the HUGEINT lesson), the two ratios one correctly-rounded division
    each."""
    return rf"""WITH {_bpe_chain_ctes(n)},
dw AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                  x -> x != '') AS ws FROM documents),
dpos AS (SELECT doc_id, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS j FROM dw),
dagg AS (SELECT doc_id, flatten(list(s ORDER BY j)) AS pieces
         FROM dpos JOIN s{n} USING (w) GROUP BY doc_id),
pd AS (SELECT d.doc_id, d.source,
         CAST(coalesce(len(a.pieces), 0) AS BIGINT) AS np,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(d.text)), '\s+'),
                              x -> x != '')) AS BIGINT) AS nw,
         CAST(length(d.text) AS BIGINT) AS nc
       FROM documents d LEFT JOIN dagg a USING (doc_id))
SELECT source, CAST(sum(np) AS BIGINT) AS n_pieces,
       CAST(sum(nw) AS BIGINT) AS n_words,
       CAST(sum(nc) AS BIGINT) AS n_chars,
       round(sum(np)::DOUBLE / sum(nw), 6) AS pieces_per_word,
       round(sum(nc)::DOUBLE / sum(np), 6) AS chars_per_piece
FROM pd GROUP BY 1 ORDER BY source"""


_RESID_LIM = 32767


def _resid_oracle_ctes(nq: int, train_pred: str = "") -> str:
    """Residual-IVFADC oracle chain (mirrors similarity.ivfpq_residual_topk
    op for op): cosine cell assignment, per-cell residual scales,
    int16-quantized residuals, salted-md5 residual codebook, per-(query,
    probed-cell) LUTs, integer ADC rescaled by cscale^2 and rounded 1e-6.

    ``train_pred``: optional WHERE predicate restricting the TRAINED
    artifacts (centroids, cell scales, codebook sample) to a subset —
    the persisted-index gate freezes them on the initially-indexed rows
    while encoding and scoring run over everything."""
    L = _RESID_LIM
    tw = f"WHERE {train_pred} " if train_pred else ""
    return f"""ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
n2f AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM ev),
cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n2f
         {tw}ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
sc0 AS (SELECT n2f.vec_id, cent.cid, cent.cv,
              coalesce(CASE WHEN n2f.n2 > 0 AND cent.cn2 > 0
                            THEN list_dot_product(n2f.v, cent.cv)
                                 / (sqrt(n2f.n2) * sqrt(cent.cn2)) END,
                       -2.0) AS s
       FROM n2f CROSS JOIN cent),
asg AS (SELECT vec_id, cid, cv FROM (
          SELECT vec_id, cid, cv,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM sc0) _ WHERE rn = 1),
rres AS (SELECT ev.vec_id, asg.cid,
           list_transform(range(1, 65), i -> ev.v[i] - asg.cv[i]) AS rv
         FROM ev JOIN asg USING (vec_id)),
cs AS (SELECT cid, max(list_max(list_transform(rv, x -> abs(x)))) AS cscale
       FROM rres {tw}GROUP BY cid),
rqv AS (SELECT r.vec_id, r.cid,
          CASE WHEN cs.cscale > 0
               THEN list_transform(r.rv,
                      x -> CAST(round(x / cs.cscale * {L}) AS BIGINT))
               ELSE list_transform(r.rv, x -> CAST(0 AS BIGINT)) END AS q
        FROM rres r JOIN cs USING (cid)),
rcb AS (SELECT row_number() OVER (ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)),
                                  vec_id) - 1 AS code, q
        FROM rqv {tw}QUALIFY code < 16),
rsub AS (SELECT code, ss.s, rcb.q[ss.s*8+1 : ss.s*8+8] AS cv
         FROM rcb CROSS JOIN (SELECT unnest(range(0,8)) AS s) ss),
red AS (SELECT e.vec_id, e.cid, sb.s, sb.code,
          list_sum(list_transform(range(1,9),
             i -> (e.q[sb.s*8+i] - sb.cv[i]) * (e.q[sb.s*8+i] - sb.cv[i])))
            AS dd
        FROM rqv e CROSS JOIN rsub sb),
renc AS (SELECT vec_id, cid, s, code FROM red
         QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY dd ASC, code ASC) = 1),
qids AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT {nq}),
probe AS (SELECT query_id, cid, cv FROM (
            SELECT sc0.vec_id AS query_id, sc0.cid, sc0.cv,
                   row_number() OVER (PARTITION BY sc0.vec_id
                                      ORDER BY sc0.s DESC, sc0.cid ASC) AS rn
            FROM sc0 JOIN qids ON sc0.vec_id = qids.query_id) _
          WHERE rn <= 4),
qres AS (SELECT p.query_id, p.cid,
           list_transform(range(1, 65), i -> ev.v[i] - p.cv[i]) AS rv
         FROM probe p JOIN ev ON ev.vec_id = p.query_id),
qresq AS (SELECT q.query_id, q.cid,
            CASE WHEN cs.cscale > 0
                 THEN list_transform(q.rv,
                        x -> CAST(round(x / cs.cscale * {L}) AS BIGINT))
                 ELSE list_transform(q.rv, x -> CAST(0 AS BIGINT)) END AS q
          FROM qres q JOIN cs USING (cid)),
rlut AS (SELECT qq.query_id, qq.cid, sb.s, sb.code,
           list_sum(list_transform(range(1,9),
              i -> (qq.q[sb.s*8+i] - sb.cv[i]) * (qq.q[sb.s*8+i] - sb.cv[i])))
             AS dd
         FROM qresq qq CROSS JOIN rsub sb),
rscq AS (SELECT l.query_id, en.vec_id,
           round(CAST(sum(l.dd) AS DOUBLE) * first(cs.cscale) *
                 first(cs.cscale) / ({L}.0 * {L}.0), 6) AS pq_dist
         FROM renc en
         JOIN rlut l ON l.cid = en.cid AND l.s = en.s AND l.code = en.code
         JOIN cs ON cs.cid = en.cid
         GROUP BY 1, 2)"""


# ---------------------------------------------------- unigram-LM oracle


def _unigram_dp_chain(tag: str, score_cte: str, maxw: int, maxp: int,
                      nbest: int = 1) -> str:
    """Viterbi DP over positions 1..maxw as materialized CTE layers —
    the SQL twin of unigram_tok.viterbi_segment / viterbi_nbest:
    dp{tag}_{i} = the ``nbest`` best (score DESC, seg ASC) partials per
    word prefix (beam truncation mirrored layer-by-layer)."""
    ctes = [
        f"dp{tag}_0 AS MATERIALIZED (SELECT word, freq,"
        f" CAST(0 AS BIGINT) AS score, '' AS seg FROM words)"
    ]
    for i in range(1, maxw + 1):
        cands = []
        for l in range(1, min(maxp, i) + 1):
            j = i - l
            cands.append(
                f"SELECT d.word, d.freq, d.score + p.logp AS score,\n"
                f"  CASE WHEN d.seg = '' THEN p.piece"
                f" ELSE d.seg || ' ' || p.piece END AS seg\n"
                f"FROM dp{tag}_{j} d JOIN {score_cte} p\n"
                f"  ON len(d.word) >= {i}"
                f" AND p.piece = substr(d.word, {j + 1}, {l})"
            )
        union = "\nUNION ALL\n".join(cands)
        ctes.append(
            f"dp{tag}_{i} AS MATERIALIZED (SELECT word, freq, score, seg"
            f" FROM (\n  SELECT *, row_number() OVER (PARTITION BY word"
            f" ORDER BY score DESC, seg ASC) AS rn FROM (\n{union}\n) _\n)"
            f" __ WHERE rn <= {nbest})"
        )
    fins = "\nUNION ALL\n".join(
        f"SELECT word, freq, seg, score FROM dp{tag}_{i}"
        f" WHERE len(word) = {i}"
        for i in range(1, maxw + 1)
    )
    ctes.append(f"fin{tag} AS MATERIALIZED (\n{fins}\n)")
    return ",\n".join(ctes)


def _unigram_mstep(tag: str, prev_vocab: str, fin: str, out: str,
                   vsize: int) -> str:
    """SQL twin of the trainer's M-step: recount from fin{tag}, chars
    always survive, prune multis by (cnt DESC, piece ASC) to the
    budget, floor counts at 1, re-score micro-nat logs."""
    return f"""
cnt{tag} AS MATERIALIZED (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(string_split(seg, ' ')) AS piece FROM {fin}
  ) _ GROUP BY piece),
mg{tag} AS (
  SELECT v.piece, coalesce(c.cnt, 0) AS cnt, len(v.piece) AS pl
  FROM {prev_vocab} v LEFT JOIN cnt{tag} c USING (piece)
  WHERE len(v.piece) = 1 OR coalesce(c.cnt, 0) > 0),
nch{tag} AS (SELECT count(*) AS n FROM mg{tag} WHERE pl = 1),
kept{tag} AS (
  SELECT piece, greatest(cnt, 1) AS cnt FROM (
    SELECT m.piece, m.cnt, m.pl,
           row_number() OVER (ORDER BY m.cnt DESC, m.piece ASC) AS rm
    FROM mg{tag} m WHERE m.pl > 1) _, nch{tag}
  WHERE rm <= {vsize} - nch{tag}.n
  UNION ALL
  SELECT piece, greatest(cnt, 1) AS cnt FROM mg{tag} WHERE pl = 1),
tot{tag} AS (SELECT sum(cnt) AS t FROM kept{tag}),
{out} AS MATERIALIZED (
  SELECT piece, cnt,
         CAST(round(ln(cnt::DOUBLE / t) * 1e6) AS BIGINT) AS logp
  FROM kept{tag}, tot{tag})"""


def _unigram_oracle(maxw: int = 16, maxp: int = 4, seed: int = 128,
                    vsize: int = 48) -> tuple[str, str, str]:
    """(vocab_sql, segment_sql, nbest_sql) for the unigram_vocab /
    unigram_segment / unigram_nbest gates — seed vocab, two Viterbi-EM
    rounds, prune, then further DP chains under the final model (1-best
    per-doc stats; beam-2 n-best per word)."""
    head = rf"""
WITH words AS MATERIALIZED (
  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
    FROM documents) _
  WHERE word <> '' AND len(word) <= {maxw} GROUP BY word),
subs AS (
  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(flatten(list_transform(range(1, len(word) + 1),
      i -> list_transform(range(1, least({maxp}, len(word) - i + 1) + 1),
                          l -> substr(word, i, l))))) AS piece
    FROM words) _ GROUP BY piece),
sv0 AS (SELECT piece, cnt FROM subs
        ORDER BY cnt DESC, piece ASC LIMIT {seed}),
seed AS MATERIALIZED (
  SELECT piece, cnt FROM sv0
  UNION ALL
  SELECT s.piece, s.cnt FROM subs s
  WHERE len(s.piece) = 1 AND s.piece NOT IN (SELECT piece FROM sv0)),
tot0 AS (SELECT sum(cnt) AS t FROM seed),
sc0 AS MATERIALIZED (
  SELECT piece, CAST(round(ln(cnt::DOUBLE / t) * 1e6) AS BIGINT) AS logp
  FROM seed, tot0)"""
    core = ",\n".join(
        [
            head,
            _unigram_dp_chain("a", "sc0", maxw, maxp),
            _unigram_mstep("a", "seed", "fina", "sc1", vsize),
            _unigram_dp_chain("b", "sc1", maxw, maxp),
            _unigram_mstep("b", "sc1", "finb", "sc2", vsize),
        ]
    )
    vocab_sql = core + """
SELECT piece, cnt, logp AS logp_micro FROM sc2
ORDER BY cnt DESC, piece ASC"""
    nbest_sql = (
        core
        + ",\n"
        + _unigram_dp_chain("d", "sc2", maxw, maxp, nbest=2)
        + """
SELECT word, freq,
       CAST(row_number() OVER (PARTITION BY word
            ORDER BY score DESC, seg ASC) AS BIGINT) AS rank,
       seg, score
FROM find ORDER BY word, rank"""
    )
    docw = r""",
docw AS MATERIALIZED (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS m FROM (
    SELECT doc_id,
      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS word
    FROM documents) _
  WHERE word <> '' AND len(word) <= """ + str(maxw) + """ GROUP BY 1, 2)"""
    seg_sql = (
        core
        + docw
        + ",\n"
        + _unigram_dp_chain("c", "sc2", maxw, maxp)
        + """
SELECT d.doc_id, CAST(sum(d.m) AS BIGINT) AS n_words,
       CAST(sum(d.m * (len(string_split(f.seg, ' ')))) AS BIGINT)
         AS n_pieces,
       CAST(sum(d.m * f.score) AS BIGINT) AS logp_micro_sum
FROM docw d JOIN finc f USING (word)
GROUP BY d.doc_id ORDER BY d.doc_id"""
    )
    return vocab_sql, seg_sql, nbest_sql


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    # shared whitespace tokenization CTE (the textstats._tokens contract)
    _toks_cte = r"""t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                    x -> x <> '') AS toks
      FROM documents)"""

    # BM25 / RRF shared statistics: (doc, term, tf, dl), df-counts, the
    # df-ranked 6x2-term query set (skip the 20 head terms), avgdl. The
    # double tree `0.25 + 0.75 * dl / avgdl` is literal-identical to
    # retrieval.py so both engines fold the same IEEE sequence.
    _bm25_ctes = f"WITH {_toks_cte}," + r"""
e AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf0 AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
tf AS (SELECT doc_id, term, tf,
         sum(tf) OVER (PARTITION BY doc_id) AS dl FROM tf0),
dfc AS (SELECT term, count(*) AS dfc FROM tf0 GROUP BY 1),
nd AS (SELECT count(*) AS n_docs FROM documents),
cand AS (SELECT term, dfc,
           row_number() OVER (ORDER BY dfc DESC, term ASC) AS r
         FROM dfc ORDER BY dfc DESC, term ASC LIMIT 32),
q AS (SELECT (r - 21) % 6 AS query_id, term, dfc FROM cand WHERE r > 20),
avgdl AS (SELECT sum(dl)::DOUBLE / count(*) AS avgdl
          FROM (SELECT DISTINCT doc_id, dl FROM tf)),
bm AS (SELECT query_id, doc_id,
         sum(CAST(round(ln((n_docs - q.dfc + 0.5) / (q.dfc + 0.5) + 1.0)
                  * 1e6) AS BIGINT)
             * CAST(round(1e6 * (tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
               AS BIGINT)) AS s
       FROM tf JOIN q USING (term) CROSS JOIN nd CROSS JOIN avgdl
       GROUP BY 1, 2)"""

    sql["bm25_topk"] = _bm25_ctes + r""",
rk AS (SELECT query_id, doc_id, s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS rank
       FROM bm)
SELECT query_id, rank, doc_id, round(s / 1e12, 6) AS bm25
FROM rk WHERE rank <= 10 ORDER BY query_id, rank"""

    # index-then-append-then-query must equal the one-shot ranking
    # (df counts and length sums are associative), so the oracle is
    # bm25_topk's SQL verbatim
    sql["bm25_index_topup"] = sql["bm25_topk"]

    sql["rrf_fuse"] = _bm25_ctes + r""",
ti AS (SELECT query_id, doc_id,
         sum(tf * CAST(round(ln((n_docs + 1)::DOUBLE / (q.dfc + 1)) * 1e6)
                  AS BIGINT)) AS s
       FROM tf JOIN q USING (term) CROSS JOIN nd
       GROUP BY 1, 2),
r1 AS (SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS r1
       FROM bm QUALIFY r1 <= 20),
r2 AS (SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS r2
       FROM ti QUALIFY r2 <= 20),
fu AS (SELECT coalesce(r1.query_id, r2.query_id) AS query_id,
         coalesce(r1.doc_id, r2.doc_id) AS doc_id,
         coalesce(CAST(round(1e6 / (60 + r1)) AS BIGINT), 0)
           + coalesce(CAST(round(1e6 / (60 + r2)) AS BIGINT), 0) AS s
       FROM r1 FULL OUTER JOIN r2
         ON r1.query_id = r2.query_id AND r1.doc_id = r2.doc_id),
rk AS (SELECT query_id, doc_id, s,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY s DESC, doc_id ASC) AS rank
       FROM fu)
SELECT query_id, rank, doc_id, round(s / 1e6, 6) AS rrf
FROM rk WHERE rank <= 10 ORDER BY query_id, rank"""

    sql["pmi_topk"] = f"WITH {_toks_cte}," + r"""
bi AS (SELECT unnest(CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i+1])
         ELSE CAST([] AS VARCHAR[]) END) AS bigram FROM t),
bc AS (SELECT bigram, count(*) AS pair_cnt FROM bi
       GROUP BY 1 HAVING count(*) >= 5),
uc AS (SELECT term, count(*) AS cnt
       FROM (SELECT unnest(toks) AS term FROM t) GROUP BY 1),
tot AS (SELECT sum(cnt) AS t_tok FROM uc),
sc AS (SELECT bigram, pair_cnt, l.cnt AS left_cnt, r.cnt AS right_cnt,
         CAST(round(ln((pair_cnt * t_tok)::DOUBLE / (l.cnt * r.cnt)) * 1e6)
              AS BIGINT) AS p
       FROM bc
       JOIN uc l ON l.term = string_split(bigram, ' ')[1]
       JOIN uc r ON r.term = string_split(bigram, ' ')[2]
       CROSS JOIN tot)
SELECT bigram, pair_cnt, left_cnt, right_cnt, round(p / 1e6, 6) AS pmi
FROM sc ORDER BY p DESC, bigram ASC LIMIT 30"""

    sql["chunk_docs"] = f"WITH {_toks_cte}," + r"""
b AS (SELECT doc_id, toks, len(toks) AS ntd,
        CASE WHEN len(toks) = 0 THEN 0
             ELSE 1 + greatest(CAST(ceil((len(toks) - 32) / 24.0)
                               AS BIGINT), 0)
        END AS n
      FROM t),
u AS (SELECT doc_id,
        unnest(list_transform(range(0, n), i -> struct_pack(
          chunk_id := CAST(i AS INT),
          n_tok := CAST(least(32, ntd - i*24) AS INT),
          chunk_text := array_to_string(toks[i*24+1 : i*24+32], ' ')))) AS c
      FROM b)
SELECT doc_id, c.chunk_id AS chunk_id, c.n_tok AS n_tok,
       c.chunk_text AS chunk_text
FROM u ORDER BY doc_id, chunk_id"""

    # NFC gate over the NFD-enriched corpus (_docs_nfd_enriched builds
    # the identical strings with chr()); nfc_normalize == unicodedata NFC
    # (both UAX #15)
    sql["text_norm"] = r"""
WITH enr AS (SELECT doc_id,
    text || CASE doc_id % 4
      WHEN 0 THEN '  cafe' || chr(769)
      WHEN 1 THEN ' nai' || chr(776) || 've  story'
      WHEN 2 THEN ' A' || chr(778) || 'ngstro' || chr(774) || 'm'
      ELSE '' END AS text
  FROM documents)
SELECT doc_id,
  trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g')) AS norm_text,
  length(text) AS n_chars_raw,
  length(trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g')))
    AS n_chars_norm,
  CASE WHEN trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g'))
            <> text THEN 1 ELSE 0 END AS changed
FROM enr ORDER BY doc_id"""

    # canonical-URL dedup over the four-surface-form enrichment
    # (_docs_url_variants builds the identical strings)
    sql["url_dedup"] = r"""
WITH enr AS (SELECT doc_id,
    text || ' ref ' || CASE doc_id % 4
      WHEN 0 THEN 'https://SITE' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
      WHEN 1 THEN 'http://www.site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
      WHEN 2 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
        || '?utm_source=feed&utm_campaign=x'
      ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
    END AS text
  FROM documents),
ex AS (SELECT doc_id,
         unnest(regexp_extract_all(text, 'https?://[^\s]+', 0)) AS u
       FROM enr),
cn AS (SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           lower(u), '^https?://', ''), '^www\.', ''), '[?#].*$', ''),
           '/$', '') AS canon_url
       FROM ex)
SELECT canon_url, min(doc_id) AS keeper_id,
       count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
FROM cn GROUP BY 1 ORDER BY canon_url"""

    # domain-authority PageRank: the same enriched corpus, edges
    # source → lower(host) sans www., 5 unrolled integer power
    # iterations (mirrors datapipe.graph.pagerank exactly: micro-unit
    # ranks, DIV out-degree normalization, 85/100 damping, uniform
    # dangling redistribution). Every sum is cast back to BIGINT — the
    # r6 HUGEINT lesson — and `//` on positive BIGINTs floors like
    # Spark's DIV.
    _pr_layers = []
    for _i in range(1, 6):
        _pr_layers.append(f"""
inf{_i} AS MATERIALIZED (SELECT e.dst AS node,
          CAST(sum((r.r * e.w) // o.wout) AS BIGINT) AS fin
        FROM edges e JOIN r{_i - 1} r ON r.node = e.src
        JOIN outdeg o ON o.src = e.src GROUP BY 1),
dg{_i} AS MATERIALIZED (SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS dg
        FROM r{_i - 1} r LEFT JOIN outdeg o ON o.src = r.node
        WHERE o.src IS NULL),
r{_i} AS MATERIALIZED (SELECT n.node,
         CAST((15 * (1000000000000 // nn.n)) // 100
              + (85 * coalesce(i.fin, 0)) // 100
              + (85 * (d.dg // nn.n)) // 100 AS BIGINT) AS r
       FROM r{_i - 1} n LEFT JOIN inf{_i} i ON i.node = n.node,
            dg{_i} d, nn)""")
    sql["pagerank_topup"] = _pagerank_topup_oracle()

    # HITS on the same edges: alternating hub/authority gathers with
    # HUGEINT-carried sums (the oracle twin of Spark's DECIMAL(38,0))
    # and x*scale//total L1 renormalization each round
    _hits_layers = []
    for _i in range(1, 4):
        _hits_layers.append(f"""
ar{_i} AS MATERIALIZED (SELECT e.dst AS node, sum(CAST(h.h AS HUGEINT) * e.w) AS a0
        FROM edges e JOIN h{_i - 1} h ON h.node = e.src GROUP BY 1),
at{_i} AS (SELECT sum(a0) AS t FROM ar{_i}),
a{_i} AS MATERIALIZED (SELECT node, (a0 * 1000000000000) // t AS a
       FROM ar{_i}, at{_i}),
hr{_i} AS MATERIALIZED (SELECT e.src AS node, sum(CAST(a.a AS HUGEINT) * e.w) AS hh
        FROM edges e JOIN a{_i} a ON a.node = e.dst GROUP BY 1),
ht{_i} AS (SELECT sum(hh) AS t FROM hr{_i}),
h{_i} AS MATERIALIZED (SELECT node, (hh * 1000000000000) // t AS h
       FROM hr{_i}, ht{_i})""")
    sql["hits"] = r"""
WITH enr AS (SELECT doc_id, source,
    text || ' ref ' || CASE doc_id % 4
      WHEN 0 THEN 'https://SITE' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
      WHEN 1 THEN 'http://www.site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
      WHEN 2 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
        || '?utm_source=feed&utm_campaign=x'
      ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
    END AS text
  FROM documents),
hx AS (SELECT source AS src,
         regexp_replace(lower(unnest(
           regexp_extract_all(text, 'https?://([^/\s:]+)', 1))),
           '^www\.', '') AS dst
       FROM enr),
edges AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
          FROM hx GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
h0 AS (SELECT DISTINCT src AS node,
         CAST(1000000000000 AS HUGEINT) AS h FROM edges),""" + ",".join(
        _hits_layers
    ) + """
SELECT n.node,
       CAST(coalesce(h3.h, 0) AS BIGINT) AS hub_micro,
       CAST(coalesce(a3.a, 0) AS BIGINT) AS auth_micro
FROM nodes n LEFT JOIN h3 ON h3.node = n.node
             LEFT JOIN a3 ON a3.node = n.node
ORDER BY n.node"""

    # triangles on the co-citation graph: degree-oriented wedges closed
    # against the oriented edge list; (degree, node) rank ties on the id
    sql["triangles"] = r"""
WITH enr AS (SELECT doc_id, source,
    text || ' ref ' || CASE doc_id % 4
      WHEN 0 THEN 'https://SITE' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
      WHEN 1 THEN 'http://www.site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
      WHEN 2 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
        || '?utm_source=feed&utm_campaign=x'
      ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
    END AS text
  FROM documents),
hx AS (SELECT source AS src,
         regexp_replace(lower(unnest(
           regexp_extract_all(text, 'https?://([^/\s:]+)', 1))),
           '^www\.', '') AS dst
       FROM enr),
ed0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM hx),
cc AS (SELECT a.dst AS u, b.dst AS v
       FROM ed0 a JOIN ed0 b ON a.src = b.src AND a.dst < b.dst
       GROUP BY 1, 2),
und AS MATERIALIZED (SELECT u AS x, v AS y FROM cc UNION SELECT v, u FROM cc),
dg AS (SELECT x, count(*) AS d FROM und GROUP BY 1),
e AS MATERIALIZED (SELECT und.x AS lo, und.y AS hi, dy.d AS hd
      FROM und JOIN dg dx ON dx.x = und.x JOIN dg dy ON dy.x = und.y
      WHERE dx.d < dy.d OR (dx.d = dy.d AND und.x < und.y)),
wd AS (SELECT e1.lo, e1.hi AS h1, e2.hi AS h2
       FROM e e1 JOIN e e2 ON e1.lo = e2.lo
       WHERE e1.hd < e2.hd OR (e1.hd = e2.hd AND e1.hi < e2.hi)),
tr AS (SELECT wd.lo, wd.h1, wd.h2
       FROM wd JOIN e ON e.lo = wd.h1 AND e.hi = wd.h2),
pn AS (SELECT node, count(*) AS t FROM (
         SELECT lo AS node FROM tr
         UNION ALL SELECT h1 FROM tr
         UNION ALL SELECT h2 FROM tr) _ GROUP BY 1)
SELECT dg.x AS node, CAST(dg.d AS BIGINT) AS degree,
       CAST(coalesce(pn.t, 0) AS BIGINT) AS triangles
FROM dg LEFT JOIN pn ON pn.node = dg.x ORDER BY node"""

    sql["pagerank"] = r"""
WITH enr AS (SELECT doc_id, source,
    text || ' ref ' || CASE doc_id % 4
      WHEN 0 THEN 'https://SITE' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '/'
      WHEN 1 THEN 'http://www.site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
      WHEN 2 THEN 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR)
        || '?utm_source=feed&utm_campaign=x'
      ELSE 'https://site' || CAST(doc_id % 50 AS VARCHAR)
        || '.example.org/page/' || CAST(doc_id % 50 AS VARCHAR) || '#frag'
    END AS text
  FROM documents),
hx AS (SELECT source AS src,
         regexp_replace(lower(unnest(
           regexp_extract_all(text, 'https?://([^/\s:]+)', 1))),
           '^www\.', '') AS dst
       FROM enr),
edges AS MATERIALIZED (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
          FROM hx GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM edges
          UNION SELECT dst FROM edges),
outdeg AS MATERIALIZED (SELECT src, CAST(sum(w) AS BIGINT) AS wout
           FROM edges GROUP BY 1),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT nodes.node,
         CAST(1000000000000 // nn.n AS BIGINT) AS r
       FROM nodes, nn),""" + ",".join(_pr_layers) + """
SELECT node, r AS rank_micro FROM r5
ORDER BY rank_micro DESC, node"""

    sql["bpe_train"] = _bpe_train_oracle(20)
    sql["bpe_encode"] = _bpe_encode_oracle(20)
    sql["fertility"] = _bpe_fertility_oracle(20)

    # distinct-n diversity: the gopher-style tagged n-gram explode
    # rolled up to (source, n) totals vs distincts
    sql["ngram_diversity"] = r"""
WITH tk AS (SELECT source,
              list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                          x -> x != '') AS t
            FROM documents),
g AS (
  SELECT source, 1 AS n, unnest(t) AS gram FROM tk
  UNION ALL
  SELECT source, 2, unnest(list_transform(range(1, len(t)),
           i -> t[i] || ' ' || t[i + 1])) FROM tk
  UNION ALL
  SELECT source, 3, unnest(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) FROM tk
),
pg AS (SELECT source, n, gram, count(*) AS c FROM g GROUP BY 1, 2, 3)
SELECT source, n, CAST(sum(c) AS BIGINT) AS total_ngrams,
       CAST(count(*) AS BIGINT) AS distinct_ngrams,
       round(count(*)::DOUBLE / sum(c), 6) AS ttr
FROM pg GROUP BY 1, 2 ORDER BY source, n"""
    sql["dedup_stream"] = """
SELECT DISTINCT md5(text) AS h FROM documents ORDER BY h"""

    # stream-stream interval join == the batch interval join (inner join
    # is exact relational semantics once both watermarks pass)
    sql["stream_join"] = """
WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type
           FROM events),
c AS (SELECT event_id AS click_id, user_id, tus AS cts_us FROM e
      WHERE event_type = 'click'),
v AS (SELECT event_id AS view_id, user_id, tus AS vts_us FROM e
      WHERE event_type = 'view')
SELECT click_id, view_id, c.user_id, cts_us, vts_us
FROM c JOIN v USING (user_id)
WHERE vts_us >= cts_us - 600000000 AND vts_us <= cts_us
ORDER BY click_id, view_id"""

    # out-of-order drain: arrival order cannot change an inner interval
    # join with a beyond-horizon watermark -> the SAME batch oracle
    sql["stream_join_ooo"] = sql["stream_join"]

    # hashed NB language classifier: md5('nb:'||tok) buckets, Laplace
    # log-weights quantized 1e-6 (integer sums), argmax ties to smallest
    # label; docs with no tokens predict NULL
    _nb_hex = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    sql["nb_classify"] = rf"""
WITH t AS (SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                                x -> x != '')) AS tok
           FROM documents),
hb AS (SELECT doc_id, CAST(({_nb_hex}) % 1024 AS BIGINT) AS b
       FROM (SELECT doc_id, md5('nb:' || tok) AS h FROM t) _),
db AS (SELECT doc_id, b, count(*) AS m FROM hb GROUP BY 1, 2),
lab AS (SELECT doc_id, lang AS l FROM documents),
lb AS (SELECT lab.l, db.b, sum(m) AS c
       FROM db JOIN lab USING (doc_id) GROUP BY 1, 2),
tl AS (SELECT l, CAST(sum(c) AS BIGINT) AS tl FROM lb GROUP BY 1),
model AS (SELECT l, b,
            CAST(round(ln((c + 1)::DOUBLE / (tl + 1024)) * 1e6) AS BIGINT)
              AS lq
          FROM lb JOIN tl USING (l)),
nd AS (SELECT count(*) AS n FROM documents),
prior AS (SELECT l, tl,
            CAST(round(ln(nl::DOUBLE / n) * 1e6) AS BIGINT) AS pq,
            CAST(round(ln(1.0 / (tl + 1024)) * 1e6) AS BIGINT) AS missq
          FROM (SELECT l, count(*) AS nl FROM lab GROUP BY 1) p
          JOIN tl USING (l) CROSS JOIN nd),
sc AS (SELECT db.doc_id, pr.l,
         any_value(pr.pq) + sum(db.m * coalesce(model.lq, pr.missq)) AS score
       FROM db CROSS JOIN prior pr
       LEFT JOIN model ON model.l = pr.l AND model.b = db.b
       GROUP BY 1, 2),
pred AS (SELECT doc_id, l AS pred FROM (
           SELECT doc_id, l,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, l ASC) AS rn
           FROM sc) _ WHERE rn = 1)
SELECT d.doc_id, d.lang AS label, pred.pred,
       CASE WHEN pred.pred = d.lang THEN 1 ELSE 0 END AS correct
FROM documents d LEFT JOIN pred USING (doc_id) ORDER BY d.doc_id"""

    # trained language ID: planted transliteration corpus (q_langid's
    # _langid_planted mirrored), char-trigram md5('lid:'||g) buckets %
    # 4096, NB trained on the doc_id%7==0 slice, applied to the rest;
    # same micro-nat quantization + smallest-label tiebreak as
    # nb_classify. Shared CTEs MATERIALIZED (DuckDB re-inlines plain
    # CTEs per reference).
    sql["langid"] = rf"""
WITH src AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN lower(trim(text))
         WHEN doc_id % 3 = 1
           THEN translate(lower(trim(text)), 'aeiou', 'äëïöü')
         ELSE translate(lower(trim(text)), 'aeiount', 'аеиоунт')
    END AS s,
    CASE WHEN doc_id % 3 = 0 THEN 'lat'
         WHEN doc_id % 3 = 1 THEN 'uml' ELSE 'cyr' END AS lang
  FROM documents),
g AS (SELECT doc_id,
        unnest(CASE WHEN len(s) >= 3
               THEN list_transform(range(1, len(s) - 1),
                                   i -> substr(s, i, 3))
               ELSE [s] END) AS gr
      FROM src),
hb AS (SELECT doc_id,
         CAST(({_nb_hex.replace("substr(h,", "substr(hh,")}) % 4096
              AS BIGINT) AS b
       FROM (SELECT doc_id, md5('lid:' || gr) AS hh FROM g
             WHERE gr != '') _),
db AS MATERIALIZED (
  SELECT doc_id, b, count(*) AS m FROM hb GROUP BY 1, 2),
lab AS MATERIALIZED (
  SELECT doc_id, lang AS l FROM src WHERE doc_id % 7 = 0),
lb AS (SELECT lab.l, db.b, sum(m) AS c
       FROM db JOIN lab USING (doc_id) GROUP BY 1, 2),
tl AS MATERIALIZED (
  SELECT l, CAST(sum(c) AS BIGINT) AS tl FROM lb GROUP BY 1),
model AS (SELECT l, b,
            CAST(round(ln((c + 1)::DOUBLE / (tl + 4096)) * 1e6) AS BIGINT)
              AS lq
          FROM lb JOIN tl USING (l)),
nd AS (SELECT count(*) AS n FROM lab),
prior AS (SELECT l,
            CAST(round(ln(nl::DOUBLE / n) * 1e6) AS BIGINT) AS pq,
            CAST(round(ln(1.0 / (tl + 4096)) * 1e6) AS BIGINT) AS missq
          FROM (SELECT l, count(*) AS nl FROM lab GROUP BY 1) p
          JOIN tl USING (l) CROSS JOIN nd),
sc AS (SELECT db.doc_id, pr.l,
         any_value(pr.pq) + sum(db.m * coalesce(model.lq, pr.missq))
           AS score
       FROM db CROSS JOIN prior pr
       LEFT JOIN model ON model.l = pr.l AND model.b = db.b
       WHERE db.doc_id % 7 != 0
       GROUP BY 1, 2),
pred AS (SELECT doc_id, l AS pred FROM (
           SELECT doc_id, l,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, l ASC) AS rn
           FROM sc) _ WHERE rn = 1)
SELECT s.doc_id, s.lang AS label, pred.pred,
       CASE WHEN pred.pred = s.lang THEN 1 ELSE 0 END AS correct
FROM src s LEFT JOIN pred USING (doc_id)
WHERE s.doc_id % 7 != 0 ORDER BY s.doc_id"""

    # variable-length exact-substring extents: planted self-repeats
    # (%21) and shared boilerplate tails (%9), 12-token anchor windows,
    # covered iff the gram occurs >= 2x corpus-wide, consecutive covered
    # positions merge via the lag/run-id window into maximal spans
    sql["suffix_dedup"] = r"""
WITH src AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN doc_id % 21 = 0 THEN text || ' ' || text
         WHEN doc_id % 9 = 0 THEN text
           || ' all rights reserved this corpus is distributed under'
           || ' the open data license terms apply to every derived work'
         ELSE text END AS text
  FROM documents),
t AS (SELECT doc_id,
        regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      FROM src),
pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
        FROM t WHERE len(toks) >= 12),
w AS (SELECT doc_id, p,
        md5(array_to_string(toks[p : p + 11], ' ')) AS h
      FROM pos),
cov AS (SELECT doc_id, p FROM (
          SELECT doc_id, p, count(*) OVER (PARTITION BY h) AS cnt
          FROM w) _ WHERE cnt >= 2),
runs AS (SELECT doc_id, p,
           CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
                THEN 0 ELSE 1 END AS nw
         FROM cov),
rid AS (SELECT doc_id, p,
          sum(nw) OVER (PARTITION BY doc_id ORDER BY p) AS run
        FROM runs)
SELECT doc_id, CAST(min(p) AS BIGINT) AS span_start,
       CAST(max(p) - min(p) + 12 AS BIGINT) AS span_len
FROM rid GROUP BY doc_id, run ORDER BY doc_id, span_start"""
    # per-document anchoring + set-union appends == one-shot extents
    sql["suffix_index_topup"] = sql["suffix_dedup"]
    sql["suffix_stream"] = sql["suffix_dedup"]

    # ExactSubstr EXCISION: the suffix_dedup extents -> per-token
    # coverage union -> rebuilt text (every occurrence removed, tokens
    # re-joined with single spaces, lowercased — _tokens convention);
    # full rebuilt strings + token counts are value-hashed
    sql["suffix_excise"] = r"""
WITH src AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN doc_id % 21 = 0 THEN text || ' ' || text
         WHEN doc_id % 9 = 0 THEN text
           || ' all rights reserved this corpus is distributed under'
           || ' the open data license terms apply to every derived work'
         ELSE text END AS text
  FROM documents),
t AS MATERIALIZED (SELECT doc_id,
        regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      FROM src),
pos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 10)) AS p
        FROM t WHERE len(toks) >= 12),
w AS (SELECT doc_id, p,
        md5(array_to_string(toks[p : p + 11], ' ')) AS h
      FROM pos),
cov AS (SELECT doc_id, p FROM (
          SELECT doc_id, p, count(*) OVER (PARTITION BY h) AS cnt
          FROM w) _ WHERE cnt >= 2),
runs AS (SELECT doc_id, p,
           CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p) = 1
                THEN 0 ELSE 1 END AS nw
         FROM cov),
rid AS (SELECT doc_id, p,
          sum(nw) OVER (PARTITION BY doc_id ORDER BY p) AS run
        FROM runs),
spans AS (SELECT doc_id, min(p) AS s, max(p) + 11 AS e
          FROM rid GROUP BY doc_id, run),
rm AS (SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS tp FROM spans),
u AS (SELECT doc_id, unnest(toks) AS tok,
             unnest(range(1, len(toks) + 1)) AS i
      FROM t)
SELECT u.doc_id,
  CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(count(rm.tp) AS BIGINT) AS removed_tokens,
  coalesce(array_to_string(
    list(u.tok ORDER BY u.i) FILTER (WHERE rm.tp IS NULL), ' '), '')
    AS text
FROM u LEFT JOIN rm ON u.doc_id = rm.doc_id AND u.i = rm.tp
GROUP BY u.doc_id ORDER BY u.doc_id"""

    # canary GUID screen: %23 docs carry canary 1 once, %29 docs carry
    # canary 2 twice; occurrence count = length-difference identity
    sql["canary_scan"] = """
WITH src AS (
  SELECT doc_id,
    text
      || CASE WHEN doc_id % 23 = 0
              THEN ' canary-7fa2bd1e-marker' ELSE '' END
      || CASE WHEN doc_id % 29 = 0
              THEN ' canary-d41d8cd9-marker xyz canary-d41d8cd9-marker'
              ELSE '' END AS text
  FROM documents),
grid AS (SELECT doc_id, text, unnest([
           'canary-7fa2bd1e-marker', 'canary-d41d8cd9-marker']) AS canary
         FROM src),
hits AS (SELECT doc_id, canary,
           CAST((len(text) - len(replace(text, canary, '')))
                // len(canary) AS BIGINT) AS n_hits
         FROM grid)
SELECT doc_id, canary, n_hits FROM hits
WHERE n_hits > 0 ORDER BY doc_id, canary"""

    # cluster-balanced diversity sample: ivf_topk's cell-assignment chain
    # (cosine argmax, ties to lowest cid) + per-cell smallest-md5 quota
    sql["diverse_sample"] = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
sc AS (SELECT n.vec_id, cent.cid,
              coalesce(CASE WHEN n.n2 > 0 AND cent.cn2 > 0
                            THEN list_dot_product(n.v, cent.cv)
                                 / (sqrt(n.n2) * sqrt(cent.cn2)) END,
                       -2.0) AS s
       FROM n CROSS JOIN cent),
asg AS (SELECT vec_id, cid AS cell FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM sc) _ WHERE rn = 1),
rk AS (SELECT vec_id, cell,
         row_number() OVER (PARTITION BY cell
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cell_rank
       FROM asg)
SELECT vec_id, cell, CAST(cell_rank AS INT) AS cell_rank
FROM rk WHERE cell_rank <= 5 ORDER BY cell, cell_rank"""

    # cross-source 5-gram Jaccard: distinct (source, shingle) sets,
    # pairwise intersections via the shingle-keyed self-join, full pair
    # grid so zero-overlap pairs survive
    sql["source_overlap"] = r"""
WITH t AS (SELECT source, regexp_split_to_array(lower(trim(text)), '\s+')
             AS toks FROM documents WHERE text IS NOT NULL),
sh AS (SELECT source,
         CASE WHEN len(toks) >= 5
              THEN list_transform(range(1, len(toks) - 3),
                                  i -> array_to_string(toks[i:i+4], ' '))
              ELSE [array_to_string(toks, ' ')] END AS shingles
       FROM t),
gs AS (SELECT DISTINCT source AS g, unnest(shingles) AS s FROM sh),
sizes AS (SELECT g, count(*) AS n FROM gs GROUP BY 1),
inter AS (SELECT a.g AS ga, b.g AS gb, count(*) AS ni
          FROM gs a JOIN gs b ON a.s = b.s AND a.g < b.g
          GROUP BY 1, 2),
grid AS (SELECT x.g AS ga, y.g AS gb, x.n AS n_a, y.n AS n_b
         FROM sizes x CROSS JOIN sizes y WHERE x.g < y.g)
SELECT ga AS src_a, gb AS src_b, n_a, n_b,
       CAST(coalesce(ni, 0) AS BIGINT) AS n_common,
       round(coalesce(ni, 0)::DOUBLE / (n_a + n_b - coalesce(ni, 0)), 6)
         AS jaccard
FROM grid LEFT JOIN inter USING (ga, gb)
ORDER BY src_a, src_b"""

    # hard-negative mining: int8-cosine top-5 restricted to cross-label
    # candidates BEFORE ranking; NULL labels never qualify
    sql["hard_negatives"] = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
lb AS (SELECT vec_id, label FROM embeddings),
qids AS (SELECT vec_id AS query_id, label AS query_label FROM embeddings
         WHERE label IS NOT NULL ORDER BY vec_id LIMIT 8),
qqv AS (SELECT qids.query_id, qids.query_label, qv.q AS qe
        FROM qv JOIN qids ON qv.vec_id = qids.query_id),
pairs AS (SELECT qqv.query_id, qqv.query_label, e.vec_id,
            lb.label AS neg_label,
            list_sum(list_transform(range(1,65), i -> e.q[i] * qqv.qe[i]))
              AS dot,
            list_sum(list_transform(range(1,65), i -> e.q[i] * e.q[i]))
              AS na2,
            list_sum(list_transform(range(1,65), i -> qqv.qe[i] * qqv.qe[i]))
              AS nb2
          FROM qv e JOIN lb ON lb.vec_id = e.vec_id CROSS JOIN qqv
          WHERE lb.label IS NOT NULL AND lb.label != qqv.query_label),
r AS (SELECT query_id, query_label, vec_id, neg_label,
        round(dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE), 6) AS qcos_sim,
        row_number() OVER (PARTITION BY query_id
          ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE) DESC,
                   vec_id ASC) AS rank
      FROM pairs WHERE na2 > 0 AND nb2 > 0)
SELECT query_id, query_label, vec_id, neg_label, qcos_sim, rank
FROM r WHERE rank <= 5 ORDER BY query_id, rank"""

    sql["resid_index_topup"] = f"""WITH {
        _resid_oracle_ctes(2, train_pred="vec_id % 5 != 0")
    },
rtk AS (SELECT query_id, vec_id, pq_dist,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY pq_dist ASC, vec_id ASC) AS rank
        FROM rscq)
SELECT query_id, vec_id, pq_dist, rank FROM rtk WHERE rank <= 10
ORDER BY query_id, rank"""

    sql["ivfpq_residual_topk"] = f"""WITH {_resid_oracle_ctes(2)},
rtk AS (SELECT query_id, vec_id, pq_dist,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY pq_dist ASC, vec_id ASC) AS rank
        FROM rscq)
SELECT query_id, vec_id, pq_dist, rank FROM rtk WHERE rank <= 10
ORDER BY query_id, rank"""
    sql["residual_recall"] = f"""WITH {_resid_oracle_ctes(8)},
qv8 AS (SELECT vec_id,
          CASE WHEN s > 0
               THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
               ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
        FROM (SELECT vec_id, v,
                list_max(list_transform(v, x -> abs(x))) AS s FROM ev) _),
cb8 AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                  vec_id) - 1 AS code, q
        FROM qv8 QUALIFY code < 16),
sub8 AS (SELECT code, ss.s, cb8.q[ss.s*8+1 : ss.s*8+8] AS cv
         FROM cb8 CROSS JOIN (SELECT unnest(range(0,8)) AS s) ss),
ed8 AS (SELECT e.vec_id, sb.s, sb.code,
          list_sum(list_transform(range(1,9),
             i -> (e.q[sb.s*8+i] - sb.cv[i]) * (e.q[sb.s*8+i] - sb.cv[i])))
            AS dd
        FROM qv8 e CROSS JOIN sub8 sb),
enc8 AS (SELECT vec_id, s, code FROM ed8
         QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                    ORDER BY dd ASC, code ASC) = 1),
lut8 AS (SELECT qids.query_id, sb.s, sb.code,
           list_sum(list_transform(range(1,9),
              i -> (qq.q[sb.s*8+i] - sb.cv[i]) * (qq.q[sb.s*8+i] - sb.cv[i])))
             AS dd
         FROM qv8 qq JOIN qids ON qq.vec_id = qids.query_id
         CROSS JOIN sub8 sb),
cand AS (SELECT probe.query_id, asg.vec_id FROM probe JOIN asg USING (cid)),
scq AS (SELECT c.query_id, c.vec_id, CAST(sum(l.dd) AS BIGINT) AS pq_dist
        FROM cand c JOIN enc8 en ON en.vec_id = c.vec_id
        JOIN lut8 l ON l.query_id = c.query_id
                   AND l.s = en.s AND l.code = en.code
        GROUP BY 1, 2),
rawk AS (SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY pq_dist ASC, vec_id ASC) AS rank
           FROM scq) _ WHERE rank <= 10),
resk AS (SELECT query_id, vec_id FROM (
           SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY pq_dist ASC, vec_id ASC) AS rank
           FROM rscq) _ WHERE rank <= 10),
qqv AS (SELECT qids.query_id, qq.q AS qe
        FROM qv8 qq JOIN qids ON qq.vec_id = qids.query_id),
pairs AS (SELECT qqv.query_id, e.vec_id,
            list_sum(list_transform(range(1,65), i -> e.q[i] * qqv.qe[i]))
              AS dot,
            list_sum(list_transform(range(1,65), i -> e.q[i] * e.q[i]))
              AS na2,
            list_sum(list_transform(range(1,65), i -> qqv.qe[i] * qqv.qe[i]))
              AS nb2
          FROM qv8 e CROSS JOIN qqv),
exv AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                            DESC, vec_id ASC) AS rank
          FROM pairs WHERE na2 > 0 AND nb2 > 0) _ WHERE rank <= 10)
SELECT e.query_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS hit_residual,
       CAST(sum(CASE WHEN w.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS hit_raw,
       round(sum(CASE WHEN r.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS recall_residual,
       round(sum(CASE WHEN w.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS recall_raw
FROM exv e
LEFT JOIN resk r ON r.query_id = e.query_id AND r.vec_id = e.vec_id
LEFT JOIN rawk w ON w.query_id = e.query_id AND w.vec_id = e.vec_id
GROUP BY e.query_id ORDER BY e.query_id"""
    sql["pdp_gauge"] = (
        f"WITH {_PDP_CTE} SELECT series_id, ts, value FROM pdp ORDER BY series_id, ts"
    )
    sql["counter_rate"] = f"""
WITH pre AS (
  SELECT event_type AS series_id, epoch(ts)::DOUBLE AS t, avg(value) AS v
  FROM events GROUP BY 1, 2),
c AS (SELECT series_id, t, sum(v) OVER (PARTITION BY series_id ORDER BY t) AS cv FROM pre),
r AS (SELECT series_id, t AS ts, cv, lag(cv) OVER w AS pv, t - lag(t) OVER w AS iv
      FROM c WINDOW w AS (PARTITION BY series_id ORDER BY t))
SELECT series_id, ts, round((cv - pv)/iv, 6) AS rate
FROM r WHERE pv IS NOT NULL AND iv <= {HB}
ORDER BY series_id, ts"""
    exact_avg = (
        "floor((sum(CAST(round(value*1000000.0) AS BIGINT))*2 + count(value))::DOUBLE"
        " / (count(value)*2)::DOUBLE) / 1000000.0"
    )
    sql["cdp_avg"] = _cdp_cte(exact_avg)
    sql["cdp_min"] = _cdp_cte("min(value)")
    sql["cdp_max"] = _cdp_cte("max(value)")
    sql["cdp_last"] = _cdp_cte(
        f"max(CASE WHEN ts = ceil(ts/{_CDP_RES})*{_CDP_RES} THEN value END)"
    )
    sql["reduce_avg"] = f"""WITH {_PDP_CTE}
SELECT series_id, ceil(ts/{STEP * 2})*{STEP * 2} AS ts, round({exact_avg}, 6) AS value
FROM pdp GROUP BY 1, 2 ORDER BY series_id, ts"""
    sql["vdef_max"] = f"""WITH {_PDP_CTE},
m AS (SELECT series_id, max(value) AS mv FROM pdp GROUP BY 1)
SELECT pdp.series_id, round(mv, 6) AS value, min(ts) AS when_ts
FROM pdp JOIN m ON pdp.series_id = m.series_id AND pdp.value = m.mv
GROUP BY 1, 2 ORDER BY 1"""
    sql["vdef_stats"] = f"""WITH {_PDP_CTE},
xs AS (SELECT series_id, CAST(round(value*1000000.0) AS HUGEINT) AS x FROM pdp),
s AS (SELECT series_id, sum(x) AS s1, sum(x*x) AS s2, count(*) AS n FROM xs GROUP BY 1)
SELECT series_id,
  floor((s1*2 + n)::DOUBLE / (n*2)::DOUBLE) / 1000000.0 AS avg_v,
  round(sqrt((n*s2 - s1*s1)::DOUBLE / (n::DOUBLE * n::DOUBLE)) / 1000000.0, 6) AS stdev_v,
  round(s1::DOUBLE / 1000000.0 * {STEP}, 4) AS total_v
FROM s ORDER BY 1"""
    sql["vdef_percentile"] = f"""WITH {_PDP_CTE},
r AS (SELECT series_id, value, row_number() OVER (PARTITION BY series_id ORDER BY value) AS rn,
             count(*) OVER (PARTITION BY series_id) AS m
      FROM pdp)
SELECT series_id, round(value, 6) AS value FROM r
WHERE rn - 1 = CAST(round(95.0 * (m - 1) / 100.0) AS BIGINT) ORDER BY 1"""
    sql["vdef_lslslope"] = f"""WITH {_PDP_CTE},
x AS (SELECT series_id, CAST(round(value*1000000.0) AS BIGINT) AS xv,
             (row_number() OVER (PARTITION BY series_id ORDER BY ts) - 1) AS xi FROM pdp),
s AS (SELECT series_id, count(*) AS cnt, sum(xi) AS sx, sum(xi*xi) AS sxx,
             sum(xi*xv) AS sxy, sum(xv) AS sy FROM x GROUP BY 1)
SELECT series_id,
  round((sx*sy - cnt*sxy)::DOUBLE / (sx*sx - cnt*sxx)::DOUBLE / 1000000.0, 6) AS value
FROM s ORDER BY 1"""
    sql["rpn_chain"] = f"""WITH {_PDP_CTE}, {_GRID_CTE}
SELECT series_id, ts,
       round(pow(least(CASE WHEN value IS NULL THEN 0 ELSE value END, 100), 2), 6) AS value
FROM padded ORDER BY series_id, ts"""
    sql["trend"] = f"""WITH {_PDP_CTE}, {_GRID_CTE},
t AS (SELECT series_id, ts,
             floor(((sum(CAST(round(value*1000000.0) AS BIGINT)) OVER wr)*2
                    + count(value) OVER wr)::DOUBLE
                   / ((count(value) OVER wr)*2)::DOUBLE) / 1000000.0 AS tv,
             row_number() OVER (PARTITION BY series_id ORDER BY ts) AS rn
      FROM padded
      WINDOW wr AS (PARTITION BY series_id ORDER BY ts
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
SELECT series_id, ts, tv AS value FROM t
WHERE rn >= 3 AND tv IS NOT NULL ORDER BY series_id, ts"""
    cdp_avg_cte = f"""cdp0 AS (
  SELECT series_id, ceil(ts/{_CDP_RES})*{_CDP_RES} AS ts, {exact_avg} AS v, count(*) AS known
  FROM pdp GROUP BY 1, 2),
cdp AS (SELECT series_id, ts, round(v, 6) AS value FROM cdp0
        WHERE ({CDP_N} - known) <= {CDP_N * XFF} AND v IS NOT NULL)"""
    sql["shift_week"] = f"""WITH {_PDP_CTE}, {cdp_avg_cte}
SELECT a.series_id, a.ts, a.value, b.value AS value_prev_week
FROM cdp a JOIN cdp b ON a.series_id = b.series_id AND b.ts = a.ts - 604800.0
ORDER BY a.series_id, a.ts"""
    sql["xport_pivot"] = f"""WITH {_PDP_CTE}, {cdp_avg_cte}
SELECT ts,
  max(value) FILTER (series_id = 'click') AS click,
  max(value) FILTER (series_id = 'error') AS error,
  max(value) FILTER (series_id = 'purchase') AS purchase,
  max(value) FILTER (series_id = 'signup') AS signup,
  max(value) FILTER (series_id = 'view') AS view
FROM cdp GROUP BY ts ORDER BY ts"""
    # --- graph data_proc (paint-chain association mirrors
    # plans.graph.data_proc exactly: left-nested base + coalesce(val, 0))
    graph_cte = f"""{_PDP_CTE}, {cdp_avg_cte},
w AS (SELECT ts,
  max(value) FILTER (series_id = 'click') AS click,
  max(value) FILTER (series_id = 'error') AS error,
  max(value) FILTER (series_id = 'purchase') AS purchase,
  max(value) FILTER (series_id = 'signup') AS signup
  FROM cdp GROUP BY ts),
m AS (SELECT *, CASE WHEN error <= {_GRAPH_MASK} THEN error END AS error_m FROM w),
p AS (SELECT ts,
  (0.0 + click) AS click_area,
  ((0.0 + coalesce(click, 0.0)) + error_m) AS error_stack,
  (((0.0 + coalesce(click, 0.0)) + coalesce(error_m, 0.0)) + purchase)
    AS purchase_stack,
  (0.0 + 50.0) AS baseline,
  (0.0 + signup) AS signup_tick
  FROM m)"""
    sql["graph_stack"] = f"""WITH {graph_cte}
SELECT ts, round(click_area, 6) AS click_area,
       round(error_stack, 6) AS error_stack,
       round(purchase_stack, 6) AS purchase_stack,
       round(baseline, 6) AS baseline,
       round(signup_tick, 6) AS signup_tick
FROM p ORDER BY ts"""
    sql["graph_scale"] = f"""WITH {graph_cte}
SELECT round(least(min(click_area), min(error_stack), min(purchase_stack),
                   min(baseline)), 6) AS value_min,
       round(greatest(max(click_area), max(error_stack), max(purchase_stack),
                      max(baseline)), 6) AS value_max
FROM p"""

    sql["first_last"] = f"""WITH {_PDP_CTE}
SELECT series_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n_rows
FROM pdp GROUP BY 1 ORDER BY 1"""
    sql["align_outer"] = f"""WITH {_PDP_CTE},
a AS (SELECT ts, value AS click_v FROM pdp WHERE series_id = 'click'),
b AS (SELECT ts, value AS view_v FROM pdp WHERE series_id = 'view')
SELECT coalesce(a.ts, b.ts) AS ts, click_v, view_v
FROM a FULL OUTER JOIN b ON a.ts = b.ts ORDER BY 1"""
    sql["dedup_exact"] = """
SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS copies
FROM documents GROUP BY 1 ORDER BY 1"""
    sql["text_stats"] = """
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\\s+')) AS token_cnt,
  round(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / n_chars, 6) AS alpha_ratio,
  round(len(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE / n_chars, 6) AS digit_ratio
FROM documents ORDER BY doc_id"""
    stop_list = ", ".join(f"'{s}'" for s in _STOPWORDS)
    sql["stopword_density"] = f"""
SELECT doc_id, lang,
  round(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                        x -> x IN ({stop_list})))::DOUBLE
        / len(regexp_split_to_array(lower(text), '\\s+')), 6) AS stopword_density
FROM documents ORDER BY doc_id"""
    sig_cols = ",\n  ".join(
        f"list_aggregate(list_transform(shingles, s -> md5('{seed}' || s)), 'min') AS sig{i}"
        for i, seed in enumerate(_MINHASH_SEEDS)
    )
    sql["minhash_sig"] = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
sh AS (
  SELECT doc_id,
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
         ELSE [array_to_string(toks, ' ')] END AS shingles
  FROM t)
SELECT doc_id,
  {sig_cols}
FROM sh ORDER BY doc_id"""
    # simhash md5 mode: nibble j = hex digit j of md5(token); token-hash bit
    # i = (nibble[i//4] >> (i%4)) & 1 — identical formula to dedup.simhash
    nib_cols = ",\n    ".join(
        f"strpos('0123456789abcdef', substr(hx, {j + 1}, 1)) - 1 AS n{j}"
        for j in range(16)
    )
    vote_cols = ",\n    ".join(
        f"sum(CASE WHEN ((n{i // 4} >> {i % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    fp_terms = " + ".join(
        f"CASE WHEN b{i} > 0 THEN {2**i if i < 63 else '(-9223372036854775807 - 1)'}::BIGINT ELSE 0 END"
        for i in range(64)
    )
    sql["simhash"] = f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents),
h AS (SELECT doc_id, md5(tok) AS hx FROM t),
n AS (SELECT doc_id,
    {nib_cols}
  FROM h),
v AS (SELECT doc_id,
    {vote_cols}
  FROM n GROUP BY doc_id)
SELECT doc_id, {fp_terms} AS simhash
FROM v ORDER BY doc_id"""
    # media_features: the deterministic stub codec is plain byte math —
    # byte i of the utf-8 payload (zero-padded to 256), pooled 4-at-a-time
    # as (b0/255 + b1/255 + b2/255 + b3/255)/4 in doubles, rounded to
    # float32 once (datapipe/multimodal.py). Bytes come from hex(encode())
    # nibbles so multi-byte text is handled identically.
    sql["media_features"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t),
f AS (SELECT doc_id, list_transform(range(0, 64), j ->
        (((bytes[4*j+1]/255.0 + bytes[4*j+2]/255.0) + bytes[4*j+3]/255.0)
         + bytes[4*j+4]/255.0) / 4.0) AS feat
      FROM b)
SELECT doc_id, j AS feat_idx, round((feat[j+1]::FLOAT)::DOUBLE, 6) AS feat_val
FROM f, range(0, 64) r(j)
ORDER BY doc_id, feat_idx"""
    # media_decode: the Spark side runs the REAL stdlib PNG/WAV decoders
    # (strict mode) over payloads encoded from the same text bytes; the
    # oracle recomputes the decoded signal directly — PNG gray8 pixel =
    # byte/255, WAV pcm8 sample = (byte-128)/128 — pooled 4-at-a-time in
    # doubles, float32-rounded once, like media_features.
    sql["media_decode"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t),
f AS (
  SELECT doc_id, 'image' AS kind, list_transform(range(0, 64), j ->
      (((bytes[4*j+1]/255.0 + bytes[4*j+2]/255.0) + bytes[4*j+3]/255.0)
       + bytes[4*j+4]/255.0) / 4.0) AS feat
  FROM b
  UNION ALL
  SELECT doc_id, 'audio' AS kind, list_transform(range(0, 64), j ->
      ((((bytes[4*j+1]-128)/128.0 + (bytes[4*j+2]-128)/128.0)
        + (bytes[4*j+3]-128)/128.0) + (bytes[4*j+4]-128)/128.0) / 4.0) AS feat
  FROM b)
SELECT doc_id, kind, j AS feat_idx,
       round((feat[j+1]::FLOAT)::DOUBLE, 6) AS feat_val
FROM f, range(0, 64) r(j)
ORDER BY doc_id, kind, feat_idx"""
    # media_probe: the probe reads PNG IHDR / WAV fmt chunks from real
    # bytes; the oracle recomputes the doc_id → dims/rate mapping that
    # synthesize_media_real(var_dims=True) encoded (w = 8+id%9,
    # h = ceil(256/w) from the zero-padded signal; rate = 4000+100*(id%20),
    # 256 8-bit mono frames)
    sql["media_probe"] = """
SELECT doc_id, 'image' AS kind, 'image/png' AS mime,
       (8 + doc_id % 9)::BIGINT AS width,
       CAST(ceil(256.0 / (8 + doc_id % 9)) AS BIGINT) AS height,
       NULL::BIGINT AS sample_rate, NULL::BIGINT AS n_samples,
       NULL::BIGINT AS duration_ms
FROM documents
UNION ALL
SELECT doc_id, 'audio' AS kind, 'audio/wav' AS mime,
       NULL::BIGINT, NULL::BIGINT,
       (4000 + 100 * (doc_id % 20))::BIGINT AS sample_rate,
       256::BIGINT AS n_samples,
       (256000 // (4000 + 100 * (doc_id % 20)))::BIGINT AS duration_ms
FROM documents
ORDER BY doc_id, kind"""
    # media_resize: nearest-neighbor 16x16 -> 8x8 picks source pixel
    # (2y, 2x) = padded byte 32y+2x; values byte/255 float32-rounded (the
    # 64-bucket pooling over 64 pixels is the identity)
    sql["media_resize"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t)
SELECT doc_id, j AS pix_idx,
  round((((bytes[32*(j//8) + 2*(j%8) + 1] / 255.0))::FLOAT)::DOUBLE, 6)
    AS pix_val
FROM b, range(0, 64) r(j)
ORDER BY doc_id, pix_idx"""
    # media_frames: every 4th 8-bit PCM frame, re-encoded 16-bit exactly:
    # sample i = (byte[4i]-128)/128
    sql["media_frames"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t)
SELECT doc_id, j AS frame_idx,
  round((((bytes[4*j + 1] - 128) / 128.0)::FLOAT)::DOUBLE, 6) AS frame_val
FROM b, range(0, 64) r(j)
ORDER BY doc_id, frame_idx"""
    # media_jpeg: quality-100 block-flat JPEG reconstructs bit-exactly
    # (all-ones quant tables; R=G=B keeps 4:2:0 chroma flat at 128), and
    # the 64x64→8x8 nearest-neighbor resize picks pixel (8y,8x) = block
    # (y,x) = byte 8y+x — so decoded pixel j is exactly byte[j]/255 for
    # both the gray and color streams.
    sql["media_jpeg"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 64), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t)
SELECT doc_id, k.kind, j AS pix_idx,
  round(((bytes[j+1] / 255.0)::FLOAT)::DOUBLE, 6) AS pix_val
FROM b, (VALUES ('jpeg'), ('jpeg_rgb')) k(kind), range(0, 64) r(j)
ORDER BY doc_id, kind, pix_idx"""
    # media_video: 4-frame animated GIF (frame f = bytes 64f..64f+63,
    # delay 2+(doc_id+f)%5 cs) strided every 2nd frame losslessly; kept
    # frame k = source frame 2k, its delay absorbs the dropped follower.
    # Per-frame pooling over the 8x8 RGB frame is 3 identical channel
    # values per bucket -> byte/255 exactly.
    sql["media_video"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t)
SELECT doc_id, f AS frame_idx,
  (4 + (doc_id + 2*f) % 5 + (doc_id + 2*f + 1) % 5)::BIGINT AS delay_cs,
  j AS feat_idx,
  round(((bytes[128*f + j + 1] / 255.0)::FLOAT)::DOUBLE, 6) AS feat_val
FROM b, range(0, 2) rf(f), range(0, 64) r(j)
ORDER BY doc_id, frame_idx, feat_idx"""
    # media_flac: FLAC sample i = (byte_i-128)*256 at 16 bit decodes to
    # (byte_i-128)/128 exactly — identical pooled byte math to the WAV
    # audio gate, but the bytes travel through Rice/fixed-predictor
    # coding with verified CRCs.
    sql["media_flac"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t),
f AS (SELECT doc_id, list_transform(range(0, 64), j ->
        ((((bytes[4*j+1]-128)/128.0 + (bytes[4*j+2]-128)/128.0)
          + (bytes[4*j+3]-128)/128.0) + (bytes[4*j+4]-128)/128.0) / 4.0) AS feat
      FROM b)
SELECT doc_id, j AS feat_idx, round((feat[j+1]::FLOAT)::DOUBLE, 6) AS feat_val
FROM f, range(0, 64) r(j)
ORDER BY doc_id, feat_idx"""
    # media_g711: text bytes are verbatim mu-law codes; the companding
    # expansion is integer bit math (u = 255-b; mag = (8*mant+132)*2^exp
    # - 132; sign = bit 7 of u), pooled 4-at-a-time like the other audio
    # gates.
    sql["media_g711"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t),
v AS (SELECT doc_id, list_transform(bytes, bb ->
        CASE WHEN (255 - bb) >= 128 THEN -1.0 ELSE 1.0 END
        * ((((255 - bb) % 16) * 8 + 132) * power(2, ((255 - bb) // 16) % 8)
           - 132) / 32768.0) AS smp
      FROM b),
f AS (SELECT doc_id, list_transform(range(0, 64), j ->
        (((smp[4*j+1] + smp[4*j+2]) + smp[4*j+3]) + smp[4*j+4]) / 4.0) AS feat
      FROM v)
SELECT doc_id, j AS feat_idx, round((feat[j+1]::FLOAT)::DOUBLE, 6) AS feat_val
FROM f, range(0, 64) r(j)
ORDER BY doc_id, feat_idx"""
    # media_ahash: sampled pixel (2y,2x) of the 16x16 PNG is byte 32y+2x;
    # mean = sum/64 (power-of-two divisor → exact double), bit j set iff
    # px > mean; the signed 64-bit hash is two's-complement: the MSB
    # contributes -2^63, the rest +2^(63-j).
    sql["media_ahash"] = """
WITH t AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t),
s AS (SELECT doc_id, list_transform(range(0, 64), j ->
        bytes[32*(j//8) + 2*(j%8) + 1]) AS px
      FROM b),
m AS (SELECT doc_id, px, list_aggregate(px, 'sum') / 64.0 AS mean FROM s),
h AS (SELECT doc_id,
        CAST(list_aggregate(list_transform(range(0, 64), j ->
          CASE WHEN px[j+1] > mean THEN
            CASE WHEN j = 0 THEN (-9223372036854775807 - 1)::HUGEINT
                 ELSE (1::HUGEINT << (63 - j)) END
          ELSE 0::HUGEINT END), 'sum') AS BIGINT) AS ahash,
        len(list_filter(range(0, 64), j -> px[j+1] <= mean)) AS n_dark
      FROM m)
SELECT doc_id, 'image' AS kind, ahash, n_dark::BIGINT AS n_dark
FROM h ORDER BY doc_id"""
    # image_near_dup: hamming-0 banding degenerates to hash equality, so
    # the oracle recomputes each ahash from the even partner's bytes and
    # self-joins; planted pairs (2k, 2k+1) plus any genuine collisions.
    sql["image_near_dup"] = """
WITH pm AS (SELECT d.doc_id, s.text
        FROM documents d JOIN documents s
          ON s.doc_id = d.doc_id - d.doc_id % 2),
t AS (SELECT doc_id, hex(encode(text)) AS hx FROM pm),
b AS (SELECT doc_id, list_transform(range(0, 256), i ->
        CASE WHEN 2*i + 2 <= len(hx)
             THEN 16*(strpos('0123456789ABCDEF', substr(hx, 2*i+1, 1)) - 1)
                  + (strpos('0123456789ABCDEF', substr(hx, 2*i+2, 1)) - 1)
             ELSE 0 END) AS bytes
      FROM t),
s AS (SELECT doc_id, list_transform(range(0, 64), j ->
        bytes[32*(j//8) + 2*(j%8) + 1]) AS px
      FROM b),
m AS (SELECT doc_id, px, list_aggregate(px, 'sum') / 64.0 AS mean FROM s),
h AS (SELECT doc_id,
        CAST(list_aggregate(list_transform(range(0, 64), j ->
          CASE WHEN px[j+1] > mean THEN
            CASE WHEN j = 0 THEN (-9223372036854775807 - 1)::HUGEINT
                 ELSE (1::HUGEINT << (63 - j)) END
          ELSE 0::HUGEINT END), 'sum') AS BIGINT) AS ahash
      FROM m)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0::BIGINT AS hamming
FROM h a JOIN h b ON a.ahash = b.ahash AND a.doc_id < b.doc_id
ORDER BY id_a, id_b"""
    # seq_pack: the packing index is pure integer arithmetic over a
    # window cumsum of (whitespace tokens + 1 EOD) in doc_id order —
    # sequence s covers doc tokens [max(0, 64s-off), min(n, 64(s+1)-off)).
    sql["seq_pack"] = """
WITH t AS (SELECT doc_id,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
          AS n_tokens
      FROM documents),
o AS (SELECT doc_id, n_tokens,
        COALESCE(SUM(n_tokens + 1) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM t),
e AS (SELECT doc_id, n_tokens, off,
        unnest(generate_series((off // 64)::BIGINT,
                               ((off + n_tokens - 1) // 64)::BIGINT))
          AS seq_idx
      FROM o WHERE n_tokens > 0)
SELECT seq_idx::BIGINT AS seq_idx, doc_id, n_tokens::BIGINT AS n_tokens,
  GREATEST(0, seq_idx * 64 - off)::BIGINT AS tok_from,
  LEAST(n_tokens, (seq_idx + 1) * 64 - off)::BIGINT AS tok_to,
  GREATEST(0, off - seq_idx * 64)::BIGINT AS pos_in_seq
FROM e ORDER BY seq_idx, doc_id"""
    # media_probe2: header facts the probe must read back from real
    # encoded bytes — JPEG SOF 64x64, single-frame GIF 16x16 (1 frame,
    # 0 delay), BMP 16x16, 4-frame video GIF 8x8 with total duration
    # 10*(8 + sum_f (doc_id+f)%5) ms.
    sql["media_probe2"] = """
SELECT doc_id, 'jpeg' AS kind, 'image/jpeg' AS mime,
       64::BIGINT AS width, 64::BIGINT AS height,
       NULL::BIGINT AS n_frames, NULL::BIGINT AS duration_ms
FROM documents
UNION ALL
SELECT doc_id, 'gif', 'image/gif', 16, 16, 1, 0 FROM documents
UNION ALL
SELECT doc_id, 'bmp', 'image/bmp', 16, 16, NULL, NULL FROM documents
UNION ALL
SELECT doc_id, 'video', 'image/gif', 8, 8, 4,
       10 * (8 + doc_id % 5 + (doc_id+1) % 5 + (doc_id+2) % 5 + (doc_id+3) % 5)
FROM documents
ORDER BY doc_id, kind"""
    sql["repetition"] = """
WITH t AS (SELECT doc_id, text FROM documents),
l AS (SELECT doc_id,
        len(string_split(text, chr(10))) AS nl,
        len(list_distinct(string_split(text, chr(10)))) AS dl
      FROM t),
tok AS (SELECT doc_id,
          regexp_split_to_array(lower(trim(text)), '\s+') AS tk
        FROM t),
bg AS (SELECT doc_id,
         list_transform(range(1, len(tk)), i -> tk[i] || ' ' || tk[i+1]) AS bgs
       FROM tok),
e AS (SELECT doc_id, len(bgs) AS n, unnest(bgs) AS b FROM bg),
c AS (SELECT doc_id, n, b, count(*) AS cnt FROM e GROUP BY doc_id, n, b),
m AS (SELECT doc_id, n, max(cnt) AS top FROM c GROUP BY doc_id, n)
SELECT t.doc_id,
  round(CASE WHEN l.nl > 0 THEN (l.nl - l.dl)::DOUBLE / l.nl END, 6)
    AS dup_line_frac,
  round(CASE WHEN m.n > 0 THEN m.top::DOUBLE / m.n END, 6) AS top_bigram_frac
FROM t JOIN l USING(doc_id) LEFT JOIN m USING(doc_id)
ORDER BY doc_id"""
    sql["quality"] = """
WITH m AS (
  SELECT doc_id, length(text)::DOUBLE AS n,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS a,
    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS d,
    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE AS p,
    length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS u
  FROM documents)
SELECT doc_id,
  round(a/n, 6) AS alpha_ratio,
  round(d/n, 6) AS digit_ratio,
  round(u/n, 6) AS upper_ratio,
  round(least(a/n*1.25, 1.0)*0.5 + (1.0 - least(d/n*4, 1.0))*0.2
        + (1.0 - least(p/n*5, 1.0))*0.2 + (1.0 - least(u/n*3, 1.0))*0.1, 6)
    AS quality_score
FROM m ORDER BY doc_id"""
    lang_exprs = []
    for lang, words in (
        ("en", ("the", "and", "of", "to", "in", "a", "is", "that", "it", "for")),
        ("de", ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den")),
        ("fr", ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que")),
        ("es", ("el", "la", "los", "y", "es", "un", "una", "de", "que", "en")),
    ):
        wl = ", ".join(f"'{w}'" for w in words)
        lang_exprs.append(
            f"len(list_filter(toks, x -> x IN ({wl})))::DOUBLE / len(toks) AS score_{lang}"
        )
    sql["lang_guess"] = f"""
WITH t AS (SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents),
s AS (SELECT doc_id, lang, {", ".join(lang_exprs)} FROM t),
g AS (SELECT *, greatest(score_en, score_de, score_fr, score_es) AS best FROM s)
SELECT doc_id, lang,
  round(score_en, 6) AS score_en, round(score_de, 6) AS score_de,
  round(score_fr, 6) AS score_fr, round(score_es, 6) AS score_es,
  CASE WHEN score_en = best AND best > 0 THEN 'en'
       WHEN score_de = best AND best > 0 THEN 'de'
       WHEN score_fr = best AND best > 0 THEN 'fr'
       WHEN score_es = best AND best > 0 THEN 'es' END AS lang_guess
FROM g ORDER BY doc_id"""
    sql["ann_cosine_top10"] = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           ORDER BY vec_id LIMIT 1),
pairs AS (
  SELECT e.vec_id,
    (SELECT sum(a.x::DOUBLE * b.x::DOUBLE)
     FROM (SELECT unnest(e.embedding) AS x, generate_subscripts(e.embedding, 1) AS i) a
     JOIN (SELECT unnest(q.qe) AS x, generate_subscripts(q.qe, 1) AS i) b USING (i)) AS dot,
    sqrt((SELECT sum(x.x::DOUBLE * x.x::DOUBLE) FROM (SELECT unnest(e.embedding) AS x) x)) AS na,
    sqrt((SELECT sum(x.x::DOUBLE * x.x::DOUBLE) FROM (SELECT unnest(q.qe) AS x) x)) AS nb
  FROM embeddings e, q WHERE e.vec_id != q.qid),
sims AS (SELECT vec_id, round(dot / (na * nb), 6) AS cos_sim FROM pairs),
ranked AS (SELECT vec_id, cos_sim,
                  row_number() OVER (ORDER BY cos_sim DESC, vec_id ASC) AS rank
           FROM sims)
SELECT vec_id, cos_sim, rank FROM ranked WHERE rank <= 10 ORDER BY rank"""

    # nearest-centroid classifier: int8 quantize (same qv chain), per-
    # label rounded-mean integer centroids, integer L2 argmin with ties
    # to the lowest label
    sql["centroid_classify"] = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
lb AS (SELECT vec_id, label FROM embeddings),
px AS (SELECT lb.label AS lbl, ii.i AS pos, qv.q[ii.i] AS x
       FROM qv JOIN lb ON lb.vec_id = qv.vec_id
       CROSS JOIN (SELECT unnest(range(1, 65)) AS i) ii
       WHERE lb.label IS NOT NULL),
cent AS (SELECT lbl, pos,
           CAST(round(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS c
         FROM px GROUP BY 1, 2),
cl AS (SELECT lbl, list(c ORDER BY pos) AS cv FROM cent GROUP BY 1),
sc AS (SELECT qv.vec_id, cl.lbl,
         list_sum(list_transform(range(1, 65),
            i -> (qv.q[i] - cv[i]) * (qv.q[i] - cv[i]))) AS dd
       FROM qv CROSS JOIN cl),
pr AS (SELECT vec_id, lbl AS pred FROM (
         SELECT vec_id, lbl,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dd ASC, lbl ASC) AS rn
         FROM sc) _ WHERE rn = 1)
SELECT pr.vec_id, lb.label, pr.pred,
       CASE WHEN pr.pred = lb.label THEN 1 ELSE 0 END AS correct
FROM pr JOIN lb USING (vec_id) ORDER BY vec_id"""

    # Lloyd k-means, 3 unrolled assign+update rounds (mirrors
    # similarity.kmeans_model exactly); the topup variant freezes the
    # trained centroids on a subset (same predicate as the Spark gate)
    # while the final scoring pass runs over everything
    sql["kmeans_iter"] = _kmeans_oracle()
    sql["kmeans_topup"] = _kmeans_oracle(train_pred="vec_id % 5 != 0")

    # product quantization ADC: int8 quantize (same qv chain as
    # ann_int8_topk), codebook = 16 smallest-md5(id) vectors split into
    # 8 subspaces (the ivf_topk sampling convention), encode = per-
    # subspace integer argmin (ties to lowest code), query LUT join,
    # ascending-distance top-10 — all-integer, bit-exact on both engines
    _pq_cte = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS code, q
       FROM qv QUALIFY code < 16),
sub AS (SELECT code, ss.s, cb.q[ss.s*8+1 : ss.s*8+8] AS cv
        FROM cb CROSS JOIN (SELECT unnest(range(0,8)) AS s) ss),
ed AS (SELECT e.vec_id, sb.s, sb.code,
         list_sum(list_transform(range(1,9),
            i -> (e.q[sb.s*8+i] - sb.cv[i]) * (e.q[sb.s*8+i] - sb.cv[i])))
           AS dd
       FROM qv e CROSS JOIN sub sb),
enc AS (SELECT vec_id, s, code FROM ed
        QUALIFY row_number() OVER (PARTITION BY vec_id, s
                                   ORDER BY dd ASC, code ASC) = 1),
qids AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT 2),
lut AS (SELECT qids.query_id, sb.s, sb.code,
          list_sum(list_transform(range(1,9),
             i -> (qq.q[sb.s*8+i] - sb.cv[i]) * (qq.q[sb.s*8+i] - sb.cv[i])))
            AS dd
        FROM qv qq JOIN qids ON qq.vec_id = qids.query_id
        CROSS JOIN sub sb),
sc AS (SELECT l.query_id, en.vec_id, CAST(sum(l.dd) AS BIGINT) AS pq_dist
       FROM enc en JOIN lut l ON en.s = l.s AND en.code = l.code
       GROUP BY 1, 2)"""

    sql["pq_topk"] = _pq_cte + """,
r AS (SELECT query_id, vec_id, pq_dist,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY pq_dist ASC, vec_id ASC) AS rank
      FROM sc)
SELECT query_id, vec_id, pq_dist, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank"""

    # IVFADC: ivf_topk's float cell/probe chain (identical CTEs) confines
    # the candidates; pq_topk's integer code/LUT chain scores them
    sql["ivfpq_topk"] = _pq_cte + """,
n2f AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM ev),
cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n2f
         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
sc0 AS (SELECT n2f.vec_id, cent.cid,
              coalesce(CASE WHEN n2f.n2 > 0 AND cent.cn2 > 0
                            THEN list_dot_product(n2f.v, cent.cv)
                                 / (sqrt(n2f.n2) * sqrt(cent.cn2)) END,
                       -2.0) AS s
       FROM n2f CROSS JOIN cent),
asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM sc0) _ WHERE rn = 1),
probe AS (SELECT query_id, cid FROM (
            SELECT sc0.vec_id AS query_id, sc0.cid,
                   row_number() OVER (PARTITION BY sc0.vec_id
                                      ORDER BY sc0.s DESC, sc0.cid ASC) AS rn
            FROM sc0 JOIN qids ON sc0.vec_id = qids.query_id) _
          WHERE rn <= 4),
cand AS (SELECT probe.query_id, asg.vec_id FROM probe JOIN asg USING (cid)),
scq AS (SELECT c.query_id, c.vec_id, CAST(sum(l.dd) AS BIGINT) AS pq_dist
        FROM cand c
        JOIN enc en ON en.vec_id = c.vec_id
        JOIN lut l ON l.query_id = c.query_id
                  AND l.s = en.s AND l.code = en.code
        GROUP BY 1, 2),
rq AS (SELECT query_id, vec_id, pq_dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY pq_dist ASC, vec_id ASC) AS rank
       FROM scq)
SELECT query_id, vec_id, pq_dist, rank FROM rq WHERE rank <= 10
ORDER BY query_id, rank"""

    # persisted PQ index: same ADC chain but the codebook samples ONLY the
    # initially-indexed subset (vec_id % 5 != 0) — appends are encoded
    # under that frozen codebook
    sql["pq_index_topup"] = _pq_cte.replace(
        """cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS code, q
       FROM qv QUALIFY code < 16)""",
        """cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS code, q
       FROM qv WHERE vec_id % 5 != 0 QUALIFY code < 16)""",
    ) + """,
r AS (SELECT query_id, vec_id, pq_dist,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY pq_dist ASC, vec_id ASC) AS rank
      FROM sc)
SELECT query_id, vec_id, pq_dist, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank"""

    # PQ recall@10 vs the int8 brute-force baseline: both sides are
    # integer-exact rankings, so the recall number itself is exact
    sql["pq_recall"] = _pq_cte + """,
apx AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY pq_dist ASC, vec_id ASC) AS rank
          FROM sc) _ WHERE rank <= 10),
qqv AS (SELECT qids.query_id, qq.q AS qe
        FROM qv qq JOIN qids ON qq.vec_id = qids.query_id),
pairs AS (SELECT qqv.query_id, e.vec_id,
            list_sum(list_transform(range(1,65), i -> e.q[i] * qqv.qe[i]))
              AS dot,
            list_sum(list_transform(range(1,65), i -> e.q[i] * e.q[i]))
              AS na2,
            list_sum(list_transform(range(1,65), i -> qqv.qe[i] * qqv.qe[i]))
              AS nb2
          FROM qv e CROSS JOIN qqv),
exv AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                            DESC, vec_id ASC) AS rank
          FROM pairs WHERE na2 > 0 AND nb2 > 0) _ WHERE rank <= 10)
SELECT e.query_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS recall_at_k
FROM exv e LEFT JOIN apx a ON a.query_id = e.query_id
                          AND a.vec_id = e.vec_id
GROUP BY e.query_id ORDER BY e.query_id"""

    # rotated PQ: Hadamard x md5-sign-diagonal over the int8 vectors
    # (integer-exact), then the identical PQ chain on the rotated frame —
    # the ev CTE head is swapped for the rotation prefix
    from rrdtool_1_x_spark.datapipe.similarity import _hadamard_signs

    _rot_slist = "[" + ", ".join(str(s) for s in _hadamard_signs(64)) + "]"
    # the sign diagonal rides in a one-row CTE: an inline list literal is
    # re-materialized per lambda evaluation (measured 16 s vs 0.1 s at
    # sf0.01 — the DuckDB twin of the Spark PQ literal-expression lesson)
    _rot_prefix = f"""
WITH sgn AS (SELECT {_rot_slist} AS dsg),
ev0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings),
qs0 AS (SELECT vec_id, v,
          list_max(list_transform(v, x -> abs(x))) AS s FROM ev0),
qv0 AS (SELECT vec_id,
          CASE WHEN s > 0
               THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
               ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q0
        FROM qs0),
rot AS (SELECT vec_id,
          list_transform(range(0, 64), i ->
            list_sum(list_transform(range(0, 64), j ->
              (CASE WHEN bit_count(i & j) % 2 = 0 THEN 1 ELSE -1 END)
              * dsg[j + 1] * q0[j + 1]))) AS rvec
        FROM qv0, sgn),
ev AS (SELECT vec_id, list_transform(rvec, x -> x::DOUBLE) AS v FROM rot)"""
    _rot_pq_cte = _rot_prefix + _pq_cte.split("FROM embeddings)", 1)[1]
    sql["rot_pq_topk"] = _rot_pq_cte + """,
r AS (SELECT query_id, vec_id, pq_dist,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY pq_dist ASC, vec_id ASC) AS rank
      FROM sc)
SELECT query_id, vec_id, pq_dist, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank"""
    sql["rot_pq_recall"] = sql["pq_recall"].replace(_pq_cte, _rot_pq_cte)

    # IR eval triple over the same pq-vs-exact frames: discounts are the
    # SAME Python-precomputed micro-unit integers the Spark plan inlines
    from rrdtool_1_x_spark.datapipe.similarity import _ndcg_discounts

    _d10 = _ndcg_discounts(10)
    _pref10 = [0]
    for _x in _d10:
        _pref10.append(_pref10[-1] + _x)
    _dcase_sql = (
        "CASE a.rank "
        + " ".join(f"WHEN {i + 1} THEN {_d10[i]}" for i in range(10))
        + " ELSE 0 END"
    )
    _icase_sql = (
        "CASE least(n_exact, 10) "
        + " ".join(f"WHEN {n} THEN {_pref10[n]}" for n in range(1, 11))
        + " ELSE 0 END"
    )
    sql["rank_metrics"] = _pq_cte + f""",
apx AS (SELECT query_id, vec_id, rank FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY pq_dist ASC, vec_id ASC) AS rank
          FROM sc) _ WHERE rank <= 10),
qqv AS (SELECT qids.query_id, qq.q AS qe
        FROM qv qq JOIN qids ON qq.vec_id = qids.query_id),
pairs AS (SELECT qqv.query_id, e.vec_id,
            list_sum(list_transform(range(1,65), i -> e.q[i] * qqv.qe[i]))
              AS dot,
            list_sum(list_transform(range(1,65), i -> e.q[i] * e.q[i]))
              AS na2,
            list_sum(list_transform(range(1,65), i -> qqv.qe[i] * qqv.qe[i]))
              AS nb2
          FROM qv e CROSS JOIN qqv),
exv AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                            DESC, vec_id ASC) AS rank
          FROM pairs WHERE na2 > 0 AND nb2 > 0) _ WHERE rank <= 10),
per AS (SELECT e.query_id,
          count(*) AS n_exact,
          CAST(sum(CASE WHEN a.rank IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hit,
          min(a.rank) AS first_rank,
          CAST(sum(CASE WHEN a.rank IS NOT NULL THEN {_dcase_sql}
                        ELSE 0 END) AS BIGINT) AS dcg
        FROM exv e LEFT JOIN apx a ON a.query_id = e.query_id
                                  AND a.vec_id = e.vec_id
        GROUP BY e.query_id)
SELECT query_id, CAST(n_exact AS BIGINT) AS n_exact, n_hit,
  round(n_hit::DOUBLE / n_exact, 6) AS recall_at_k,
  round(CASE WHEN first_rank IS NOT NULL
             THEN 1.0 / first_rank ELSE 0 END, 6) AS mrr_at_k,
  round(CASE WHEN ({_icase_sql}) > 0
             THEN dcg::DOUBLE / ({_icase_sql}) ELSE 0 END, 6) AS ndcg_at_k
FROM per ORDER BY query_id"""

    # OPQ learned allocation (Ge et al. CVPR 2013 §4.2, diagonal-
    # covariance member): per-dim exact integer variance of the int8
    # corpus, (var DESC, dim ASC) rank snake-dealt into 8 subspaces —
    # half = rank//8 is the slot, direction alternates per half — then
    # the raw float vectors permute and the identical PQ chain runs.
    # HUGEINT keeps n*Σx² − (Σx)² exact (the DECIMAL(38,0) twin of the
    # Spark side); var is only an ORDER BY key, never an output.
    _opq_prefix = """
WITH ev0 AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
             FROM embeddings),
qs0 AS (SELECT vec_id, v,
          list_max(list_transform(v, x -> abs(x))) AS s FROM ev0),
qv0 AS (SELECT vec_id, v,
          CASE WHEN s > 0
               THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
               ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q0
        FROM qs0),
dv AS (SELECT di.di AS dim,
         CAST(count(*) AS HUGEINT)
           * CAST(sum(q0[di.di + 1] * q0[di.di + 1]) AS HUGEINT)
         - CAST(sum(q0[di.di + 1]) AS HUGEINT)
           * CAST(sum(q0[di.di + 1]) AS HUGEINT) AS var
       FROM qv0 CROSS JOIN (SELECT unnest(range(0, 64)) AS di) di
       GROUP BY 1),
rk AS (SELECT dim,
         CAST(row_number() OVER (ORDER BY var DESC, dim ASC) - 1 AS BIGINT)
           AS r
       FROM dv),
al AS (SELECT dim,
         (CASE WHEN (r // 8) % 2 = 0 THEN r % 8 ELSE 7 - (r % 8) END) * 8
           + (r // 8) AS np
       FROM rk),
pm AS (SELECT list(dim ORDER BY np) AS p FROM al),
ev AS (SELECT vec_id, list_transform(pm.p, d -> v[d + 1]) AS v
       FROM ev0, pm)"""
    _opq_pq_cte = _opq_prefix + _pq_cte.split("FROM embeddings)", 1)[1]
    sql["opq_topk"] = _opq_pq_cte + """,
r AS (SELECT query_id, vec_id, pq_dist,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY pq_dist ASC, vec_id ASC) AS rank
      FROM sc)
SELECT query_id, vec_id, pq_dist, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank"""
    sql["opq_recall"] = sql["pq_recall"].replace(_pq_cte, _opq_pq_cte)
    # composed stack: OPQ prefix + the IVFADC chain verbatim
    sql["opq_ivfpq_topk"] = sql["ivfpq_topk"].replace(_pq_cte, _opq_pq_cte)
    # frozen-subset OPQ model: allocation variances AND codebook sample
    # only vec_id % 5 != 0; appends encode under that model
    sql["opq_index_topup"] = (
        _opq_pq_cte.replace(
            """FROM qv0 CROSS JOIN (SELECT unnest(range(0, 64)) AS di) di
       GROUP BY 1),""",
            """FROM qv0 CROSS JOIN (SELECT unnest(range(0, 64)) AS di) di
       WHERE vec_id % 5 != 0 GROUP BY 1),""",
        ).replace(
            """cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS code, q
       FROM qv QUALIFY code < 16)""",
            """cb AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                 vec_id) - 1 AS code, q
       FROM qv WHERE vec_id % 5 != 0 QUALIFY code < 16)""",
        )
        + """,
r AS (SELECT query_id, vec_id, pq_dist,
        row_number() OVER (PARTITION BY query_id
                           ORDER BY pq_dist ASC, vec_id ASC) AS rank
      FROM sc)
SELECT query_id, vec_id, pq_dist, rank FROM r WHERE rank <= 10
ORDER BY query_id, rank"""
    )

    # int8-quantized ANN: same query/top-k shape as ann_cosine_top10 but
    # every score is integer-dot / sqrt(integer norms) — no float fold
    sql["ann_int8_topk"] = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
qq AS (SELECT vec_id AS qid, q AS qe FROM qv ORDER BY vec_id LIMIT 1),
pairs AS (
  SELECT e.vec_id,
    (SELECT sum(a.x * b.x)
     FROM (SELECT unnest(e.q) AS x, generate_subscripts(e.q, 1) AS i) a
     JOIN (SELECT unnest(qq.qe) AS x, generate_subscripts(qq.qe, 1) AS i) b
       USING (i)) AS dot,
    (SELECT sum(x.x * x.x) FROM (SELECT unnest(e.q) AS x) x) AS na2,
    (SELECT sum(x.x * x.x) FROM (SELECT unnest(qq.qe) AS x) x) AS nb2
  FROM qv e, qq WHERE e.vec_id != qq.qid),
sims AS (SELECT vec_id,
           round(dot / sqrt(na2::DOUBLE * nb2::DOUBLE), 6) AS qcos_sim
         FROM pairs WHERE na2 > 0 AND nb2 > 0),
ranked AS (SELECT vec_id, qcos_sim,
                  row_number() OVER (ORDER BY qcos_sim DESC, vec_id ASC)
                    AS rank
           FROM sims)
SELECT vec_id, qcos_sim, rank FROM ranked WHERE rank <= 10 ORDER BY rank"""

    # int4 scan: the identical chain at 7 levels (qmax=7)
    sql["ann_int4_topk"] = sql["ann_int8_topk"].replace("* 127", "* 7")

    # two-stage truncated-dim retrieval: stage 1 ranks on the 16-dim
    # prefix (candidates=50, ties to lowest id), stage 2 re-ranks the
    # survivors with the full 64-dim int8 cosine
    sql["trunc_rerank"] = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
qids AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT 2),
qqv AS (SELECT qi.query_id, q.q AS qe
        FROM qv q JOIN qids qi ON q.vec_id = qi.query_id),
s1 AS (SELECT qqv.query_id, e.vec_id, e.q AS eq, qqv.qe,
         list_sum(list_transform(range(1, 17), i -> e.q[i] * qqv.qe[i]))
           AS pdot,
         list_sum(list_transform(range(1, 17), i -> e.q[i] * e.q[i]))
           AS pna2,
         list_sum(list_transform(range(1, 17), i -> qqv.qe[i] * qqv.qe[i]))
           AS pnb2
       FROM qv e CROSS JOIN qqv),
c1 AS (SELECT query_id, vec_id, eq, qe FROM (
         SELECT query_id, vec_id, eq, qe,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY pdot::DOUBLE / sqrt(pna2::DOUBLE * pnb2::DOUBLE)
                           DESC, vec_id ASC) AS r1
         FROM s1 WHERE pna2 > 0 AND pnb2 > 0) _ WHERE r1 <= 50),
s2 AS (SELECT query_id, vec_id,
         list_sum(list_transform(range(1, 65), i -> eq[i] * qe[i])) AS dot,
         list_sum(list_transform(range(1, 65), i -> eq[i] * eq[i])) AS na2,
         list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i])) AS nb2
       FROM c1)
SELECT query_id, vec_id,
       round(dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE), 6) AS qcos_sim,
       rank
FROM (SELECT query_id, vec_id, dot, na2, nb2,
             row_number() OVER (PARTITION BY query_id
               ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                        DESC, vec_id ASC) AS rank
      FROM s2) _
WHERE rank <= 10 ORDER BY query_id, rank"""

    # recall@10 of the int4 ranking vs the int8 baseline — both sides
    # integer-deterministic, both INCLUDE the query row (mirrors
    # quantized_topk, which does not self-exclude)
    sql["int4_recall"] = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
q8 AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
q4 AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 7) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
qids AS (SELECT vec_id AS query_id FROM embeddings ORDER BY vec_id LIMIT 2),
p4 AS (SELECT qi.query_id, e.vec_id,
         list_sum(list_transform(range(1, 65), i -> e.q[i] * qe.q[i])) AS dot,
         list_sum(list_transform(range(1, 65), i -> e.q[i] * e.q[i])) AS na2,
         list_sum(list_transform(range(1, 65), i -> qe.q[i] * qe.q[i])) AS nb2
       FROM q4 e CROSS JOIN qids qi JOIN q4 qe ON qe.vec_id = qi.query_id),
apx AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                            DESC, vec_id ASC) AS rank
          FROM p4 WHERE na2 > 0 AND nb2 > 0) _ WHERE rank <= 10),
p8 AS (SELECT qi.query_id, e.vec_id,
         list_sum(list_transform(range(1, 65), i -> e.q[i] * qe.q[i])) AS dot,
         list_sum(list_transform(range(1, 65), i -> e.q[i] * e.q[i])) AS na2,
         list_sum(list_transform(range(1, 65), i -> qe.q[i] * qe.q[i])) AS nb2
       FROM q8 e CROSS JOIN qids qi JOIN q8 qe ON qe.vec_id = qi.query_id),
exv AS (SELECT query_id, vec_id FROM (
          SELECT query_id, vec_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                            DESC, vec_id ASC) AS rank
          FROM p8 WHERE na2 > 0 AND nb2 > 0) _ WHERE rank <= 10)
SELECT e.query_id, count(*) AS n_exact,
       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hit,
       round(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS recall_at_k
FROM exv e LEFT JOIN apx a ON a.query_id = e.query_id
                          AND a.vec_id = e.vec_id
GROUP BY e.query_id ORDER BY e.query_id"""

    # --- MinHash-LSH near-dup pipeline (mirrors datapipe.dedup exactly:
    # md5 minhashes with "mh{i}:" seeds, 4 bands of 2, candidates within
    # band buckets, exact Jaccard on distinct shingles, threshold 0.5)
    sig_list = ",\n    ".join(
        f"list_aggregate(list_transform(shingles, s -> md5('mh{i}:' || s)), 'min') AS sig{i}"
        for i in range(8)
    )
    band_list = ", ".join(
        f"md5(sig{2 * b} || '|' || sig{2 * b + 1}) AS b{b}" for b in range(4)
    )
    band_names = ", ".join(f"b{b}" for b in range(4))
    # mirrors the Spark skew guards: exact-duplicate collapse to the min-id
    # representative, long-format banding, and the 512 hot-bucket cap.
    # Parameterized by the base relation so the composed curation gate can
    # run the identical pipeline on its quality-filtered survivor set.
    _nd_cte_from = lambda base: f"""
reps AS (SELECT doc_id, text FROM {base}
         QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1),
t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
      FROM reps),
sh AS (SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> array_to_string(toks[i:i+2], ' '))
              ELSE [array_to_string(toks, ' ')] END AS shingles
       FROM t),
sig AS (SELECT doc_id,
    {sig_list}
  FROM sh),
band AS (SELECT doc_id, {band_list} FROM sig),
bandl AS (SELECT doc_id, bi, bh FROM band UNPIVOT (bh FOR bi IN ({band_names}))),
keep AS (SELECT bi, bh FROM bandl GROUP BY 1, 2 HAVING count(*) <= 512),
bk AS (SELECT bandl.* FROM bandl JOIN keep USING (bi, bh)),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         FROM bk x JOIN bk y
           ON x.bi = y.bi AND x.bh = y.bh AND x.doc_id < y.doc_id),
ds AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh),
ver AS (SELECT id_a, id_b,
          len(list_intersect(x.s, y.s))::DOUBLE
            / (len(x.s) + len(y.s) - len(list_intersect(x.s, y.s))) AS j
        FROM cand JOIN ds x ON x.doc_id = id_a JOIN ds y ON y.doc_id = id_b),
nd_pairs AS (SELECT id_a, id_b, j FROM ver WHERE j >= 0.5)"""
    nd_cte = _nd_cte_from("documents")
    sql["near_dup_pairs"] = f"""WITH {nd_cte}
SELECT id_a, id_b, round(j, 6) AS jaccard FROM nd_pairs ORDER BY id_a, id_b"""
    # banding audit: exact-Jaccard truth via the sparse shared-shingle
    # all-pairs join; candidates straight from the capped band join;
    # theory literal = 1-(1-t^r)^b at the threshold
    nd_cte3 = _nd_cte_from(
        "(SELECT * FROM documents WHERE doc_id % 3 = 0)"
    )
    sql["lsh_pr"] = f"""WITH {nd_cte3},
allsh2 AS (SELECT doc_id, unnest(s) AS sh2 FROM ds),
pi2 AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
        FROM allsh2 a JOIN allsh2 b
          ON a.sh2 = b.sh2 AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
sz2 AS (SELECT doc_id, len(s) AS n FROM ds),
truth AS (SELECT id_a, id_b FROM pi2
          JOIN sz2 x ON x.doc_id = pi2.id_a
          JOIN sz2 y ON y.doc_id = pi2.id_b
          WHERE i >= 0.5 * (x.n + y.n - i)),
nt AS (SELECT count(*) AS n_truth FROM truth),
ncd AS (SELECT count(*) AS n_candidates FROM cand),
nh AS (SELECT count(*) AS n_hit FROM truth JOIN cand USING (id_a, id_b))
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_candidates AS BIGINT) AS n_candidates,
       CAST(n_hit AS BIGINT) AS n_hit,
       round(CASE WHEN n_candidates > 0
                  THEN n_hit::DOUBLE / n_candidates ELSE 0 END, 6)
         AS precision,
       round(CASE WHEN n_truth > 0
                  THEN n_hit::DOUBLE / n_truth ELSE 1 END, 6) AS recall,
       {round(1.0 - (1.0 - 0.5 ** 2) ** 4, 6)} AS theory_recall_at_t
FROM nt, ncd, nh"""
    # connected components: recursive reachability, label = min reachable id
    cc_tail = """
edges AS (SELECT id_a AS u, id_b AS v FROM nd_pairs
          UNION ALL SELECT id_b, id_a FROM nd_pairs),
reach AS (SELECT u AS node, v AS r FROM edges
          UNION
          SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u),
labels AS (SELECT node AS doc_id, least(node, min(r)) AS group_id
           FROM reach GROUP BY node)"""
    cc_cte = f"{nd_cte},{cc_tail}"
    sql["dup_groups"] = f"""WITH RECURSIVE {cc_cte}
SELECT doc_id, group_id FROM labels ORDER BY doc_id"""
    # SoftDeDup: same component labels, singletons self-grouped,
    # weight = 1000000 DIV component size (exact integer)
    sql["softdedup_weights"] = f"""WITH RECURSIVE {cc_cte},
alldocs AS (SELECT d.doc_id,
              coalesce(l.group_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN labels l USING (doc_id)),
sizes AS (SELECT group_id, CAST(count(*) AS BIGINT) AS group_size
          FROM alldocs GROUP BY 1)
SELECT a.doc_id, a.group_id, s.group_size,
       CAST(1000000 // s.group_size AS BIGINT) AS weight
FROM alldocs a JOIN sizes s USING (group_id) ORDER BY a.doc_id"""
    # DF-weighted Jaccard over the near-dup pairs: w(s) = floor(1e6/df(s)),
    # integer sums (associative → engine-independent), ratio rounded last
    sql["weighted_jaccard"] = f"""WITH {nd_cte},
allsh AS (SELECT doc_id, unnest(s) AS shingle FROM ds),
wts AS (SELECT shingle, CAST(floor(1000000.0 / count(*)) AS BIGINT) AS w
        FROM allsh GROUP BY 1),
dw AS (SELECT doc_id, sum(w) AS tw FROM allsh JOIN wts USING (shingle) GROUP BY 1),
pi AS (SELECT p.id_a, p.id_b, sum(w) AS iw
       FROM nd_pairs p
       JOIN allsh a ON a.doc_id = p.id_a
       JOIN allsh b ON b.doc_id = p.id_b AND b.shingle = a.shingle
       JOIN wts ON wts.shingle = a.shingle
       GROUP BY 1, 2)
SELECT p.id_a, p.id_b,
       round(coalesce(iw, 0)::DOUBLE / (x.tw + y.tw - coalesce(iw, 0)), 6)
         AS wjaccard
FROM nd_pairs p
LEFT JOIN pi ON pi.id_a = p.id_a AND pi.id_b = p.id_b
JOIN dw x ON x.doc_id = p.id_a
JOIN dw y ON y.doc_id = p.id_b
ORDER BY p.id_a, p.id_b"""
    # quality-aware representative: the SAME cc labels ranked by the
    # quality gate's composite score (rounded 6dp first so the argmax
    # decision sits at the gate's own precision), ties to lowest id
    sql["dedup_best"] = f"""WITH RECURSIVE {cc_cte},
qm AS (
  SELECT doc_id, length(text)::DOUBLE AS n,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS a,
    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS d,
    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE AS p,
    length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS u
  FROM documents),
qs AS (SELECT doc_id,
         round(least(a/n*1.25, 1.0)*0.5 + (1.0 - least(d/n*4, 1.0))*0.2
               + (1.0 - least(p/n*5, 1.0))*0.2
               + (1.0 - least(u/n*3, 1.0))*0.1, 6) AS q
       FROM qm),
rk AS (SELECT l.doc_id, l.group_id,
              row_number() OVER (PARTITION BY l.group_id
                                 ORDER BY q DESC, l.doc_id ASC) AS r
       FROM labels l JOIN qs ON qs.doc_id = l.doc_id),
rep AS (SELECT group_id, doc_id AS rep_id FROM rk WHERE r = 1)
SELECT doc.doc_id, l.group_id,
       coalesce(rep.rep_id, doc.doc_id) AS rep_id,
       coalesce(rep.rep_id, doc.doc_id) = doc.doc_id AS keep
FROM documents doc
LEFT JOIN labels l ON l.doc_id = doc.doc_id
LEFT JOIN rep ON rep.group_id = l.group_id
ORDER BY doc.doc_id"""
    sql["dedup_report"] = f"""WITH RECURSIVE {cc_cte},
g AS (SELECT group_id, count(*) AS sz FROM labels GROUP BY 1),
s AS (SELECT count(*) AS dup_groups, sum(sz)::BIGINT AS dup_docs FROM g),
tot AS (SELECT count(*) AS total_docs FROM documents)
SELECT total_docs, dup_docs, dup_groups,
       dup_docs - dup_groups AS docs_removed,
       total_docs - (dup_docs - dup_groups) AS docs_kept,
       round((dup_docs - dup_groups)::DOUBLE / total_docs, 6) AS dup_rate
FROM tot, s"""

    # --- LSH-bucketed similarity (hyperplanes inlined so DuckDB computes
    # the identical bucket ids; repr() round-trips the exact doubles)
    from rrdtool_1_x_spark.datapipe.similarity import _hyperplanes

    def _bits(vec_expr: str, planes: list[list[float]]) -> str:
        return " || ".join(
            "CASE WHEN list_dot_product(%s, [%s]) >= 0 THEN '1' ELSE '0' END"
            % (vec_expr, ", ".join(repr(v) for v in plane))
            for plane in planes
        )

    nd_planes = [_hyperplanes(64, 4, seed=f"nd{t}") for t in range(3)]
    nd_bucket_cols = ", ".join(
        f"{_bits('v', nd_planes[t])} AS b{t}" for t in range(3)
    )
    nd_bucket_names = ", ".join(f"b{t}" for t in range(3))
    sql["embed_near_dup"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
b AS (SELECT vec_id, v, {nd_bucket_cols} FROM e),
bl AS (SELECT vec_id, bi, bh FROM b UNPIVOT (bh FOR bi IN ({nd_bucket_names}))),
keep AS (SELECT bi, bh FROM bl GROUP BY 1, 2 HAVING count(*) <= 512),
bk AS (SELECT bl.* FROM bl JOIN keep USING (bi, bh)),
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM bk x JOIN bk y
           ON x.bi = y.bi AND x.bh = y.bh AND x.vec_id < y.vec_id),
s AS (SELECT id_a, id_b, list_dot_product(x.v, y.v) AS dot,
             list_dot_product(x.v, x.v) AS na2, list_dot_product(y.v, y.v) AS nb2
      FROM cand JOIN e x ON x.vec_id = id_a JOIN e y ON y.vec_id = id_b),
c AS (SELECT id_a, id_b,
             CASE WHEN na2 > 0 AND nb2 > 0 THEN dot / (sqrt(na2) * sqrt(nb2)) END AS cs
      FROM s)
SELECT id_a, id_b, round(cs, 6) AS cos_sim FROM c
WHERE cs >= 0.35 ORDER BY id_a, id_b"""

    tk_planes = [_hyperplanes(64, 6, seed=f"lsh{t}") for t in range(2)]
    cb_cols = ", ".join(f"{_bits('v', tk_planes[t])} AS b{t}" for t in range(2))
    qb_cols = ", ".join(f"{_bits('qv', tk_planes[t])} AS b{t}" for t in range(2))
    tk_or = " OR ".join(f"cb.b{t} = qb.b{t}" for t in range(2))
    sql["lsh_topk"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e ORDER BY vec_id LIMIT 2),
cb AS (SELECT vec_id, v, {cb_cols} FROM e),
qb AS (SELECT query_id, qv, {qb_cols} FROM q),
cand AS (SELECT DISTINCT query_id, vec_id FROM cb JOIN qb ON {tk_or}),
s AS (SELECT query_id, vec_id,
             CASE WHEN na2 > 0 AND nb2 > 0 THEN dot / (sqrt(na2) * sqrt(nb2)) END AS cs
      FROM (SELECT cand.query_id, cand.vec_id,
                   list_dot_product(x.v, y.qv) AS dot,
                   list_dot_product(x.v, x.v) AS na2,
                   list_dot_product(y.qv, y.qv) AS nb2
            FROM cand JOIN e x ON x.vec_id = cand.vec_id
                      JOIN q y ON y.query_id = cand.query_id) _),
r AS (SELECT query_id, vec_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, vec_id, round(cs, 6) AS cos_sim, rank FROM r
WHERE rank <= 10 ORDER BY query_id, rank"""

    # IVF cell-probe ANN: the oracle re-derives the same centroid model in
    # SQL (nlist smallest md5(id) vectors), assigns every vector to its
    # best cell with the identical coalesce(-2.0) zero-vector rule and
    # (s DESC, cid ASC) tie-break, probes nprobe cells per query, and
    # scores only probed cells. Quadratic assignment is fine at oracle
    # scale; the Spark side inlines the model as literals instead.
    sql["ivf_topk"] = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM e),
cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
sc AS (SELECT n.vec_id, cent.cid,
              coalesce(CASE WHEN n.n2 > 0 AND cent.cn2 > 0
                            THEN list_dot_product(n.v, cent.cv)
                                 / (sqrt(n.n2) * sqrt(cent.cn2)) END,
                       -2.0) AS s
       FROM n CROSS JOIN cent),
asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM sc) _ WHERE rn = 1),
q AS (SELECT vec_id AS query_id FROM e ORDER BY vec_id LIMIT 2),
probe AS (SELECT query_id, cid FROM (
            SELECT sc.vec_id AS query_id, sc.cid,
                   row_number() OVER (PARTITION BY sc.vec_id
                                      ORDER BY sc.s DESC, sc.cid ASC) AS rn
            FROM sc JOIN q ON sc.vec_id = q.query_id) _ WHERE rn <= 4),
cand AS (SELECT probe.query_id, asg.vec_id FROM probe JOIN asg USING (cid)),
s2 AS (SELECT cand.query_id, cand.vec_id,
              CASE WHEN x.n2 > 0 AND y.n2 > 0
                   THEN list_dot_product(x.v, y.v)
                        / (sqrt(x.n2) * sqrt(y.n2)) END AS cs
       FROM cand JOIN n x ON x.vec_id = cand.vec_id
                 JOIN n y ON y.vec_id = cand.query_id),
r AS (SELECT query_id, vec_id, cs,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cs DESC, vec_id ASC) AS rank
      FROM s2)
SELECT query_id, vec_id, round(cs, 6) AS cos_sim, rank FROM r
WHERE rank <= 10 ORDER BY query_id, rank"""

    # SemDeDup: reuses ivf_topk's centroid/assignment CTEs (same md5
    # quantizer, coalesce(-2.0) zero-vector rule and (s DESC, cid ASC)
    # tie-break), then keep-lowest-id within each (cell, md5-ordered
    # shard of 4096) — quadratic within-cell join is fine at oracle
    # scale. Parameterized by the (vec_id, v) source relation so the
    # text_semantic_dedup composition gate runs the IDENTICAL chain.
    _sem_chain = lambda src_rel, nlist, threshold: f"""
n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM {src_rel}),
cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {nlist}),
sc AS (SELECT n.vec_id, cent.cid,
              coalesce(CASE WHEN n.n2 > 0 AND cent.cn2 > 0
                            THEN list_dot_product(n.v, cent.cv)
                                 / (sqrt(n.n2) * sqrt(cent.cn2)) END,
                       -2.0) AS s
       FROM n CROSS JOIN cent),
asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM sc) _ WHERE rn = 1),
sh AS (SELECT vec_id, cid,
              CAST(floor((row_number() OVER (PARTITION BY cid
                     ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1)
                   / 4096) AS BIGINT) AS shard
       FROM asg),
p AS (SELECT y.vec_id AS id_b, min(x.vec_id) AS dup_of
      FROM sh x JOIN sh y
        ON x.cid = y.cid AND x.shard = y.shard AND x.vec_id < y.vec_id
      JOIN n a ON a.vec_id = x.vec_id
      JOIN n bb ON bb.vec_id = y.vec_id
      WHERE a.n2 > 0 AND bb.n2 > 0
        AND list_dot_product(a.v, bb.v) / (sqrt(a.n2) * sqrt(bb.n2))
            >= {threshold}
      GROUP BY 1)
SELECT s.vec_id, s.cid AS cell, p.dup_of, p.dup_of IS NULL AS keep
FROM sh s LEFT JOIN p ON p.id_b = s.vec_id ORDER BY s.vec_id"""
    sql["semantic_dedup"] = f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
{_sem_chain('e', 16, 0.2)}"""

    from rrdtool_1_x_spark.datapipe.textstats import BPE_SPLIT_PATTERN

    _bpe_pat = BPE_SPLIT_PATTERN.replace("'", "''")
    sql["bpe_tokens"] = f"""
WITH b AS (SELECT doc_id, text,
             len(regexp_extract_all(text, '{_bpe_pat}'))::BIGINT
               AS bpe_tokens,
             len(list_filter(regexp_split_to_array(lower(trim(text)),
                                                   '\\s+'),
                             t -> t <> ''))::BIGINT AS ws_tokens
           FROM documents)
SELECT doc_id, bpe_tokens, ws_tokens,
       CASE WHEN bpe_tokens > 0
            THEN round(length(text)::DOUBLE / bpe_tokens, 6)
       END AS chars_per_token
FROM b ORDER BY doc_id"""

    # duplicated 8-token spans: same shingle construction as the MinHash
    # CTE (full windows when len >= n, one partial otherwise), md5-hashed;
    # a window is duplicated iff its hash occurs in >= 2 distinct docs
    sql["dup_spans"] = """
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+')
             AS toks FROM documents),
w AS (SELECT doc_id,
        CASE WHEN len(toks) >= 8
             THEN list_transform(range(1, len(toks) - 6),
                                 i -> md5(array_to_string(toks[i:i+7], ' ')))
             ELSE [md5(array_to_string(toks, ' '))] END AS ws
      FROM t),
x AS (SELECT doc_id, unnest(ws) AS h FROM w),
ph AS (SELECT doc_id, h, count(*) AS c FROM x GROUP BY 1, 2),
dfq AS (SELECT h FROM ph GROUP BY h HAVING count(*) >= 2),
d AS (SELECT ph.doc_id, sum(c)::BIGINT AS dup_windows
      FROM ph JOIN dfq USING (h) GROUP BY 1),
b AS (SELECT doc_id, len(ws)::BIGINT AS n_windows FROM w)
SELECT b.doc_id, n_windows,
       coalesce(dup_windows, 0)::BIGINT AS dup_windows,
       round(coalesce(dup_windows, 0)::DOUBLE / n_windows, 6) AS dup_fraction
FROM b LEFT JOIN d USING (doc_id) ORDER BY b.doc_id"""

    # feature-hashing embeddings: integer nibble-parse of the md5 prefix
    # reproduces Spark's conv(substring(h,1,8),16,10) % dim exactly; sums
    # are integers so the L2 normalization divides identical doubles
    _hex8int = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    )
    # shared featurization CTEs: tokens -> md5 bucket/sign -> sparse
    # (doc, bucket) sums -> squared norm -> dense dim grid
    _fh_ctes = f"""
e0 AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                  '\\s+'),
                            t -> t <> '')) AS tok
       FROM documents),
hh AS (SELECT doc_id, md5('fh:' || tok) AS h FROM e0),
b AS (SELECT doc_id, CAST(({_hex8int}) % 64 AS BIGINT) AS bucket,
        CASE WHEN (strpos('0123456789abcdef', substr(h, 9, 1)) - 1) % 2 = 0
             THEN 1 ELSE -1 END AS s
      FROM hh),
c AS (SELECT doc_id, bucket, sum(s)::BIGINT AS v FROM b GROUP BY 1, 2),
nn AS (SELECT doc_id, sum(v * v)::DOUBLE AS nrm2 FROM c GROUP BY 1),
g AS (SELECT doc_id, unnest(range(0, 64)) AS i FROM documents)"""
    sql["hash_embed"] = f"""
WITH {_fh_ctes}
SELECT g.doc_id, g.i::BIGINT AS i,
       round(CASE WHEN nn.nrm2 > 0
                  THEN coalesce(c.v, 0)::DOUBLE / sqrt(nn.nrm2)
                  ELSE 0.0 END, 6) AS v
FROM g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bucket = g.i
       JOIN nn ON nn.doc_id = g.doc_id
ORDER BY g.doc_id, g.i"""

    # composition: the SAME featurization CTEs (unrounded, list-assembled
    # in dim order) feed the SAME semantic chain — nlist 8, cosine 0.8
    sql["text_semantic_dedup"] = f"""
WITH {_fh_ctes},
emb AS (SELECT g.doc_id AS vec_id,
          list(CASE WHEN nn.nrm2 > 0
                    THEN coalesce(c.v, 0)::DOUBLE / sqrt(nn.nrm2)
                    ELSE 0.0 END ORDER BY g.i) AS v
        FROM g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bucket = g.i
               JOIN nn ON nn.doc_id = g.doc_id
        GROUP BY 1),
{_sem_chain('emb', 8, 0.8)}"""

    # cluster naming: the same hashed-embedding + IVF assignment chain,
    # then per-cell tf-idf top-5 (idf over cells, not docs)
    sql["cluster_keywords"] = f"""
WITH {_fh_ctes},
emb AS (SELECT g.doc_id AS vec_id,
          list(CASE WHEN nn.nrm2 > 0
                    THEN coalesce(c.v, 0)::DOUBLE / sqrt(nn.nrm2)
                    ELSE 0.0 END ORDER BY g.i) AS v
        FROM g LEFT JOIN c ON c.doc_id = g.doc_id AND c.bucket = g.i
               JOIN nn ON nn.doc_id = g.doc_id
        GROUP BY 1),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM emb),
cent AS (SELECT vec_id AS cid, v AS cv, n2 AS cn2 FROM n
         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
sc AS (SELECT n.vec_id, cent.cid,
              coalesce(CASE WHEN n.n2 > 0 AND cent.cn2 > 0
                            THEN list_dot_product(n.v, cent.cv)
                                 / (sqrt(n.n2) * sqrt(cent.cn2)) END,
                       -2.0) AS s
       FROM n CROSS JOIN cent),
asg AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY s DESC, cid ASC) AS rn
          FROM sc) _ WHERE rn = 1),
tt AS (SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                  '\\s+'),
                            x -> x <> '')) AS term
       FROM documents),
tf AS (SELECT asg.cid AS cell, term, count(*) AS tf
       FROM tt JOIN asg ON asg.vec_id = tt.doc_id GROUP BY 1, 2),
cw AS (SELECT term, count(*) AS cw FROM tf GROUP BY 1),
ncl AS (SELECT count(DISTINCT cell) AS nc FROM tf),
sc2 AS (SELECT cell, term, tf,
          tf * CAST(round(ln((nc + 1)::DOUBLE / (cw + 1)) * 1e6) AS BIGINT)
            AS s
        FROM tf JOIN cw USING (term) CROSS JOIN ncl),
rk AS (SELECT cell, term, tf, s,
         row_number() OVER (PARTITION BY cell
                            ORDER BY s DESC, term ASC) AS rank
       FROM sc2)
SELECT cell, rank, term, tf, round(s / 1e6, 6) AS tfidf
FROM rk WHERE rank <= 5 ORDER BY cell, rank"""

    # ExactSubstr span removal: same window construction as dup_spans;
    # an occurrence is removable iff its hash occurs >= 2 times in the
    # corpus (within OR across docs) and it is not the (doc, pos)-minimal
    # one; removable windows' token coverage is excised
    sql["span_dedup"] = """
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+')
             AS toks FROM documents),
w AS (SELECT doc_id, toks,
        CASE WHEN len(toks) >= 8
             THEN list_transform(range(1, len(toks) - 6),
                                 i -> md5(array_to_string(toks[i:i+7], ' ')))
             ELSE [md5(array_to_string(toks, ' '))] END AS ws
      FROM t),
o AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, unnest(ws) AS h
      FROM w),
r AS (SELECT doc_id, p FROM (
        SELECT doc_id, p,
               count(*) OVER (PARTITION BY h) AS cnt,
               row_number() OVER (PARTITION BY h
                                  ORDER BY doc_id ASC, p ASC) AS rk
        FROM o) _ WHERE cnt >= 2 AND rk >= 2),
cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS tp FROM r),
cs AS (SELECT doc_id, list(tp) AS rm FROM cov GROUP BY 1),
f AS (SELECT w.doc_id, toks, coalesce(cs.rm, []) AS rm
      FROM w LEFT JOIN cs ON cs.doc_id = w.doc_id)
SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       len(list_filter(range(1, len(toks) + 1),
                       p -> list_contains(rm, p)))::BIGINT AS removed_tokens,
       coalesce(array_to_string(
         list_transform(list_filter(range(1, len(toks) + 1),
                                    p -> NOT list_contains(rm, p)),
                        p -> toks[p]), ' '), '') AS text
FROM f ORDER BY doc_id"""

    sql["fingerprint"] = """
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents)
SELECT doc_id,
  list_aggregate(list_transform(range(1, len(toks) + 1),
                                i -> md5(array_to_string(toks[i:i+7], ' '))),
                 'min') AS fingerprint
FROM t ORDER BY doc_id"""
    # Holt-Winters (operators/hw.py _hw_loop; reference src/rrd_hw_math.c:
    # 21-126): per-series sequential recurrence replayed as a recursive CTE.
    # State per step: intercept a, slope b, null-count k, seasonal s[24],
    # deviation d[24], violation ring viol[9]. Constants are written exactly
    # as the Python loop computes them (1-0.1=0.9, 1-0.0035=0.9965 — repr
    # round-trip) so every double op matches numpy bit-for-bit.
    sql["hw_predict"] = f"""
WITH RECURSIVE {_PDP_CTE},{_GRID_CTE},
hwg AS (
  SELECT series_id,
         CAST((ts - min(ts) OVER (PARTITION BY series_id)) / {STEP} AS INT) AS i,
         ts, value AS x
  FROM padded),
hw AS (
  SELECT series_id, -1 AS i, CAST(NULL AS DOUBLE) AS ts,
         CAST(NULL AS DOUBLE) AS a, CAST(NULL AS DOUBLE) AS b, 0 AS k,
         list_transform(range(1, 25), j -> CAST(NULL AS DOUBLE)) AS s,
         list_transform(range(1, 25), j -> CAST(NULL AS DOUBLE)) AS d,
         list_transform(range(1, 10), j -> 0) AS viol,
         CAST(NULL AS DOUBLE) AS pr, CAST(0 AS DOUBLE) AS fail
  FROM (SELECT DISTINCT series_id FROM pdp) _
  UNION ALL
  SELECT series_id, i, ts, a2, b2, k2,
         list_transform(range(1, 25), j -> CASE WHEN j = pidx THEN s_new ELSE s[j] END),
         list_transform(range(1, 25), j -> CASE WHEN j = pidx THEN d_new ELSE d[j] END),
         viol2, pr,
         CASE WHEN list_sum(viol2) >= 7 THEN CAST(1 AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
  FROM (
    SELECT *,
      CASE WHEN boot THEN CAST(0 AS DOUBLE)
           WHEN pr IS NOT NULL AND x IS NOT NULL
             THEN 0.0035::DOUBLE*(a2 - a) + 0.9965::DOUBLE*b
           ELSE b END AS b2,
      CASE WHEN x IS NOT NULL AND sc IS NULL AND last_a IS NOT NULL THEN x - last_a
           WHEN x IS NOT NULL AND sc IS NOT NULL AND a2 IS NOT NULL
             THEN 0.1::DOUBLE*(x - a2) + 0.9::DOUBLE*sc
           ELSE sc END AS s_new,
      CASE WHEN x IS NOT NULL AND pr IS NOT NULL AND dv IS NULL THEN abs(pr - x)
           WHEN x IS NOT NULL AND pr IS NOT NULL
             THEN 0.1::DOUBLE*abs(pr - x) + 0.9::DOUBLE*dv
           ELSE dv END AS d_new
    FROM (
      SELECT *,
        CASE WHEN boot THEN x ELSE a END AS last_a,
        CASE WHEN boot THEN x
             WHEN pr IS NOT NULL AND x IS NOT NULL
               THEN 0.1::DOUBLE*(x - sc) + 0.9::DOUBLE*(a + b*k)
             ELSE a END AS a2,
        CASE WHEN boot THEN 1
             WHEN pr IS NOT NULL AND x IS NULL THEN k + 1
             WHEN pr IS NOT NULL AND x IS NOT NULL THEN 1
             ELSE k END AS k2,
        list_prepend(CASE WHEN x IS NOT NULL AND pr IS NOT NULL AND dv IS NOT NULL
                          AND (x > pr + 2.0*dv OR x < pr - 2.0*dv) THEN 1 ELSE 0 END,
                     viol[1:8]) AS viol2
      FROM (
        SELECT r.series_id, q.i, q.ts, q.x, r.a, r.b, r.k, r.s, r.d, r.viol,
               (q.i % 24) + 1 AS pidx,
               r.s[(q.i % 24) + 1] AS sc,
               r.d[(q.i % 24) + 1] AS dv,
               (r.a IS NULL AND q.x IS NOT NULL) AS boot,
               CASE WHEN r.a IS NOT NULL AND r.b IS NOT NULL
                         AND r.s[(q.i % 24) + 1] IS NOT NULL
                    THEN r.a + r.b*r.k + r.s[(q.i % 24) + 1] END AS pr
        FROM hw r JOIN hwg q ON q.series_id = r.series_id AND q.i = r.i + 1
      ) s1
    ) s2
  ) s3
)
SELECT series_id, ts, round(pr, 6) AS prediction, fail AS failures
FROM hw WHERE pr IS NOT NULL
ORDER BY series_id, ts"""

    # --- banded SimHash near-dups: reuse the portable md5 simhash CTE,
    # emulate Spark's shiftrightunsigned via unsigned HUGEINT arithmetic
    # (DuckDB >> sign-extends BIGINT), pigeonhole blocks of 16 bits,
    # hot-block cap 512, hamming = bit_count(xor) (two's-complement
    # bitwise — engine-identical on signed 64-bit)
    block_divs = [1, 65536, 4294967296, 281474976710656]
    blk_cols = ", ".join(
        f"CAST((u // {d}::HUGEINT) % 65536 AS BIGINT) AS bv{b}"
        for b, d in enumerate(block_divs)
    )
    sql["simhash_near_dup"] = f"""
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
  FROM documents),
h AS (SELECT doc_id, md5(tok) AS hx FROM t),
n AS (SELECT doc_id,
    {nib_cols}
  FROM h),
v AS (SELECT doc_id,
    {vote_cols}
  FROM n GROUP BY doc_id),
fp AS (SELECT doc_id, {fp_terms} AS simhash FROM v),
un AS (SELECT doc_id, simhash,
              simhash::HUGEINT + CASE WHEN simhash < 0
                THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END AS u
       FROM fp),
blk AS (SELECT doc_id, simhash, {blk_cols} FROM un),
bl AS (SELECT doc_id, simhash, bi, bv FROM blk
       UNPIVOT (bv FOR bi IN (bv0, bv1, bv2, bv3))),
keep AS (SELECT bi, bv FROM bl GROUP BY 1, 2 HAVING count(*) <= 512),
bk AS (SELECT bl.* FROM bl JOIN keep USING (bi, bv)),
cand AS (SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                x.simhash AS fa, y.simhash AS fb
         FROM bk x JOIN bk y
           ON x.bi = y.bi AND x.bv = y.bv AND x.doc_id < y.doc_id)
SELECT id_a, id_b, bit_count(xor(fa, fb))::INT AS hamming
FROM cand WHERE bit_count(xor(fa, fb)) <= 3
ORDER BY id_a, id_b"""

    # --- decontamination / sampling (datapipe.decontam, datapipe.sampling)
    # 8-gram overlap: i ranges over 1..len-7 with inclusive slicing
    # toks[i:i+7] = 8 tokens — same windows as the Spark transform.
    ngrams8 = """CASE WHEN len(toks) >= 8
         THEN list_transform(range(1, len(toks) - 6),
                             i -> array_to_string(toks[i:i+7], ' '))
         ELSE [array_to_string(toks, ' ')] END"""
    sql["decontam_overlap"] = f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents),
dg AS (SELECT DISTINCT doc_id, g AS ngram
       FROM (SELECT doc_id, unnest({ngrams8}) AS g FROM t) _),
bg AS (SELECT doc_id AS bench_id, ngram FROM dg WHERE doc_id % 50 = 0),
bsz AS (SELECT bench_id, count(*) AS bench_ngrams FROM bg GROUP BY 1),
ov AS (SELECT dg.doc_id, bg.bench_id, count(*) AS overlap_ngrams
       FROM dg JOIN bg USING (ngram) GROUP BY 1, 2)
SELECT ov.doc_id, ov.bench_id, overlap_ngrams, bench_ngrams,
       round(overlap_ngrams::DOUBLE / bench_ngrams, 6) AS overlap_frac
FROM ov JOIN bsz USING (bench_id)
WHERE overlap_ngrams::DOUBLE / bench_ngrams >= 0.5
ORDER BY ov.doc_id, ov.bench_id"""
    # the bloom prefilter has no false negatives: the two-phase plan's
    # answer is definitionally identical to the exact overlap chain
    sql["bloom_decontam"] = sql["decontam_overlap"]

    # composed curation pipeline: the quality/length cut feeds the SAME
    # parameterized nd/cc CTE chain the standalone gates use, then the
    # survivors run the decontam overlap; verdict precedence = stage order
    sql["curate"] = f"""
WITH RECURSIVE
qm0 AS (
  SELECT doc_id, text, length(text)::DOUBLE AS n,
    len(regexp_split_to_array(trim(text), '\\s+')) AS tc,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS a,
    length(regexp_replace(text, '[^0-9]', '', 'g'))::DOUBLE AS d,
    length(regexp_replace(text, '[^.,;:!?''"()\\[\\]-]', '', 'g'))::DOUBLE AS p,
    length(regexp_replace(text, '[^A-Z]', '', 'g'))::DOUBLE AS u
  FROM documents),
qm AS (SELECT doc_id, text, tc,
         CASE WHEN n > 0 THEN round(least(a/n*1.25, 1.0)*0.5
              + (1.0 - least(d/n*4, 1.0))*0.2
              + (1.0 - least(p/n*5, 1.0))*0.2
              + (1.0 - least(u/n*3, 1.0))*0.1, 6) END AS q
       FROM qm0),
lowq AS (SELECT doc_id FROM qm
         WHERE q < {_CURATE_QTHR} OR q IS NULL OR tc < {_CURATE_MIN_TOKENS}),
qkeep AS (SELECT doc_id, text FROM qm
          WHERE NOT (q < {_CURATE_QTHR} OR q IS NULL OR tc < {_CURATE_MIN_TOKENS})),
{_nd_cte_from("qkeep")},{cc_tail},
exact_dup AS (SELECT doc_id FROM qkeep
              WHERE doc_id NOT IN (SELECT doc_id FROM reps)),
neardup AS (SELECT doc_id FROM labels WHERE doc_id != group_id),
surv AS (SELECT doc_id, text FROM reps
         WHERE doc_id NOT IN (SELECT doc_id FROM neardup)),
st AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       FROM surv),
sdg AS (SELECT DISTINCT doc_id, g AS ngram
        FROM (SELECT doc_id, unnest({ngrams8}) AS g FROM st) _),
bt AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
       FROM documents WHERE doc_id % 50 = 0),
bg AS (SELECT DISTINCT doc_id AS bench_id, g AS ngram
       FROM (SELECT doc_id, unnest({ngrams8}) AS g FROM bt) _),
bsz AS (SELECT bench_id, count(*) AS bench_ngrams FROM bg GROUP BY 1),
ov AS (SELECT sdg.doc_id, bg.bench_id, count(*) AS c
       FROM sdg JOIN bg USING (ngram)
       WHERE sdg.doc_id != bg.bench_id GROUP BY 1, 2),
contam AS (SELECT DISTINCT ov.doc_id FROM ov JOIN bsz USING (bench_id)
           WHERE c::DOUBLE / bench_ngrams >= 0.5),
kept AS (SELECT doc_id FROM surv
         WHERE doc_id NOT IN (SELECT doc_id FROM contam))
SELECT doc_id, verdict FROM (
  SELECT doc_id, 'low_quality' AS verdict FROM lowq
  UNION ALL SELECT doc_id, 'exact_dup' FROM exact_dup
  UNION ALL SELECT doc_id, 'near_dup' FROM neardup
  UNION ALL SELECT doc_id, 'contaminated' FROM contam
  UNION ALL SELECT doc_id, 'kept' FROM kept) _
ORDER BY doc_id"""
    # hash_u01: first 8 hex nibbles of md5(seed:id) as a uint32 / 2^32 —
    # rebuilt nibble-by-nibble (same formula as sampling.hash_u01)
    u01 = (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1) * {16 ** (7 - j)}.0"
            for j in range(8)
        )
        + ") / 4294967296.0"
    )
    # one materialized mixture epoch: the temperature_mix chain's rounded
    # epochs joined back per-doc; stochastic rounding via the u01 draw
    sql["mix_sample"] = rf"""
WITH e AS (SELECT source AS domain,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS tk
           FROM documents),
per AS (SELECT domain, CAST(sum(tk) AS BIGINT) AS tok_cnt FROM e GROUP BY 1),
tt AS (SELECT CAST(sum(tok_cnt) AS BIGINT) AS t FROM per),
p AS (SELECT domain, tok_cnt::DOUBLE / t AS pr,
             CAST(round(sqrt(tok_cnt::DOUBLE / t) * 1e9) AS BIGINT) AS wq
      FROM per CROSS JOIN tt),
wt AS (SELECT CAST(sum(wq) AS BIGINT) AS w FROM p),
ep AS (SELECT domain, round((wq::DOUBLE / w) / pr, 6) AS epochs
       FROM p CROSS JOIN wt),
d AS (SELECT doc_id, source,
             md5('mix:' || CAST(doc_id AS VARCHAR)) AS h FROM documents),
u AS (SELECT doc_id, source, {u01} AS u FROM d),
nn AS (SELECT u.doc_id, u.source,
         CAST(floor(epochs) AS BIGINT)
         + CASE WHEN u.u < epochs - floor(epochs) THEN 1 ELSE 0 END AS n
       FROM u JOIN ep ON ep.domain = u.source)
SELECT doc_id, source, unnest(range(1, n + 1)) AS copy
FROM nn WHERE n > 0 ORDER BY doc_id, copy"""

    # split-leakage audit: hash_split labels + exact-copy pairs (to the
    # min-id representative) + the shared near-dup chain, cross-split only
    sql["split_leak"] = f"""
WITH lab0 AS (SELECT doc_id, text,
                md5('split:' || CAST(doc_id AS VARCHAR)) AS h
              FROM documents),
lab1 AS (SELECT doc_id, text, {u01} AS u FROM lab0),
lab AS (SELECT doc_id, text,
          CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val'
               ELSE 'test' END AS split
        FROM lab1),
{_nd_cte_from("lab")},
g AS (SELECT doc_id, split, md5(text) AS h FROM lab),
sr AS (SELECT h, split, min(doc_id) AS rid FROM g GROUP BY 1, 2),
ex AS (SELECT DISTINCT least(g.doc_id, sr.rid) AS id_a,
              greatest(g.doc_id, sr.rid) AS id_b, 1.0 AS j
       FROM g JOIN sr ON sr.h = g.h AND sr.split != g.split),
nx AS (SELECT DISTINCT least(a2.rid, b2.rid) AS id_a,
              greatest(a2.rid, b2.rid) AS id_b, p.j
       FROM nd_pairs p
       JOIN g ga ON ga.doc_id = p.id_a
       JOIN g gb ON gb.doc_id = p.id_b
       JOIN sr a2 ON a2.h = ga.h
       JOIN sr b2 ON b2.h = gb.h AND b2.split != a2.split),
allp AS (SELECT id_a, id_b, j FROM ex
         UNION ALL SELECT id_a, id_b, j FROM nx)
SELECT p.id_a, la.split AS split_a, p.id_b, lb.split AS split_b,
       round(p.j, 6) AS jaccard
FROM allp p JOIN lab la ON la.doc_id = p.id_a
            JOIN lab lb ON lb.doc_id = p.id_b
WHERE la.split != lb.split ORDER BY id_a, id_b"""

    sql["hash_split"] = f"""
WITH t AS (SELECT doc_id, md5('split:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
u AS (SELECT doc_id, {u01} AS u FROM t)
SELECT doc_id,
  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
FROM u ORDER BY doc_id"""
    # held-out KN: model counts from u01<0.8 train docs, val docs
    # scored; unseen pairs -> backoff mass (cb=0), unseen w1/w2 -> oov
    sql["kn_heldout"] = rf"""
WITH t AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS toks,
             md5('split:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
f AS (SELECT doc_id, toks, ({u01}) < 0.8 AS is_train FROM t),
bg AS (SELECT doc_id, is_train, unnest(toks[1:len(toks)-1]) AS w1,
              unnest(toks[2:len(toks)]) AS w2 FROM f),
db AS (SELECT doc_id, is_train, w1, w2, count(*) AS m
       FROM bg GROUP BY 1, 2, 3, 4),
tb AS (SELECT w1, w2, sum(m) AS cb FROM db WHERE is_train GROUP BY 1, 2),
lft AS (SELECT w1, sum(cb) AS c1, count(*) AS fanout FROM tb GROUP BY 1),
rgt AS (SELECT w2, count(*) AS fanin FROM tb GROUP BY 1),
bt AS (SELECT count(*) AS btypes FROM tb),
sc AS (SELECT doc_id,
         round(sum(m * CAST(round(ln(greatest(coalesce(cb, 0) - 0.75, 0)
                                       / c1
                                     + (0.75 * fanout / c1)
                                       * (fanin::DOUBLE / btypes)) * 1e6)
                            AS BIGINT)) / sum(m) / 1e6, 6) AS kn_logprob,
         CAST(sum(m) AS BIGINT) AS bigram_cnt
       FROM db LEFT JOIN tb USING (w1, w2)
               JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN bt
       WHERE NOT db.is_train
       GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS tot
        FROM db WHERE NOT is_train GROUP BY 1)
SELECT tot.doc_id, kn_logprob,
       coalesce(bigram_cnt, 0) AS bigram_cnt,
       tot - coalesce(bigram_cnt, 0) AS oov_bigrams
FROM tot LEFT JOIN sc ON sc.doc_id = tot.doc_id
ORDER BY tot.doc_id"""

    # leakage-safe split: the SAME cc labels as dup_groups pick each
    # component's representative; singletons use their own id; then the
    # hash_split md5 rule keyed on the representative
    sql["group_split"] = f"""WITH RECURSIVE {cc_cte},
gs_rep AS (SELECT d.doc_id, coalesce(l.group_id, d.doc_id) AS rep
        FROM documents d LEFT JOIN labels l ON l.doc_id = d.doc_id),
gs_t AS (SELECT doc_id, rep, md5('split:' || CAST(rep AS VARCHAR)) AS h
      FROM gs_rep),
gs_u AS (SELECT doc_id, rep, {u01} AS u FROM gs_t)
SELECT doc_id, rep,
  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
FROM gs_u ORDER BY doc_id"""
    sql["stratified_sample"] = """
WITH r AS (SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5('strat:' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
SELECT doc_id, lang FROM r WHERE rk <= 20 ORDER BY doc_id"""
    sql["token_budget"] = """
WITH t AS (SELECT doc_id, lang,
             len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS token_cnt
           FROM documents),
b AS (SELECT *, CASE lang WHEN 'en' THEN 2000 WHEN 'de' THEN 1000
                          WHEN 'fr' THEN 1500 END AS budget
      FROM t),
r AS (SELECT *, sum(token_cnt) OVER (PARTITION BY lang
        ORDER BY md5('mix:' || CAST(doc_id AS VARCHAR)), doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      FROM b WHERE budget IS NOT NULL)
SELECT doc_id, lang, token_cnt, (run - token_cnt)::BIGINT AS tokens_before
FROM r WHERE run <= budget ORDER BY doc_id"""
    sql["vocab_top"] = """
WITH tok AS (SELECT DISTINCT doc_id,
               unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS ngram
             FROM documents),
c AS (SELECT ngram, count(*) AS doc_freq FROM tok GROUP BY 1),
r AS (SELECT ngram, doc_freq,
             row_number() OVER (ORDER BY doc_freq DESC, ngram ASC) AS rank
      FROM c)
SELECT ngram, doc_freq, rank FROM r WHERE rank <= 50 ORDER BY rank"""

    # --- library-only surfaces (round 4). The incremental index appends and
    # the persisted-IVF probe are exact re-derivations of existing pipelines,
    # so their oracles are those pipelines' SQL verbatim — the gate checks
    # the append/probe machinery, not new math.
    sql["band_index_topup"] = sql["near_dup_pairs"]
    sql["simhash_index_topup"] = sql["simhash_near_dup"]
    sql["ivf_indexed_topk"] = sql["ivf_topk"]
    # xport to_csv formatter: the %.7e cell strings through DuckDB printf
    sql["xport_fmt"] = f"""WITH {_PDP_CTE}, {cdp_avg_cte},
cv AS (SELECT * FROM cdp WHERE series_id IN ('click', 'view')),
b AS (SELECT CAST(min(ts) AS BIGINT) AS lo, CAST(max(ts) AS BIGINT) AS hi FROM cv),
g AS (SELECT unnest(generate_series(lo, hi, {int(_CDP_RES)})) AS ts FROM b),
p AS (SELECT ts,
        max(value) FILTER (series_id = 'click') AS click,
        max(value) FILTER (series_id = 'view') AS view
      FROM cv GROUP BY ts)
SELECT g.ts,
  coalesce(printf('%.7e', p.click), 'NaN') AS click,
  coalesce(printf('%.7e', p.view), 'NaN') AS view
FROM g LEFT JOIN p ON p.ts = g.ts ORDER BY g.ts"""
    # sql// source: the libdbi bucketing (min/avg/max/count/sigma) in SQL
    sql["sql_source"] = """
WITH pre AS (SELECT epoch(ts)::DOUBLE AS t, avg(value) AS v
             FROM events WHERE event_type = 'click' GROUP BY ts),
b AS (SELECT CAST(trunc(min(t)) AS BIGINT) AS lo,
             CAST(trunc(max(t)) AS BIGINT) AS hi FROM pre),
p AS (SELECT (lo - lo % 3600) AS t0, (hi - hi % 3600) AS t1 FROM b),
raw AS (SELECT t, v FROM pre CROSS JOIN p WHERE t > t0 AND t < t1),
agg AS (SELECT CAST(floor((t - t0) / 3600) AS BIGINT) AS idx,
               min(v) AS mn, sum(v) AS sm, max(v) AS mx,
               count(*) AS n, sum(v * v) AS s2
        FROM raw CROSS JOIN p GROUP BY 1),
g AS (SELECT unnest(generate_series(0, CAST((t1 - t0) / 3600 AS BIGINT) - 1)) AS idx
      FROM p)
SELECT (p.t0 + (g.idx + 1) * 3600)::DOUBLE AS ts,
  round(a.mn, 6) AS min_v,
  round(a.sm / a.n, 6) AS avg_v,
  round(a.mx, 6) AS max_v,
  coalesce(a.n, 0)::DOUBLE AS cnt,
  round(CASE WHEN a.n > 2
             THEN sqrt((a.n * a.s2 - a.sm * a.sm) / (a.n * (a.n - 1.0))) END,
        6) AS sigma_v
FROM g CROSS JOIN p LEFT JOIN agg a ON a.idx = g.idx
ORDER BY ts"""
    # sql// derive: same bucketing, but raw readings become positive
    # per-second rates against the previous row first (dts in (0, 2*max),
    # dv > 0 — src/rrd_fetch_libdbi.c derive handling); max=86400
    sql["sql_derive"] = """
WITH pre AS (SELECT epoch(ts)::DOUBLE AS t, avg(value) AS v
             FROM events WHERE event_type = 'click' GROUP BY ts),
b AS (SELECT CAST(trunc(min(t)) AS BIGINT) AS lo,
             CAST(trunc(max(t)) AS BIGINT) AS hi FROM pre),
p AS (SELECT (lo - lo % 3600) AS t0, (hi - hi % 3600) AS t1 FROM b),
raw AS (SELECT t, v FROM pre CROSS JOIN p WHERE t > t0 AND t < t1),
d AS (SELECT t,
        CASE WHEN t - lag(t) OVER w > 0 AND t - lag(t) OVER w < 172800
                  AND v - lag(v) OVER w > 0
             THEN (v - lag(v) OVER w) / (t - lag(t) OVER w) END AS v
      FROM raw WINDOW w AS (ORDER BY t)),
agg AS (SELECT CAST(floor((t - t0) / 3600) AS BIGINT) AS idx,
               min(v) AS mn, sum(v) AS sm, max(v) AS mx,
               count(v) AS n, sum(v * v) AS s2
        FROM d CROSS JOIN p WHERE v IS NOT NULL GROUP BY 1),
g AS (SELECT unnest(generate_series(0, CAST((t1 - t0) / 3600 AS BIGINT) - 1)) AS idx
      FROM p)
SELECT (p.t0 + (g.idx + 1) * 3600)::DOUBLE AS ts,
  round(a.mn, 6) AS min_v,
  round(a.sm / a.n, 6) AS avg_v,
  round(a.mx, 6) AS max_v,
  coalesce(a.n, 0)::DOUBLE AS cnt,
  round(CASE WHEN a.n > 2
             THEN sqrt((a.n * a.s2 - a.sm * a.sm) / (a.n * (a.n - 1.0))) END,
        6) AS sigma_v
FROM g CROSS JOIN p LEFT JOIN agg a ON a.idx = g.idx
ORDER BY ts"""
    # cb// source: the registered callback's deterministic series
    # (fetch_pseudo aligns the range down to the step: 1000000 -> 999900)
    sql["cb_source"] = """
WITH i AS (SELECT unnest(generate_series(0, 287)) AS k)
SELECT (999900 + (k + 1) * 300)::DOUBLE AS ts,
       round(sin(k / 7.0) * 100 + k % 13, 6) AS value
FROM i ORDER BY ts"""
    # the distributed CSV sink writes the SAME rows as the in-memory
    # formatter — one oracle serves both (part-order + formatting gate)
    sql["xport_sink"] = sql["xport_fmt"]
    # daemon FETCH: the padded per-step grid the wire rows carry
    sql["daemon_fetch"] = f"""WITH {_PDP_CTE},
c AS (SELECT ts, value FROM pdp WHERE series_id = 'click'),
b AS (SELECT CAST(min(ts) AS BIGINT) AS lo, CAST(max(ts) AS BIGINT) AS hi FROM c),
g AS (SELECT unnest(generate_series(lo, hi, {int(STEP)})) AS t FROM b)
SELECT g.t::DOUBLE AS ts, round(c.value, 6) AS value
FROM g LEFT JOIN c ON c.ts = g.t ORDER BY ts"""
    # PII scrub: the same RE2-safe patterns verbatim (DuckDB 1.0 has no
    # regexp_count → len(regexp_extract_all)); redaction order URL →
    # email → IP → phone matches PII_PATTERNS
    from rrdtool_1_x_spark.datapipe.pii import PII_PATTERNS

    pats = {name: pat for name, pat, _ in PII_PATTERNS}
    red = "text"
    for _name, pat, repl in PII_PATTERNS:
        red = f"regexp_replace({red}, '{pat}', '{repl}', 'g')"
    cnt_cols = ",\n  ".join(
        f"len(regexp_extract_all(text, '{pats[n]}')) AS {n}_cnt"
        for n in ("url", "email", "ipv4", "phone")
    )
    sql["pii_scrub"] = f"""
WITH e AS (
  SELECT doc_id,
    text
    || repeat(' user' || doc_id || '@mail.example.com', CAST(doc_id % 3 AS INT))
    || repeat(' see http://ex.org/p/' || doc_id, CAST(doc_id % 2 AS INT))
    || ' ip 10.0.' || (doc_id % 256) || '.7'
    || repeat(' call +1-555-0142 now', CAST((doc_id + 1) % 2 AS INT)) AS text
  FROM documents)
SELECT doc_id, {cnt_cols},
  len(regexp_extract_all(text, '{pats["url"]}'))
  + len(regexp_extract_all(text, '{pats["email"]}'))
  + len(regexp_extract_all(text, '{pats["ipv4"]}'))
  + len(regexp_extract_all(text, '{pats["phone"]}')) AS pii_total,
  md5({red}) AS redacted_md5
FROM e ORDER BY doc_id"""
    # unigram LM: wordcount CTEs, per-token logprob quantized to 1e-6
    # BEFORE the per-doc mean (same as the Spark side) so aggregation
    # order cannot move the hash
    # interpolated bigram LM: parallel unnest of the two shifted slices
    # zips adjacent pairs; 0.75/0.25 are exact binary so the mixed term
    # is the same double in both engines; quantization as in unigram
    # shared interpolated-bigram score chain (bigram_logprob + the CCNet
    # bucket gate consume the same `bsc` frame)
    _bg_ctes = r"""
t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
        AS toks FROM documents),
bg AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
              unnest(toks[2:len(toks)]) AS w2 FROM t),
db AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
bc AS (SELECT w1, w2, sum(m) AS cb FROM db GROUP BY 1, 2),
u AS (SELECT unnest(toks) AS tok FROM t),
uc AS (SELECT tok, count(*) AS cu FROM u GROUP BY 1),
nt AS (SELECT count(*) AS n_total FROM u),
bsc AS (SELECT doc_id,
          round(sum(m * CAST(round(ln(0.75 * (cb / u1.cu)
                                    + 0.25 * (u2.cu / n_total)) * 1e6)
                             AS BIGINT))
                / sum(m) / 1e6, 6) AS score,
          CAST(sum(m) AS BIGINT) AS bigram_cnt
        FROM db JOIN bc USING (w1, w2)
                JOIN uc u1 ON u1.tok = db.w1
                JOIN uc u2 ON u2.tok = db.w2
                CROSS JOIN nt
        GROUP BY doc_id)"""
    sql["bigram_logprob"] = f"""
WITH {_bg_ctes}
SELECT doc_id, score AS bigram_logprob, bigram_cnt
FROM bsc ORDER BY doc_id"""

    # top-100 common-word coverage: vocabulary boundary tie-breaks on the
    # token string (same rule as the Spark orderBy), LEFT-join membership
    sql["oov_rate"] = r"""
WITH t AS (SELECT doc_id,
  list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')
    AS toks
  FROM documents),
e AS (SELECT doc_id, unnest(toks) AS tok FROM t),
dt AS (SELECT doc_id, tok, count(*) AS m FROM e GROUP BY 1, 2),
vc AS (SELECT tok, sum(m) AS cnt FROM dt GROUP BY 1),
vocab AS (SELECT tok AS vtok FROM vc ORDER BY cnt DESC, tok ASC LIMIT 100),
per AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS token_cnt,
          CAST(sum(CASE WHEN vtok IS NULL THEN m ELSE 0 END) AS BIGINT)
            AS oov_cnt
        FROM dt LEFT JOIN vocab ON vtok = tok GROUP BY doc_id)
SELECT doc_id, token_cnt, oov_cnt,
  CASE WHEN token_cnt > 0 THEN round(oov_cnt::DOUBLE / token_cnt, 6) END
    AS oov_rate
FROM per ORDER BY doc_id"""

    # interpolated Kneser-Ney (D=0.75, exact in binary): continuation
    # counts from the bigram-type frame, token logprobs integer-quantized
    sql["kn_bigram"] = r"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
             AS toks FROM documents),
bg AS (SELECT doc_id, unnest(toks[1:len(toks)-1]) AS w1,
              unnest(toks[2:len(toks)]) AS w2 FROM t),
db AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
bc AS (SELECT w1, w2, sum(m) AS cb FROM db GROUP BY 1, 2),
lft AS (SELECT w1, sum(cb) AS c1, count(*) AS fanout FROM bc GROUP BY 1),
rgt AS (SELECT w2, count(*) AS fanin FROM bc GROUP BY 1),
bt AS (SELECT count(*) AS btypes FROM bc),
sc AS (SELECT doc_id,
         round(sum(m * CAST(round(ln(greatest(cb - 0.75, 0) / c1
                                     + (0.75 * fanout / c1)
                                       * (fanin::DOUBLE / btypes)) * 1e6)
                            AS BIGINT)) / sum(m) / 1e6, 6) AS kn_logprob,
         CAST(sum(m) AS BIGINT) AS bigram_cnt
       FROM db JOIN bc USING (w1, w2) JOIN lft USING (w1)
               JOIN rgt USING (w2) CROSS JOIN bt
       GROUP BY doc_id)
SELECT doc_id, kn_logprob, bigram_cnt FROM sc ORDER BY doc_id"""

    # prefix-blocked Levenshtein near-dup over the suffix-variant-enriched
    # corpus: 24-char block key, 256 block cap, 20%-of-length edit budget
    sql["edit_near_dup"] = r"""
WITH enr AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' v' || CAST(doc_id % 3 AS VARCHAR)
  FROM documents WHERE doc_id % 5 = 0),
reps AS (SELECT doc_id, text FROM enr
         QUALIFY row_number() OVER (PARTITION BY md5(text)
                                    ORDER BY doc_id) = 1),
base AS (SELECT doc_id AS id, lower(trim(text)) AS t,
                substr(lower(trim(text)), 1, 24) AS k FROM reps),
keep AS (SELECT k FROM base GROUP BY k HAVING count(*) <= 256),
b2 AS (SELECT base.* FROM base JOIN keep USING (k)),
cand AS (SELECT x.id AS id_a, y.id AS id_b, x.t AS ta, y.t AS tb
         FROM b2 x JOIN b2 y ON x.k = y.k AND x.id < y.id),
sc AS (SELECT id_a, id_b, levenshtein(ta, tb) AS lev,
              greatest(len(ta), len(tb)) AS mx FROM cand)
SELECT id_a, id_b, CAST(lev AS BIGINT) AS lev,
       round(lev::DOUBLE / mx, 6) AS edit_ratio
FROM sc WHERE lev <= 0.2 * mx ORDER BY id_a, id_b"""

    # MinHash fuzzy decontamination: same mh{i}:-seeded signatures and
    # 4x2 banding as the dedup tier, benchmark = every-17th doc truncated
    # to 2/3 of its tokens, estimate = matching components / 8
    mc_sigs = ",\n    ".join(
        f"list_aggregate(list_transform(shingles, s -> md5('mh{i}:' || s)),"
        f" 'min') AS sig{i}"
        for i in range(8)
    )
    mc_bands = ", ".join(
        f"md5(sig{2 * b} || '|' || sig{2 * b + 1}) AS b{b}" for b in range(4)
    )
    mc_bnames = ", ".join(f"b{b}" for b in range(4))
    mc_match = " + ".join(
        f"CASE WHEN d.sig{i} = e.sig{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    mc_shingle = """
          CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                                   i -> array_to_string(toks[i:i+2], ' '))
               ELSE [array_to_string(toks, ' ')] END AS shingles"""
    sql["minhash_decontam"] = f"""
WITH bsrc AS (
  SELECT doc_id AS bench_id,
         array_to_string(toks[1:greatest((2*len(toks))//3, 1)], ' ') AS text
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+')
          AS toks
        FROM documents WHERE doc_id % 17 = 0)),
dt AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+')
         AS toks FROM documents),
bt AS (SELECT bench_id, regexp_split_to_array(lower(trim(text)), '\\s+')
         AS toks FROM bsrc),
dsh AS (SELECT doc_id, {mc_shingle} FROM dt),
bsh AS (SELECT bench_id, {mc_shingle} FROM bt),
dsig AS (SELECT doc_id, {mc_sigs} FROM dsh),
bsig AS (SELECT bench_id, {mc_sigs} FROM bsh),
dband AS (SELECT doc_id, bi, bh FROM
          (SELECT doc_id, {mc_bands} FROM dsig)
          UNPIVOT (bh FOR bi IN ({mc_bnames}))),
bband AS (SELECT bench_id, bi, bh FROM
          (SELECT bench_id, {mc_bands} FROM bsig)
          UNPIVOT (bh FOR bi IN ({mc_bnames}))),
keep AS (SELECT bi, bh FROM
         (SELECT bi, bh FROM dband UNION ALL SELECT bi, bh FROM bband)
         GROUP BY 1, 2 HAVING count(*) <= 512),
cand AS (SELECT DISTINCT x.doc_id, y.bench_id
         FROM (SELECT dband.* FROM dband JOIN keep USING (bi, bh)) x
         JOIN (SELECT bband.* FROM bband JOIN keep USING (bi, bh)) y
           ON x.bi = y.bi AND x.bh = y.bh),
est AS (SELECT cand.doc_id, cand.bench_id, ({mc_match}) AS matches
        FROM cand JOIN dsig d ON d.doc_id = cand.doc_id
                  JOIN bsig e ON e.bench_id = cand.bench_id)
SELECT doc_id, bench_id, CAST(matches AS BIGINT) AS matches,
       round(matches::DOUBLE / 8, 6) AS est_jaccard
FROM est WHERE matches >= 4 ORDER BY doc_id, bench_id"""

    # span-level decontamination: the span_dedup coverage mechanics with
    # removable = windows whose hash appears in the truncated-copy
    # benchmark's window-hash set (identical bsrc derivation)
    sql["decontam_spans"] = r"""
WITH bsrc AS (
  SELECT doc_id AS bench_id,
         array_to_string(toks[1:greatest((2*len(toks))//3, 1)], ' ') AS text
  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
          AS toks
        FROM documents WHERE doc_id % 17 = 0)),
t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
        AS toks FROM documents),
w AS (SELECT doc_id, toks,
        CASE WHEN len(toks) >= 8
             THEN list_transform(range(1, len(toks) - 6),
                                 i -> md5(array_to_string(toks[i:i+7], ' ')))
             ELSE [md5(array_to_string(toks, ' '))] END AS ws
      FROM t),
bt AS (SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS toks
       FROM bsrc),
bw AS (SELECT DISTINCT
         unnest(CASE WHEN len(toks) >= 8
                THEN list_transform(range(1, len(toks) - 6),
                                    i -> md5(array_to_string(toks[i:i+7],
                                                             ' ')))
                ELSE [md5(array_to_string(toks, ' '))] END) AS h
       FROM bt),
o AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, unnest(ws) AS h
      FROM w),
r AS (SELECT o.doc_id, o.p FROM o JOIN bw USING (h)),
cov AS (SELECT DISTINCT doc_id, unnest(range(p, p + 8)) AS tp FROM r),
cs AS (SELECT doc_id, list(tp) AS rm FROM cov GROUP BY 1),
f AS (SELECT w.doc_id, toks, coalesce(cs.rm, []) AS rm
      FROM w LEFT JOIN cs ON cs.doc_id = w.doc_id)
SELECT doc_id, len(toks)::BIGINT AS n_tokens,
       len(list_filter(range(1, len(toks) + 1),
                       p -> list_contains(rm, p)))::BIGINT AS removed_tokens,
       coalesce(array_to_string(
         list_transform(list_filter(range(1, len(toks) + 1),
                                    p -> NOT list_contains(rm, p)),
                        p -> toks[p]), ' '), '') AS text
FROM f ORDER BY doc_id"""

    # Morton interleave of (user_id & 1023, event-minute & 1023): the same
    # shift/mask terms as layout.zorder_expr, first 50 events in z-order
    zo_terms = " | ".join(
        f"((((CAST(user_id & 1023 AS BIGINT)) >> {i}) & 1) << {2 * i})"
        f" | ((((CAST((tus // 60000000) & 1023 AS BIGINT)) >> {i}) & 1)"
        f" << {2 * i + 1})"
        for i in range(10)
    )
    sql["zorder_events"] = f"""
WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events),
z AS (SELECT event_id, user_id, (tus // 60000000) & 1023 AS minute_b,
             ({zo_terms}) AS zval FROM e)
SELECT event_id, user_id, minute_b, CAST(zval AS BIGINT) AS zval
FROM z ORDER BY zval, event_id LIMIT 50"""

    # Hilbert curve: the identical per-level rotate/flip recurrence the
    # Spark aggregate fold runs (layout.hilbert_xy2d), as a recursive
    # CTE over the 10 bit levels; 2^bits-1 = 1023 is the reflection
    sql["hilbert_events"] = """
WITH RECURSIVE e AS (SELECT event_id, user_id, epoch_us(ts) AS tus
                     FROM events),
pts AS (SELECT event_id, user_id, (tus // 60000000) & 1023 AS minute_b,
               CAST(user_id & 1023 AS BIGINT) AS xb,
               CAST((tus // 60000000) & 1023 AS BIGINT) AS yb
        FROM e),
h AS (
  SELECT event_id, user_id, minute_b, xb AS hx, yb AS hy,
         CAST(0 AS BIGINT) AS hd, CAST(9 AS BIGINT) AS i
  FROM pts
  UNION ALL
  SELECT event_id, user_id, minute_b,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 1023 - hy ELSE hy END)
         ELSE hx END,
    CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN 1023 - hx ELSE hx END)
         ELSE hy END,
    hd + s * s * xor(3 * rx, ry),
    i - 1
  FROM (SELECT *, (CAST(1 AS BIGINT) << i) AS s,
          CASE WHEN (hx & (CAST(1 AS BIGINT) << i)) > 0
               THEN 1 ELSE 0 END AS rx,
          CASE WHEN (hy & (CAST(1 AS BIGINT) << i)) > 0
               THEN 1 ELSE 0 END AS ry
        FROM h WHERE i >= 0) t
)
SELECT event_id, user_id, minute_b, hd AS hval
FROM h WHERE i = -1 ORDER BY hval, event_id LIMIT 50"""

    # KMV distinct-value synopsis over per-source 3-shingles: 15 hex
    # digits of md5('kmv:'||s) as a uint60, k=128 smallest per group,
    # estimate 127 * 2^60 / h_k as one rounded float division
    _hex15int = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1)"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    _kmv_ctes = rf"""
t AS (SELECT source, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      FROM documents),
sh AS (SELECT source,
         unnest(CASE WHEN len(toks) >= 3
                THEN list_transform(range(1, len(toks) - 1),
                                    i -> array_to_string(toks[i:i+2], ' '))
                ELSE [array_to_string(toks, ' ')] END) AS s
       FROM t),
hh AS (SELECT DISTINCT source, md5('kmv:' || s) AS h FROM sh),
hv AS (SELECT source, CAST(({_hex15int}) AS BIGINT) AS hi FROM hh),
rk AS (SELECT source, hi,
         row_number() OVER (PARTITION BY source ORDER BY hi) AS rn FROM hv),
syn AS (SELECT source, hi FROM rk WHERE rn <= 128)"""
    _p60 = repr(float(1 << 60))
    sql["kmv_distinct"] = f"""
WITH {_kmv_ctes},
agg AS (SELECT source, count(*) AS n_syn, max(hi) AS hk FROM syn GROUP BY 1)
SELECT source, CAST(n_syn AS BIGINT) AS n_syn,
  CASE WHEN n_syn < 128 THEN CAST(n_syn AS BIGINT)
       ELSE CAST(round(127.0 * ({_p60} / hk::DOUBLE)) AS BIGINT) END
    AS kmv_est
FROM agg ORDER BY source"""
    # index-then-append == one-shot (KMV merge theorem): same SQL
    sql["kmv_index_topup"] = sql["kmv_distinct"]
    sql["kmv_overlap"] = f"""
WITH {_kmv_ctes},
pairs AS (SELECT a.source AS src_a, b.source AS src_b
          FROM (SELECT DISTINCT source FROM syn) a
          JOIN (SELECT DISTINCT source FROM syn) b ON a.source < b.source),
u AS (SELECT p.src_a, p.src_b, s.hi,
        max(CASE WHEN s.source = p.src_a THEN 1 ELSE 0 END) AS ia,
        max(CASE WHEN s.source = p.src_b THEN 1 ELSE 0 END) AS ib
      FROM pairs p JOIN syn s ON s.source IN (p.src_a, p.src_b)
      GROUP BY 1, 2, 3),
tk AS (SELECT src_a, src_b, hi, ia, ib,
         row_number() OVER (PARTITION BY src_a, src_b ORDER BY hi) AS rn
       FROM u),
agg AS (SELECT src_a, src_b, count(*) AS n_syn, max(hi) AS hk,
          sum(ia * ib) AS rho
        FROM tk WHERE rn <= 128 GROUP BY 1, 2),
est AS (SELECT src_a, src_b,
          CASE WHEN n_syn < 128 THEN CAST(n_syn AS BIGINT)
               ELSE CAST(round(127.0 * ({_p60} / hk::DOUBLE)) AS BIGINT)
          END AS union_est, rho
        FROM agg)
SELECT src_a, src_b, union_est,
       CAST((rho * union_est) // 128 AS BIGINT) AS inter_est,
       round(rho::DOUBLE / 128, 6) AS jaccard_est
FROM est ORDER BY src_a, src_b"""

    # CCNet head/middle/tail terciles over the same score frame: two
    # interpolated-percentile scalars, broadcast compare
    sql["ppl_bucket"] = f"""
WITH {_bg_ctes},
cuts AS (SELECT quantile_cont(score, 1.0/3.0) AS c1,
                quantile_cont(score, 2.0/3.0) AS c2 FROM bsc)
SELECT doc_id, score,
  CASE WHEN score >= c2 THEN 'head'
       WHEN score >= c1 THEN 'middle'
       ELSE 'tail' END AS ppl_bucket
FROM bsc CROSS JOIN cuts ORDER BY doc_id"""

    # per-doc top-3 tf-idf terms; integer-quantized idf so the ranking
    # key is exact, ties by term string
    sql["tfidf_topk"] = r"""
WITH t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
           FROM documents),
e AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM e GROUP BY 1, 2),
dfc AS (SELECT term, count(*) AS dfc FROM tf GROUP BY 1),
nd AS (SELECT count(*) AS n FROM documents),
sc AS (SELECT doc_id, term, tf,
         tf * CAST(round(ln((n + 1)::DOUBLE / (dfc + 1)) * 1e6) AS BIGINT)
           AS s
       FROM tf JOIN dfc USING (term) CROSS JOIN nd),
rk AS (SELECT doc_id, term, tf, s,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY s DESC, term ASC) AS rank
       FROM sc)
SELECT doc_id, rank, term, tf, round(s / 1e6, 6) AS tfidf
FROM rk WHERE rank <= 3 ORDER BY doc_id, rank"""

    # domain inventory over the deterministically URL-enriched corpus —
    # identical injected strings, identical RE2-safe host pattern
    sql["domain_stats"] = r"""
WITH enr AS (
  SELECT doc_id,
    text
    || repeat(' see https://site' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.org/p/' || CAST(doc_id AS VARCHAR),
              CAST(doc_id % 2 AS INT))
    || repeat(' img http://cdn' || CAST(doc_id % 3 AS VARCHAR)
              || '.example.net/a.png',
              CAST(doc_id % 3 AS INT)) AS text
  FROM documents),
h AS (SELECT doc_id,
        lower(unnest(regexp_extract_all(text, 'https?://([^/\s:]+)', 1)))
          AS domain
      FROM enr),
pd AS (SELECT doc_id, domain, count(*) AS c FROM h GROUP BY 1, 2)
SELECT domain, CAST(sum(c) AS BIGINT) AS url_cnt, count(*) AS doc_cnt
FROM pd GROUP BY domain ORDER BY domain"""

    # shared 6-word line regrouping for the line-level cleaning gates —
    # identical strings to __spark_entry__._lines_enriched
    def _line_ctes(punct: bool) -> str:
        if punct:
            body = (
                "array_to_string(toks[i*6+1 : i*6+6], ' ') || "
                "CASE WHEN (doc_id + i) % 7 = 0 THEN '' "
                "WHEN (doc_id + i) % 5 = 0 THEN '!' ELSE '.' END"
            )
        else:
            body = "array_to_string(toks[i*6+1 : i*6+6], ' ')"
        return f"""
t AS (SELECT doc_id,
        list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                    x -> x <> '') AS toks
      FROM documents),
base AS (SELECT doc_id,
           list_transform(range(0, CAST(ceil(len(toks) / 6.0) AS BIGINT)),
                          i -> {body}) AS ls
         FROM t)"""

    # C4 heuristics over the punctuated line structure + marker injections
    sql["c4_clean"] = f"""
WITH {_line_ctes(True)},
e AS (SELECT doc_id,
        (CASE WHEN doc_id % 11 = 0
              THEN ['please enable javascript to view this page.']
              ELSE [] END)
        || ls
        || (CASE WHEN doc_id % 13 = 0
                 THEN ['lorem ipsum dolor sit amet consectetur.']
                 ELSE [] END)
        || (CASE WHEN doc_id % 17 = 0
                 THEN ['if (x) {{ return y; }} end of sample.']
                 ELSE [] END) AS ls
      FROM base),
k AS (SELECT doc_id, len(ls) AS n_lines,
        list_filter(ls, l ->
            substr(l, length(l), 1) IN ('.', '!', '?', '"')
            AND len(list_filter(string_split(l, ' '), w -> w <> '')) >= 5
            AND NOT contains(lower(l), 'javascript')) AS kept,
        array_to_string(ls, chr(10)) AS full_text
      FROM e),
p AS (SELECT doc_id, n_lines, len(kept) AS kept_lines,
        (len(kept) >= 3
         AND NOT contains(lower(full_text), 'lorem ipsum')
         AND NOT contains(full_text, '{{')) AS page_kept,
        kept
      FROM k)
SELECT doc_id, n_lines, kept_lines, page_kept,
       CASE WHEN page_kept THEN array_to_string(kept, chr(10)) END
         AS clean_text
FROM p ORDER BY doc_id"""

    # corpus-wide first-occurrence line dedup over the boilerplate-
    # injected line structure
    sql["line_dedup"] = f"""
WITH {_line_ctes(False)},
e AS (SELECT doc_id,
        (CASE WHEN doc_id % 3 = 0
              THEN ['subscribe to our newsletter for daily updates']
              ELSE [] END)
        || ls
        || (CASE WHEN doc_id % 5 = 0
                 THEN ['all rights reserved copyright two thousand']
                 ELSE [] END) AS ls
      FROM base),
x AS (SELECT doc_id, unnest(ls) AS line,
             unnest(range(1, len(ls) + 1)) AS p
      FROM e),
f AS (SELECT doc_id, line, p,
             row_number() OVER (PARTITION BY line ORDER BY doc_id, p) = 1
               AS keep
      FROM x)
SELECT doc_id, count(*) AS n_lines,
       count(*) FILTER (WHERE NOT keep) AS removed_lines,
       coalesce(string_agg(line, chr(10) ORDER BY p)
                  FILTER (WHERE keep), '') AS clean_text
FROM f GROUP BY doc_id ORDER BY doc_id"""

    # split-index-append composition returns exactly the one-shot result
    sql["line_index_topup"] = sql["line_dedup"]

    # HTML extraction over deterministically rebuilt markup; the regex
    # chain mirrors extract_html_text step for step (RE2 == Java regex on
    # these patterns: inline (?is), lazy bodies, no backrefs)
    sql["html_extract"] = f"""
WITH {_line_ctes(False)},
h AS (SELECT doc_id,
  '<div class="nav"><a href="/">home &amp; start</a></div>'
  || CASE WHEN doc_id % 7 = 0
          THEN '<script type="text/javascript">var s=1;</script>'
          ELSE '' END
  || array_to_string(list_transform(range(0, len(ls)),
       i -> '<p>' || ls[i+1]
            || CASE WHEN (doc_id + i) % 5 = 0
                    THEN ' Tom &amp; Jerry &lt;3' ELSE '' END
            || CASE WHEN (doc_id + i) % 4 = 0
                    THEN '<br>line break bit' ELSE '' END
            || '</p>'), '')
  || CASE WHEN doc_id % 11 = 0 THEN '<style>.x{{color:red}}</style>'
          ELSE '' END
  || CASE WHEN doc_id % 13 = 0 THEN '<!-- hidden -->' ELSE '' END AS html
FROM base),
s1 AS (SELECT doc_id, regexp_replace(html,
         '(?is)<script\\b[^>]*>.*?</script\\s*>', '', 'g') AS x FROM h),
s2 AS (SELECT doc_id, regexp_replace(x,
         '(?is)<style\\b[^>]*>.*?</style\\s*>', '', 'g') AS x FROM s1),
s3 AS (SELECT doc_id, regexp_replace(x, '(?s)<!--.*?-->', '', 'g') AS x
       FROM s2),
s4 AS (SELECT doc_id, regexp_replace(x,
         '(?i)<br\\s*/?>|</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote)\\s*>',
         chr(10), 'g') AS x FROM s3),
s5 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', '', 'g') AS x FROM s4),
s6 AS (SELECT doc_id,
         replace(replace(replace(replace(replace(replace(replace(x,
           '&nbsp;', ' '), '&quot;', '"'), '&#39;', chr(39)),
           '&apos;', chr(39)), '&lt;', '<'), '&gt;', '>'),
           '&amp;', '&') AS x
       FROM s5),
s7 AS (SELECT doc_id, regexp_replace(x, '[ \\t]+', ' ', 'g') AS x FROM s6),
lf AS (SELECT doc_id,
         list_filter(list_transform(string_split(x, chr(10)),
                                    l -> trim(l)),
                     l -> l <> '') AS ls2
       FROM s7)
SELECT doc_id, array_to_string(ls2, chr(10)) AS text,
       len(ls2) AS n_lines
FROM lf ORDER BY doc_id"""

    # data-card report: exact counts + IEEE single-division ratios; the
    # median is nearest-rank from the token-count histogram, entropy terms
    # are 1e-6-quantized before the order-free integer sum
    sql["datacard"] = r"""
WITH d AS (SELECT doc_id, lang, source,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS tk,
             length(text) AS ch, md5(text) AS h
           FROM documents),
tot AS (SELECT count(*) AS n, CAST(sum(tk) AS BIGINT) AS t,
               CAST(sum(ch) AS BIGINT) AS c,
               count(DISTINCT h) AS u, count(DISTINCT lang) AS nl,
               count(DISTINCT source) AS ns FROM d),
base AS (
  SELECT 'n_docs' AS metric, n::DOUBLE AS value FROM tot UNION ALL
  SELECT 'n_tokens', t::DOUBLE FROM tot UNION ALL
  SELECT 'n_chars', c::DOUBLE FROM tot UNION ALL
  SELECT 'n_langs', nl::DOUBLE FROM tot UNION ALL
  SELECT 'n_sources', ns::DOUBLE FROM tot UNION ALL
  SELECT 'mean_doc_tokens', round(t / n::DOUBLE, 6) FROM tot UNION ALL
  SELECT 'exact_dup_rate', round(1.0 - u / n::DOUBLE, 6) FROM tot),
hist AS (SELECT tk, count(*) AS cnt FROM d GROUP BY 1),
cum AS (SELECT tk, sum(cnt) OVER (ORDER BY tk) AS cum FROM hist),
med AS (SELECT 'median_doc_tokens' AS metric,
               CAST(min(tk) AS DOUBLE) AS value
        FROM cum CROSS JOIN tot WHERE cum >= ceil(n / 2.0)),
langs AS (SELECT 'lang_share:' || lang AS metric,
                 round(cnt / n::DOUBLE, 6) AS value
          FROM (SELECT lang, count(*) AS cnt FROM d GROUP BY 1)
          CROSS JOIN tot),
ent AS (SELECT 'source_entropy_nats' AS metric,
               round(-CAST(sum(q) AS BIGINT) / 1e6, 6) AS value
        FROM (SELECT CAST(round(ln(cnt / n::DOUBLE)
                                * (cnt / n::DOUBLE) * 1e6) AS BIGINT) AS q
              FROM (SELECT source, count(*) AS cnt FROM d GROUP BY 1)
              CROSS JOIN tot) _)
SELECT metric, value FROM (
  SELECT * FROM base UNION ALL SELECT * FROM med
  UNION ALL SELECT * FROM langs UNION ALL SELECT * FROM ent) _
ORDER BY metric"""

    # temperature-scaled domain mixing at alpha = 0.5: sqrt and division
    # are IEEE-correctly-rounded, so no quantization convention is needed
    # beyond the 1e9 integer weight that makes the normalizer order-free
    sql["temperature_mix"] = r"""
WITH e AS (SELECT source AS domain,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS tk
           FROM documents),
per AS (SELECT domain, count(*) AS n_docs, CAST(sum(tk) AS BIGINT) AS tok_cnt
        FROM e GROUP BY 1),
tt AS (SELECT CAST(sum(tok_cnt) AS BIGINT) AS t FROM per),
p AS (SELECT domain, n_docs, tok_cnt, tok_cnt::DOUBLE / t AS pr,
             CAST(round(sqrt(tok_cnt::DOUBLE / t) * 1e9) AS BIGINT) AS wq
      FROM per CROSS JOIN tt),
wt AS (SELECT CAST(sum(wq) AS BIGINT) AS w FROM p)
SELECT domain, n_docs, tok_cnt,
       round(pr, 6) AS raw_share,
       round(wq::DOUBLE / w, 6) AS mix_weight,
       round((wq::DOUBLE / w) / pr, 6) AS epochs
FROM p CROSS JOIN wt ORDER BY domain"""

    # as-of join: greatest right ts <= left ts per user within tolerance,
    # ties to the greatest view_id (= the Spark side's payload-tuple rule)
    sql["asof_join"] = """
WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type, value
           FROM events),
c AS (SELECT event_id, user_id, tus FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS view_id, user_id, tus, value AS view_value
      FROM e WHERE event_type = 'view'),
j AS (SELECT c.user_id, c.event_id, c.tus,
             v.view_id, v.tus AS tus_r, v.view_value,
             row_number() OVER (PARTITION BY c.event_id
                                ORDER BY v.tus DESC, v.view_id DESC) AS rn
      FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.tus <= c.tus
                        AND v.tus >= c.tus - 600000000)
SELECT user_id, event_id, tus, view_id, tus_r, view_value
FROM j WHERE rn = 1 ORDER BY event_id"""

    # range join: plain inclusive theta join — the Spark side's bucketed
    # equi-join must return exactly these pairs
    sql["range_join"] = """
WITH e AS (SELECT event_id, epoch_us(ts) AS tus, user_id, event_type
           FROM events),
c AS (SELECT event_id AS click_id, user_id, tus FROM e
      WHERE event_type = 'click'),
r AS (SELECT event_id AS error_id, user_id, tus AS start_us,
             tus + 300000000 AS end_us
      FROM e WHERE event_type = 'error')
SELECT c.user_id, r.error_id, c.click_id, c.tus, r.start_us
FROM c JOIN r ON r.user_id = c.user_id
             AND c.tus >= r.start_us AND c.tus <= r.end_us
ORDER BY error_id, click_id"""

    # gap sessionization: lag + running sum, 0-based per-user session ids
    sql["sessionize"] = """
WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
l AS (SELECT user_id, tus,
             CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus) > 1800000000
                  THEN 1 ELSE 0 END AS nw
      FROM e),
s AS (SELECT user_id, tus,
             CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
      FROM l)
SELECT user_id, session_idx, min(tus) AS start_us, max(tus) AS end_us,
       count(*) AS n_events, max(tus) - min(tus) AS duration_us
FROM s GROUP BY 1, 2 ORDER BY user_id, session_idx"""

    # path mining: the sessionize chain + two lead() steps over the
    # (user, session) partition ordered (tus, event_id); complete
    # 3-grams only
    sql["event_paths"] = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
           FROM events),
l AS (SELECT user_id, event_id, tus, event_type,
             CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus) > 1800000000
                  THEN 1 ELSE 0 END AS nw
      FROM e),
s AS (SELECT user_id, event_id, tus, event_type,
             CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sx
      FROM l),
p AS (SELECT user_id, sx, event_type AS e0,
             lead(event_type, 1) OVER w AS e1,
             lead(event_type, 2) OVER w AS e2
      FROM s WINDOW w AS (PARTITION BY user_id, sx
                          ORDER BY tus, event_id)),
c AS (SELECT e0 || ' > ' || e1 || ' > ' || e2 AS path,
             CAST(user_id AS VARCHAR) || '/' || CAST(sx AS VARCHAR) AS sk
      FROM p WHERE e0 IS NOT NULL AND e1 IS NOT NULL
        AND e2 IS NOT NULL)
SELECT path, CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT sk) AS BIGINT) AS n_sessions
FROM c GROUP BY 1 ORDER BY n_occurrences DESC, path"""

    # one-step transition matrix: same sessionize CTEs as event_paths,
    # lead(1), NULL-propagating drop, exact integer probability
    sql["event_transitions"] = """
WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus, event_type
           FROM events),
l AS (SELECT user_id, event_id, tus, event_type,
             CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id
                                            ORDER BY tus) > 1800000000
                  THEN 1 ELSE 0 END AS nw
      FROM e),
s AS (SELECT user_id, event_id, tus, event_type,
             CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY tus
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sx
      FROM l),
p AS (SELECT event_type AS from_type,
             lead(event_type, 1) OVER (PARTITION BY user_id, sx
                                       ORDER BY tus, event_id) AS to_type
      FROM s),
c AS (SELECT from_type, to_type, count(*) AS n FROM p
      WHERE from_type IS NOT NULL AND to_type IS NOT NULL
      GROUP BY 1, 2)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(n::DOUBLE / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM c ORDER BY from_type, to_type"""

    # positional phrase search: postings with 1-based positions, phrase
    # = join chain on (doc, pos + i) over term-filtered postings
    sql["phrase_search"] = r"""
WITH tk AS (SELECT doc_id,
              list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                          x -> x != '') AS t
            FROM documents),
post AS (SELECT doc_id, unnest(range(1, len(t) + 1)) AS pos,
                unnest(t) AS term
         FROM tk),
ph AS (SELECT unnest(['slow hash batch', 'table table key',
                      'fast table value']) AS phrase),
pt AS (SELECT phrase, regexp_split_to_array(phrase, ' ') AS w FROM ph),
m AS (SELECT pt.phrase, p0.doc_id, p0.pos AS p0
      FROM pt
      JOIN post p0 ON p0.term = pt.w[1]
      JOIN post p1 ON p1.doc_id = p0.doc_id AND p1.pos = p0.pos + 1
                   AND p1.term = pt.w[2]
      JOIN post p2 ON p2.doc_id = p0.doc_id AND p2.pos = p0.pos + 2
                   AND p2.term = pt.w[3])
SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       CAST(min(p0) AS BIGINT) AS first_pos
FROM m GROUP BY 1, 2 ORDER BY phrase, doc_id"""

    # ordered funnel: one min-aggregate per stage, greedy-earliest with
    # the 7-day whole-funnel window anchored at ts_1
    sql["funnel"] = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
s1 AS (SELECT user_id, min(tus) AS ts_1 FROM e
       WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT s1.user_id, ts_1,
         min(CASE WHEN e.tus > s1.ts_1
                   AND e.tus <= s1.ts_1 + 604800000000
                  THEN e.tus END) AS ts_2
       FROM s1 LEFT JOIN e ON e.user_id = s1.user_id
                              AND e.event_type = 'view'
       GROUP BY 1, 2),
s3 AS (SELECT s2.user_id, ts_1, ts_2,
         min(CASE WHEN e.tus > s2.ts_2
                   AND e.tus <= s2.ts_1 + 604800000000
                  THEN e.tus END) AS ts_3
       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
                              AND e.event_type = 'click'
       GROUP BY 1, 2, 3),
s4 AS (SELECT s3.user_id, ts_1, ts_2, ts_3,
         min(CASE WHEN e.tus > s3.ts_3
                   AND e.tus <= s3.ts_1 + 604800000000
                  THEN e.tus END) AS ts_4
       FROM s3 LEFT JOIN e ON e.user_id = s3.user_id
                              AND e.event_type = 'purchase'
       GROUP BY 1, 2, 3, 4)
SELECT user_id, ts_1, ts_2, ts_3, ts_4,
       CAST(1 + CASE WHEN ts_2 IS NOT NULL THEN 1 ELSE 0 END + CASE WHEN ts_3 IS NOT NULL THEN 1 ELSE 0 END + CASE WHEN ts_4 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS steps_completed
FROM s4 ORDER BY user_id"""

    # weekly cohort retention: integer-division period buckets (div/# //
    # agree; float-divide-then-cast would round on DuckDB)
    sql["retention"] = """
WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS p FROM events),
first AS (SELECT user_id, min(p) AS cohort FROM e GROUP BY 1),
active AS (SELECT DISTINCT user_id, p FROM e),
sz AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY 1),
grid AS (SELECT cohort, a.p - cohort AS "offset", count(*) AS n_active
         FROM active a JOIN first USING (user_id) GROUP BY 1, 2)
SELECT grid.cohort, "offset", n_active, cohort_size,
       round(n_active / cohort_size::DOUBLE, 6) AS retention
FROM grid JOIN sz USING (cohort) ORDER BY cohort, 2"""

    # ROLLUP grouping sets; values summed as exact integer cents so no
    # float-fold ordering can perturb the hash
    sql["event_rollup"] = """
WITH e AS (SELECT event_type, user_id // 10 AS user_bucket,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events)
SELECT event_type, user_bucket, count(*) AS n_events,
       round(CAST(sum(cents) AS BIGINT) / 100.0, 6) AS value_sum
FROM e GROUP BY ROLLUP (event_type, user_bucket)
ORDER BY event_type, user_bucket"""

    # CDC block dedup: boundary after token p where the md5 of the
    # 4-token window ending at p starts with nibble '0'; exclusive
    # prefix-sum of flags numbers the blocks; block md5 is the dedup key
    sql["cdc_dedup"] = r"""
WITH tk AS (SELECT doc_id,
              list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                          x -> x != '') AS t
            FROM documents),
wn AS (SELECT doc_id, t, len(t) AS n,
         list_transform(range(1, greatest(len(t) - 3, 0) + 1),
            j -> md5(t[j] || ' ' || t[j + 1] || ' ' || t[j + 2]
                     || ' ' || t[j + 3])) AS wh
       FROM tk),
fl AS (SELECT doc_id, t, n,
         list_concat(
           list_transform(range(1, least(n, 3) + 1), j -> false),
           list_transform(wh, h -> substr(h, 1, 1) = '0')) AS flags
       FROM wn),
ex AS (SELECT doc_id, unnest(range(1, n + 1)) AS pos, unnest(t) AS tok,
         unnest(flags) AS bflag
       FROM fl),
bl AS (SELECT doc_id, pos, tok,
         coalesce(sum(CASE WHEN bflag THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS block_id
       FROM ex),
bh AS (SELECT doc_id, block_id, count(*) AS n_tok,
         md5(string_agg(tok, ' ' ORDER BY pos)) AS block_hash
       FROM bl GROUP BY 1, 2),
ph AS (SELECT block_hash, count(*) AS c, min(n_tok) AS nt
       FROM bh GROUP BY 1)
SELECT CAST(sum(c) AS BIGINT) AS total_blocks,
       CAST(count(*) AS BIGINT) AS distinct_blocks,
       CAST(sum(c * nt) AS BIGINT) AS tokens_total,
       CAST(sum(nt) AS BIGINT) AS tokens_dedup,
       round((sum(c * nt) - sum(nt))::DOUBLE / sum(c * nt), 6)
         AS dup_token_share
FROM ph"""

    # deterministic epoch shuffle: md5(epoch0:id) permutation rank,
    # shard = rank DIV 64 (ids make the key unique, so ties are moot)
    sql["shard_epoch"] = """
WITH r AS (SELECT doc_id,
             row_number() OVER (
               ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)),
                        doc_id) - 1 AS rank0
           FROM documents)
SELECT doc_id, CAST(rank0 // 64 AS BIGINT) AS shard,
       CAST(rank0 % 64 AS BIGINT) AS pos_in_shard
FROM r ORDER BY doc_id"""

    # SCD2 merge: open slice full-outer-joined with the update batch;
    # null-safe attr compare (IS NOT DISTINCT FROM = Spark's <=>)
    sql["scd2"] = """
WITH dim AS (SELECT c_custkey, c_mktsegment, c_nationkey,
               CAST(0 AS BIGINT) AS valid_from,
               CAST(NULL AS BIGINT) AS valid_to
             FROM customer),
upd AS (
  SELECT c_custkey, c_mktsegment || '_v2' AS c_mktsegment, c_nationkey,
         CAST(1000 AS BIGINT) AS ts
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey, c_mktsegment, c_nationkey, 1000
  FROM customer WHERE c_custkey % 7 != 0 AND c_custkey % 11 = 0
  UNION ALL
  SELECT c_custkey + 1000000, 'NEWSEG', c_nationkey, 1000
  FROM (SELECT * FROM customer ORDER BY c_custkey LIMIT 5) _),
j AS (SELECT d.c_custkey AS dk, d.c_mktsegment AS dm, d.c_nationkey AS dn,
             d.valid_from AS vf, d.valid_to AS vt,
             u.c_custkey AS uk, u.c_mktsegment AS um, u.c_nationkey AS un,
             u.ts
      FROM dim d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey),
same AS (SELECT *,
           (dm IS NOT DISTINCT FROM um) AND (dn IS NOT DISTINCT FROM un)
             AS eq
         FROM j),
-- late guard (ts <= vf rejected as no-op) mirrored from scd2_merge;
-- the fixture batch is one-row-per-key with ts > valid_from throughout
keep_open AS (SELECT dk AS c_custkey, dm AS c_mktsegment,
                     dn AS c_nationkey, vf AS valid_from, vt AS valid_to
              FROM same WHERE uk IS NULL
                OR (dk IS NOT NULL AND (eq OR ts <= vf))),
now_closed AS (SELECT dk, dm, dn, vf, ts
               FROM same
               WHERE dk IS NOT NULL AND uk IS NOT NULL AND NOT eq
                 AND ts > vf),
new_open AS (SELECT uk, um, un, ts, CAST(NULL AS BIGINT)
             FROM same
             WHERE uk IS NOT NULL
               AND (dk IS NULL OR (NOT eq AND ts > vf))),
allr AS (SELECT * FROM keep_open UNION ALL SELECT * FROM now_closed
         UNION ALL SELECT * FROM new_open)
SELECT c_custkey, c_mktsegment, c_nationkey, valid_from, valid_to
FROM allr ORDER BY c_custkey, valid_from, valid_to"""

    # data-quality report: each check one aggregate / anti-join count;
    # NULL predicate results and NULL FK keys count as violations
    sql["dq_checks"] = """
WITH c1 AS (SELECT 'orders_pk_unique' AS check,
              CAST(count(*) AS BIGINT) AS n_checked,
              CAST(count(*) - (SELECT count(*) FROM
                   (SELECT DISTINCT o_orderkey FROM orders))
                   AS BIGINT) AS n_violations
            FROM orders),
c2 AS (SELECT 'customer_pk_unique',
              CAST(count(*) AS BIGINT),
              CAST(count(*) - (SELECT count(*) FROM
                   (SELECT DISTINCT c_custkey FROM customer))
                   AS BIGINT)
       FROM customer),
c3 AS (SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT)
       FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
         ON o.o_custkey = c.c_custkey),
c4 AS (SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT)
       FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
         ON l.l_orderkey = o.o_orderkey),
c5 AS (SELECT 'lineitem_quantity_range', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN coalesce(
                     NOT (l_quantity BETWEEN 1 AND 50), TRUE)
                   THEN 1 ELSE 0 END) AS BIGINT)
       FROM lineitem),
c6 AS (SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN coalesce(o_totalprice <= 0, TRUE)
                   THEN 1 ELSE 0 END) AS BIGINT)
       FROM orders),
c7 AS (SELECT 'documents_text_nonempty', CAST(count(*) AS BIGINT),
              CAST(sum(CASE WHEN coalesce(length(trim(text)) = 0, TRUE)
                   THEN 1 ELSE 0 END) AS BIGINT)
       FROM documents),
u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2 UNION ALL
      SELECT * FROM c3 UNION ALL SELECT * FROM c4 UNION ALL
      SELECT * FROM c5 UNION ALL SELECT * FROM c6 UNION ALL
      SELECT * FROM c7)
SELECT "check", n_checked, n_violations,
       CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS pass_flag
FROM u ORDER BY "check" """

    # schema-on-read JSON: typed $.k per event type; missing/malformed
    # fields are NULL (counted in n_events, not n_present) on both sides
    sql["json_props"] = """
WITH x AS (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS v
           FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(v) AS BIGINT) AS n_present,
       CAST(sum(v) AS BIGINT) AS val_sum,
       min(v) AS val_min, max(v) AS val_max
FROM x GROUP BY 1 ORDER BY event_type"""

    # vocabulary coverage curve: word counts, (count desc, word asc)
    # rank, prefix sums at each candidate k
    sql["vocab_coverage"] = r"""
WITH tk AS (SELECT unnest(list_filter(
              regexp_split_to_array(lower(trim(text)), '\s+'),
              x -> x != '')) AS w
            FROM documents),
wc AS (SELECT w, count(*) AS c FROM tk GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS total FROM wc),
rk AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w ASC) AS r
       FROM wc),
ks AS (SELECT unnest([10, 100, 1000]) AS k)
SELECT ks.k,
       CAST(sum(CASE WHEN rk.r <= ks.k THEN rk.c ELSE 0 END) AS BIGINT)
         AS covered,
       any_value(tot.total) AS total,
       round(sum(CASE WHEN rk.r <= ks.k THEN rk.c ELSE 0 END)::DOUBLE
             / any_value(tot.total), 6) AS coverage
FROM ks CROSS JOIN rk CROSS JOIN tot GROUP BY ks.k ORDER BY ks.k"""

    # per-user median/MAD outlier report: nearest-rank LOWER medians
    # ((n+1) DIV 2-th smallest) over exact integer cents — all-integer
    sql["mad_outlier"] = """
WITH b AS (SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c
           FROM events WHERE value IS NOT NULL),
r AS (SELECT user_id, c,
        row_number() OVER (PARTITION BY user_id ORDER BY c ASC) AS rn,
        count(*) OVER (PARTITION BY user_id) AS n
      FROM b),
m AS (SELECT user_id, c AS med FROM r WHERE rn = (n + 1) // 2),
d AS (SELECT b.user_id, m.med, abs(b.c - m.med) AS dev
      FROM b JOIN m USING (user_id)),
dr AS (SELECT user_id, dev,
         row_number() OVER (PARTITION BY user_id ORDER BY dev ASC) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
       FROM d),
md AS (SELECT user_id, dev AS mad FROM dr WHERE rn = (n + 1) // 2)
SELECT d.user_id, CAST(count(*) AS BIGINT) AS n_events,
       min(d.med) AS med_cents, min(md.mad) AS mad_cents,
       CAST(sum(CASE WHEN d.dev > 3 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN md USING (user_id) GROUP BY 1 ORDER BY user_id"""

    # k-NN label propagation: int8 pairs corpus x the FIXED-SIZE seed
    # sample (50 smallest-md5 labeled vectors), 5 nearest non-self seeds
    # per vector (sim desc, seed id asc), majority vote (count desc,
    # label asc)
    sql["label_prop"] = """
WITH ev AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
            FROM embeddings),
qs AS (SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) AS s FROM ev),
qv AS (SELECT vec_id,
         CASE WHEN s > 0
              THEN list_transform(v, x -> CAST(round(x / s * 127) AS BIGINT))
              ELSE list_transform(v, x -> CAST(0 AS BIGINT)) END AS q
       FROM qs),
lb AS (SELECT vec_id, label FROM embeddings),
sd AS (SELECT qv.vec_id AS sid, qv.q AS sq, lb.label AS slab
       FROM qv JOIN lb USING (vec_id)
       WHERE lb.label IS NOT NULL
       ORDER BY md5(CAST(qv.vec_id AS VARCHAR)), qv.vec_id LIMIT 50),
pr AS (SELECT e.vec_id, sd.sid, sd.slab,
         list_sum(list_transform(range(1, 65), i -> e.q[i] * sd.sq[i]))
           AS dot,
         list_sum(list_transform(range(1, 65), i -> e.q[i] * e.q[i]))
           AS na2,
         list_sum(list_transform(range(1, 65), i -> sd.sq[i] * sd.sq[i]))
           AS nb2
       FROM qv e CROSS JOIN sd WHERE e.vec_id != sd.sid),
nn5 AS (SELECT vec_id, slab FROM (
          SELECT vec_id, slab,
                 row_number() OVER (PARTITION BY vec_id
                   ORDER BY dot::DOUBLE / sqrt(na2::DOUBLE * nb2::DOUBLE)
                            DESC, sid ASC) AS rn
          FROM pr WHERE na2 > 0 AND nb2 > 0) _ WHERE rn <= 5),
vt AS (SELECT vec_id, slab, count(*) AS votes FROM nn5 GROUP BY 1, 2),
pd AS (SELECT vec_id, slab AS pred_label, votes FROM (
         SELECT vec_id, slab, votes,
                row_number() OVER (PARTITION BY vec_id
                                   ORDER BY votes DESC, slab ASC) AS rv
         FROM vt) _ WHERE rv = 1)
SELECT pd.vec_id, pd.pred_label, CAST(pd.votes AS BIGINT) AS votes,
       lb.label,
       CASE WHEN pd.pred_label = lb.label THEN 1 ELSE 0 END AS correct
FROM pd JOIN lb USING (vec_id) ORDER BY pd.vec_id"""

    # bit-exact HyperLogLog: md5-derived 32-bit hashes, 512 integer-max
    # registers, harmonic sum as an exact dyadic rational (V*2^K + S)/2^K;
    # only the final multiply/divide and the linear-counting ln are float,
    # each one correctly-rounded op on exactly-reproducible inputs
    _alpha_sql = "0.7213 / (1 + 1.079 / 512) * 512 * 512"
    sql["hll_distinct"] = rf"""
WITH e AS (SELECT source,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                      '\s+'),
                                x -> x <> '')) AS tok
           FROM documents),
hh AS (SELECT source, tok, md5('hll:' || tok) AS h FROM e),
hv AS (SELECT source, CAST(({_hex8int}) AS BIGINT) AS h32 FROM hh),
br AS (SELECT source, h32 >> 23 AS bucket, h32 % 8388608 AS w FROM hv),
rr AS (SELECT source, bucket,
         CASE WHEN w > 0 THEN 23 - (length(bin(w)) - 1) ELSE 24 END AS rho
       FROM br),
regs AS (SELECT source, bucket, max(rho) AS mr FROM rr GROUP BY 1, 2),
kk AS (SELECT source, max(mr) AS K FROM regs GROUP BY 1),
per AS (SELECT regs.source, any_value(K) AS K, count(*) AS nb,
          CAST(sum(CAST(1 AS BIGINT) << (K - mr)) AS BIGINT) AS S
        FROM regs JOIN kk USING (source) GROUP BY 1),
sel AS (SELECT source, (512 - nb) AS V,
          CAST(CAST(1 AS BIGINT) << K AS DOUBLE) AS p2k, S
        FROM per),
est AS (SELECT source,
          CASE WHEN ({_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE))
                    <= 1280.0 AND V > 0
               THEN 512.0 * ln(512.0 / V)
               WHEN ({_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE))
                    > (4294967296.0 / 30.0)
                AND ({_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE))
                    < 4294967296.0
               THEN -4294967296.0
                    * ln(1.0 - ({_alpha_sql} * p2k
                                / (V::DOUBLE * p2k + S::DOUBLE))
                          / 4294967296.0)
               ELSE {_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE)
          END AS ev
        FROM sel),
ex AS (SELECT source, count(DISTINCT tok) AS n_exact FROM e GROUP BY 1)
SELECT est.source, n_exact, round(ev, 4) AS hll_est,
       round(abs(round(ev, 4) - n_exact) / n_exact::DOUBLE, 4) AS rel_err
FROM est JOIN ex USING (source) ORDER BY source"""

    # persisted-register variant: register max-merge == one-shot sketch,
    # so the oracle is the same estimate chain without the exact audit
    sql["hll_index_topup"] = (
        sql["hll_distinct"].split(",\nex AS (SELECT source")[0]
        + "\nSELECT source, round(ev, 4) AS hll_est FROM est ORDER BY source"
    )

    # HyperBall harmonic centrality (Boldi & Vigna): one HLL per node,
    # balls grown by register-max along in-edges, per-radius estimates
    # through the SAME dyadic estimate chain as hll_distinct (rounded 4),
    # harmonic = sum of (b_r - b_{r-1})/r rounded 6
    _hb_est_case = f"""CASE WHEN ({_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE))
                    <= 1280.0 AND V > 0
               THEN 512.0 * ln(512.0 / V)
               WHEN ({_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE))
                    > (4294967296.0 / 30.0)
                AND ({_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE))
                    < 4294967296.0
               THEN -4294967296.0
                    * ln(1.0 - ({_alpha_sql} * p2k
                                / (V::DOUBLE * p2k + S::DOUBLE))
                          / 4294967296.0)
               ELSE {_alpha_sql} * p2k / (V::DOUBLE * p2k + S::DOUBLE)
          END"""
    _hb_parts = []
    for _r in range(0, 4):
        if _r > 0:
            _hb_parts.append(f"""
hb_g{_r} AS MATERIALIZED (SELECT node, bucket, max(mr) AS mr FROM (
    SELECT node, bucket, mr FROM hb_g{_r - 1}
    UNION ALL
    SELECT e.dst AS node, g.bucket, g.mr
    FROM edges e JOIN hb_g{_r - 1} g ON g.node = e.src) _
  GROUP BY 1, 2)""")
        _hb_parts.append(f"""
hb_k{_r} AS (SELECT node, max(mr) AS K FROM hb_g{_r} GROUP BY 1),
hb_p{_r} AS (SELECT g.node, any_value(K) AS K, count(*) AS nb,
            CAST(sum(CAST(1 AS BIGINT) << (K - mr)) AS BIGINT) AS S
          FROM hb_g{_r} g JOIN hb_k{_r} USING (node) GROUP BY 1),
hb_s{_r} AS (SELECT node, (512 - nb) AS V,
            CAST(CAST(1 AS BIGINT) << K AS DOUBLE) AS p2k, S
          FROM hb_p{_r}),
hb_e{_r} AS (SELECT node, round({_hb_est_case}, 4) AS b{_r} FROM hb_s{_r})""")
    sql["harmonic"] = (rf"""
WITH {_PR_ENR},
hx AS (SELECT source AS src,
         regexp_replace(lower(unnest(
           regexp_extract_all(text, 'https?://([^/\s:]+)', 1))),
           '^www\.', '') AS dst
       FROM enr),
edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM hx),
hb_n AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
hb_h AS (SELECT node, md5('hb:' || node) AS h FROM hb_n),
hb_v AS (SELECT node, CAST(({_hex8int}) AS BIGINT) AS h32 FROM hb_h),
hb_g0 AS MATERIALIZED (SELECT node, h32 >> 23 AS bucket,
            CASE WHEN h32 % 8388608 > 0
                 THEN 23 - (length(bin(h32 % 8388608)) - 1)
                 ELSE 24 END AS mr
          FROM hb_v),"""
        + ",".join(_hb_parts)
        + """
SELECT n.node, e3.b3 AS reach_est,
       round((e1.b1 - e0.b0) / 1.0 + (e2.b2 - e1.b1) / 2.0
             + (e3.b3 - e2.b2) / 3.0, 6) AS harmonic
FROM hb_n n JOIN hb_e0 e0 USING (node) JOIN hb_e1 e1 USING (node)
            JOIN hb_e2 e2 USING (node) JOIN hb_e3 e3 USING (node)
ORDER BY n.node""")

    # Count-Min heavy-hitter audit: the sketch is exact integer sums over
    # md5 buckets (order-free); estimates = min of each candidate's 4
    # counters; overcount >= 0 is the CM guarantee made visible
    sql["cms_topk"] = rf"""
WITH e AS (SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                           '\s+'),
                                     x -> x <> '')) AS tok
           FROM documents),
tc AS (SELECT tok, count(*) AS c FROM e GROUP BY 1),
cand AS (SELECT tok, c FROM tc ORDER BY c DESC, tok LIMIT 20),
hx AS (SELECT tok, c AS w, d,
              md5('cms' || d || ':' || tok) AS h
       FROM tc CROSS JOIN (SELECT unnest(range(0, 4)) AS d) dd),
hb AS (SELECT tok, w, d, CAST(({_hex8int}) % 1024 AS INT) AS bucket FROM hx),
sk AS (SELECT d, bucket, CAST(sum(w) AS BIGINT) AS cnt FROM hb GROUP BY 1, 2),
cb AS (SELECT cand.tok, cand.c, hb.d, hb.bucket
       FROM cand JOIN hb ON hb.tok = cand.tok),
est AS (SELECT tok, c, min(coalesce(cnt, 0)) AS cms_est
        FROM cb LEFT JOIN sk USING (d, bucket) GROUP BY 1, 2)
SELECT tok, c AS n_exact, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - c AS BIGINT) AS overcount
FROM est ORDER BY n_exact DESC, tok"""
    # additive counter merge == one-shot sketch: same SQL
    sql["cms_index_topup"] = sql["cms_topk"]
    # streamed register folds == one-shot sketch: same estimate SQL
    sql["sketch_stream"] = sql["hll_index_topup"]

    # exact nearest-rank quantiles from the token-count histogram: the
    # rank threshold ceil(q*n) is the only float math (same literal both
    # engines); values are integers end to end
    sql["tok_quantiles"] = r"""
WITH d AS (SELECT lang,
             len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                             x -> x <> '')) AS v
           FROM documents),
hist AS (SELECT lang, v, count(*) AS c FROM d GROUP BY 1, 2),
cum AS (SELECT lang, v, sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum
        FROM hist),
tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM hist GROUP BY 1)
SELECT cum.lang, any_value(n) AS n,
       min(CASE WHEN cum >= ceil(0.25 * n) THEN v END) AS p25,
       min(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS p50,
       min(CASE WHEN cum >= ceil(0.75 * n) THEN v END) AS p75,
       min(CASE WHEN cum >= ceil(0.9 * n) THEN v END) AS p90
FROM cum JOIN tot USING (lang) GROUP BY 1 ORDER BY lang"""

    # DSIR hashed-unigram importance weights: target = lang 'en', raw =
    # whole corpus; add-one smoothed bucket distributions, 1e-6-quantized
    # per-bucket log-ratios (same convention as the LM score gates)
    sql["dsir_weight"] = f"""
WITH e AS (SELECT doc_id, lang = 'en' AS t,
             unnest(list_filter(regexp_split_to_array(lower(trim(text)),
                                                      '\\s+'),
                                x -> x <> '')) AS tok
           FROM documents),
hh AS (SELECT doc_id, t, md5('ds:' || tok) AS h FROM e),
bb AS (SELECT doc_id, t, CAST(({_hex8int}) % 64 AS BIGINT) AS b FROM hh),
dc AS (SELECT doc_id, b, count(*) AS c, bool_or(t) AS t
       FROM bb GROUP BY 1, 2),
bd AS (SELECT b, sum(CASE WHEN t THEN c ELSE 0 END) AS tc, sum(c) AS rc
       FROM dc GROUP BY 1),
tt AS (SELECT sum(tc) AS tt, sum(rc) AS rt FROM bd),
lr AS (SELECT b, CAST(round(ln((tc + 1)::DOUBLE / (tt + 64)
                             * (rt + 64) / (rc + 1)::DOUBLE) * 1e6)
                      AS BIGINT) AS q
       FROM bd CROSS JOIN tt)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS tok_cnt,
       round(sum(c * q) / 1e6, 6) AS dsir_logweight
FROM dc JOIN lr USING (b) GROUP BY doc_id ORDER BY doc_id"""

    # full Gopher repetition table: n-gram families 2..10 per doc; a doc
    # shorter than n tokens contributes no n-family (NULL columns)
    top_cols = ",\n  ".join(
        f"max(CASE WHEN n = {n} THEN topf END) AS top{n}_frac"
        for n in (2, 3, 4)
    )
    dup_cols = ",\n  ".join(
        f"max(CASE WHEN n = {n} THEN dupf END) AS dup{n}_frac"
        for n in range(5, 11)
    )
    sql["gopher_rep"] = rf"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
             AS toks FROM documents),
gr AS (SELECT doc_id, n,
         unnest(list_transform(range(1, len(toks) - n + 2),
                               i -> array_to_string(toks[i:i+n-1], ' ')))
           AS gram
       FROM t CROSS JOIN (SELECT unnest(range(2, 11)) AS n) ns
       WHERE len(toks) >= n),
pg AS (SELECT doc_id, n, gram, count(*) AS c FROM gr GROUP BY 1, 2, 3),
pn AS (SELECT doc_id, n, max(c) AS topc, sum(c) AS tot,
              sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS dupc
       FROM pg GROUP BY 1, 2),
fr AS (SELECT doc_id, n, round(topc::DOUBLE / tot, 6) AS topf,
              round(dupc::DOUBLE / tot, 6) AS dupf FROM pn)
SELECT doc_id,
  {top_cols},
  {dup_cols}
FROM fr GROUP BY doc_id ORDER BY doc_id"""

    sql["unigram_logprob"] = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
  FROM documents),
dt AS (SELECT doc_id, tok, count(*) AS m FROM tok GROUP BY 1, 2),
v AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
n AS (SELECT sum(cnt) AS n_total FROM v)
SELECT doc_id,
  round(sum(m * CAST(round(ln(cnt / n_total) * 1e6) AS BIGINT)) / sum(m)
        / 1e6, 6) AS unigram_logprob,
  CAST(sum(m) AS BIGINT) AS token_cnt
FROM dt JOIN v USING (tok) CROSS JOIN n
GROUP BY doc_id ORDER BY doc_id"""

    # winnowing (MOSS): 4-gram 60-bit md5 hashes, window 4, rightmost-
    # min selection expressed relationally — every window start joins
    # its 4 gram rows, row_number(ORDER BY h ASC, pos DESC) = 1 picks
    # the selection, DISTINCT collapses repeat picks; digest per doc
    _h60gram = " + ".join(
        f"(strpos('0123456789abcdef', substr(hx, {j + 1}, 1)) - 1)"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    _winnow_fp_cte = rf"""
WITH tl AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+')
              AS t FROM documents),
gr AS (SELECT doc_id,
         unnest(range(0, greatest(len(t) - 3, 0))) AS pos, t FROM tl),
gh0 AS (SELECT doc_id, pos,
          md5(array_to_string(t[pos + 1 : pos + 4], ' ')) AS hx FROM gr),
gh AS (SELECT doc_id, pos, CAST({_h60gram} AS BIGINT) AS h FROM gh0),
ng AS (SELECT doc_id, count(*) AS n FROM gh GROUP BY 1),
st AS (SELECT doc_id, unnest(range(0, n - 3)) AS s FROM ng WHERE n >= 4),
win AS (SELECT gh.doc_id, st.s, gh.pos, gh.h
        FROM gh JOIN st ON gh.doc_id = st.doc_id
                       AND gh.pos >= st.s AND gh.pos < st.s + 4),
fp AS (SELECT DISTINCT doc_id, pos, h FROM (
         SELECT doc_id, s, pos, h,
                row_number() OVER (PARTITION BY doc_id, s
                                   ORDER BY h ASC, pos DESC) AS rn
         FROM win) _ WHERE rn = 1)"""
    sql["winnow_fp"] = _winnow_fp_cte + """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
       CAST(sum(h % 1000000007) % 1000000007 AS BIGINT) AS fp_mod_sum,
       min(h) AS min_fp, max(h) AS max_fp
FROM fp GROUP BY doc_id ORDER BY doc_id"""
    sql["winnow_overlap"] = _winnow_fp_cte + """,
df AS (SELECT DISTINCT doc_id, h FROM fp),
rare AS (SELECT h FROM df GROUP BY h HAVING count(*) <= 64),
fr AS (SELECT doc_id, h FROM df JOIN rare USING (h))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fr a JOIN fr b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3
ORDER BY id_a, id_b"""

    # priority sampling: per-source bottom-8 by exact-integer
    # (h60+1) // n_tokens, tiebreak (n_tokens DESC, h60, doc_id) so
    # heavier rows win within a quantization bucket; n_tokens > 0 only
    _h60p = " + ".join(
        f"(strpos('0123456789abcdef', substr(hx, {j + 1}, 1)) - 1)"
        f" * {16 ** (14 - j)}"
        for j in range(15)
    )
    sql["priority_sample"] = rf"""
WITH d AS (SELECT doc_id, source,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
                  AS BIGINT) AS n_tokens
           FROM documents),
h0 AS (SELECT doc_id, source, n_tokens,
         md5('prio:' || CAST(doc_id AS VARCHAR)) AS hx
       FROM d WHERE n_tokens > 0),
h AS (SELECT doc_id, source, n_tokens,
        CAST({_h60p} AS BIGINT) AS hv FROM h0),
r AS (SELECT source, doc_id, n_tokens,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY (hv + 1) // n_tokens ASC, n_tokens DESC,
                   hv ASC, doc_id ASC)
          AS INT) AS prio_rank
      FROM h)
SELECT source, doc_id, n_tokens, prio_rank FROM r
WHERE prio_rank <= 8 ORDER BY source, prio_rank"""

    # ROUGE-2 pair scoring: clipped bigram counts (inner join on gram,
    # sum of least) over (doc, own-truncated-copy) and (doc, next-doc's
    # truncated copy) pairs; zero-gram / zero-match sides score 0
    sql["rouge_pairs"] = r"""
WITH s AS (SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS t
           FROM documents WHERE doc_id % 13 = 0),
sc AS (SELECT doc_id, array_to_string(t, ' ') AS orig,
         array_to_string(t[1 : greatest((2 * len(t)) // 3, 1)], ' ') AS cut
       FROM s),
rk AS (SELECT *, row_number() OVER (ORDER BY doc_id) AS r FROM sc),
pr AS (SELECT doc_id AS id_a, orig AS text_a, doc_id AS id_b,
              cut AS text_b FROM sc
       UNION ALL
       SELECT a.doc_id, a.orig, b.doc_id, b.cut
       FROM rk a JOIN rk b ON b.r = a.r + 1),
ga AS (SELECT id_a, id_b, g, count(*) AS ca FROM (
         SELECT id_a, id_b,
           unnest(list_transform(
             range(1, len(regexp_split_to_array(text_a, '\s+')) - 2 + 2),
             i -> array_to_string(
               regexp_split_to_array(text_a, '\s+')[i:i+1], ' '))) AS g
         FROM pr
         WHERE len(regexp_split_to_array(text_a, '\s+')) >= 2) _
       GROUP BY 1, 2, 3),
gb AS (SELECT id_a, id_b, g, count(*) AS cb FROM (
         SELECT id_a, id_b,
           unnest(list_transform(
             range(1, len(regexp_split_to_array(text_b, '\s+')) - 2 + 2),
             i -> array_to_string(
               regexp_split_to_array(text_b, '\s+')[i:i+1], ' '))) AS g
         FROM pr
         WHERE len(regexp_split_to_array(text_b, '\s+')) >= 2) _
       GROUP BY 1, 2, 3),
m AS (SELECT id_a, id_b, CAST(sum(least(ca, cb)) AS BIGINT) AS n_match
      FROM ga JOIN gb USING (id_a, id_b, g) GROUP BY 1, 2),
ta AS (SELECT id_a, id_b, CAST(sum(ca) AS BIGINT) AS ngrams_a
       FROM ga GROUP BY 1, 2),
tb AS (SELECT id_a, id_b, CAST(sum(cb) AS BIGINT) AS ngrams_b
       FROM gb GROUP BY 1, 2),
base AS (SELECT DISTINCT id_a, id_b FROM pr),
o AS (SELECT base.id_a, base.id_b,
        coalesce(ngrams_a, 0) AS ngrams_a,
        coalesce(ngrams_b, 0) AS ngrams_b,
        coalesce(n_match, 0) AS n_match
      FROM base LEFT JOIN ta USING (id_a, id_b)
                LEFT JOIN tb USING (id_a, id_b)
                LEFT JOIN m USING (id_a, id_b))
SELECT id_a, id_b, ngrams_a, ngrams_b, n_match,
  round(CASE WHEN ngrams_a > 0
             THEN n_match::DOUBLE / ngrams_a ELSE 0 END, 6) AS precision,
  round(CASE WHEN ngrams_b > 0
             THEN n_match::DOUBLE / ngrams_b ELSE 0 END, 6) AS recall,
  round(CASE WHEN n_match > 0 THEN
          2 * (n_match::DOUBLE / ngrams_a) * (n_match::DOUBLE / ngrams_b)
          / ((n_match::DOUBLE / ngrams_a) + (n_match::DOUBLE / ngrams_b))
        ELSE 0 END, 6) AS f1
FROM o ORDER BY id_a, id_b"""

    # log-histogram quantile sketch: bucket = top-5-bits binary bucket
    # (exact below 32), rank = (n*num + den - 1) // den over cumulative
    # counts, answer = bucket LOWER edge; bit arithmetic only (bin()
    # length), same recurrence as datapipe.sketch.logq_bucket/logq_rep
    _lq_rep = (
        "CASE WHEN {b} < 32 THEN {b} ELSE ({b} - 16 * (({b} // 16) - 1))"
        " << (({b} // 16) - 1) END"
    )
    sql["logq_quantiles"] = rf"""
WITH d AS (SELECT source,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
                  AS BIGINT) AS v
           FROM documents),
bk AS (SELECT source,
         CASE WHEN v <= 0 THEN 0 WHEN v < 32 THEN v
              ELSE 16 * (length(bin(v)) - 5)
                   + (v >> (length(bin(v)) - 5)) END AS bucket
       FROM d),
sk AS (SELECT source, bucket, count(*) AS cnt FROM bk GROUP BY 1, 2),
cum AS (SELECT source, bucket, cnt,
          sum(cnt) OVER (PARTITION BY source ORDER BY bucket) AS c,
          sum(cnt) OVER (PARTITION BY source) AS n
        FROM sk),
sel AS (SELECT source, max(n) AS n,
          min(CASE WHEN c >= (n * 50 + 99) // 100 THEN bucket END) AS b50,
          min(CASE WHEN c >= (n * 90 + 99) // 100 THEN bucket END) AS b90,
          min(CASE WHEN c >= (n * 99 + 99) // 100 THEN bucket END) AS b99
        FROM cum GROUP BY source)
SELECT source, CAST(n AS BIGINT) AS n,
  CAST({_lq_rep.format(b="b50")} AS BIGINT) AS p50,
  CAST({_lq_rep.format(b="b90")} AS BIGINT) AS p90,
  CAST({_lq_rep.format(b="b99")} AS BIGINT) AS p99
FROM sel ORDER BY source"""
    sql["logq_index_topup"] = sql["logq_quantiles"]
    sql["logq_stream"] = sql["logq_quantiles"]
    # per-document fingerprints + set-union appends == one-shot winnow
    sql["winnow_index_topup"] = sql["winnow_overlap"]
    sql["winnow_stream"] = sql["winnow_overlap"]
    (
        sql["unigram_vocab"],
        sql["unigram_segment"],
        sql["unigram_nbest"],
    ) = _unigram_oracle()

    # snapshot diff: derived new snapshot (%11 removed, %13 mutated,
    # 5 added under 'newsrc'), full-outer on id, md5 content compare;
    # changed/unchanged count under the NEW group, removed under the old
    sql["corpus_diff"] = """
WITH o AS (SELECT doc_id AS id, source AS go, md5(text) AS ho,
                  1 AS po
           FROM documents),
base AS (SELECT doc_id, source, text FROM documents),
mut AS (SELECT doc_id, source,
          CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        FROM base WHERE doc_id % 11 != 0),
add_ AS (SELECT doc_id + 2000000 AS doc_id, 'newsrc' AS source, text
         FROM (SELECT * FROM base ORDER BY doc_id LIMIT 5) _),
n AS (SELECT doc_id AS id, source AS gn, md5(text) AS hn, 1 AS pn
      FROM mut
      UNION ALL SELECT doc_id, source, md5(text), 1 FROM add_),
j AS (SELECT coalesce(n.gn, o.go) AS source,
        CASE WHEN o.po IS NULL THEN 'added'
             WHEN n.pn IS NULL THEN 'removed'
             WHEN o.ho IS NOT DISTINCT FROM n.hn THEN 'unchanged'
             ELSE 'changed' END AS st
      FROM o FULL OUTER JOIN n ON o.id = n.id)
SELECT source,
  CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_added,
  CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_removed,
  CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_changed,
  CAST(sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
    AS n_unchanged
FROM j GROUP BY source ORDER BY source"""

    # script composition: RE2 code-point classes; dominant = argmax with
    # the fixed script-order tiebreak; mixed = runner-up > 50 per-mille
    _scr = [
        ("latin", "[A-Za-z]"),
        ("cyrillic", r"[\x{0400}-\x{04FF}]"),
        ("greek", r"[\x{0370}-\x{03FF}]"),
        ("arabic", r"[\x{0600}-\x{06FF}]"),
        ("cjk", r"[\x{4E00}-\x{9FFF}]"),
    ]
    _cnt_cols = ",\n  ".join(
        f"CAST(len(regexp_extract_all(text, '{cls}')) AS BIGINT)"
        f" AS {n}_cnt"
        for n, cls in _scr
    )
    _tot = " + ".join(f"{n}_cnt" for n, _ in _scr)
    _best = "greatest(" + ", ".join(f"{n}_cnt" for n, _ in _scr) + ")"
    _dom = "CASE "
    for n, _ in _scr:
        _dom += f"WHEN {n}_cnt = {_best} AND {_best} > 0 THEN '{n}' "
    _dom += "ELSE NULL END"
    _second = "greatest(" + ", ".join(
        f"CASE WHEN ({_dom}) = '{n}' THEN 0 ELSE {n}_cnt END"
        for n, _ in _scr
    ) + ")"
    sql["script_mix"] = f"""
WITH e AS (SELECT doc_id,
             CASE WHEN doc_id % 17 = 0
                  THEN replace(text, 'o', '\u043e') ELSE text END AS text
           FROM documents),
c AS (SELECT doc_id,
  {_cnt_cols}
  FROM e)
SELECT doc_id, latin_cnt, cyrillic_cnt, greek_cnt, arabic_cnt, cjk_cnt,
       CAST({_tot} AS BIGINT) AS scripted_cnt,
       {_dom} AS dominant_script,
       CASE WHEN ({_tot}) > 0
             AND ({_second}) * 1000 > 50 * ({_tot})
            THEN 1 ELSE 0 END AS mixed_flag
FROM c ORDER BY doc_id"""

    # LPT snake-deal shard packing: global (tokens DESC, id) rank,
    # shard = pos or mirror by pass parity; digest per shard
    sql["shard_balance"] = r"""
WITH d AS (SELECT doc_id,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\s+'))
                  AS BIGINT) AS w
           FROM documents),
r AS (SELECT doc_id, w,
        CAST(row_number() OVER (ORDER BY w DESC, doc_id ASC) - 1
             AS BIGINT) AS rk
      FROM d),
a AS (SELECT doc_id, w,
        CASE WHEN (rk // 16) % 2 = 0 THEN rk % 16
             ELSE 15 - (rk % 16) END AS shard
      FROM r)
SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(w) AS BIGINT) AS total_tokens,
       min(w) AS min_tokens, max(w) AS max_tokens
FROM a GROUP BY shard ORDER BY shard"""

    # per-source unigram KL from the corpus: micro-nat integer logs
    # L(x) = round(ln(x)*1e6) of integer args, absent-token mass closed
    # form -- (n_g+V)*KL*1e6 stays an exact integer (kl_micro)
    sql["source_kl"] = r"""
WITH tok AS (SELECT source AS grp,
               unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS tok
             FROM documents),
gcnt AS (SELECT grp, tok, count(*) AS c FROM tok GROUP BY 1, 2),
ccnt AS (SELECT tok, count(*) AS cc FROM tok GROUP BY 1),
consts AS (SELECT count(*) AS v, sum(cc) AS n_corpus,
             sum(CAST(round(ln((cc + 1)::DOUBLE) * 1e6) AS BIGINT)) AS t_all
           FROM ccnt),
gtot AS (SELECT grp, sum(c) AS n_g, count(*) AS g_vocab
         FROM gcnt GROUP BY 1),
j AS (SELECT g.grp, g.c, c2.cc, t.n_g, t.g_vocab, k.v, k.n_corpus, k.t_all
      FROM gcnt g JOIN ccnt c2 USING (tok)
      JOIN gtot t ON g.grp = t.grp CROSS JOIN consts k),
pres AS (SELECT grp, n_g, g_vocab, v, n_corpus, t_all,
           sum((c + 1) * (CAST(round(ln((c + 1)::DOUBLE) * 1e6) AS BIGINT)
               - CAST(round(ln((n_g + v)::DOUBLE) * 1e6) AS BIGINT)
               - CAST(round(ln((cc + 1)::DOUBLE) * 1e6) AS BIGINT)
               + CAST(round(ln((n_corpus + v)::DOUBLE) * 1e6) AS BIGINT)))
             AS p,
           sum(CAST(round(ln((cc + 1)::DOUBLE) * 1e6) AS BIGINT))
             AS lc_present
         FROM j GROUP BY 1, 2, 3, 4, 5, 6),
fin AS (SELECT grp, n_g, g_vocab,
          p + (v - g_vocab)
              * (CAST(round(ln((n_corpus + v)::DOUBLE) * 1e6) AS BIGINT)
                 - CAST(round(ln((n_g + v)::DOUBLE) * 1e6) AS BIGINT))
            - (t_all - lc_present) AS kl_micro,
          v
        FROM pres)
SELECT grp AS source, CAST(n_g AS BIGINT) AS n_tokens,
       CAST(g_vocab AS BIGINT) AS vocab_overlap,
       CAST(kl_micro AS BIGINT) AS kl_micro,
       round(kl_micro::DOUBLE / 1e6 / (n_g + v), 6) AS kl
FROM fin ORDER BY source"""
    # T5 span corruption: same hash draw, running-max island merge,
    # sentinel pieces assembled with ORDER BY p string_agg
    sql["span_corrupt"] = rf"""
WITH t AS (SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                         x -> x <> '') AS toks
           FROM documents),
tk AS (SELECT doc_id, i - 1 AS p, toks[i] AS w
       FROM t, unnest(range(1, len(toks) + 1)) AS r(i)),
hh AS (SELECT doc_id, p, w,
         md5('corrupt:' || CAST(doc_id AS VARCHAR) || ':'
             || CAST(p AS VARCHAR)) AS hx
       FROM tk),
hv AS (SELECT doc_id, p, w, CAST((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 72057594037927936 + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 4503599627370496 + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 281474976710656 + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1) * 17592186044416 + (strpos('0123456789abcdef', substr(hx, 5, 1)) - 1) * 1099511627776 + (strpos('0123456789abcdef', substr(hx, 6, 1)) - 1) * 68719476736 + (strpos('0123456789abcdef', substr(hx, 7, 1)) - 1) * 4294967296 + (strpos('0123456789abcdef', substr(hx, 8, 1)) - 1) * 268435456 + (strpos('0123456789abcdef', substr(hx, 9, 1)) - 1) * 16777216 + (strpos('0123456789abcdef', substr(hx, 10, 1)) - 1) * 1048576 + (strpos('0123456789abcdef', substr(hx, 11, 1)) - 1) * 65536 + (strpos('0123456789abcdef', substr(hx, 12, 1)) - 1) * 4096 + (strpos('0123456789abcdef', substr(hx, 13, 1)) - 1) * 256 + (strpos('0123456789abcdef', substr(hx, 14, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(hx, 15, 1)) - 1) * 1 AS BIGINT) AS h FROM hh),
se AS (SELECT doc_id, p, w,
         CASE WHEN h % 100 < 5
              THEN p + (2 + (h // 100) % 3) - 1 END AS e
       FROM hv),
cu AS (SELECT doc_id, p, w,
         max(e) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS UNBOUNDED PRECEDING) AS cum,
         max(e) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pcum
       FROM se),
fl AS (SELECT doc_id, p, w,
         (cum IS NOT NULL AND cum >= p) AS masked,
         (cum IS NOT NULL AND cum >= p
          AND (pcum IS NULL OR pcum < p)) AS isl_start
       FROM cu),
il AS (SELECT doc_id, p, w, masked, isl_start,
         sum(CASE WHEN isl_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY p
                 ROWS UNBOUNDED PRECEDING) - 1 AS isl
       FROM fl),
pc AS (SELECT doc_id, p, masked, isl_start,
         CASE WHEN NOT masked THEN w
              WHEN isl_start
              THEN '<extra_id_' || CAST(isl AS VARCHAR) || '>' END AS cp,
         CASE WHEN masked THEN
           CASE WHEN isl_start
                THEN '<extra_id_' || CAST(isl AS VARCHAR) || '> ' || w
                ELSE w END END AS tp
       FROM il)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  CAST(sum(CASE WHEN isl_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_masked,
  coalesce(string_agg(cp, ' ' ORDER BY p) FILTER (cp IS NOT NULL), '')
    AS corrupted,
  coalesce(string_agg(tp, ' ' ORDER BY p) FILTER (tp IS NOT NULL), '')
    AS target
FROM pc GROUP BY doc_id ORDER BY doc_id"""
    return sql
