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

from rrdtool_1_x_spark.datapipe.mat import materialize


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


def split_leakage(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "split",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_len: int = 3,
    jaccard_threshold: float = 0.5,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Train/val/test leakage report: duplicate content that crosses the
    split boundary. A val/test item with a (near-)copy in train silently
    inflates every metric — this is the audit a split must pass before an
    eval number is trusted.

    Composes the deterministic ``hash_split`` assignment with TWO overlap
    detectors, reported at MEMBER level so no leaked document escapes:

    * exact copies: every document pairs with the smallest-id member of
      its md5 group in EACH OTHER split (jaccard = 1.0). A copy group
      {0:test, 1:test, 2:train} therefore reports (0,2) AND (1,2) — the
      member-member leak a representative-only pairing would miss.
    * near-duplicates: ``minhash_near_duplicates`` runs on collapsed
      representatives (its skew guard); each rep-level pair is expanded
      to the PER-SPLIT representatives of both md5 groups, so a
      train-side near-dup of any test-side copy yields a cross-split
      witness pair for every split combination the two groups span.

    Returns distinct cross-split pairs ``(id_a, split_a, id_b, split_b,
    jaccard)`` with ``id_a < id_b`` — at least one witness per
    (leaking document, foreign split) for exact copies, and per
    (group pair, split pair) for near-dups.

    Shape at scale: the split label is a scan-time hash expression; the
    exact side is one md5-keyed aggregate + a member-to-rep join
    (<= n_splits rows per member); the near side expands the (few)
    rep pairs by at most n_splits^2; the final label attach keys against
    the slim (id, split) projection.
    """
    from rrdtool_1_x_spark.datapipe.dedup import minhash_near_duplicates
    from rrdtool_1_x_spark.datapipe.sampling import hash_split

    labeled = hash_split(
        df.select(id_col, text_col), weights, id_col=id_col, seed=seed
    ).withColumn("_h", F.md5(F.col(text_col).cast("binary")))
    # the SLIM (id, split, text-hash) projection feeds six consumers
    # below (srep, both exact sides, both group maps, the label attach);
    # materialize it once — ids and hashes only, never the text, so the
    # checkpoint stays corpus-slim at scale. The near-dup detector gets
    # the lazy text-bearing frame and materializes its own internals.
    slim = labeled.select(id_col, "split", "_h").transform(materialize)
    # per-(group, split) representative: the witness anchor
    srep = slim.groupBy("_h", "split").agg(
        F.min(id_col).alias("_rid")
    )
    # exact: every member x every OTHER split's representative of its group
    exact = (
        slim
        .join(srep.withColumnRenamed("split", "_osplit"), "_h")
        .filter(F.col("split") != F.col("_osplit"))
        .select(
            F.least(F.col(id_col), F.col("_rid")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("_rid")).alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
        .distinct()
    )
    near_rep = minhash_near_duplicates(
        labeled,
        id_col,
        text_col,
        num_hashes,
        bands,
        shingle_len,
        jaccard_threshold,
        max_bucket_size,
    ).select("id_a", "id_b", F.col("jaccard"))
    # expand each rep-level near pair to both groups' per-split reps
    gmap = slim.select(F.col(id_col).alias("_gid"), F.col("_h"))
    near = (
        near_rep.join(
            gmap.withColumnRenamed("_h", "_ha"),
            near_rep["id_a"] == F.col("_gid"),
        )
        .drop("_gid")
        .join(
            gmap.withColumnRenamed("_h", "_hb"),
            near_rep["id_b"] == F.col("_gid"),
        )
        .drop("_gid")
        .join(
            srep.select(
                F.col("_h").alias("_ha"),
                F.col("split").alias("_sa"),
                F.col("_rid").alias("_ra"),
            ),
            "_ha",
        )
        .join(
            srep.select(
                F.col("_h").alias("_hb"),
                F.col("split").alias("_sb"),
                F.col("_rid").alias("_rb"),
            ),
            "_hb",
        )
        .filter(F.col("_sa") != F.col("_sb"))
        .select(
            F.least(F.col("_ra"), F.col("_rb")).alias("id_a"),
            F.greatest(F.col("_ra"), F.col("_rb")).alias("id_b"),
            "jaccard",
        )
        .distinct()
    )
    lab = slim.select(id_col, "split")
    return (
        exact.unionByName(near)
        .join(
            lab.select(
                F.col(id_col).alias("id_a"), F.col("split").alias("split_a")
            ),
            "id_a",
        )
        .join(
            lab.select(
                F.col(id_col).alias("id_b"), F.col("split").alias("split_b")
            ),
            "id_b",
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("id_a", "split_a", "id_b", "split_b", "jaccard")
    )


def bloom_contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap_frac: float = 0.5,
    m_bits: int = 1 << 16,
    k: int = 4,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """``contamination_pairs`` with a Bloom prefilter — the two-phase
    shape exact decontamination needs when the benchmark n-gram table is
    too large to broadcast-JOIN against every corpus n-gram: phase 1
    probes each corpus n-gram against the broadcast BITSET (map-only, a
    few bit ops — m/8 bytes instead of the string table); phase 2 joins
    only the surviving n-grams against the real benchmark table to remove
    Bloom false positives.

    A Bloom filter has NO false negatives, so the output is IDENTICAL to
    ``contamination_pairs`` — the same oracle verifies both paths; only
    the plan changes.
    """
    from rrdtool_1_x_spark.datapipe.sketch import bloom_bits, bloom_probe

    dg = _ngram_frame(docs, doc_id_col, doc_text_col, n, "doc_id")
    bg = _ngram_frame(benchmark, bench_id_col, bench_text_col, n, "bench_id")
    bits = bloom_bits(
        bg.select("ngram").distinct(), F.col("ngram"), m_bits, k
    )
    surv = dg.filter(bloom_probe("ngram", bits, m_bits, k))
    bsz = bg.groupBy("bench_id").agg(F.count("*").alias("bench_ngrams"))
    # phase 2: NO broadcast of bg — the whole point of the Bloom phase is
    # that the benchmark n-gram table is too large for one; the survivors
    # are Bloom-thinned, so AQE picks a (possibly still-shuffled, but
    # survivor-sized) join here
    overlap = (
        surv.join(bg, "ngram")
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
        .select(
            "doc_id", "bench_id", "overlap_ngrams", "bench_ngrams",
            "overlap_frac",
        )
    )


def minhash_contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_len: int = 3,
    est_threshold: float = 0.5,
    max_bucket_size: int | None = 512,
    unpersist_handle: list | None = None,
) -> DataFrame:
    """FUZZY decontamination: MinHash-estimated Jaccard between training
    documents and benchmark items — the scalable companion to the exact
    n-gram rule of ``contamination_pairs``. Exact overlap misses the
    paraphrased/truncated/reformatted eval copy (the Llama/Dolma reports
    both run a fuzzy pass for exactly this); the MinHash estimate
    ``matching signature components / num_hashes`` is an unbiased Jaccard
    estimator that needs only the two signature frames, never a shingle
    intersection.

    Returns (doc_id, bench_id, matches, est_jaccard) for candidate pairs
    with estimate >= ``est_threshold``; candidates come from LSH band
    buckets shared ACROSS the two frames, so the corpus pairs only
    against benchmark items it plausibly overlaps.

    Shape at scale: signatures are map-only per side (array_min folds
    inside the scan); banding explodes ``bands`` rows per document; the
    candidate join keys on (band, bucket) where the benchmark side is
    eval-sized — broadcastable — and the hot-bucket cap (counted over the
    UNION of both sides, same 512 rule as the dedup tier) bounds any
    boilerplate bucket before the join. The estimate then joins the two
    signature frames on the candidate pairs only — pair-count-sized, not
    corpus-sized. Run ``exact_dedup`` first if the corpus carries exact
    copies (same representative rule as the near-dup tier).
    """
    from pyspark import StorageLevel

    from .dedup import minhash_signatures

    rows_per_band = num_hashes // bands
    # persist the CORPUS signature frame: it feeds the band explode, the
    # bucket-cap count and the estimate join, and Spark re-runs the whole
    # shingle+md5 lineage per consumer otherwise (measured 7.7 s -> one
    # pass at sf0.1; at 100 TB the sig frame is ~100x slimmer than the
    # text it summarizes). Callers pass unpersist_handle=[] to reclaim.
    ds = minhash_signatures(
        docs, doc_id_col, doc_text_col, num_hashes, shingle_len
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if unpersist_handle is not None:
        unpersist_handle.append(ds)
    # the benchmark signature frame is eval-sized (small by doctrine) and
    # feeds the cap count, the semi join and the estimate join; it is
    # ALSO referenced as explode siblings in _bands below, and generator
    # siblings re-evaluate per generated row — materialize it once so the
    # sibling references read stored columns instead of re-running the
    # interpreted signature chain x bands (measured 1.3 s/pass at sf0.1)
    bs = minhash_signatures(
        benchmark, bench_id_col, bench_text_col, num_hashes, shingle_len
    ).localCheckpoint(eager=True)

    def _bands(sigs: DataFrame, id_col: str, tag: str) -> DataFrame:
        # the band rows CARRY the signature vector (tagged columns), so
        # the estimate below needs no join back to either signature
        # frame — two joins (and a benchmark-side recompute) fewer for
        # ~bands x num_hashes extra hex columns per shuffled row; the
        # slim (band, bucket) projections still feed the cap count
        structs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band_idx"),
                    F.md5(
                        F.concat_ws(
                            "|",
                            *[
                                F.col(f"sig{b * rows_per_band + r}")
                                for r in range(rows_per_band)
                            ],
                        ).cast("binary")
                    ).alias("bucket"),
                )
                for b in range(bands)
            ]
        )
        sig_aliases = [
            F.col(f"sig{i}").alias(f"_{tag}{i}") for i in range(num_hashes)
        ]
        return (
            sigs.select(F.col(id_col), structs.alias("_ba"), *sig_aliases)
            .select(
                id_col,
                F.explode("_ba").alias("_bb"),
                *[f"_{tag}{i}" for i in range(num_hashes)],
            )
            .select(
                id_col,
                "_bb.band_idx",
                "_bb.bucket",
                *[f"_{tag}{i}" for i in range(num_hashes)],
            )
        )

    db = _bands(ds, doc_id_col, "d")
    bb = _bands(bs, bench_id_col, "b")
    if max_bucket_size is not None:
        keep = (
            db.select("band_idx", "bucket")
            .unionAll(bb.select("band_idx", "bucket"))
            .groupBy("band_idx", "bucket")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("band_idx", "bucket")
        )
        db = db.join(keep, ["band_idx", "bucket"], "left_semi")
        bb = bb.join(keep, ["band_idx", "bucket"], "left_semi")
    matches = sum(
        F.when(F.col(f"_d{i}") == F.col(f"_b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (
        db.join(F.broadcast(bb), ["band_idx", "bucket"])
        .select(
            doc_id_col,
            bench_id_col,
            matches.cast("long").alias("matches"),
        )
        .distinct()
    )
    return est.filter(
        F.col("matches") >= F.lit(est_threshold) * num_hashes
    ).select(
        doc_id_col,
        bench_id_col,
        "matches",
        F.round(F.col("matches").cast("double") / num_hashes, 6).alias(
            "est_jaccard"
        ),
    )


def remove_contaminated_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    doc_id_col: str = "doc_id",
    doc_text_col: str = "text",
    bench_text_col: str = "text",
) -> DataFrame:
    """Span-level decontamination — the surgical counterpart of
    ``decontaminate``'s whole-document drop: every n-token window of a
    training document that appears VERBATIM in the benchmark is excised
    (coverage union over overlapping windows, the Lee-et-al. span-removal
    mechanics applied to eval overlap instead of corpus duplication).
    Dropping a 10k-token page because one paragraph quotes a benchmark
    question wastes the other 9.9k tokens; masking just the quoted span
    keeps them while removing the leakage verbatim.

    Returns ``(id, n_tokens, removed_tokens, text)`` with the cleaned
    text — same contract as ``remove_duplicate_spans``.

    Shape at scale: window hashing is map-only; the benchmark window-hash
    set is eval-sized and broadcasts, so contamination detection is a
    map-side semi join over the corpus scan (no corpus shuffle at all
    until the per-document coverage aggregation, which is keyed by the
    document and bounded by document length).
    """
    from .dedup import _shingle_array, _tokens

    toks = _tokens(F.col(doc_text_col))
    hasher = lambda s: F.md5(s.cast("binary"))  # noqa: E731
    base = docs.select(
        F.col(doc_id_col),
        toks.alias("_t"),
        F.transform(
            _shingle_array(F.col(doc_text_col), n), hasher
        ).alias("_w"),
    )
    bg = (
        benchmark.select(
            F.explode(
                F.array_distinct(
                    F.transform(
                        _shingle_array(F.col(bench_text_col), n), hasher
                    )
                )
            ).alias("_h")
        )
        .distinct()
    )
    occ = base.select(
        F.col(doc_id_col), F.posexplode("_w").alias("_p0", "_h")
    ).select(doc_id_col, (F.col("_p0") + 1).alias("_p"), "_h")
    removable = occ.join(F.broadcast(bg), "_h", "left_semi").select(
        doc_id_col, "_p"
    )
    # coverage union: aggregate window START positions per document, then
    # expand to covered token positions inside the array — the doc-keyed
    # shuffle carries one row per contaminated window instead of n (same
    # rewrite as remove_duplicate_spans)
    cover = (
        removable.groupBy(doc_id_col)
        .agg(F.collect_set("_p").alias("_ps"))
        .select(
            F.col(doc_id_col),
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "_ps", lambda p: F.sequence(p, p + F.lit(n - 1))
                    )
                )
            ).alias("_rm"),
        )
    )
    joined = base.join(cover, doc_id_col, "left").select(
        F.col(doc_id_col),
        "_t",
        F.coalesce(F.col("_rm"), F.array().cast("array<int>")).alias("_rm"),
    )
    # kept positions via array_except (hash-set difference, O(L + |rm|)
    # per document, order-preserving; out-of-range positions of a short
    # document's partial window drop out naturally) — replaces the
    # O(L * |rm|) per-token array_contains scan
    kept_pos = F.array_except(F.sequence(F.lit(1), F.size("_t")), F.col("_rm"))
    pre = joined.select(F.col(doc_id_col), "_t", kept_pos.alias("_kp"))
    return pre.select(
        F.col(doc_id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size("_kp")).cast("long").alias("removed_tokens"),
        F.array_join(
            F.transform("_kp", lambda p: F.element_at(F.col("_t"), p)), " "
        ).alias(doc_text_col),
    )


def canary_scan(
    df: DataFrame,
    canaries: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark canary detection — the exact-substring screen for
    planted eval-set markers (the BIG-bench "canary GUID" convention:
    eval suites embed a unique string; any training document containing
    it is contaminated by construction, no fuzzy matching needed).
    Returns one row per (document, canary) HIT:
    ``(id, canary, n_hits)`` with the exact occurrence count
    (substring count, case-sensitive — canaries are opaque tokens).

    Shape at scale: the canary list is a literal array in the plan
    (broadcast by construction, eval suites have dozens of canaries,
    not millions); one corpus scan, occurrence counting via the
    length-difference identity (no regex compilation, no explode of
    text); map-only until the final determinism sort. For canary lists
    too large for a literal array, join against a broadcast frame —
    same one-scan shape."""
    if not canaries:
        raise ValueError("canary_scan needs at least one canary string")
    if any(not c for c in canaries):
        raise ValueError("empty canary string")
    # ONE corpus scan: explode the literal canary array per row (k-way
    # map-side amplification, never k scans), count via length identity
    text = F.col(text_col)
    exploded = df.select(
        F.col(id_col),
        text.alias("_t"),
        F.explode(F.array(*[F.lit(c) for c in canaries])).alias("canary"),
    )
    hits = (
        (
            F.length(F.col("_t"))
            - F.length(F.replace(F.col("_t"), F.col("canary"), F.lit("")))
        )
        / F.length(F.col("canary"))
    ).cast("long")
    return (
        exploded.select(F.col(id_col), "canary", hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )
