"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the point of these over naive pairwise comparison):

* exact: hash-groupBy — one shuffle on a 128-bit digest, no pairwise work.
* MinHash+LSH: per-doc signatures (embarrassingly parallel) → band buckets
  → candidate pairs only within buckets (the quadratic blowup is confined
  to hash collisions) → exact Jaccard verification on the candidates.
* SimHash: 64-bit fingerprint per doc; near-dups share fingerprints at
  small Hamming distance; bucket by rotated prefixes for banding.
* n-gram Jaccard: exact verification primitive; only ever run on candidate
  pairs, never the full cross product.

All hashing is md5-based (deterministic, portable across engines) and runs
in whole-stage codegen after an explode — lambda-heavy higher-order
functions stay off the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.mat import materialize


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def _shingle_array(text: Column, shingle_len: int) -> Column:
    """array<string> of token shingles, built per document with array ops.

    Map-only by construction — the posexplode+lead(window) formulation this
    replaced shuffled and sorted every token row TWICE (window + groupBy)
    before a single byte of real work; the per-document transform keeps
    shingling inside the scan task. Documents shorter than the shingle
    length keep one partial shingle, matching the old filter.

    The token split is evaluated a CONSTANT number of times per document:
    the k shifted copies are arguments of arrays_zip (each evaluated once),
    never expressions inside the lambda body — an interpreted HOF re-runs
    its lambda per element, so a ``slice(split(text), i, k)`` body would
    re-split the document once per shingle (O(tokens²); measured 4x slower
    at sf0.1, and growing with document length)."""
    k = shingle_len
    toks = _tokens(text)
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}") for i in range(k)]
    )
    full = F.transform(
        F.slice(zipped, 1, F.size(toks) - (k - 1)),
        lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(k)]),
    )
    return F.when(F.size(toks) >= k, full).otherwise(
        F.array(F.concat_ws(" ", toks))
    )


def _shingle_frame(
    df: DataFrame, id_col: str, text_col: str, shingle_len: int
) -> DataFrame:
    """(id, shingle) rows, distinct per document — per-doc shingle array,
    map-side array_distinct, then one explode.

    The array is projected in its own step first: expressions placed next
    to a generator are re-evaluated per generated row, so an inline
    transform would re-shingle each document once per shingle (O(n²)).
    Per-document uniqueness comes from array_distinct INSIDE the scan
    task; rows are already unique across documents (the id is part of the
    row), so no .distinct() — which would shuffle every exploded shingle
    of the corpus — is ever needed downstream."""
    pre = df.select(
        F.col(id_col).alias("_id"),
        _shingle_array(F.col(text_col), shingle_len).alias("_sh"),
    )
    return pre.select("_id", F.explode(F.array_distinct("_sh")).alias("_s"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: (text_hash, keeper, copies, ids)."""
    return (
        df.select(F.md5(F.col(text_col).cast("binary")).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("copies"),
            F.sort_array(F.collect_list(id_col)).alias("ids"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_len: int = 3,
) -> DataFrame:
    """(id, sig0..sigN) MinHash signatures over token shingles.

    Entirely map-side: the per-seed minimum folds over the document's own
    shingle array (array_min over a transform), so there is NO shuffle —
    signatures come straight off the scan. The previous explode→groupBy
    shape shuffled every shingle row to re-group what was already grouped."""
    pre = df.select(
        F.col(id_col), _shingle_array(F.col(text_col), shingle_len).alias("_sh")
    )
    # NOTE: the hash lambda MUST take exactly one parameter. A defaulted
    # second param (`lambda s, i=i: ...`) makes PySpark pass the
    # (element, index) form, silently replacing the seed with the shingle's
    # array position — every sig column collapses to the same hash function.
    def _seed_hash(seed):
        return lambda s: F.md5(F.concat(F.lit(f"mh{seed}:"), s).cast("binary"))

    sigs = [
        F.array_min(F.transform(F.col("_sh"), _seed_hash(i))).alias(f"sig{i}")
        for i in range(num_hashes)
    ]
    return pre.select(id_col, *sigs)


def _spread(df: DataFrame) -> DataFrame:
    """Re-spread a MATERIALIZED (checkpointed) frame whose small byte
    size let AQE coalesce it below the session's parallelism. The frames
    this guards feed interpreted-HOF hash projections (minhash/shingle
    md5 chains) whose cost is per-ROW CPU, not bytes — AQE's byte-based
    coalescing otherwise computes a 10 MB batch's 16 md5 minhashes on
    ONE core (measured 18.7 s -> 1.5 s for a 5k-doc batch at sf0.1 on
    local[32]). No-op when the frame already has enough partitions, so
    a corpus-sized input is never collapsed DOWN to the core count.

    The spread frame is MATERIALIZED (it is batch/representative-sized
    by contract — never the raw corpus): a bare ``repartition`` does not
    work because Catalyst pushes the consumer's projection below the
    round-robin exchange, so the expensive expressions still evaluate on
    the pre-spread partitions (measured 14.6 s lazy vs 1.5 s
    materialized). Only call on materialized frames: getNumPartitions on
    a lazy AQE plan would force planning early."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p).transform(materialize)


def _collapse_exact_reps(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """One representative (smallest id) per exact text — the shared
    pre-LSH skew guard: identical texts have identical signatures, so a
    10k-copy document would alone put k^2/2 candidate rows on one
    shuffle key. Every banding/audit entry point collapses through THIS
    helper so the rule (md5 text group, min id) cannot drift.

    groupBy + min(struct(id, text)), NOT a row_number window: ids are
    unique so min(struct) picks exactly the window's rank-1 row, but the
    aggregate gets map-side partial aggregation (one candidate row per
    key per map task crosses the shuffle instead of every copy of a
    viral document) and hot keys cannot pin a whole task the way a
    window partition does (guide §2.5 — windows get no AQE skew
    handling)."""
    return (
        df.select(id_col, text_col)
        .groupBy(F.md5(F.col(text_col).cast("binary")).alias("_ch"))
        .agg(F.min(F.struct(F.col(id_col), F.col(text_col))).alias("_f"))
        .select(
            F.col(f"_f.{id_col}").alias(id_col),
            F.col(f"_f.{text_col}").alias(text_col),
        )
    )


def minhash_band_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    collapse_exact: bool = True,
) -> DataFrame:
    """(id, band_idx, bucket_hash) long-format LSH band assignments.

    The shared candidate-generation input of minhash_near_duplicates; also
    the audit surface for the hot-bucket cap — e.g.
    ``minhash_band_buckets(df).groupBy("band_idx", "bucket").count()``
    filtered above the cap shows exactly which buckets (and how many docs)
    a capped run drops."""
    base = df
    if collapse_exact:
        # see _collapse_exact_reps — the shared pre-LSH skew guard
        base = _collapse_exact_reps(df, id_col, text_col)
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(base, id_col, text_col, num_hashes, shingle_len)
    band_structs = F.array(
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
    # pre-project the array before exploding (generator siblings re-evaluate
    # per generated row)
    return (
        sigs.select(id_col, band_structs.alias("_ba"))
        .select(id_col, F.explode("_ba").alias("_bb"))
        .select(id_col, F.col("_bb.band_idx").alias("band_idx"), F.col("_bb.bucket").alias("bucket"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int | None = 512,
    collapse_exact: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded LSH + exact Jaccard verification.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard >= threshold.
    The pairwise work happens only inside LSH buckets; with b bands of r
    rows the collision probability is 1-(1-j^r)^b (standard MinHash-LSH).

    Skew guards (what keeps this alive on a 100 TB corpus):
    * ``collapse_exact``: exact duplicates are collapsed to one
      representative before signatures — identical texts pairwise-match
      trivially and belong to exact_dedup, not the LSH join. Pairs among
      exact copies are therefore NOT emitted here.
    * ``max_bucket_size``: buckets larger than this are dropped from
      candidate generation (a k-doc bucket emits k²/2 candidate rows on one
      shuffle key). Oversized buckets are boilerplate collisions where the
      band carries no signal; audit what a cap drops via
      minhash_band_buckets(). ``None`` disables the cap.
    """
    base = df
    if collapse_exact:
        base = _collapse_exact_reps(df, id_col, text_col)
    melted = minhash_band_buckets(
        base, id_col, text_col, num_hashes, bands, shingle_len, collapse_exact=False
    ).transform(materialize)  # feeds size count + both join sides
    if max_bucket_size is not None:
        # bucket sizes via groupBy + semi join against the checkpointed
        # frame, NOT a per-bucket count window: the window pinned every row
        # of a hot boilerplate bucket to one task (the very buckets the
        # cap exists to drop), and the aggregate gets map-side partial
        # aggregation + an AQE-splittable/broadcastable join
        small = (
            melted.groupBy("band_idx", "bucket")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_bucket_size)
            .select("band_idx", "bucket")
        )
        melted = melted.join(small, ["band_idx", "bucket"], "left_semi")
    left = melted.select(F.col(id_col).alias("id_a"), "band_idx", "bucket")
    right = melted.select(F.col(id_col).alias("id_b"), "band_idx", "bucket")
    pairs = (
        left.join(right, ["band_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    verified = ngram_jaccard_pairs(
        pairs, base, id_col=id_col, text_col=text_col, shingle_len=shingle_len
    )
    return verified.filter(F.col("jaccard") >= jaccard_threshold)


def write_band_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
) -> None:
    """Persist the LSH state for append-only near-dup maintenance.

    Layout: ``{path}/docs`` (exact-collapsed representative texts),
    ``{path}/reps`` (text_hash → rep id, the exact-dup registry),
    ``{path}/bands`` (id, band_idx, bucket). ``append_band_index`` then
    shingles ONLY new documents — the point of the index: an append to a
    100 TB corpus costs the new batch's signatures plus a bucket join, not
    a corpus rescan. Appends are plain parquet appends here; production
    writes go through a transactional commit (see sources.store's
    manifest-snapshot pattern).
    """
    hashed = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.md5(F.col(text_col).cast("binary")).alias("text_hash"),
    )
    # min(struct) keep-smallest-id, not a row_number window — same rule,
    # map-side combinable and skew-safe (see _collapse_exact_reps)
    reps = (
        hashed.groupBy("text_hash")
        .agg(F.min(F.struct(F.col(id_col), F.col(text_col))).alias("_f"))
        .select(
            F.col(f"_f.{id_col}").alias(id_col),
            F.col(f"_f.{text_col}").alias(text_col),
            "text_hash",
        )
    )
    reps.select(id_col, text_col).write.mode("overwrite").parquet(f"{path}/docs")
    reps.select("text_hash", F.col(id_col).alias("rep_id")).write.mode(
        "overwrite"
    ).parquet(f"{path}/reps")
    minhash_band_buckets(
        reps, id_col, text_col, num_hashes, bands, shingle_len, collapse_exact=False
    ).write.mode("overwrite").parquet(f"{path}/bands")


def append_band_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int | None = 512,
    precollapsed_fresh: bool = False,
) -> DataFrame:
    """Append a batch to a ``write_band_index`` index and return the new
    verified near-dup pairs (new↔old and new↔new; id_a < id_b).

    Only the batch is shingled/signed; exact copies of already-indexed
    texts are dropped against the hash registry (exact_dedup's job, same
    rule as the batch pipeline's collapse). With append-only increasing
    ids this composes exactly: batch-pipeline pairs over the full corpus
    == initial pairs ∪ every append's pairs (tested). The bucket cap is
    evaluated on post-append bucket sizes, so a bucket that crosses the
    cap stops generating NEW candidates; pairs it produced earlier stand
    (no retraction — matching the cap's drop-and-log semantics).

    ``precollapsed_fresh``: the caller asserts ``new_docs`` is ALREADY
    exact-collapsed (one min-id representative per distinct text),
    anti-joined against the index's hash registry, materialized, and
    carries a ``text_hash`` column — the streaming curation sink does
    all of that itself, and without the flag this function repeated the
    collapse window, the registry read and an extra checkpoint per
    micro-batch for no change in result.
    """
    spark = new_docs.sparkSession
    if precollapsed_fresh:
        fresh = new_docs.select(id_col, text_col, "text_hash")
    else:
        hashed = new_docs.select(
            F.col(id_col),
            F.col(text_col),
            F.md5(F.col(text_col).cast("binary")).alias("text_hash"),
        )
        # min(struct) keep-smallest-id, not a row_number window — same
        # rule, map-side combinable and skew-safe (_collapse_exact_reps)
        batch_reps = (
            hashed.groupBy("text_hash")
            .agg(F.min(F.struct(F.col(id_col), F.col(text_col))).alias("_f"))
            .select(
                F.col(f"_f.{id_col}").alias(id_col),
                F.col(f"_f.{text_col}").alias(text_col),
                "text_hash",
            )
        )
        fresh = batch_reps.join(
            spark.read.parquet(f"{path}/reps"), "text_hash", "left_anti"
        ).localCheckpoint(eager=True)
    # _spread: AQE coalesces the small-bytes batch to ~1 partition and the
    # interpreted minhash/shingle projections below are per-row CPU —
    # without this the signature pass runs on one core (guide §2.5)
    fresh = _spread(fresh)
    new_bands = minhash_band_buckets(
        fresh, id_col, text_col, num_hashes, bands, shingle_len, collapse_exact=False
    ).localCheckpoint(eager=True)  # feeds the join AND the index append
    old_bands = spark.read.parquet(f"{path}/bands")
    all_bands = old_bands.unionByName(new_bands)
    if max_bucket_size is not None:
        keep = (
            all_bands.groupBy("band_idx", "bucket")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("band_idx", "bucket")
        )
        new_side = new_bands.join(keep, ["band_idx", "bucket"], "left_semi")
        all_side = all_bands.join(keep, ["band_idx", "bucket"], "left_semi")
    else:
        new_side, all_side = new_bands, all_bands
    j = new_side.select(F.col(id_col).alias("_x"), "band_idx", "bucket").join(
        all_side.select(F.col(id_col).alias("_y"), "band_idx", "bucket"),
        ["band_idx", "bucket"],
    )
    pairs = (
        j.filter(F.col("_x") != F.col("_y"))
        .select(
            F.least("_x", "_y").alias("id_a"), F.greatest("_x", "_y").alias("id_b")
        )
        .distinct()
    )
    # verification shingles only the documents that appear in a candidate
    # pair: semi-join the (old reps ∪ batch) texts down before exploding
    all_docs = (
        spark.read.parquet(f"{path}/docs")
        .unionByName(fresh.select(id_col, text_col))
    )
    ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    needed = all_docs.join(ids, id_col, "left_semi")
    out = (
        ngram_jaccard_pairs(pairs, needed, id_col=id_col, text_col=text_col, shingle_len=shingle_len)
        .filter(F.col("jaccard") >= jaccard_threshold)
        # materialize BEFORE the index appends: the plan reads {path}/bands
        # and {path}/docs, and a lazy re-evaluation after the appends would
        # see the new files
        .localCheckpoint(eager=True)
    )
    new_bands.write.mode("append").parquet(f"{path}/bands")
    fresh.select("text_hash", F.col(id_col).alias("rep_id")).write.mode(
        "append"
    ).parquet(f"{path}/reps")
    fresh.select(id_col, text_col).write.mode("append").parquet(f"{path}/docs")
    return out


def ngram_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate (id_a, id_b) pairs.

    Set algebra on exploded shingles: |A∩B| counted by joining each pair's
    distinct shingles, |A∪B| = |A|+|B|-|A∩B|. No arrays are collected."""
    sh = _shingle_frame(docs, id_col, text_col, shingle_len)
    # Pair-centric plan (candidate-rerank contract: pairs ≪ corpus):
    # explode each pair into its two member docs and broadcast that tiny
    # frame INTO the corpus shingle scan — ONE map-side join replaces the
    # two corpus-wide shuffle joins plus the sizes aggregation. A shingle
    # seen by both members (count==2 per pair; shingles are distinct per
    # doc) is intersection; total row count per pair is |A|+|B|.
    pe = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("_id")
    )
    j = sh.join(F.broadcast(pe), "_id")
    per_s = j.groupBy("id_a", "id_b", "_s").agg(F.count("*").alias("_c"))
    out = per_s.groupBy("id_a", "id_b").agg(
        F.sum(F.when(F.col("_c") == 2, F.lit(1)).otherwise(F.lit(0))).alias("_i"),
        F.sum("_c").alias("_ab"),
    )
    jac = F.col("_i") / (F.col("_ab") - F.col("_i"))
    return out.select("id_a", "id_b", jac.alias("jaccard"))


def shingle_weight_frame(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """(_id, _s, _w) distinct shingles with idf-quantized integer weights
    w(s) = floor(scale / df(s)) — the shared corpus-wide input of
    weighted_jaccard_pairs, worth materializing once when several pair
    batches score against the same corpus."""
    sh = _shingle_frame(docs, id_col, text_col, shingle_len)
    dfreq = sh.groupBy("_s").agg(F.count("*").alias("_df"))
    return sh.join(dfreq, "_s").select(
        "_id",
        "_s",
        F.floor(F.lit(float(weight_scale)) / F.col("_df")).alias("_w"),
    )


def weighted_jaccard_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_len: int = 3,
    weight_scale: int = 1_000_000,
    shingle_weights: DataFrame | None = None,
) -> DataFrame:
    """Document-frequency-weighted Jaccard for candidate (id_a, id_b) pairs.

    Rare shingles carry more near-dup evidence than boilerplate; each
    shingle weighs w(s) = floor(scale / df(s)) where df is the number of
    corpus documents containing it (quantized inverse document frequency —
    INTEGER weights keep the sums associative, hence identical across
    partitionings and engines). J_w(A,B) = Σ_{s∈A∩B} w / Σ_{s∈A∪B} w,
    union weight computed as Sa + Sb − I like the unweighted verifier.

    Same shuffle shape as ngram_jaccard_pairs (explode → two bucket joins →
    pair aggregation); the df table adds one extra aggregation over the
    exploded shingles, amortized across all pairs.
    """
    w = (
        shingle_weights
        if shingle_weights is not None
        else shingle_weight_frame(docs, id_col, text_col, shingle_len, weight_scale)
    )
    # Pair-centric plan (candidate-rerank contract: pairs ≪ corpus), same
    # shape as ngram_jaccard_pairs: ONE map-side broadcast join of the
    # exploded pair-membership frame into the weight scan replaces the two
    # corpus-wide shuffle joins plus the totals aggregation. w(s) depends
    # only on the shingle, so intersection weight = Σ w over shingles both
    # members carry (_c==2), and Sa + Sb = Σ w over all matched rows —
    # integer sums, associative across any partitioning.
    pe = pairs.select(
        "id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("_id")
    )
    j = w.join(F.broadcast(pe), "_id")
    per_s = j.groupBy("id_a", "id_b", "_s").agg(
        F.count("*").alias("_c"), F.max("_w").alias("_w")
    )
    out = per_s.groupBy("id_a", "id_b").agg(
        F.sum(F.when(F.col("_c") == 2, F.col("_w")).otherwise(F.lit(0))).alias("_iw"),
        F.sum(F.col("_w") * F.col("_c")).alias("_ab"),
    )
    wj = F.col("_iw").cast("double") / (F.col("_ab") - F.col("_iw"))
    return out.select("id_a", "id_b", wj.alias("wjaccard"))


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash fingerprints: (id, simhash long).

    Per token: a 64-bit hash; each bit votes ±1; the fingerprint takes the
    majority sign per bit. Near-duplicate texts differ in few bits (compare
    via bit_count(a XOR b)).

    ``hash_fn``: "xxhash64" (fast, JVM-specific) or "md5" (portable across
    engines — the token hash is the first 64 bits of md5, extracted
    nibble-wise from the hex digest, so any engine with md5 + integer bit
    ops reproduces the fingerprint exactly). Both stay in whole-stage
    codegen; md5 costs one extra hash per token."""
    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(_tokens(F.col(text_col))).alias("_tok")
    )
    if hash_fn == "md5":
        # nibble j = value of hex digit j of md5(token); bit i of the token
        # hash = (nibble[i//4] >> (i%4)) & 1 — mirrored 1:1 in the oracle SQL
        nibbles = [
            F.conv(F.substring(F.md5(F.col("_tok").cast("binary")), j + 1, 1), 16, 10)
            .cast("int")
            .alias(f"_n{j}")
            for j in range(bits // 4)
        ]
        h = toks.select("_id", *nibbles)
        votes = [
            F.sum(
                F.when(
                    F.shiftright(F.col(f"_n{i // 4}"), i % 4).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    else:
        h = toks.select("_id", F.xxhash64("_tok").alias("_h"))
        votes = [
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(bits)
        ]
    agg = h.groupBy("_id").agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return agg.select(F.col("_id").alias(id_col), fp.alias("simhash"))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two simhash fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 64,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Near-duplicate pairs by SimHash: (id_a, id_b, hamming) with
    id_a < id_b and hamming <= max_hamming.

    Pigeonhole blocking makes this bucketed, not all-pairs: fingerprints
    differing in <= max_hamming bits agree on at least one of ``blocks``
    equal-width bit blocks whenever max_hamming < blocks, so candidates
    are documents sharing (block_idx, block_value) and verification is one
    bit_count per candidate pair. Same skew guard as the MinHash path: a
    hot block value (all-zero fingerprints from empty texts, boilerplate)
    is dropped above ``max_bucket_size`` instead of exploding k²/2 on one
    shuffle key.
    """
    fp = simhash(df, id_col, text_col, bits=bits, hash_fn=hash_fn)
    return signature_near_duplicates(
        fp, id_col=id_col, sig_col="simhash", max_hamming=max_hamming,
        blocks=blocks, bits=bits, max_bucket_size=max_bucket_size,
    )


def signature_near_duplicates(
    fp: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 64,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Pigeonhole-banded near-dup pairing over ANY precomputed 64-bit
    signature column (SimHash, image average-hash, ...): the generic core
    simhash_near_duplicates delegates to. Same plan, same skew cap."""
    if max_hamming >= blocks:
        raise ValueError("pigeonhole blocking needs max_hamming < blocks")
    width = bits // blocks
    mask = (1 << width) - 1
    if sig_col != "simhash":
        fp = fp.select(F.col(id_col), F.col(sig_col).alias("simhash"))
    block_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("block_idx"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("block_val"),
            )
            for b in range(blocks)
        ]
    )
    melted = (
        fp.select(id_col, "simhash", block_structs.alias("_ba"))
        .select(id_col, "simhash", F.explode("_ba").alias("_bb"))
        .select(
            id_col,
            "simhash",
            F.col("_bb.block_idx").alias("block_idx"),
            F.col("_bb.block_val").alias("block_val"),
        )
        .transform(materialize)  # feeds the size count and both sides
    )
    if max_bucket_size is not None:
        # block sizes via groupBy + semi join, NOT a count window: the
        # window materialized every row of a hot block in one task BEFORE
        # the cap filter could drop it — the very blocks the cap exists
        # for. The aggregate gets map-side partial aggregation and the
        # semi join AQE skew splitting (guide §2.5).
        small = (
            melted.groupBy("block_idx", "block_val")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_bucket_size)
            .select("block_idx", "block_val")
        )
        melted = melted.join(small, ["block_idx", "block_val"], "left_semi")
    left = melted.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_fa"), "block_idx", "block_val"
    )
    right = melted.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_fb"), "block_idx", "block_val"
    )
    return (
        left.join(right, ["block_idx", "block_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            simhash_hamming(F.col("_fa"), F.col("_fb")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def write_simhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocks: int = 4,
    bits: int = 64,
    hash_fn: str = "md5",
) -> None:
    """Persist SimHash state for append-only near-dup maintenance:
    ``{path}/fps`` (id, simhash) and ``{path}/blocks`` (id, block_idx,
    block_val). The simhash analogue of write_band_index — an append
    fingerprints ONLY the new batch and joins it against the persisted
    block table, never re-reading the corpus text."""
    width = bits // blocks
    mask = (1 << width) - 1
    fp = simhash(docs, id_col, text_col, bits=bits, hash_fn=hash_fn)
    fp.write.mode("overwrite").parquet(f"{path}/fps")
    _simhash_blocks(fp, id_col, blocks, width, mask).write.mode(
        "overwrite"
    ).parquet(f"{path}/blocks")


def _simhash_blocks(
    fp: DataFrame, id_col: str, blocks: int, width: int, mask: int
) -> DataFrame:
    block_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("block_idx"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("block_val"),
            )
            for b in range(blocks)
        ]
    )
    return (
        fp.select(id_col, "simhash", block_structs.alias("_ba"))
        .select(id_col, "simhash", F.explode("_ba").alias("_bb"))
        .select(
            id_col,
            "simhash",
            F.col("_bb.block_idx").alias("block_idx"),
            F.col("_bb.block_val").alias("block_val"),
        )
    )


def append_simhash_index(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    blocks: int = 4,
    bits: int = 64,
    hash_fn: str = "md5",
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Append a batch to a ``write_simhash_index`` index; return the NEW
    verified pairs (new↔old and new↔new, id_a < id_b, hamming <=
    max_hamming).

    Composes exactly with the batch pipeline under append-only increasing
    ids: simhash_near_duplicates over the full corpus == initial pairs ∪
    every append's pairs (tested). Unlike the MinHash index there is no
    exact-copy registry — identical texts have identical fingerprints and
    the batch path emits those hamming-0 pairs, so the append path must
    too. The block cap is evaluated on post-append block sizes (same
    drop-don't-retract semantics as append_band_index)."""
    if max_hamming >= blocks:
        raise ValueError("pigeonhole blocking needs max_hamming < blocks")
    spark = new_docs.sparkSession
    width = bits // blocks
    mask = (1 << width) - 1
    fp = simhash(new_docs, id_col, text_col, bits=bits, hash_fn=hash_fn)
    new_blocks = _simhash_blocks(fp, id_col, blocks, width, mask).localCheckpoint(
        eager=True
    )  # feeds the cap count, the join, and the index append
    old_blocks = spark.read.parquet(f"{path}/blocks")
    all_blocks = old_blocks.unionByName(new_blocks)
    if max_bucket_size is not None:
        keep = (
            all_blocks.groupBy("block_idx", "block_val")
            .count()
            .filter(F.col("count") <= max_bucket_size)
            .select("block_idx", "block_val")
        )
        new_side = new_blocks.join(keep, ["block_idx", "block_val"], "left_semi")
        all_side = all_blocks.join(keep, ["block_idx", "block_val"], "left_semi")
    else:
        new_side, all_side = new_blocks, all_blocks
    j = new_side.select(
        F.col(id_col).alias("_x"), F.col("simhash").alias("_fx"), "block_idx", "block_val"
    ).join(
        all_side.select(
            F.col(id_col).alias("_y"), F.col("simhash").alias("_fy"), "block_idx", "block_val"
        ),
        ["block_idx", "block_val"],
    )
    out = (
        j.filter(F.col("_x") != F.col("_y"))
        .select(
            F.least("_x", "_y").alias("id_a"),
            F.greatest("_x", "_y").alias("id_b"),
            simhash_hamming(F.col("_fx"), F.col("_fy")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        # materialize BEFORE the appends below rewrite what the plan reads
        .localCheckpoint(eager=True)
    )
    new_blocks.select(id_col, "simhash").dropDuplicates([id_col]).write.mode(
        "append"
    ).parquet(f"{path}/fps")
    new_blocks.write.mode("append").parquet(f"{path}/blocks")
    return out


def duplicate_groups(
    pairs: DataFrame,
    max_iterations: int = 10,
) -> DataFrame:
    """Group near-duplicate pairs into connected components.

    (id_a, id_b) pairs → (doc_id, group_id) where group_id is the smallest
    doc id in the component. Distributed label propagation: each node
    repeatedly adopts the minimum label among itself and its neighbors;
    converges in O(component diameter) join rounds (dedup components are
    shallow in practice — near-dup clusters are cliques from LSH buckets).
    Iteration is driver-controlled with early exit on fixpoint.
    """
    # materialize the edge list once: ``pairs`` is typically the whole
    # LSH→verify pipeline, and the propagation loop references edges in
    # every iteration join AND the fixpoint check — without this the
    # upstream pipeline re-executes O(iterations) times
    # duplicate-PAIR-sized frames (only docs in near-dup relations),
    # consumed once per propagation round: the loop below NEEDS
    # lineage-truncating localCheckpoint (not materialize()/persist) —
    # a lineage-keeping persist grows the logical plan by one join per
    # iteration and the analyzer cost compounds
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nlabel"))
        )
        # the fixpoint flag is computed INSIDE the label update (labels
        # only ever decrease, so changed == some neighbor min undercut
        # the old label) — the old/new join the check used to run was a
        # full extra join job per iteration; the limit(1).count() below
        # reads the just-materialized checkpoint only
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                    "label"
                ),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias(
                    "_chg"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("_chg").limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("group_id"))


def dedup_report(
    docs: DataFrame,
    groups: DataFrame,
    id_col: str = "doc_id",
) -> dict:
    """Corpus-level dedup summary: total docs, docs in duplicate groups,
    number of groups, documents kept after keep-one-per-group."""
    total = docs.count()
    g = groups.groupBy("group_id").agg(F.count("*").alias("sz"))
    dup_groups = g.filter(F.col("sz") > 1)
    stats = dup_groups.agg(
        F.count("*").alias("groups"), F.sum("sz").alias("members")
    ).first()
    n_groups = stats["groups"] or 0
    members = stats["members"] or 0
    removed = members - n_groups  # keep one per group
    return {
        "total_docs": total,
        "docs_in_dup_groups": int(members),
        "dup_groups": int(n_groups),
        "docs_removed": int(removed),
        "docs_kept": int(total - removed),
        "dup_rate": (removed / total) if total else 0.0,
    }


def duplicated_ngram_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Substring-level exact-duplicate detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499): document-level dedup misses the boilerplate CASE —
    licenses, navigation chrome, quoted passages — that repeats INSIDE
    otherwise-unique documents. Every n-token window is hashed; a window
    is a duplicated span iff its hash also occurs in at least one OTHER
    document (the paper's suffix-array span query, re-expressed as the
    shuffle-friendly hash-of-fixed-windows approximation it reduces to at
    a fixed match length).

    Returns per document: ``(id, n_windows, dup_windows, dup_fraction)``
    — dup_windows counts window POSITIONS (a span repeated k times in one
    doc counts k), dup_fraction = dup_windows / n_windows. Documents
    shorter than n tokens contribute one partial window (``_shingle_array``
    semantics, shared with the MinHash pipeline).

    Shape at scale: windows are built per document inside the scan task
    (arrays_zip shifted-slices, map-only), then ONE linear chain with no
    join-back: groupBy(doc, hash) with map-side combine, a hash-keyed
    window for the doc-frequency (each hash partition is a handful of
    rows), and a final per-doc aggregation — since EVERY window position
    lands in the (doc, hash) counts, n_windows is sum(c) per doc and the
    document branch that would re-scan the corpus never exists. Nothing
    is quadratic and no global window forms. Hash collisions are
    negligible by construction at either width.

    ``hash_fn``: "md5" (engine-portable hex string — the oracle-gated
    default) or "xxhash64" (JVM-native long, a quarter of the shuffled
    key bytes — prefer at corpus scale; same convention as
    ``rolling_fingerprint``).
    """
    hasher = (
        (lambda s: F.md5(s.cast("binary")))
        if hash_fn == "md5"
        else (lambda s: F.xxhash64(s))
    )
    wins = df.select(
        F.col(id_col),
        F.transform(_shingle_array(F.col(text_col), n), hasher).alias("_w"),
    )
    exploded = wins.select(F.col(id_col), F.explode("_w").alias("_h"))
    # per_doc feeds BOTH the doc-frequency aggregate and the join back —
    # materialize it once so the window hashing does not run twice
    # (ReusedExchange covers only the exchange, not AQE's independently
    # compiled broadcast-side query stage)
    per_doc = (
        exploded.groupBy(id_col, "_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .transform(materialize)
    )
    # document frequency via groupBy + join back, NOT a per-hash window:
    # per_doc rows are unique per (doc, hash), so count(*) per hash IS the
    # doc frequency, and the aggregate gets map-side partial aggregation.
    # A window partitioned by _h pins every (doc, "the boilerplate gram")
    # row of the corpus to ONE task — the exact straggler the suffix tier
    # was hardened against (windows get no AQE skew handling; joins do,
    # and the duplicated-hash side is small enough to broadcast).
    dup_hashes = (
        per_doc.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= 2)
        .select("_h", F.lit(1).alias("_dup"))
    )
    flagged = per_doc.join(dup_hashes, "_h", "left")
    dup_c = F.sum(F.when(F.col("_dup") == 1, F.col("_c")).otherwise(F.lit(0)))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sum("_c").cast("long").alias("n_windows"),
            dup_c.cast("long").alias("dup_windows"),
        )
        .select(
            F.col(id_col),
            "n_windows",
            "dup_windows",
            F.round(
                F.col("dup_windows").cast("double") / F.col("n_windows"), 6
            ).alias("dup_fraction"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """The TRANSFORMATION counterpart of ``duplicated_ngram_spans`` —
    Lee et al. 2022's ExactSubstr dedup excises repeated spans from the
    training text instead of dropping whole documents. Every n-token
    window whose hash occurs more than once in the corpus (across OR
    within documents) is a duplicate span; the canonical occurrence —
    the (lowest doc id, lowest position) one — is KEPT, every other
    occurrence's tokens are removed, and the surviving tokens are
    re-joined. Tokens under overlapping duplicate windows are removed
    once (coverage union), so the kept-copy guarantee is best-effort
    under overlap, as in the paper's implementation.

    Returns ``(id, n_tokens, removed_tokens, text)`` with the cleaned
    text (possibly empty when a document is one big duplicate).

    Shape at scale: window hashing is map-only (arrays_zip shifted
    slices); occurrences shuffle once on the hash (a window per
    occurrence decides canonical-vs-removable), coverage positions
    aggregate per document, and the final mask is applied inside a
    per-document filter over the token array — no driver work, no
    quadratic stage. Documents shorter than n contribute one partial
    window (``_shingle_array`` semantics).
    """
    toks = _tokens(F.col(text_col))
    # hash_fn: "md5" (engine-portable, the oracle-gated default) or
    # "xxhash64" (long keys — a quarter of the shuffled bytes; prefer at
    # corpus scale, same convention as duplicated_ngram_spans)
    hasher = (
        (lambda s: F.md5(s.cast("binary")))
        if hash_fn == "md5"
        else (lambda s: F.xxhash64(s))
    )
    base = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.transform(_shingle_array(F.col(text_col), n), hasher).alias("_w"),
    )
    # occ feeds BOTH the canonical-occurrence aggregate and the join
    # back — materialize it once so the window hashing (md5 per n-token
    # window, the dominant map cost) does not run twice
    occ = base.select(
        F.col(id_col), F.posexplode("_w").alias("_p0", "_h")
    ).select(id_col, (F.col("_p0") + 1).alias("_p"), "_h").transform(materialize)
    # canonical occurrence per duplicated hash via groupBy + join back,
    # NOT a pair of per-hash windows: min(struct(id, p)) IS the (lowest
    # doc, lowest position) rule, the aggregate gets map-side partial
    # aggregation, and the join back is AQE-skew-splittable — a window
    # partitioned by _h pins every occurrence of a boilerplate window
    # hash to one task (same hardening as the suffix tier).
    dup = (
        occ.groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.min(
                F.struct(F.col(id_col).alias("_ki"), F.col("_p").alias("_kp"))
            ).alias("_keep"),
        )
        .filter(F.col("_cnt") >= 2)
        .select("_h", "_keep")
    )
    removable = (
        occ.join(dup, "_h")
        .filter(
            (F.col(id_col) != F.col("_keep._ki"))
            | (F.col("_p") != F.col("_keep._kp"))
        )
        .select(id_col, "_p")
    )
    # coverage union: aggregate window START positions per document first,
    # then expand to covered token positions inside the array — the
    # doc-keyed shuffle carries one row per removable window instead of n
    # (the expansion is per-document array math on the reduce side)
    cover = (
        removable.groupBy(id_col)
        .agg(F.collect_set("_p").alias("_ps"))
        .select(
            F.col(id_col),
            F.array_distinct(
                F.flatten(
                    F.transform(
                        "_ps", lambda p: F.sequence(p, p + F.lit(n - 1))
                    )
                )
            ).alias("_rm"),
        )
    )
    joined = base.join(cover, id_col, "left").select(
        F.col(id_col),
        "_t",
        F.coalesce(F.col("_rm"), F.array().cast("array<int>")).alias("_rm"),
    )
    # kept positions via array_except (hash-set difference, O(L + |rm|)
    # per document and order-preserving over the 1..L sequence) — the
    # per-token array_contains scan this replaces was O(L * |rm|).
    # Positions past L (a short document's partial window) drop out of
    # the except naturally, preserving the old array_intersect clamp.
    kept_pos = F.array_except(F.sequence(F.lit(1), F.size("_t")), F.col("_rm"))
    pre = joined.select(F.col(id_col), "_t", kept_pos.alias("_kp"))
    return pre.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        (F.size("_t") - F.size("_kp")).cast("long").alias("removed_tokens"),
        F.array_join(
            F.transform("_kp", lambda p: F.element_at(F.col("_t"), p)), " "
        ).alias(text_col),
    )


def best_quality_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str | None = None,
    score_frame: DataFrame | None = None,
) -> DataFrame:
    """Quality-aware dedup disposition: each near-duplicate group keeps
    its HIGHEST-quality member instead of the lowest id — the
    representative rule production curation actually uses (RefinedWeb /
    CCNet keep the best-scoring copy; min-id is only the cheapest
    deterministic stand-in). Ties break to the lowest id, so the output
    is still fully deterministic.

    ``pairs``: (id_a, id_b) near-dup pairs (e.g. from
    ``minhash_near_duplicates``). ``score_frame``/``score_col``: an
    (id, score) frame — defaults to ``textstats.quality_metrics``'s
    composite quality_score rounded to 6dp (rounding first makes the
    argmax decision identical across engines at the value-hash gate's
    own precision).

    Returns one row per CORPUS document: ``(id, group_id, rep_id, keep)``
    — group_id NULL for documents in no group (trivially kept,
    rep_id = self).

    Shape at scale: the connected components come from the checkpointed
    label propagation (``duplicate_groups``); ranking is a window over
    GROUP-sized partitions (near-dup groups are small by construction);
    the final disposition is one id-keyed left join per side.
    """
    from rrdtool_1_x_spark.datapipe.textstats import quality_metrics

    groups = duplicate_groups(pairs)
    if score_frame is None:
        score_frame = quality_metrics(
            df.select(id_col, text_col), text_col=text_col
        ).select(
            F.col(id_col), F.round("quality_score", 6).alias("_qs")
        )
        score_col = "_qs"
    scored = groups.join(
        score_frame.select(F.col(id_col), F.col(score_col).alias("_qs")),
        id_col,
    )
    w = Window.partitionBy("group_id").orderBy(
        F.desc("_qs"), F.asc(id_col)
    )
    rep = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("group_id", F.col(id_col).alias("rep_id"))
    )
    return (
        df.select(id_col)
        .join(groups, id_col, "left")
        .join(rep, "group_id", "left")
        .select(
            F.col(id_col),
            "group_id",
            F.coalesce(F.col("rep_id"), F.col(id_col)).alias("rep_id"),
            (F.coalesce(F.col("rep_id"), F.col(id_col)) == F.col(id_col)).alias(
                "keep"
            ),
        )
    )


def edit_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_ratio: float = 0.2,
    prefix_len: int = 24,
    block_cap: int = 256,
    threshold_cap: int | None = None,
    collapse_exact: bool = True,
) -> DataFrame:
    """Edit-distance near-duplicate pairs: prefix-blocked candidates, then
    Levenshtein with a length-proportional budget — the character-exact
    verifier of the dedup ladder (MinHash/SimHash see token/term overlap;
    only edit distance catches the one-character-tweak template family
    that shares every shingle). A pair survives when

        levenshtein(a, b) <= floor(max_ratio * max(len(a), len(b)))

    Emits (id_a, id_b, lev, edit_ratio).

    Blocking: exact-duplicate texts collapse to their min-id
    representative first (``collapse_exact``; distance-0 pairs are
    exact_dedup's job and k copies would otherwise pair k²/2 times inside
    one block); then candidates share the first ``prefix_len`` characters
    of the lower/trim-normalized text (template near-dups keep their
    head; a diverging head means an edit budget the ratio test would
    reject anyway for short prefixes of long docs). Blocks larger than
    ``block_cap`` are dropped whole — same skew rule as the MinHash
    bucket cap: a boilerplate prefix shared by millions of docs would
    otherwise form an O(k²) pair explosion on one shuffle key. At
    production scale this operator is the RERANK stage behind
    ``signature_near_duplicates`` candidates; prefix blocking is the
    self-contained deterministic surface.

    Cost model: Levenshtein is O(len_a · len_b) per pair. The JVM builtin
    accepts a FOLDABLE threshold that switches to the band-limited dynamic
    program (O(max_len · threshold) and earliest exit for rejected pairs)
    — but only as a literal int, so pass ``threshold_cap`` = floor(
    max_ratio · longest-doc-length) when the corpus length bound is known;
    per-pair filtering below the cap is unchanged (above-cap distances
    come back as -1 and are rejected, exactly what the ratio test would
    have done).
    """
    src = df
    if collapse_exact:
        # identical texts pair quadratically inside their shared block
        # (k copies -> k²/2 Levenshtein calls for distance-0 pairs that
        # are exact_dedup's job) — the same scale-killer the MinHash tier
        # collapses; keep the min-id representative per md5(text). The
        # representative set is ids only (min(long) HASH-aggregates with
        # map-side combine; carrying the text column through the agg
        # forces SortAggregate — a full corpus sort per consumer, measured
        # 8x on this gate) and rejoins as a semi join on the id. The 10x
        # replicated-corpus probe measured 62 s without the collapse.
        rep_ids = (
            df.select(
                F.col(id_col),
                F.md5(F.col(text_col).cast("binary")).alias("_h"),
            )
            .groupBy("_h")
            .agg(F.min(id_col).alias(id_col))
            .select(id_col)
        )
        src = df.join(rep_ids, id_col, "left_semi")
    norm = F.lower(F.trim(F.col(text_col)))
    base = src.select(
        F.col(id_col).alias("_id"),
        norm.alias("_t"),
        F.substring(norm, 1, prefix_len).alias("_k"),
    )
    keep = (
        base.groupBy("_k").count().filter(F.col("count") <= block_cap).select("_k")
    )
    # materialized once: both candidate self-join sides read the blocked
    # frame, and each otherwise re-runs the exact-collapse semi join +
    # normalization upstream (AQE stages do not share the subplan)
    blocked = base.join(keep, "_k", "left_semi").transform(materialize)
    a = blocked.select(
        F.col("_k"), F.col("_id").alias("id_a"), F.col("_t").alias("_ta")
    )
    b = blocked.select(
        F.col("_k"), F.col("_id").alias("id_b"), F.col("_t").alias("_tb")
    )
    cand = a.join(b, "_k").filter(F.col("id_a") < F.col("id_b"))
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"), threshold_cap)
    scored = cand.select(
        "id_a",
        "id_b",
        lev.alias("lev"),
        F.greatest(F.length("_ta"), F.length("_tb")).alias("_mx"),
    ).filter((F.col("lev") >= 0) & (F.col("lev") <= F.lit(max_ratio) * F.col("_mx")))
    return scored.select(
        "id_a",
        "id_b",
        F.col("lev").cast("long").alias("lev"),
        F.round(F.col("lev").cast("double") / F.col("_mx"), 6).alias("edit_ratio"),
    )


def cdc_blocks(
    df: DataFrame,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined chunking over the token stream — the
    storage-dedup primitive (LBFS/FastCDC family): a block boundary
    falls AFTER token ``p`` wherever the md5 of the ``window``-token
    span ending at ``p`` starts with a zero nibble (P = 1/16 → mean
    block ≈ 16 tokens). Because boundaries depend only on local
    CONTENT, an insertion early in a document shifts at most the block
    it lands in — every later block re-aligns and deduplicates again,
    which is exactly what fixed-size chunking cannot do.

    Returns ``(id, block_id, n_tok, block_hash)`` — block_hash is the
    md5 of the space-joined tokens, the cross-document dedup key.

    Shape at scale: window hashes and boundary flags are per-row array
    arithmetic inside the scan; the running block id is one
    sum-of-flags window keyed BY DOCUMENT (skew bounded by document
    length), and block assembly is a (doc, block) aggregation —
    corpus-linear, no corpus-wide key before the final block-hash
    count."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    w = window
    zipped = F.arrays_zip(
        *[F.slice(toks, i + 1, F.size(toks)).alias(f"t{i}") for i in range(w)]
    )
    n = F.size(toks)
    full = F.transform(
        F.slice(zipped, 1, F.greatest(n - (w - 1), F.lit(0))),
        lambda x: F.concat_ws(" ", *[x[f"t{i}"] for i in range(w)]),
    )
    flags = F.concat(
        F.array_repeat(F.lit(False), F.least(n, F.lit(w - 1))),
        F.transform(
            full,
            lambda s: F.substring(F.md5(s.cast("binary")), 1, 1) == "0",
        ),
    )
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.arrays_zip(toks.alias("tok"), flags.alias("bnd"))),
    ).select(
        id_col,
        F.col("pos"),
        F.col("col.tok").alias("tok"),
        F.col("col.bnd").cast("int").alias("bnd"),
    )
    wn = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    blocks = ex.withColumn(
        "block_id", F.coalesce(F.sum("bnd").over(wn), F.lit(0)).cast("long")
    )
    return (
        blocks.groupBy(id_col, "block_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(
                            F.collect_list(F.struct("pos", "tok"))
                        ),
                        lambda s: s["tok"],
                    ),
                ).cast("binary")
            ).alias("block_hash"),
        )
    )


def cdc_dedup_report(
    df: DataFrame,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus storage-dedup accounting over CDC blocks: how many token
    blocks exist, how many are distinct, and what share of tokens a
    block-store would NOT have to keep twice — the measurement behind
    'how much smaller does this corpus get under content-addressed
    storage'. One row:
    ``(total_blocks, distinct_blocks, tokens_total, tokens_dedup,
    dup_token_share)`` where tokens_dedup keeps one copy per distinct
    block."""
    b = cdc_blocks(df, window, id_col, text_col)
    per_hash = b.groupBy("block_hash").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min("n_tok").alias("_nt"),
    )
    return per_hash.agg(
        F.sum("_c").cast("long").alias("total_blocks"),
        F.count(F.lit(1)).alias("distinct_blocks"),
        F.sum(F.col("_c") * F.col("_nt")).cast("long").alias("tokens_total"),
        F.sum("_nt").cast("long").alias("tokens_dedup"),
        F.round(
            (F.sum(F.col("_c") * F.col("_nt")) - F.sum("_nt")).cast("double")
            / F.sum(F.col("_c") * F.col("_nt")),
            6,
        ).alias("dup_token_share"),
    )


def lsh_precision_recall(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_len: int = 3,
    jaccard_threshold: float = 0.7,
    max_bucket_size: int | None = 512,
) -> DataFrame:
    """Banding-quality AUDIT: measured precision/recall of the LSH
    candidate set against the EXACT-Jaccard ground truth — the honest
    answer to "what does the banding actually miss" next to the
    S-curve's theoretical collision probability 1-(1-j^r)^b (standard
    MinHash-LSH analysis; reported at the threshold as
    ``theory_recall_at_t``).

    Ground truth = all pairs of exact-collapsed representatives with
    true Jaccard >= threshold, computed through the sparse
    shared-shingle join (only pairs sharing a shingle are scored — a
    pair at j >= t > 0 always shares one). This is the all-pairs audit
    tier, like ``source_overlap``'s exact matrix: run it on samples at
    100 TB (the KMV/banded paths are the scale estimators it
    calibrates).

    Returns ONE row: (n_truth, n_candidates, n_hit, precision, recall,
    theory_recall_at_t). precision = hit/candidates (0 when no
    candidates); recall = hit/truth (1 when no truth pairs)."""
    reps = _collapse_exact_reps(df, id_col, text_col)
    ds = reps.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(
            _shingle_array(F.col(text_col), shingle_len)
        ).alias("_s"),
    ).transform(materialize)
    sizes = ds.select("_id", F.size("_s").alias("_n"))
    ex = ds.select("_id", F.explode("_s").alias("_sh"))
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a._sh") == F.col("b._sh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    truth = (
        inter.join(
            sizes.select(
                F.col("_id").alias("id_a"), F.col("_n").alias("_na")
            ),
            "id_a",
        )
        .join(
            sizes.select(
                F.col("_id").alias("id_b"), F.col("_n").alias("_nb")
            ),
            "id_b",
        )
        .filter(
            F.col("_i")
            >= F.lit(float(jaccard_threshold))
            * (F.col("_na") + F.col("_nb") - F.col("_i"))
        )
        .select("id_a", "id_b")
    )
    # materialized ONCE for the same reason minhash_near_duplicates
    # checkpoints its melted frame: the band assignments feed BOTH sides
    # of the candidate self-join, and without the checkpoint the whole
    # interpreted-HOF signature computation (and the exact-collapse
    # window upstream) re-executes per side — measured 5.7 s -> 1.5 s
    # for the candidate stage at sf0.1
    melted = minhash_band_buckets(
        reps, id_col, text_col, num_hashes, bands, shingle_len,
        collapse_exact=False,
    ).transform(materialize)
    if max_bucket_size is not None:
        # groupBy + semi join, not a per-bucket count window — same skew
        # rationale as minhash_near_duplicates' cap
        small = (
            melted.groupBy("band_idx", "bucket")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") <= max_bucket_size)
            .select("band_idx", "bucket")
        )
        melted = melted.join(small, ["band_idx", "bucket"], "left_semi")
    cand = (
        melted.alias("x")
        .join(
            melted.alias("y"),
            (F.col("x.band_idx") == F.col("y.band_idx"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    hit = truth.join(cand, ["id_a", "id_b"])
    r = num_hashes // bands
    theory = round(
        1.0 - (1.0 - float(jaccard_threshold) ** r) ** bands, 6
    )
    nt = truth.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    nc = cand.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    nh = hit.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    return (
        nt.select(F.col("n").alias("n_truth"), "_k")
        .join(nc.select(F.col("n").alias("n_candidates"), "_k"), "_k")
        .join(nh.select(F.col("n").alias("n_hit"), "_k"), "_k")
        .select(
            F.col("n_truth").cast("long").alias("n_truth"),
            F.col("n_candidates").cast("long").alias("n_candidates"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(
                F.when(
                    F.col("n_candidates") > 0,
                    F.col("n_hit") / F.col("n_candidates").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("precision"),
            F.round(
                F.when(
                    F.col("n_truth") > 0,
                    F.col("n_hit") / F.col("n_truth").cast("double"),
                ).otherwise(F.lit(1.0)),
                6,
            ).alias("recall"),
            F.lit(theory).alias("theory_recall_at_t"),
        )
    )


def exact_substring_spans(
    df: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """Variable-length exact-substring duplicate EXTENTS — the
    suffix-array tier of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better", arXiv:2107.06499): their ExactSubstr
    pass removes every maximal exact repeat of >= ``n`` tokens
    (the paper uses 50), not just fixed-``n`` windows. The suffix-array
    adjacent-prefix query distributes as sorted ``n``-token ANCHORS plus
    RUN EXTENSION: a token window is *covered* iff its ``n``-gram occurs
    at least twice in the corpus (across OR within documents — the
    paper counts both), and because an exact repeat of length
    ``m >= n`` covers all of its ``m - n + 1`` anchors, merging
    CONSECUTIVE covered anchor positions reconstructs the maximal
    duplicated extents (overlapping repeats merge into their coverage
    union, exactly as the paper's excision does).

    Returns one row per maximal duplicated span:
    ``(id, span_start, span_len)`` — 1-based token position and length
    in tokens (``span_len >= n``, variable). Documents shorter than
    ``n`` tokens yield no spans (whole-document dedup's job — this is
    the within-document tier; ``duplicated_ngram_spans`` reports the
    fixed-window fractions, ``remove_duplicate_spans`` excises).

    ``hash_fn``: "md5" (engine-portable, the oracle-gated default) or
    "xxhash64" (JVM-native long keys, a quarter of the shuffled bytes —
    prefer at corpus scale; collisions negligible at either width).

    Shape at scale: anchor hashing is map-only inside the scan
    (``_shingle_array`` shifted-slice zip); the coverage count is a
    map-side partial ``groupBy("_h")`` plus a leftsemi join back on the
    duplicated hashes (skew-safe: a 10^8-occurrence boilerplate hash is
    one aggregate row, and the join is AQE-skew-splittable — never a
    per-hash window, which would pin all occurrences of one hash to a
    single task); covered positions shuffle ONCE on the document for
    the lag/run-id window (per-doc partitions, bounded by document
    length); the span aggregate reuses that partitioning. No global
    window, nothing corpus-quadratic."""
    # the occurrence frame feeds BOTH the duplicated-hash aggregate and
    # the join back — materialize it once so the anchor hashing (md5 of
    # every n-token window, the dominant map cost) does not run twice.
    # This is the distributed analogue of Lee et al. writing the suffix
    # array to disk before querying it; the persisted-index path
    # (write_anchor_index / anchor_index_spans) reads its occurrences
    # from parquet instead and needs no checkpoint.
    occ = _anchor_occurrences(df, n, id_col, text_col, hash_fn).transform(materialize)
    return _extents_from_occurrences(occ, n, id_col)


def _anchor_occurrences(
    df: DataFrame,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> DataFrame:
    """(id, p, h): every n-token anchor window position of every document
    with >= n tokens (the suffix-dedup occurrence frame; map-only)."""
    hasher = (
        (lambda s: F.md5(s.cast("binary")))
        if hash_fn == "md5"
        else (lambda s: F.xxhash64(s))
    )
    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).alias("_L"),
        F.transform(_shingle_array(F.col(text_col), n), hasher).alias("_w"),
    ).filter(F.col("_L") >= n)
    return base.select(
        F.col(id_col), F.posexplode("_w").alias("_p0", "_h")
    ).select(F.col(id_col), (F.col("_p0") + 1).alias("_p"), "_h")


def _extents_from_occurrences(
    occ: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Covered anchors (corpus count >= 2) -> consecutive-run merge ->
    maximal (span_start, span_len) extents. The reduce tail shared by
    ``exact_substring_spans`` and ``anchor_index_spans``.

    The coverage count is a groupBy + semi-join, NOT a per-hash window:
    a window forces every occurrence of one hash into a single task, and
    the data this operator targets is exactly where one hash explodes —
    a boilerplate 50-token run (license header, templated footer) can
    repeat 10^8+ times at corpus scale, a straggler partition AQE cannot
    split (windows, unlike joins, get no skew handling). groupBy gets
    map-side partial aggregation (each task emits one row per local
    hash), the duplicated-hash frame it yields is a small fraction of
    the occurrences, and the semi-join back is AQE-skew-splittable and
    broadcastable when the dup set is small."""
    dup_hashes = (
        occ.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .filter(F.col("_cnt") >= 2)
        .select("_h")
    )
    cov = occ.join(dup_hashes, "_h", "leftsemi").select(F.col(id_col), "_p")
    wd = Window.partitionBy(id_col).orderBy(F.col("_p").asc())
    runs = cov.withColumn(
        "_new",
        F.when(F.col("_p") - F.lag("_p").over(wd) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "_run",
        F.sum("_new").over(
            wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        runs.groupBy(F.col(id_col), F.col("_run"))
        .agg(
            F.min("_p").cast("long").alias("span_start"),
            (F.max("_p") - F.min("_p") + n).cast("long").alias("span_len"),
        )
        .select(F.col(id_col), "span_start", "span_len")
    )


def _anchor_fs(spark, path: str):
    """(FileSystem, Path) for ``{path}/anchor_meta.json`` via the Hadoop
    FileSystem API — the meta pin must live on the SAME filesystem as
    the parquet anchors (hdfs://, s3a://, file://…), not the driver's
    local disk (the start_quantile_stream snapshot-delete pattern)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{path}/anchor_meta.json")
    return p.getFileSystem(conf), p


def _anchor_meta_write(spark, path: str, meta: dict) -> None:
    import json

    fs, p = _anchor_fs(spark, path)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        out.close()


def _anchor_meta_check(
    spark, path: str, n: int, id_col: str, hash_fn: str
) -> bool:
    """Validate (n, id_col, hash_fn) against ``{path}/anchor_meta.json``:
    an index is only meaningful under ONE anchoring config — a
    mismatched write would silently produce wrong span lengths
    (span_len = run + n) or mixed hash types, so mismatches raise.
    Returns True when a pin exists (and matches), False when the index
    is new — callers write the pin AFTER a successful anchors write so
    a failed first write never leaves a meta file with no anchors."""
    meta = {"n": int(n), "id_col": id_col, "hash_fn": hash_fn}
    fs, p = _anchor_fs(spark, path)
    if not fs.exists(p):
        return False
    stored = _anchor_meta_read(spark, path)
    if stored != meta:
        raise ValueError(
            f"anchor index at {path} was written with {stored};"
            f" this call uses {meta}"
        )
    return True


def _anchor_meta_read(spark, path: str) -> dict:
    import json

    fs, p = _anchor_fs(spark, path)
    stream = fs.open(p)
    try:
        raw = bytes(
            spark._jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        )
    finally:
        stream.close()
    return json.loads(raw.decode("utf-8"))


def write_anchor_index(
    docs: DataFrame,
    path: str,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> None:
    """Persist the suffix-dedup ANCHOR index: distinct (doc_id, p, h)
    n-token window occurrences. Anchoring is strictly per-document, so
    the merge law is plain set UNION (the winnow-index pattern): an
    append anchors ONLY the new batch, and index-then-append equals the
    one-shot ``exact_substring_spans`` EXACTLY for any batch split —
    coverage counts aggregate over the stored union at read time.
    The anchoring config (n, id_col, hash_fn) is pinned in
    ``anchor_meta.json`` (same filesystem as the anchors, written AFTER
    a successful anchors write); appends and reads validate against it.
    Plain parquet appends here; production writes go through a
    transactional commit (sources.store's manifest-snapshot pattern)."""
    _anchor_occurrences(docs, n, id_col, text_col, hash_fn).distinct() \
        .write.mode("overwrite").parquet(f"{path}/anchors")
    _anchor_meta_write(
        docs.sparkSession, path,
        {"n": int(n), "id_col": id_col, "hash_fn": hash_fn},
    )


def append_anchor_index(
    batch: DataFrame,
    path: str,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
) -> None:
    """Anchor the batch only and append (set union; a replayed batch's
    duplicate rows are absorbed by the read-side distinct). Raises if
    (n, id_col, hash_fn) differ from the index's pinned config; a fresh
    index gets its pin after the first successful append."""
    spark = batch.sparkSession
    pinned = _anchor_meta_check(spark, path, n, id_col, hash_fn)
    _anchor_occurrences(batch, n, id_col, text_col, hash_fn).distinct() \
        .write.mode("append").parquet(f"{path}/anchors")
    if not pinned:
        _anchor_meta_write(
            spark, path,
            {"n": int(n), "id_col": id_col, "hash_fn": hash_fn},
        )


def anchor_index_spans(spark, path: str, n: int | None = None) -> DataFrame:
    """Maximal duplicated extents straight off the STORED anchors — no
    corpus access (a 100 TB corpus grows by anchoring each new batch,
    never re-anchoring). Semantics identical to
    ``exact_substring_spans`` by construction (shared reduce tail).
    ``n`` defaults to the index's pinned config; passing a different
    value raises (span_len arithmetic depends on it)."""
    meta = _anchor_meta_read(spark, path)
    if n is not None and int(n) != meta["n"]:
        raise ValueError(
            f"anchor index at {path} was written with n={meta['n']},"
            f" read requested n={n}"
        )
    occ = spark.read.parquet(f"{path}/anchors").distinct()
    return _extents_from_occurrences(occ, meta["n"], meta["id_col"])


def excise_duplicate_extents(
    df: DataFrame,
    n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "md5",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Variable-length exact-substring EXCISION — the removal half of
    Lee et al. 2022's ExactSubstr pass (arXiv:2107.06499 §3.1): every
    maximal exact repeat of >= ``n`` tokens (the paper uses 50) is cut
    from EVERY occurrence and the surviving tokens re-joined.
    ``exact_substring_spans`` reports the maximal duplicated extents;
    this composes extents -> token-coverage union -> rebuilt text
    (the ``remove_contaminated_spans`` mechanics over variable-length
    spans instead of fixed-``n`` windows — ``remove_duplicate_spans``
    keeps a canonical copy of fixed windows; the suffix tier removes
    all copies, as the paper's implementation does).

    ``spans``: a precomputed extents frame ``(id, span_start,
    span_len)`` — pass ``anchor_index_spans(...)`` output to excise
    against a persisted anchor index without re-anchoring the corpus;
    defaults to the one-shot ``exact_substring_spans`` over ``df``.

    Returns one row per corpus document (untouched documents included):
    ``(id, n_tokens, removed_tokens, text)`` — token counts before
    excision and removed, and the rebuilt text (possibly empty when a
    document is one big duplicate). Token conservation holds by
    construction: ``n_tokens - removed_tokens`` tokens survive.

    Shape at scale: extents come from the skew-hardened suffix tier
    (see ``exact_substring_spans``); coverage positions explode per
    span and aggregate per document (bounded by document length, like
    the duplicated extents themselves); the final mask is one
    doc-keyed left join + a per-document array filter inside the scan
    task. No driver work, nothing corpus-quadratic."""
    if spans is None:
        spans = exact_substring_spans(df, n, id_col, text_col, hash_fn)
    # aggregate the (start, end) extents per document FIRST, then expand
    # to covered token positions inside the array — the doc-keyed shuffle
    # carries one row per extent instead of span_len rows (the expansion
    # is per-document array math on the reduce side; array_distinct keeps
    # collect_set's overlap-union semantics for caller-provided spans)
    cover = (
        spans.groupBy(id_col)
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").cast("int").alias("_a"),
                    (F.col("span_start") + F.col("span_len") - 1)
                    .cast("int")
                    .alias("_b"),
                )
            ).alias("_sp")
        )
        .select(
            F.col(id_col),
            F.array_distinct(
                F.flatten(
                    F.transform("_sp", lambda s: F.sequence(s["_a"], s["_b"]))
                )
            ).alias("_rm"),
        )
    )
    base = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_t"))
    joined = base.join(cover, id_col, "left").select(
        F.col(id_col),
        "_t",
        F.coalesce(F.col("_rm"), F.array().cast("array<int>")).alias("_rm"),
    )
    # kept positions via array_except (hash-set difference, O(L + |rm|)
    # per document, order-preserving) — replaces the O(L * |rm|)
    # per-token array_contains scan
    kept_pos = F.array_except(F.sequence(F.lit(1), F.size("_t")), F.col("_rm"))
    pre = joined.select(F.col(id_col), "_t", F.col("_rm"), kept_pos.alias("_kp"))
    return pre.select(
        F.col(id_col),
        F.size("_t").cast("long").alias("n_tokens"),
        F.size("_rm").cast("long").alias("removed_tokens"),
        F.array_join(
            F.transform("_kp", lambda p: F.element_at(F.col("_t"), p)), " "
        ).alias(text_col),
    )


def soft_dedup_weights(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """SoftDeDup — reweight instead of remove (He et al. 2024,
    "SoftDedup: an Efficient Data Reweighting Method for Speeding Up
    Language Model Pretraining", arXiv:2407.06654): hard dedup throws
    away every non-canonical duplicate; the soft variant keeps all
    copies but downweights each near-duplicate COMPONENT's members by
    its size, so the component contributes ~one document's worth of
    gradient. Returns per document: ``(id, group_id, group_size,
    weight)`` with ``weight = 1000000 DIV group_size`` (per-million
    integer — exact BIGINT arithmetic keeps the frame hash-gateable and
    the weights directly usable by ``priority_sample``'s integer
    ranking); singletons (docs in no pair) form their own group with
    weight 1000000.

    Shape at scale: rides ``duplicate_groups``'s label propagation
    (component-sized frames, hot-bucket-capped pairs); one doc-keyed
    left join + one group-sized count aggregate. Nothing
    corpus-quadratic; the corpus scans once."""
    groups = duplicate_groups(pairs)
    if id_col != "doc_id":
        groups = groups.withColumnRenamed("doc_id", id_col)
    base = docs.select(F.col(id_col)).join(groups, id_col, "left")
    base = base.withColumn(
        "group_id", F.coalesce(F.col("group_id"), F.col(id_col))
    )
    sizes = base.groupBy("group_id").agg(
        F.count(F.lit(1)).cast("long").alias("group_size")
    )
    return base.join(sizes, "group_id").select(
        F.col(id_col),
        "group_id",
        "group_size",
        F.expr("1000000L DIV group_size").alias("weight"),
    )
