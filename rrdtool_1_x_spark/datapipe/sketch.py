"""Distributed sketches — sublinear-state summaries for 100 TB scans.

HyperLogLog here is formulated so the ENTIRE sketch is cross-engine
bit-exact: hashes come from md5 (content-addressed, engine-portable),
registers are integer maxima (order-free under any partitioning), and the
harmonic sum is computed as an exact dyadic rational — ``sum(2^-rho)``
becomes ``(V * 2^K + sum(2^(K - rho))) / 2^K`` over integers, so no float
accumulation order can perturb the estimate. Only the final
multiply/divide (and the linear-counting ``ln``) are floating point, each
a single correctly-rounded operation on exactly-reproducible inputs.

This is the estimator of Flajolet/Fusy/Gandouet/Meunier (AofA 2007) in
its classic 32-bit form with linear-counting small-range correction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_P = 9                      # 2^9 = 512 registers
_M = 1 << _P
_WBITS = 32 - _P            # bits feeding the rho (leading-zero) count


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def _h32(col: Column, seed: str = "hll") -> Column:
    """First 8 hex digits of md5(seed:value) as a uint32 — the portable
    hash every gate's oracle rebuilds."""
    h = F.md5(F.concat(F.lit(seed + ":"), col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def hll_register_cols(value: Column, seed: str = "hll") -> tuple[Column, Column]:
    """(bucket, rho) for one value: bucket = high ``_P`` hash bits; rho =
    1 + leading zeros of the remaining ``_WBITS``-bit word (capped at
    ``_WBITS + 1`` for the all-zero word). ``floor(log2(w))`` is computed
    exactly as ``length(bin(w)) - 1`` — both engines have bin() — so no
    float log touches the register path."""
    h = _h32(value, seed)
    bucket = F.shiftright(h, _WBITS)
    w = h % F.lit(1 << _WBITS)
    rho = F.when(w > 0, F.lit(_WBITS) - (F.length(F.bin(w)) - 1)).otherwise(
        F.lit(_WBITS + 1)
    )
    return bucket.cast("int").alias("bucket"), rho.cast("int").alias("rho")


def _hll_est_col() -> Column:
    """The HLL estimate as a Column over register-summary columns
    ``nb`` (non-empty registers), ``K`` (max rho) and ``S`` (the dyadic
    numerator ``sum(2^(K - rho))``) — factored out so the branch logic is
    unit-testable on crafted register frames (the large-range branch
    needs >1e8 distincts to trigger from real data).

    Branches of the classic 32-bit estimator:
    * linear counting when E <= 2.5m and empty registers exist;
    * large-range correction ``-2^32 ln(1 - E/2^32)`` for
      2^32/30 < E < 2^32 (hash-collision undercount);
    * E >= 2^32 (saturated sketch — outside the 32-bit estimator's
      domain) falls back to the raw value instead of ln() of a
      non-positive argument (NULL on Spark, an error on DuckDB).
    """
    m = float(_M)
    V = F.lit(_M) - F.col("nb")
    # 2^K as an exact integer shift (K <= 25), not pow() — float pow is
    # not guaranteed correctly rounded everywhere
    pow2k = F.expr("shiftleft(1L, K)").cast("double")
    e_raw = (
        F.lit(_alpha(_M) * m * m)
        * pow2k
        / (V.cast("double") * pow2k + F.col("S").cast("double"))
    )
    return (
        F.when(
            (e_raw <= 2.5 * _M) & (V > 0),
            F.lit(m) * F.log(F.lit(m) / V.cast("double")),
        )
        .when(
            (e_raw > F.lit(2.0**32 / 30.0)) & (e_raw < F.lit(2.0**32)),
            F.lit(-(2.0**32))
            * F.log(F.lit(1.0) - e_raw / F.lit(2.0**32)),
        )
        .otherwise(e_raw)
    )


def _estimate_from_registers(regs: DataFrame, groups: list[str]) -> DataFrame:
    """(*groups, hll_est) from a (groups..., bucket, mr) register frame —
    the estimate tail shared by the inline ``hll_distinct`` and the
    persisted-register ``hll_index_distinct``."""
    w = Window.partitionBy(*groups) if groups else Window.partitionBy()
    # exact dyadic harmonic sum: scale by 2^K (K = the group's max rho,
    # <= 24 at p=9/32-bit hashes, so every shifted term fits a long)
    regs = regs.withColumn("K", F.max("mr").over(w))
    per = regs.groupBy(*groups).agg(
        F.first("K").alias("K"),
        F.count("*").alias("nb"),
        # pyspark's shiftleft() helper takes a literal bit count; the SQL
        # form accepts a column expression
        F.sum(F.expr("shiftleft(1L, K - mr)")).alias("S"),
    )
    return per.select(*groups, F.round(_hll_est_col(), 4).alias("hll_est"))


def hll_distinct(
    df: DataFrame,
    value: Column,
    group_cols: list[str] | None = None,
    seed: str = "hll",
    exact: bool = False,
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) [GROUP BY group_cols] via a
    512-register HyperLogLog. Returns one row per group:
    ``(*group_cols, hll_est)`` (+ ``n_exact`` and ``rel_err`` with
    ``exact=True``, for recall-style audits).

    Shape at scale: duplicates collapse in the FIRST map-side combine
    (max per (group, bucket) register) — the shuffle carries at most 512
    integer rows per group no matter how many billions of values feed it.
    That register frame is the whole reduction state; the estimate math
    runs on it alone. This is the operator that replaces an exact
    count-distinct's full shuffle of every distinct value.
    """
    groups = group_cols or []
    bucket, rho = hll_register_cols(value, seed)
    regs = (
        df.select(*groups, bucket, rho)
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("mr"))
    )
    out = _estimate_from_registers(regs, groups)
    if exact:
        ex = df.select(*groups, value.alias("_v")).groupBy(*groups).agg(
            F.countDistinct("_v").alias("n_exact")
        )
        join_on = groups if groups else None
        if join_on:
            out = out.join(ex, join_on)
        else:
            out = out.crossJoin(ex)
        out = out.select(
            *groups,
            "n_exact",
            "hll_est",
            F.round(
                F.abs(F.col("hll_est") - F.col("n_exact"))
                / F.col("n_exact").cast("double"),
                4,
            ).alias("rel_err"),
        )
    return out


def cms_table(
    df: DataFrame,
    value: Column,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
    weight: Column | None = None,
) -> DataFrame:
    """Count-Min sketch table (Cormode/Muthukrishnan 2005): ``depth``
    independent md5 hash rows of ``width`` integer counters. Returns
    ``(d, bucket, cnt)`` — ``depth * width`` rows of exact integer sums,
    so the sketch is order-free and engine-exact (the classic CM
    guarantee ``est >= true`` with overshoot <= 2N/width at probability
    1 - 2^-depth holds verbatim).

    Shape at scale: one explode by ``depth`` (constant) feeding a
    map-side-combinable groupBy on (d, bucket) — the reduction state is
    ``depth * width`` integers no matter the corpus size; point queries
    and heavy-hitter audits then run against this tiny table.
    """
    w = weight if weight is not None else F.lit(1).cast("long")
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (_h32(value, f"{seed}{d}") % width).cast("int").alias(
                    "bucket"
                ),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("_r"), w.alias("_w"))
        .select("_r.d", "_r.bucket", "_w")
        .groupBy("d", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str = "value",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the CM table for each candidate value: the estimate is
    the MIN of its ``depth`` counters (missing counter = 0). Returns the
    candidates frame plus ``cms_est``. The candidate frame is
    query-sized and must be DISTINCT on its columns (rows are grouped
    back by all of them — duplicates would merge); the join keys it
    against the depth*width sketch under collision-proof column names."""
    rows = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (_h32(F.col(value_col), f"{seed}{d}") % width)
                .cast("int")
                .alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    sk = sketch.select(
        F.col("d").alias("_cms_d"),
        F.col("bucket").alias("_cms_bucket"),
        F.col("cnt").alias("_cms_cnt"),
    )
    keyed = candidates.select("*", F.explode(rows).alias("_r")).select(
        "*",
        F.col("_r.d").alias("_cms_d"),
        F.col("_r.bucket").alias("_cms_bucket"),
    )
    return (
        keyed.join(F.broadcast(sk), ["_cms_d", "_cms_bucket"], "left")
        .groupBy(*candidates.columns)
        .agg(
            F.min(F.coalesce(F.col("_cms_cnt"), F.lit(0))).alias("cms_est")
        )
    )


def bloom_bits(
    df: DataFrame,
    value: Column,
    m_bits: int = 1 << 16,
    k: int = 4,
    seed: str = "bloom",
) -> list[int]:
    """Build a Bloom-filter bitset over the (query-side-sized) value set:
    ``k`` md5 hash positions per value, packed into ``m_bits/64`` signed
    longs ready to inline as an array literal. Deterministic — the same
    values produce the same bits on every engine/run.

    The positions collect is one distinct aggregate over the SMALL side
    (a benchmark / blocklist / vocabulary); the corpus never sees this
    function — it sees only the broadcast-literal probe column.
    """
    pos = F.explode(
        F.array(
            *[
                (_h32(value, f"{seed}{i}") % m_bits).cast("long")
                for i in range(k)
            ]
        )
    )
    rows = df.select(pos.alias("p")).distinct().collect()
    words = [0] * (m_bits // 64)
    for r in rows:
        p = int(r["p"])
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_probe(
    value_sql: str,
    words: list[int],
    m_bits: int = 1 << 16,
    k: int = 4,
    seed: str = "bloom",
) -> Column:
    """Boolean membership-probe Column: true iff all ``k`` bits are set.
    ``value_sql`` is the SQL expression of the probed column; the whole
    test is ONE expr string over the bitset array literal (the PQ
    construction lesson: literals inline as one parsed expression, never
    thousands of Column-API nodes). No false negatives; false-positive
    rate ~ (1 - e^(-kn/m))^k.
    """
    lit = "array(" + ",".join(f"{w}L" for w in words) + ")"
    pos = ",".join(
        "CAST(conv(substring(md5(CAST(concat('"
        + f"{seed}{i}:', {value_sql}) AS BINARY)), 1, 8), 16, 10) AS BIGINT)"
        + f" % {m_bits}"
        for i in range(k)
    )
    return F.expr(
        f"forall(array({pos}), p -> ((shiftright(element_at({lit},"
        " CAST(shiftright(p, 6) AS INT) + 1), CAST(p % 64 AS INT)) & 1)"
        " = 1))"
    )


# ---------------------------------------------------------------- KMV synopsis

_KMV_BITS = 60  # 15 hex digits of md5 -> uint60, exact in BIGINT both engines


def _h60(col: Column, seed: str = "kmv") -> Column:
    """First 15 hex digits of md5(seed:value) as a uint60 — same portable
    hash convention as the HLL tier, wide enough that k-th-smallest ties
    are collision-improbable and every value fits BIGINT exactly."""
    h = F.md5(F.concat(F.lit(seed + ":"), col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def kmv_synopsis(
    df: DataFrame,
    value: Column,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: str = "kmv",
    salt_buckets: int = 64,
) -> DataFrame:
    """K-Minimum-Values distinct-value synopsis (Beyer et al., SIGMOD
    2007): per group, the ``k`` smallest distinct 60-bit hashes of
    ``value``. Unlike HyperLogLog the synopsis supports MULTISET algebra
    — union (k smallest of the merged synopses) and, critically,
    intersection (the rho estimator in :func:`kmv_source_overlap`) —
    which is why engines keep both sketches.

    Returns long-format (group_cols..., h) rows, <= k per group — the
    synopsis IS a tiny frame, joinable and unionable with other runs.

    Shape at scale: duplicates collapse in the first map-side combine
    (groupBy group+hash), then the k-smallest selection runs as a
    two-level tournament — k per (group, salt-of-hash) partition first,
    k of those <= salt_buckets*k survivors second — so no single sort
    ever sees more than 1/salt_buckets of a group's distinct values (the
    same bounded-window rule as the pack_sequences prefix-sum fix; a
    plain per-group window would sort every distinct value of a hot
    group in one task)."""
    groups = group_cols or []
    h = _h60(value, seed)
    distinct = (
        df.select(*groups, h.alias("h")).groupBy(*groups, "h").agg(F.lit(1))
    ).select(*groups, "h")
    salted = distinct.withColumn("_salt", F.col("h") % salt_buckets)
    w1 = Window.partitionBy(*groups, "_salt").orderBy("h")
    lvl1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*groups).orderBy("h")
    return (
        lvl1.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _kmv_est(k: int, n_col: str = "n_syn", hk_col: str = "_hk") -> Column:
    """(k-1) * 2^60 / h_k rounded to BIGINT, or the exact synopsis size
    when the group never filled the synopsis."""
    return F.when(F.col(n_col) < k, F.col(n_col).cast("long")).otherwise(
        F.round(
            F.lit(float(k - 1))
            * (F.lit(float(1 << _KMV_BITS)) / F.col(hk_col).cast("double"))
        ).cast("long")
    )


def kmv_distinct(
    df: DataFrame,
    value: Column,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: str = "kmv",
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) [GROUP BY group_cols] from the
    KMV synopsis: est = (k-1) * 2^60 / h_(k) (unbiased, Beyer et al.
    eq. 2) when the group carries >= k distinct values, and the EXACT
    synopsis size below that (the synopsis holds every value — no
    estimation error to pay). Same float discipline as the HLL tier:
    the inputs are exact integers ((k-1) and 2^60 are exactly
    representable doubles; h_k converts once), and the estimate is one
    correctly-rounded division + multiplication + round — bit-portable
    across engines.

    Returns (*group_cols, n_syn, kmv_est)."""
    syn = kmv_synopsis(df, value, group_cols, k, seed)
    groups = group_cols or []
    agg = syn.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_syn"), F.max("h").alias("_hk")
    )
    return agg.select(*groups, "n_syn", _kmv_est(k).alias("kmv_est"))


def kmv_source_overlap(
    df: DataFrame,
    value: Column,
    group_col: str,
    k: int = 128,
    seed: str = "kmv",
) -> DataFrame:
    """Pairwise distinct-value overlap between groups, estimated ENTIRELY
    from the per-group KMV synopses (Beyer et al. §4: the rho estimator):
    for groups a, b take L = the k smallest hashes of synopsis(a) ∪
    synopsis(b); K_v = max(L); then

        union_est  = round((k-1) * 2^60 / K_v)  (or exact when |union| < k)
        rho        = |{h in L : h in a AND b}|
        inter_est  = rho * union_est DIV k
        jaccard    = rho / k

    The full pair grid costs |groups|^2 * k synopsis rows — constant in
    corpus size; this is the scalable companion of ``source_overlap``'s
    exact shingle-join matrix (which re-scans the corpus per audit).
    Returns (src_a, src_b, union_est, inter_est, jaccard_est) for
    src_a < src_b."""
    # the synopsis is |groups| x k rows and feeds both pair-grid sides
    # (plus their distinct group lists) — materialize it once so the
    # corpus-sized hash + bottom-k pass behind it runs once, not four
    # times
    syn = kmv_synopsis(df, value, [group_col], k, seed).select(
        F.col(group_col).alias("_g"), "h"
    ).localCheckpoint(eager=True)
    a = syn.select(F.col("_g").alias("src_a"), F.col("h"))
    b = syn.select(F.col("_g").alias("src_b"), F.col("h"))
    # union of the two synopses, tagged with membership on both sides
    both = (
        a.crossJoin(b.select("src_b").distinct())
        .filter(F.col("src_a") < F.col("src_b"))
        .select("src_a", "src_b", "h", F.lit(1).alias("_in_a"), F.lit(0).alias("_in_b"))
        .unionByName(
            b.crossJoin(a.select("src_a").distinct())
            .filter(F.col("src_a") < F.col("src_b"))
            .select("src_a", "src_b", "h", F.lit(0).alias("_in_a"), F.lit(1).alias("_in_b"))
        )
    )
    merged = both.groupBy("src_a", "src_b", "h").agg(
        F.max("_in_a").alias("ia"), F.max("_in_b").alias("ib")
    )
    wk = Window.partitionBy("src_a", "src_b").orderBy("h")
    top = merged.withColumn("_rn", F.row_number().over(wk)).filter(
        F.col("_rn") <= k
    )
    agg = top.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_syn"),
        F.max("h").alias("_hk"),
        F.sum(F.col("ia") * F.col("ib")).alias("_rho"),
    )
    return agg.select(
        "src_a",
        "src_b",
        _kmv_est(k).alias("union_est"),
        F.col("_rho").cast("long").alias("_rho"),
    ).select(
        "src_a",
        "src_b",
        "union_est",
        F.expr(f"CAST((_rho * union_est) DIV {k} AS BIGINT)").alias(
            "inter_est"
        ),
        F.round(F.col("_rho").cast("double") / k, 6).alias("jaccard_est"),
    )


def write_kmv_synopsis(
    df: DataFrame,
    path: str,
    value: Column,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: str = "kmv",
) -> None:
    """Persist the per-group KMV synopses — the incremental-maintenance
    form of the distinct sketch: the stored state is <= k hashes per
    group (KB-scale however large the corpus), and an append needs only
    the NEW batch's synopsis plus a synopsis-sized merge, never a corpus
    rescan. Plain parquet overwrite here; production writes go through a
    transactional commit (see sources.store's manifest-snapshot
    pattern)."""
    kmv_synopsis(df, value, group_cols, k, seed).write.mode(
        "overwrite"
    ).parquet(path)


def append_kmv_synopsis(
    batch: DataFrame,
    path: str,
    value: Column,
    group_cols: list[str] | None = None,
    k: int = 128,
    seed: str = "kmv",
) -> None:
    """Merge a new batch into the stored synopses: synopsis(batch), union
    with the stored hashes, keep the k smallest distinct per group — by
    the KMV merge theorem (Beyer et al. §3.2) the result EQUALS the
    synopsis of the full concatenated corpus, so index-then-append is
    exactly the one-shot build. State in, state out: both sides of the
    merge are synopsis-sized."""
    spark = batch.sparkSession
    groups = group_cols or []
    new = kmv_synopsis(batch, value, group_cols, k, seed)
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(new)
        .groupBy(*groups, "h")
        .agg(F.lit(1))
        .select(*groups, "h")
    )
    w = Window.partitionBy(*groups).orderBy("h")
    out = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .localCheckpoint(eager=True)  # sever lineage before the overwrite
    )
    out.write.mode("overwrite").parquet(path)


def kmv_index_distinct(spark, path: str, k: int = 128) -> DataFrame:
    """Distinct-count estimates straight off the stored synopses — no
    corpus access at all (the read is the whole query cost). Same
    estimator as :func:`kmv_distinct`."""
    syn = spark.read.parquet(path)
    groups = [c for c in syn.columns if c != "h"]
    agg = syn.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_syn"), F.max("h").alias("_hk")
    )
    return agg.select(*groups, "n_syn", _kmv_est(k).alias("kmv_est"))


def _hll_registers(
    df: DataFrame, value: Column, groups: list[str], seed: str
) -> DataFrame:
    bucket, rho = hll_register_cols(value, seed)
    return (
        df.select(*groups, bucket, rho)
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("mr"))
    )


def write_hll_registers(
    df: DataFrame,
    path: str,
    value: Column,
    group_cols: list[str] | None = None,
    seed: str = "hll",
) -> None:
    """Persist the HLL register frame (<= 512 integer rows per group) —
    the incremental form of the distinct sketch: appends merge registers
    by max, which is idempotent and associative, so ANY append order
    (including replayed batches) converges to the one-shot registers.
    Plain parquet overwrite here; production writes go through a
    transactional commit (see sources.store's manifest-snapshot
    pattern)."""
    _hll_registers(df, value, group_cols or [], seed).write.mode(
        "overwrite"
    ).parquet(path)


def append_hll_registers(
    batch: DataFrame,
    path: str,
    value: Column,
    group_cols: list[str] | None = None,
    seed: str = "hll",
) -> None:
    """Fold a new batch into the stored registers: register(batch), union
    with the stored frame, max per (group, bucket). Both merge sides are
    register-sized; the batch scan is the only corpus-touching work."""
    spark = batch.sparkSession
    groups = group_cols or []
    new = _hll_registers(batch, value, groups, seed)
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(new)
        .groupBy(*groups, "bucket")
        .agg(F.max("mr").alias("mr"))
        .localCheckpoint(eager=True)  # sever lineage before the overwrite
    )
    merged.write.mode("overwrite").parquet(path)


def hll_index_distinct(spark, path: str) -> DataFrame:
    """Distinct-count estimates straight off the stored registers — no
    corpus access (same contract as ``kmv_index_distinct``)."""
    regs = spark.read.parquet(path)
    groups = [c for c in regs.columns if c not in ("bucket", "mr")]
    return _estimate_from_registers(regs, groups)


def write_cms_table(
    df: DataFrame,
    path: str,
    value: Column,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
    weight: Column | None = None,
) -> None:
    """Persist the CM counter table (depth x width integers). Counters
    are exact integer SUMS, so appends merge additively — index-then-
    append equals the one-shot sketch for any batch split (this is the
    linearity the CM guarantee is built on). Completes the persisted
    family: KMV merges by k-smallest-of-union, HLL by register max, CM
    by counter sum."""
    cms_table(df, value, depth, width, seed, weight).write.mode(
        "overwrite"
    ).parquet(path)


def append_cms_table(
    batch: DataFrame,
    path: str,
    value: Column,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
    weight: Column | None = None,
) -> None:
    """Add a new batch's counters into the stored table (sum per
    (d, bucket)); both merge sides are sketch-sized."""
    spark = batch.sparkSession
    new = cms_table(batch, value, depth, width, seed, weight)
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(new)
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)  # sever lineage before the overwrite
    )
    merged.write.mode("overwrite").parquet(path)


def cms_index_estimate(
    spark,
    path: str,
    candidates: DataFrame,
    value_col: str = "value",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms",
) -> DataFrame:
    """Point-query the STORED counter table — same contract as
    ``cms_estimate`` with the sketch read from disk."""
    return cms_estimate(
        spark.read.parquet(path), candidates, value_col, depth, width, seed
    )


# ---------------------------------------------------------------- quantiles


def logq_bucket(value: Column) -> Column:
    """Log-histogram bucket index for a non-negative integer value — the
    binary-bucket member of the relative-error quantile-sketch family
    (DDSketch, Masson/Lee/Law VLDB 2019; their gamma-log buckets made
    ENGINE-PORTABLE by replacing float log with integer bit arithmetic):

    - v <= 0      -> bucket 0 (documented floor for count-like values)
    - 0 < v < 32  -> bucket v (exact: one bucket per value)
    - v >= 32     -> with e = floor(log2 v) and s = e - 4, bucket =
      16*s + (v >> s): the top 5 bits of v, so 16 sub-buckets per
      octave and relative bucket width 1/16 (6.25%).

    Buckets are contiguous and monotone in v, so rank selection over
    cumulative counts is order-exact. ``e`` comes from the length of
    the binary string (length(bin(v)) - 1), never a float log whose
    last-ulp behaviour at powers of two differs across engines."""
    v = value.cast("long")
    e = F.length(F.bin(v)) - F.lit(1)
    s = e - F.lit(4)
    return (
        F.when(v <= 0, F.lit(0))
        .when(v < 32, v)
        .otherwise(
            F.lit(16) * s
            + F.call_function("shiftright", v, s.cast("int"))
        )
        .cast("long")
    )


def logq_rep(bucket: Column) -> Column:
    """The bucket's representative value — its exact LOWER edge
    (deterministic convention; estimates are therefore one-sided: at
    most 1/16 relative below the true quantile, never above)."""
    b = bucket.cast("long")
    s = (b / 16).cast("long") - F.lit(1)  # b DIV 16 - 1 (b >= 0)
    m = b - s * 16
    return F.when(b < 32, b).otherwise(
        F.call_function("shiftleft", m, s.cast("int"))
    ).cast("long")


def logq_sketch(
    df: DataFrame,
    value: Column,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Build the quantile sketch: (groups..., bucket, cnt). At most
    ~16 * 60 + 32 buckets per group regardless of corpus size; counts
    are exact integer sums, so the merge law is bucket-wise ADDITION —
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly, the same
    closure the KMV / HLL / CMS tier pins (this completes the family:
    distinct, frequency, and now quantiles). One map-side-combinable
    aggregate; the sketch is broadcast-sized."""
    groups = list(group_cols or [])
    return (
        df.select(*groups, logq_bucket(value).alias("bucket"))
        .groupBy(*groups, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def logq_quantiles(
    sketch: DataFrame,
    qs: list[tuple[int, int]] = ((50, 100), (90, 100), (99, 100)),
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates off the sketch alone: for q = num/den the
    selected bucket is the first whose cumulative count reaches
    ceil(q * n) (the lower-rank convention, computed as
    (n*num + den - 1) DIV den — integer-exact, no float rank). Returns
    one row per group: n plus p<num> columns holding the representative
    (lower-edge) values. Window over the bucket-sized sketch, never the
    corpus."""
    groups = list(group_cols or [])
    w = (
        Window.partitionBy(*groups)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.select(
        *groups,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("_cum"),
        F.sum("cnt").over(
            Window.partitionBy(*groups).orderBy("bucket").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    aggs = [F.max("_n").cast("long").alias("n")]
    for num, den in qs:
        target = F.expr(f"(_n * {num} + {den} - 1) DIV {den}")
        aggs.append(
            F.min(
                F.when(F.col("_cum") >= target, F.col("bucket"))
            ).alias(f"_b{num}")
        )
    picked = cum.groupBy(*groups).agg(*aggs)
    out_cols = [*groups, "n"] + [
        logq_rep(F.col(f"_b{num}")).alias(f"p{num}") for num, _ in qs
    ]
    return picked.select(*out_cols)


def write_logq_sketch(
    df: DataFrame,
    path: str,
    value: Column,
    group_cols: list[str] | None = None,
) -> None:
    """Persist the quantile sketch. Appends merge by bucket-wise count
    ADDITION (exact linearity, like the CM table) — index-then-append
    equals the one-shot sketch for any batch split."""
    logq_sketch(df, value, group_cols).write.mode("overwrite").parquet(path)


def append_logq_sketch(
    batch: DataFrame,
    path: str,
    value: Column,
    group_cols: list[str] | None = None,
) -> None:
    """Fold a batch into the stored sketch (sum per (group, bucket));
    both merge sides are sketch-sized."""
    spark = batch.sparkSession
    groups = list(group_cols or [])
    new = logq_sketch(batch, value, groups)
    old = spark.read.parquet(path)
    merged = (
        old.unionByName(new)
        .groupBy(*groups, "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .localCheckpoint(eager=True)  # sever lineage before the overwrite
    )
    merged.write.mode("overwrite").parquet(path)


def logq_index_quantiles(
    spark,
    path: str,
    qs: list[tuple[int, int]] = ((50, 100), (90, 100), (99, 100)),
) -> DataFrame:
    """Quantiles straight off the STORED sketch — no corpus access
    (same contract as the other *_index_* readers)."""
    sk = spark.read.parquet(path)
    groups = [c for c in sk.columns if c not in ("bucket", "cnt")]
    return logq_quantiles(sk, qs, groups)
