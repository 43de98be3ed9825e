"""Deterministic sampling, splitting, and corpus-composition operators.

Training-data pipelines need reproducible sampling: the same corpus must
produce the same train/val split on every run, on any engine, at any
parallelism. Everything here keys off md5(id) — content-addressed, order-
independent, partition-independent — never off ``rand()`` (non-reproducible
across retries/speculative tasks) or ``monotonically_increasing_id``
(partition-layout dependent).

Scale notes:
* ``hash_split`` / ``hash_sample`` are map-only: no shuffle, no state —
  a filter pushed onto the scan. The split decision is a pure function of
  the id, so re-running on an appended corpus never reassigns old rows
  (critical: a train document must not silently move into val after an
  append).
* ``stratified_sample`` shuffles once on the strata key (the window rank
  over the hash order is map-side combinable up to the per-stratum top-n).
* ``token_budget_sample`` is the "data mixing" primitive: fill a per-group
  token quota in deterministic hash order — one shuffle on the group key,
  running totals via a window (no driver-side loop, no collect).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_u01(id_col: Column, seed: str = "split") -> Column:
    """Deterministic uniform-[0,1) draw from an id: the first 8 hex digits
    of md5(seed || ':' || id) scaled by 2^-32.

    Portable: any engine with md5 + hex parsing reproduces it exactly
    (the DuckDB oracles rebuild it nibble-by-nibble)."""
    h = F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(2**32))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Assign every row to a named split with the given weights.

    Returns the input plus a ``split`` column. Deterministic in the id
    alone: appends never reassign existing rows, and every engine computes
    the same assignment. Map-only — the assignment is a scan-time
    expression, no shuffle (.explain shows no Exchange).
    """
    total = sum(weights.values())
    u = hash_u01(F.col(id_col), seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        cond = u < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows with u01(id) < p.

    Unlike ``df.sample`` this is stable across runs, engines, retries and
    repartitioning, and composable: ``hash_sample(df, 0.1, seed=s)`` is a
    subset of ``hash_sample(df, 0.2, seed=s)`` (nested samples for scaling-
    law curves)."""
    return df.filter(hash_u01(F.col(id_col), seed) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: str = "strat",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum is
    smaller), chosen in deterministic hash order.

    One shuffle on the strata key; the rank is a top-n window (map-side
    partial sort at scale). Hash order makes the selection a uniform draw
    while staying reproducible."""
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")),
        F.col(id_col),
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def _global_rank(df: DataFrame, order_cols: list[str], id_col: str) -> DataFrame:
    """Exact DISTRIBUTED global 0-based rank by (order_cols..., id) —
    the two-level prefix-count shared by ``shard_epoch`` and
    ``balanced_shards`` (and, in weighted form, ``pack_sequences``):
    range-partition on the sort key, row_number inside each partition
    in parallel, add the broadcast predecessor totals. Never a
    single-partition window over the corpus. The lazy localCheckpoint
    pins ONE materialization so the totals and the rows they prefix
    agree on partition boundaries. Returns the input columns plus
    ``_rank0``."""
    local_w = Window.partitionBy("_pid").orderBy(
        *[F.asc(c) for c in order_cols], F.asc(id_col)
    )
    local = (
        df.repartitionByRange(*order_cols, id_col)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_loc", F.row_number().over(local_w) - 1)
        .localCheckpoint(eager=False)
    )
    totals = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_tot"))
    prefix = (
        totals.alias("a")
        .join(
            totals.select(
                F.col("_pid").alias("_bpid"), F.col("_tot").alias("_btot")
            ),
            F.col("_bpid") < F.col("a._pid"),
            "left",
        )
        .groupBy(F.col("a._pid").alias("_pid"))
        .agg(F.coalesce(F.sum("_btot"), F.lit(0)).alias("_pre"))
    )
    return (
        local.join(F.broadcast(prefix), "_pid")
        .withColumn(
            "_rank0", (F.col("_pre") + F.col("_loc")).cast("long")
        )
        .drop("_pid", "_loc", "_pre")
    )


def balanced_shards(
    df: DataFrame,
    num_shards: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weight-balanced shard assignment — the training-shard packing
    step (equal-token shards so no data-parallel worker starves): rank
    all rows by (weight DESC, id ASC) and snake-deal into
    ``num_shards`` — rank pass p fills every shard once, direction
    alternating, the closed-form counterpart of first-fit-decreasing
    (same longest-processing-time family, Graham 1969; identical
    balance law to ``opq_dim_allocation``'s variance deal). Guarantee
    (telescoping over passes — each pass deals one row per shard from a
    descending run): max shard total − min shard total <=
    w_max − w_min, i.e. absolute imbalance is bounded by ONE document,
    with no sequential state; true LPT tightens the constant but needs
    a running argmin no closed form gives.

    Scale: the global (weight, id) rank is the SAME exact two-level
    distributed prefix-count as ``shard_epoch`` / ``pack_sequences`` —
    range-partition on the sort key, local row_number, broadcast
    predecessor totals; never a single-partition window. Returns
    ``(id, weight, shard)``."""
    m = int(num_shards)
    base = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("_w"),
        (-F.col(weight_col).cast("long")).alias("_nw"),
    )
    ranked = _global_rank(base, ["_nw"], id_col)
    return ranked.select(
        F.col(id_col),
        F.col("_w").alias("weight"),
        F.expr(
            f"CAST(CASE WHEN (_rank0 DIV {m}) % 2 = 0 THEN _rank0 % {m}"
            f" ELSE {m - 1} - (_rank0 % {m}) END AS BIGINT)"
        ).alias("shard"),
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    strata_cols: list[str] | None = None,
    id_col: str = "doc_id",
    seed: str = "prio",
) -> DataFrame:
    """Weight-proportional bottom-k sampling — priority sampling
    (Duffield, Lund & Thorup, "Priority Sampling for Estimation of
    Arbitrary Subset Sums", JACM 2007): each row draws priority
    ``q = w / u`` from a uniform ``u``; the ``k`` highest priorities are
    the sample, so heavy rows (long documents, hot domains) enter with
    probability ~proportional to weight while every row keeps a nonzero
    chance — the length-biased draw a token-budget corpus mix needs
    (``token_budget_sample`` CUTS at a budget; this SAMPLES toward one).

    Engine-portable determinism: ``u`` is the 60-bit md5 draw, and the
    rank key is the FLOOR-quantized inverse priority
    ``(h + 1) DIV w`` ascending (h+1 so a zero hash cannot win every
    draw), ties broken by (weight DESC, h, id). Floor quantization only
    merges rows whose true priorities agree to integer precision of
    h/w — in particular every row with ``w >= h+1`` quantizes to
    inv_prio 0 — and the weight-DESC tie-break keeps the selection
    *within* a quantization bucket ordered the way Duffield et al.'s
    exact priorities would lean (heavier first) instead of uniformly by
    hash. Every comparison stays exact BIGINT (a float u would make
    cross-engine ranking drift in the last ulp). Rows with weight <= 0
    never enter the sample (documented: weights are counts).

    One shuffle on the strata key (global sample = one deterministic
    stratum), rank via top-k window — map-side partial sort at scale,
    same shape as ``stratified_sample``. Returns the sampled rows plus
    ``prio_rank`` (1..k per stratum)."""
    strata = list(strata_cols or [])
    # 60-bit hash and the floor division BOTH stay in BIGINT expressions:
    # a double intermediate would lose exactness above 2^53 and drift
    # from the oracle's integer `//`
    h_sql = (
        "CAST(conv(substring(md5(CAST(concat("
        f"'{seed}:', CAST({id_col} AS STRING)) AS BINARY)), 1, 15),"
        " 16, 10) AS BIGINT)"
    )
    h = F.expr(h_sql)
    inv_prio = F.expr(
        f"({h_sql} + 1L) DIV CAST({weight_col} AS BIGINT)"
    )
    base = df.filter(F.col(weight_col).cast("long") > 0)
    wdesc = F.col(weight_col).cast("long").desc()
    order = [inv_prio.asc(), wdesc, h.asc(), F.col(id_col).asc()]
    if strata:
        w = Window.partitionBy(*strata).orderBy(*order)
        return (
            base.withColumn("prio_rank", F.row_number().over(w))
            .filter(F.col("prio_rank") <= k)
        )
    # global sample: orderBy().limit() = TakeOrdered (per-partition
    # top-k, k-row driver merge) — an unpartitioned rank window would
    # funnel the whole corpus through one task (the kmeans-init lesson);
    # the rank re-derives on the K-ROW survivor frame
    top = base.orderBy(*order).limit(int(k))
    wk = Window.orderBy(*order)
    return top.withColumn("prio_rank", F.row_number().over(wk))


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    token_col: str = "token_cnt",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Data-mixing primitive: fill each group's token budget in hash order.

    ``budgets`` maps group value → max tokens. Documents are taken in
    deterministic hash order until the group's RUNNING token total would
    exceed the budget; a document is kept iff the total *through it* fits.
    Groups absent from ``budgets`` are dropped. Output adds ``tokens_before``
    (tokens taken by earlier kept-or-not rows — the running total excluding
    this row), which downstream mixers use for curriculum ordering.

    One shuffle on the group key; the running sum is a window — no driver
    loop, no collect, scales to any number of groups.
    """
    order = [
        F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")).cast("binary")),
        F.col(id_col),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    budget_map = F.create_map(
        *[x for k, v in budgets.items() for x in (F.lit(k), F.lit(int(v)))]
    )
    running = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_budget", budget_map[F.col(group_col)])
        .filter(F.col("_budget").isNotNull())
        .withColumn("_run", running)
        .filter(F.col("_run") <= F.col("_budget"))
        .withColumn("tokens_before", (F.col("_run") - F.col(token_col)).cast("long"))
        .drop("_budget", "_run")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    eod_tokens: int = 1,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing — the GPT-style pretraining
    layout: documents are laid end-to-end in deterministic ``id_col``
    order, each followed by ``eod_tokens`` separator tokens, and the
    token stream is cut into fixed ``seq_len`` windows. Emits one row per
    (sequence, document) overlap — the index a sequence writer assembles
    training examples from:

        seq_idx      which output sequence this piece lands in
        doc_id       the source document
        n_tokens     the document's token count
        tok_from     first document token in this sequence (inclusive)
        tok_to       last document token in this sequence (EXCLUSIVE)
        pos_in_seq   where tok_from sits inside the sequence

    Token counts come from ``token_col`` when given, else whitespace
    tokenization of ``text_col`` (the shared textstats convention).
    Zero-token documents occupy only their separator and emit no rows.

    Scale: the stream offset is an exact DISTRIBUTED prefix-sum — never a
    single-partition global window. The default (``shard_col=None``) keeps
    exact global stream identity via the classic two-level scan:
    range-partition by ``doc_id``, cumsum inside each partition in
    parallel, then add each partition's broadcast predecessor total
    (partition ids of a range exchange ascend with the sort key, so
    ``prefix(pid) + local_cumsum`` equals the global cumsum bit-for-bit).
    ``shard_col`` instead packs each shard independently (offsets restart
    per shard). The per-sequence explode is ``F.sequence`` — pure JVM, no
    UDF.
    """
    if token_col is None:
        toks = F.when(F.trim(F.col(text_col)) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
        )
    else:
        toks = F.col(token_col)
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.cast("long").alias("n_tokens"),
        *([F.col(shard_col).alias("_shard")] if shard_col else []),
    )
    stride = F.col("n_tokens") + F.lit(int(eod_tokens))
    if shard_col:
        w = Window.partitionBy("_shard").orderBy("doc_id")
        offset = F.coalesce(
            F.sum(stride).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("offset")
        packed = base.select("doc_id", "n_tokens", offset, "_shard")
    else:
        # two-level exact global prefix-sum. localCheckpoint pins ONE
        # materialization of the range exchange so the per-partition
        # totals and the rows they prefix agree on partition boundaries
        # (spark_partition_id must not be recomputed under a resample).
        local_w = Window.partitionBy("_pid").orderBy("doc_id")
        local = (
            base.repartitionByRange("doc_id")
            .withColumn("_pid", F.spark_partition_id())
            .withColumn(
                "_loc",
                F.coalesce(
                    F.sum(stride).over(
                        local_w.rowsBetween(Window.unboundedPreceding, -1)
                    ),
                    F.lit(0),
                ),
            )
            .localCheckpoint(eager=False)
        )
        totals = local.groupBy("_pid").agg(F.sum(stride).alias("_tot"))
        # predecessor totals over the tiny totals frame (one row per
        # shuffle partition): a theta self-join, not a global window
        prefix = (
            totals.alias("a")
            .join(
                totals.select(
                    F.col("_pid").alias("_bpid"), F.col("_tot").alias("_btot")
                ),
                F.col("_bpid") < F.col("a._pid"),
                "left",
            )
            .groupBy(F.col("a._pid").alias("_pid"))
            .agg(F.coalesce(F.sum("_btot"), F.lit(0)).alias("_pre"))
        )
        packed = (
            local.join(F.broadcast(prefix), "_pid")
            .select(
                "doc_id",
                "n_tokens",
                (F.col("_pre") + F.col("_loc")).alias("offset"),
            )
        )
    s0 = F.floor(F.col("offset") / seq_len)
    s1 = F.floor((F.col("offset") + F.col("n_tokens") - 1) / seq_len)
    out = (
        packed.filter(F.col("n_tokens") > 0)
        .withColumn("seq_idx", F.explode(F.sequence(s0, s1)))
        .select(
            *(["_shard"] if shard_col else []),
            F.col("seq_idx").cast("long").alias("seq_idx"),
            "doc_id",
            "n_tokens",
            F.greatest(
                F.lit(0), F.col("seq_idx") * seq_len - F.col("offset")
            ).cast("long").alias("tok_from"),
            F.least(
                F.col("n_tokens"),
                (F.col("seq_idx") + 1) * seq_len - F.col("offset"),
            ).cast("long").alias("tok_to"),
            F.greatest(
                F.lit(0), F.col("offset") - F.col("seq_idx") * seq_len
            ).cast("long").alias("pos_in_seq"),
        )
    )
    if shard_col:
        out = out.withColumnRenamed("_shard", shard_col)
    return out


def temperature_mix(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled domain mixing weights — the multi-source sampling
    rule of mT5/Pile-style corpora: a domain with raw token share ``p_d``
    is sampled with probability proportional to ``p_d ** alpha``
    (``alpha < 1`` upweights small domains, ``alpha = 1`` is natural
    mixing).

    Returns one row per domain: ``(domain, n_docs, tok_cnt, raw_share,
    mix_weight, epochs)`` where ``epochs = mix_weight / raw_share`` is how
    many effective passes over the domain one epoch of the mixture makes
    (the "repetition factor" that mixing tables in the Pile / PaLM data
    cards report).

    Determinism: token counts are exact integers; ``raw_share`` is one
    IEEE division (correctly rounded on every engine); for the default
    ``alpha = 0.5`` the power is ``sqrt`` — also IEEE-correctly-rounded —
    so the whole chain is bit-exact across engines with no quantization
    convention needed. Non-half-integer alphas route through ``pow``,
    whose last ulp is not guaranteed identical across libm builds; the
    oracle-gated configuration therefore pins ``alpha = 0.5``.

    Shape at scale: one map-side-combinable groupBy on the domain key; the
    domain table (thousands of rows at most) then cross-joins a 1-row
    total frame — no corpus-sized shuffle beyond the aggregate.
    """
    toks = F.size(
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        )
    ).cast("long")
    per = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count("*").alias("n_docs"), F.sum(toks).alias("tok_cnt")
    )
    # the domain table crosses TWO broadcast boundaries (total tokens,
    # total tempered weight) and Spark does not reuse exchanges across a
    # broadcast boundary — without the persist the corpus token aggregate
    # runs four times (BASELINE.md broadcast-boundary lesson). The frame
    # is domain-sized (thousands of rows), never corpus-sized.
    from pyspark import StorageLevel

    per = per.persist(StorageLevel.MEMORY_AND_DISK)
    tot = per.agg(F.sum("tok_cnt").alias("_tt"))
    half = alpha * 2
    if half == int(half) and 0 <= half <= 2:
        # exact path: p^0, sqrt(p), or p — all correctly-rounded IEEE ops
        def powa(c):
            return (
                F.lit(1.0)
                if half == 0
                else (F.sqrt(c) if half == 1 else c)
            )
    else:  # pragma: no cover - non-gated configuration
        def powa(c):
            return F.pow(c, F.lit(float(alpha)))

    shared = per.crossJoin(F.broadcast(tot)).select(
        "domain",
        "n_docs",
        "tok_cnt",
        (F.col("tok_cnt").cast("double") / F.col("_tt")).alias("_p"),
    )
    # quantize the powered share before normalizing so the normalizer is a
    # sum of exact integers (order-independent), same convention as the
    # LM-score gates
    q = shared.select(
        "domain",
        "n_docs",
        "tok_cnt",
        "_p",
        F.round(powa(F.col("_p")) * 1e9).cast("long").alias("_wq"),
    )
    wtot = q.agg(F.sum("_wq").alias("_wt"))
    return (
        q.crossJoin(F.broadcast(wtot))
        .select(
            "domain",
            "n_docs",
            "tok_cnt",
            F.round(F.col("_p"), 6).alias("raw_share"),
            F.round(F.col("_wq") / F.col("_wt"), 6).alias("mix_weight"),
            F.round(
                (F.col("_wq") / F.col("_wt")) / F.col("_p"), 6
            ).alias("epochs"),
        )
    )


def apply_mixture(
    df: DataFrame,
    mix: DataFrame | None = None,
    domain_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Materialize ONE epoch of the temperature-scaled mixture: each
    document of domain ``d`` appears ``floor(epochs_d)`` times plus one
    more with probability ``frac(epochs_d)``, decided by the
    deterministic hash draw — stochastic rounding of the repetition
    factor, so the expected token mix equals ``temperature_mix``'s table
    exactly while every run/engine materializes the identical row set.

    Returns the input rows with a ``copy`` column (1..n for repeated
    docs); downweighted domains (``epochs < 1``) come out subsampled,
    upweighted ones repeated — the physical corpus a trainer shuffles and
    packs directly.

    Shape at scale: the domain→epochs table broadcasts onto a map-only
    scan; the repeat is a per-row ``sequence`` explode (output-sized, no
    shuffle). Pass a precomputed ``mix`` to reuse the aggregate across
    epochs/splits.
    """
    if mix is None:
        mix = temperature_mix(df, domain_col, text_col, alpha)
    rates = mix.select(
        F.col("domain").alias(domain_col), F.col("epochs")
    )
    extra = F.when(
        hash_u01(F.col(id_col), seed)
        < F.col("epochs") - F.floor(F.col("epochs")),
        F.lit(1),
    ).otherwise(F.lit(0))
    n = (F.floor(F.col("epochs")).cast("long") + extra).alias("_n")
    return (
        df.join(F.broadcast(rates), domain_col)
        .withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn(
            "copy", F.explode(F.sequence(F.lit(1).cast("long"), F.col("_n")))
        )
        .drop("_n", "epochs")
    )


def dsir_logweights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
    seed: str = "ds",
    cache_counts: bool = True,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw document
    by how much it looks like the ``target`` subset under a hashed
    bag-of-words model.

    Tokens hash into ``buckets`` md5 buckets (the paper's hashed n-gram
    features); the target and raw corpora each get an add-one-smoothed
    bucket distribution; a document's weight is the sum over its tokens of
    ``ln(p_target(bucket) / p_raw(bucket))``. Sampling proportionally to
    ``exp(weight)`` is the paper's importance resampling step — here the
    output is the per-document log weight itself, ready for hash_sample /
    token_budget_sample downstream.

    Returns ``(id, tok_cnt, dsir_logweight)``. The per-bucket log-ratio is
    quantized to 1e-6 before the per-doc sum (same cross-engine
    determinism convention as the unigram/bigram LM scores).

    Shape at scale: one token explode feeding a (doc, bucket) count with
    map-side combine; the two bucket distributions are ``buckets``-row
    aggregates joined back by broadcast — no corpus-sized join, no window,
    no driver loop. The (doc, bucket) count frame feeds BOTH the
    distribution aggregate and the final weighted sum, and Spark does not
    reuse the exchange across the broadcast boundary — ``cache_counts``
    persists it (<= ``buckets`` rows/doc of integers, far smaller than
    the corpus) so the token explode runs exactly once.
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    h = F.md5(F.concat(F.lit(seed + ":"), F.col("_tok")).cast("binary"))
    bucket = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % buckets
    ).alias("_b")
    ex = df.select(
        F.col(id_col), target.alias("_t"), F.explode(toks).alias("_tok")
    ).select(F.col(id_col), "_t", bucket)
    doc_counts = ex.groupBy(id_col, "_b").agg(
        F.count("*").alias("_c"), F.first("_t").alias("_t")
    )
    if cache_counts:
        from pyspark import StorageLevel

        doc_counts = doc_counts.persist(StorageLevel.MEMORY_AND_DISK)
    # bucket distributions: a buckets-row aggregate + a 1-row total,
    # both broadcast. Add-one smoothing; buckets with zero raw count never
    # appear in doc_counts so they need no log-ratio row at all.
    bdist = doc_counts.groupBy("_b").agg(
        F.sum(F.when(F.col("_t"), F.col("_c")).otherwise(0)).alias("_tc"),
        F.sum("_c").alias("_rc"),
    )
    totals = bdist.agg(
        F.sum("_tc").alias("_tt"), F.sum("_rc").alias("_rt")
    )
    dist = bdist.crossJoin(F.broadcast(totals)).select(
        "_b",
        F.round(
            F.log(
                (F.col("_tc") + 1).cast("double")
                / (F.col("_tt") + buckets)
                * (F.col("_rt") + buckets)
                / (F.col("_rc") + 1).cast("double")
            )
            * 1e6
        ).cast("long").alias("_lr_q"),
    )
    return (
        doc_counts.join(F.broadcast(dist), "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_c").alias("tok_cnt"),
            F.round(
                F.sum(F.col("_c") * F.col("_lr_q")) / 1e6, 6
            ).alias("dsir_logweight"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunking — the context-window preparation
    step every LM training / RAG-indexing pipeline runs: each document
    becomes ceil-strided windows of ``chunk_size`` tokens advancing by
    ``stride`` (overlap = chunk_size - stride), final partial window
    kept. Zero-token documents produce no chunks.

    Returns (id, chunk_id, n_tok, chunk_text). Purely per-row array
    arithmetic inside the scan (transform over a sequence + slice) —
    no shuffle at all until the caller aggregates; output row count is
    corpus-linear (~len/stride rows per doc).
    """
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    base = df.select(F.col(id_col), toks.alias("_t")).withColumn(
        "_n",
        F.when(F.size("_t") == 0, F.lit(0)).otherwise(
            1
            + F.greatest(
                F.ceil((F.size("_t") - chunk_size) / F.lit(float(stride))),
                F.lit(0),
            )
        ),
    )
    chunks = F.when(
        F.col("_n") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("_n") - 1),
            lambda i: F.struct(
                i.cast("int").alias("chunk_id"),
                F.least(
                    F.lit(chunk_size), F.size("_t") - i * stride
                ).alias("n_tok"),
                F.array_join(
                    F.slice(F.col("_t"), i * stride + 1, chunk_size), " "
                ).alias("chunk_text"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_id:int,n_tok:int,chunk_text:string>>"))
    return base.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_id").alias("chunk_id"),
        F.col("_c.n_tok").alias("n_tok"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """Train/val/test assignment that can never put two near-duplicates
    in different splits — the fix for the contamination channel
    ``split_leakage`` audits: instead of hashing each document's own id
    (``hash_split``), every member of a near-dup connected component is
    keyed by the component's representative (min id; singletons by their
    own id), so a whole dup group lands in ONE split by construction.

    ``pairs`` is any (id_a, id_b) near-dup edge list (MinHash-LSH,
    SimHash, embedding — whatever the pipeline verified). Returns
    ``(id, rep, split)``.

    Shape at scale: label propagation over the pair-sized edge list
    (O(component diameter) node-frame joins), one left join to attach
    labels to the corpus, then the same map-only md5 assignment as
    ``hash_split`` — deterministic in the edge list + ids alone, stable
    under appends that don't add edges."""
    from rrdtool_1_x_spark.datapipe.dedup import duplicate_groups

    groups = duplicate_groups(pairs)
    rep = docs.join(groups, docs[id_col] == groups["doc_id"], "left").select(
        docs[id_col],
        F.coalesce(groups["group_id"], docs[id_col]).alias("rep"),
    )
    return hash_split(rep, weights, id_col="rep", seed=seed).select(
        id_col, "rep", "split"
    )


def shard_epoch(
    df: DataFrame,
    shard_size: int = 1024,
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic epoch shuffle + fixed-size shard assignment — the
    training-data-loader layout step: documents are permuted by
    ``md5(seed:id)`` (a new seed per epoch reshuffles reproducibly, the
    corpus-convention deterministic draw) and cut into shards of
    ``shard_size`` in permuted order, so every worker can seek its shard
    without coordination and a re-run (or a resumed job) produces the
    identical layout. Returns ``(id, shard, pos_in_shard)``.

    Scale: the permutation rank is the shared ``_global_rank``
    two-level prefix-count (also under ``balanced_shards``; weighted
    form in ``pack_sequences``) — never a single-partition global
    window over the corpus.
    """
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    base = df.select(F.col(id_col), key.alias("_k"))
    ranked = _global_rank(base, ["_k"], id_col)
    return ranked.select(
        id_col,
        F.expr(f"_rank0 DIV {int(shard_size)}").cast("long").alias("shard"),
        (F.col("_rank0") % shard_size).cast("long").alias("pos_in_shard"),
    )


def span_corrupt(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_pct: int = 5,
    seed: str = "corrupt",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. JMLR 2020 §3.1.4, the
    denoising pre-training objective): mask token spans, replace each
    contiguous masked run with ONE sentinel ``<extra_id_k>`` in the
    input, and emit the target as the sentinel-prefixed masked spans —
    made DETERMINISTIC (reproducible across runs/engines/retries, the
    corpus-convention hash draw): position p starts a span when
    ``h60(seed:id:p) % 100 < start_pct``, with span length
    ``2 + (h DIV 100) % 3`` (2-4 tokens, mean 3 — start_pct=5 yields
    the paper's ~15% corruption rate). Overlapping draws merge into one
    island (running-max end), so sentinel numbering is stable.

    Returns ``(id, n_tokens, n_spans, n_masked, corrupted, target)``;
    a doc with no spans keeps its token stream verbatim with an empty
    target. Documents with zero tokens produce no row (they had no
    exploded positions in the original formulation).

    Shape at scale: MAP-ONLY. Tokenization stays an engine expression
    (so the split/lower semantics cannot fork from the other text
    operators), and the whole draw/island/sentinel pass runs per
    document inside one Arrow kernel — the previous formulation
    exploded every token position and pushed the corpus's token rows
    through a doc-keyed shuffle for three running-max windows plus a
    collect_list aggregate, and evaluated the md5 draw expression twice
    per position (h and the span length each inlined the hash). The
    60-bit draw is ``int(md5[:15], 16)`` — identical to the engine's
    ``conv(substring(md5(..),1,15),16,10)`` convention, pinned by the
    transcription test."""
    import hashlib

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    tokd = df.select(F.col(id_col), toks.alias("_t"))
    out_schema = StructType(
        [
            StructField(id_col, df.schema[id_col].dataType),
            StructField("n_tokens", LongType()),
            StructField("n_spans", LongType()),
            StructField("n_masked", LongType()),
            StructField("corrupted", StringType()),
            StructField("target", StringType()),
        ]
    )
    pct = int(start_pct)

    def corrupt(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in
                   (id_col, "n_tokens", "n_spans", "n_masked",
                    "corrupted", "target")}
            for did, tlist in zip(pdf[id_col], pdf["_t"]):
                tl = list(tlist)
                n = len(tl)
                if n == 0:
                    continue  # zero-token docs emit no row
                cum = None
                k = -1
                n_masked = 0
                n_spans = 0
                corrupted: list = []
                target: list = []
                for p, w in enumerate(tl):
                    h = int(
                        hashlib.md5(
                            f"{seed}:{did}:{p}".encode()
                        ).hexdigest()[:15],
                        16,
                    )
                    prev_cum = cum
                    if h % 100 < pct:
                        e = p + (2 + (h // 100) % 3) - 1
                        cum = e if cum is None else max(cum, e)
                    if cum is not None and cum >= p:
                        n_masked += 1
                        if prev_cum is None or prev_cum < p:
                            k += 1
                            n_spans += 1
                            corrupted.append(f"<extra_id_{k}>")
                            target.append(f"<extra_id_{k}> {w}")
                        else:
                            target.append(w)
                    else:
                        corrupted.append(w)
                out[id_col].append(did)
                out["n_tokens"].append(n)
                out["n_spans"].append(n_spans)
                out["n_masked"].append(n_masked)
                out["corrupted"].append(" ".join(corrupted))
                out["target"].append(" ".join(target))
            yield pd.DataFrame(out)

    return tokd.mapInPandas(corrupt, out_schema)
