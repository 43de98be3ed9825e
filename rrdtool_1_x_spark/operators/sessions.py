"""Gap-based sessionization — the canonical event-stream grouping: a new
session starts whenever a key's inter-event gap exceeds the timeout.

Expressed as lag + running sum over one (key)-partitioned window — a
single shuffle on the key, no join, no state outside the window. Session
assignment is order-independent under timestamp ties (a zero gap never
opens a session), so the result is exact across engines/partitionings.
For live streams the same semantics come from Structured Streaming's
``session_window``; this is the batch/backfill form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts_col: str = "tus",
    by: list[str] | None = None,
    gap: int = 1_800_000_000,
) -> DataFrame:
    """Add a ``session_idx`` column (0-based per key, in time order): a
    new session opens when the gap to the key's previous event exceeds
    ``gap`` microseconds. Map + one window over the key partition."""
    by = list(by or [])
    w = Window.partitionBy(*by).orderBy(F.asc(ts_col))
    new = F.when(
        F.col(ts_col) - F.lag(ts_col).over(w) > F.lit(int(gap)), 1
    ).otherwise(0)
    return df.withColumn(
        "session_idx",
        (F.sum(new).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )).cast("long"),
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "tus",
    by: list[str] | None = None,
    gap: int = 1_800_000_000,
) -> DataFrame:
    """Per-session summary: ``(*by, session_idx, start_us, end_us,
    n_events, duration_us)``. One window pass + one map-side-combinable
    aggregate on (key, session)."""
    by = list(by or [])
    s = sessionize(df, ts_col, by, gap)
    return s.groupBy(*by, "session_idx").agg(
        F.min(ts_col).alias("start_us"),
        F.max(ts_col).alias("end_us"),
        F.count("*").alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_us"),
    )


def cohort_retention(
    events: DataFrame,
    ts_col: str = "tus",
    by: str = "user_id",
    period: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Cohort retention matrix: users grouped by their FIRST-activity
    period; for each (cohort, offset) the count of cohort members active
    ``offset`` periods later, plus the retention share against the
    cohort's size. Returns ``(cohort, offset, n_active, cohort_size,
    retention)``.

    Two combinable aggregates + one broadcastable join on the (tiny)
    cohort axis: first-activity per key (min), distinct (key, period)
    activity, then the (cohort, offset) count — no window over raw
    events, no per-key state.
    """
    # integer division, not float-divide-then-cast: Spark truncates that
    # cast while DuckDB rounds it — `div`/`//` agree exactly
    per = F.expr(f"CAST({ts_col} AS BIGINT) div {int(period)}")
    first = events.groupBy(by).agg(F.min(per).alias("cohort"))
    active = events.select(F.col(by), per.alias("_p")).distinct()
    size = first.groupBy("cohort").agg(F.count("*").alias("cohort_size"))
    grid = (
        active.join(first, by)
        .select("cohort", (F.col("_p") - F.col("cohort")).alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").alias("n_active"))
    )
    return grid.join(F.broadcast(size), "cohort").select(
        "cohort",
        "offset",
        "n_active",
        "cohort_size",
        F.round(
            F.col("n_active") / F.col("cohort_size").cast("double"), 6
        ).alias("retention"),
    )


def robust_outliers(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    thresh: int = 3,
) -> DataFrame:
    """Per-key robust outlier report: median / MAD (median absolute
    deviation) over exact integer cents, flagging values with
    ``|x - median| > thresh * MAD`` — the fraud/telemetry anomaly
    screen that survives the heavy tails that break mean/stddev
    z-scores (one whale purchase inflates sigma enough to hide real
    anomalies; the median pair does not move).

    Medians are the nearest-rank LOWER median ((n+1) DIV 2-th smallest)
    over cents = round(value*100) — all-integer, so every engine and
    partitioning agrees exactly. With MAD = 0 (over half the values
    identical) any deviation counts as an outlier, the standard
    degenerate-MAD convention. Returns
    ``(key, n_events, med_cents, mad_cents, n_outliers)``.

    Shape at scale: two rank windows and two aggregations all keyed by
    ``key_col`` — per-key-linear state, no corpus-wide key; skew is
    bounded by the busiest key's event count.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    # NULL values are excluded up front: they carry no magnitude to rank,
    # and the engines disagree on NULL sort placement (Spark asc = nulls
    # first, most SQL engines = nulls last), so letting them reach the
    # rank windows would silently shift every median
    base = events.select(F.col(key_col), cents.alias("_c")).filter(
        F.col("_c").isNotNull()
    )
    wr = Window.partitionBy(key_col).orderBy(F.asc("_c"))
    ranked = base.withColumn("_rn", F.row_number().over(wr)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(key_col))
    )
    med = (
        ranked.filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
        .select(F.col(key_col), F.col("_c").alias("_med"))
    )
    dev = base.join(med, key_col).select(
        F.col(key_col), "_c", "_med", F.abs(F.col("_c") - F.col("_med")).alias("_d")
    )
    wd = Window.partitionBy(key_col).orderBy(F.asc("_d"))
    dranked = dev.withColumn("_rn", F.row_number().over(wd)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(key_col))
    )
    mad = (
        dranked.filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
        .select(F.col(key_col), F.col("_d").alias("_mad"))
    )
    return (
        dev.join(mad, key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_med").alias("med_cents"),
            F.min("_mad").alias("mad_cents"),
            F.sum(
                F.when(
                    F.col("_d") > F.lit(thresh) * F.col("_mad"), F.lit(1)
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
    )


def json_field_stats(
    events: DataFrame,
    field: str = "k",
    group_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Typed extraction over a semi-structured JSON properties column —
    the schema-on-read step every event lake needs (properties vary by
    event type, so they land as JSON strings; analytics pulls typed
    fields back out): integer field ``$.field`` per row, aggregated per
    group to ``(group, n_events, n_present, sum, min, max)``.

    Rows whose JSON lacks the field (or is malformed) count in
    ``n_events`` but not ``n_present`` — extraction yields NULL, never
    an error, exactly like SQL JSON path semantics.

    Shape at scale: ``get_json_object`` is a JVM-side scan expression
    (inside whole-stage codegen, no UDF) feeding one map-side
    combinable aggregation — corpus-linear."""
    v = F.get_json_object(F.col(props_col), f"$.{field}").cast("long")
    return (
        events.select(F.col(group_col), v.alias("_v"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_v").alias("n_present"),
            F.sum("_v").alias("val_sum"),
            F.min("_v").alias("val_min"),
            F.max("_v").alias("val_max"),
        )
    )


def session_paths(
    events: DataFrame,
    n: int = 3,
    ts_col: str = "tus",
    by: list[str] | None = None,
    gap: int = 1_800_000_000,
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Behavioral path mining — the funnel DISCOVERY op (``funnel``
    checks a path you already hypothesized; this surfaces which paths
    actually happen): every n-step sequence of consecutive event types
    inside a session, counted corpus-wide. Returns
    ``(path, n_occurrences, n_sessions)``.

    Within-session order is (ts, event id) — the id tiebreak makes the
    n-grams deterministic under timestamp ties, which raw sessionize
    does not need but path extraction does.

    NULL event types: an n-gram containing ANY NULL step is dropped
    (every step must be non-null, not just the last) — a NULL mid-
    sequence must not collapse 'a > NULL > c' into the genuine shorter
    path 'a > c'. The untyped event still occupies its position, so it
    also breaks the overlapping n-grams around it (NULL-propagating
    semantics, same as SQL ``||`` concatenation).

    Shape at scale: sessionize's key window, one lead() window per
    extra step over the same partition (no extra shuffle — same key),
    then a combinable path count; the hottest key holds an integer."""
    by = list(by or ["user_id"])
    s = sessionize(events, ts_col, by, gap)
    w = Window.partitionBy(*by, "session_idx").orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(" > ", *steps)
    sess_key = F.concat_ws("/", *[F.col(c).cast("string") for c in by],
                           F.col("session_idx").cast("string"))
    all_present = None
    for i in range(n):
        nn = F.col(f"_s{i}").isNotNull()
        all_present = nn if all_present is None else all_present & nn
    complete = s.select(
        path.alias("path"), sess_key.alias("_sk"),
        *[c.alias(f"_s{i}") for i, c in enumerate(steps)],
    ).filter(all_present)
    return complete.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("_sk").alias("n_sessions"),
    )


def event_transitions(
    events: DataFrame,
    ts_col: str = "tus",
    by: list[str] | None = None,
    gap: int = 1_800_000_000,
    type_col: str = "event_type",
    id_col: str = "event_id",
    quantize: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix of within-session behavior —
    the aggregate view ``session_paths`` unrolls (paths enumerate
    n-step sequences; this gives the one-step conditional
    P(next | current) the journey models and anomaly screens read).
    Returns ``(from_type, to_type, n, p)`` with ``p = n / Σ_to n``
    rounded to ``quantize`` decimals (one exact integer division per
    row — counts are integers, so p is engine-exact).

    Within-session order is (ts, event id) — the session_paths tiebreak
    — and a transition is dropped when EITHER side is a NULL event type
    (the NULL-propagating convention shared with paths). Shape at
    scale: sessionize's key window, one lead() on the same partition
    (no extra shuffle), then a combinable (from, to) count — the matrix
    is |types|² rows."""
    by = list(by or ["user_id"])
    s = sessionize(events, ts_col, by, gap)
    w = Window.partitionBy(*by, "session_idx").orderBy(
        F.asc(ts_col), F.asc(id_col)
    )
    pairs = s.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col, 1).over(w).alias("to_type"),
    ).filter(F.col("from_type").isNotNull() & F.col("to_type").isNotNull())
    counted = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("from_type")
    return counted.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n") / F.sum("n").over(tot).cast("double"), quantize
        ).alias("p"),
    )
