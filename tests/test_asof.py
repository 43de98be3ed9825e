"""asof_join / range_join unit semantics (operators/asof.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from rrdtool_1_x_spark.operators.asof import asof_join, range_join


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "u", 50), (4, "w", 100)],
        "event_id long, user string, tus long",
    )
    right = spark.createDataFrame(
        [(10, "u", 100, 1.0), (11, "u", 200, 2.0), (12, "v", 90, 3.0)],
        "rid long, user string, tus long, val double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, "tus", ["user"]).collect()
    }
    # equal ts matches (<=); latest-at-or-before wins; no match -> nulls
    assert out[1]["rid"] == 10 and out[1]["tus_r"] == 100
    assert out[2]["rid"] == 11 and out[2]["val"] == 2.0
    assert out[3]["rid"] is None          # nothing at or before ts=50
    assert out[4]["rid"] is None          # key 'w' has no right rows


def test_asof_tolerance_and_ties(spark):
    left = spark.createDataFrame(
        [(1, "u", 1000), (2, "u", 5000)], "event_id long, user string, tus long"
    )
    right = spark.createDataFrame(
        [(10, "u", 900, 1.0), (11, "u", 900, 2.0)],
        "rid long, user string, tus long, val double",
    )
    out = {
        r["event_id"]: r
        for r in asof_join(
            left, right, "tus", ["user"], tolerance=500
        ).collect()
    }
    # tie at ts=900 resolves to the greatest payload tuple (rid 11 first
    # field wins)
    assert out[1]["rid"] == 11 and out[1]["val"] == 2.0
    # 5000 - 900 > 500 tolerance -> nulled match
    assert out[2]["rid"] is None


def test_range_join_matches_theta(spark):
    import random

    rnd = random.Random(7)
    pts = [(i, "k%d" % (i % 3), rnd.randrange(0, 10_000)) for i in range(120)]
    ivs = [
        (100 + j, "k%d" % (j % 3), s, s + rnd.randrange(0, 2_000))
        for j, s in enumerate(rnd.randrange(0, 9_000) for _ in range(40))
    ]
    p = spark.createDataFrame(pts, "pid long, key string, tus long")
    v = spark.createDataFrame(ivs, "iid long, key string, start_us long, end_us long")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(p, v, "tus", "start_us", "end_us", ["key"],
                            bucket=512).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, pk, ts in pts
        for iid, ik, s, e in ivs
        if pk == ik and s <= ts <= e
    )
    assert got == want and len(want) > 0


def test_sessionize_hand_case(spark):
    from rrdtool_1_x_spark.operators.sessions import session_stats, sessionize

    # gaps: 10, 10, 100(new), 10, 200(new) -> 3 sessions for u; 1 for w
    rows = [("u", t) for t in (0, 10, 20, 120, 130, 330)] + [("w", 5)]
    df = spark.createDataFrame(rows, "user string, tus long")
    s = sessionize(df, "tus", ["user"], gap=50)
    got = {
        (r["user"], r["tus"]): r["session_idx"] for r in s.collect()
    }
    assert [got[("u", t)] for t in (0, 10, 20, 120, 130, 330)] == [
        0, 0, 0, 1, 1, 2,
    ]
    assert got[("w", 5)] == 0
    st = {
        (r["user"], r["session_idx"]): r
        for r in session_stats(df, "tus", ["user"], gap=50).collect()
    }
    assert st[("u", 1)]["n_events"] == 2
    assert st[("u", 1)]["duration_us"] == 10
    assert st[("u", 2)]["start_us"] == st[("u", 2)]["end_us"] == 330


def test_funnel_hand_case(spark):
    from rrdtool_1_x_spark.operators.funnel import funnel

    rows = [
        # u completes all 4 in order; the step-2 'view' at ts=5 (before
        # signup) must be ignored, and stage ts must be strictly after
        ("u", "view", 5), ("u", "signup", 10), ("u", "view", 20),
        ("u", "click", 20),   # NOT after view(20) -> stage 3 waits
        ("u", "click", 30), ("u", "purchase", 40),
        # v stalls after view
        ("v", "signup", 10), ("v", "view", 15),
        # w never signs up -> absent
        ("w", "click", 10),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, tus long")
    out = {r["user_id"]: r for r in funnel(
        df, ["signup", "view", "click", "purchase"], by="user_id"
    ).collect()}
    assert set(out) == {"u", "v"}
    u = out["u"]
    assert (u["ts_1"], u["ts_2"], u["ts_3"], u["ts_4"]) == (10, 20, 30, 40)
    assert u["steps_completed"] == 4
    v = out["v"]
    assert v["steps_completed"] == 2 and v["ts_3"] is None


def test_funnel_window_bound(spark):
    from rrdtool_1_x_spark.operators.funnel import funnel

    rows = [("u", "signup", 0), ("u", "view", 50), ("u", "click", 200)]
    df = spark.createDataFrame(rows, "user_id string, event_type string, tus long")
    out = funnel(df, ["signup", "view", "click"], by="user_id",
                 within=100).collect()[0]
    # click at 200 falls outside signup+100
    assert out["ts_2"] == 50 and out["ts_3"] is None
    assert out["steps_completed"] == 2


def test_cohort_retention_hand_case(spark):
    from rrdtool_1_x_spark.operators.sessions import cohort_retention

    # period=100: u first in p0, active p0+p2; v first p0, active p0 only;
    # w first p2, active p2+p3
    rows = [("u", 10), ("u", 50), ("u", 250), ("v", 20),
            ("w", 210), ("w", 320)]
    df = spark.createDataFrame(rows, "user_id string, tus long")
    out = {
        (r["cohort"], r["offset"]): r
        for r in cohort_retention(df, period=100).collect()
    }
    assert out[(0, 0)]["n_active"] == 2 and out[(0, 0)]["cohort_size"] == 2
    assert out[(0, 0)]["retention"] == 1.0
    assert out[(0, 2)]["n_active"] == 1 and out[(0, 2)]["retention"] == 0.5
    assert out[(2, 0)]["cohort_size"] == 1 and out[(2, 1)]["retention"] == 1.0
    assert (0, 1) not in out  # nobody from cohort 0 active in period 1


def test_robust_outliers_hand_case(spark):
    from rrdtool_1_x_spark.operators.sessions import robust_outliers

    # user 1: values 1..5 plus a whale at 1000 → med 3.00, MAD 1.00 cents
    # scale: med=300, dev=[200,100,0,100,200,99700], mad over sorted devs
    # [0,100,100,200,200,99700] lower-median ((6+1)//2=3rd)=100
    rows = [(1, float(v)) for v in (1, 2, 3, 4, 5, 1000)] + [
        (2, 10.0), (2, 10.0), (2, 10.0)
    ]
    df = spark.createDataFrame(rows, "user_id long, value double")
    out = {r["user_id"]: r for r in robust_outliers(df).collect()}
    r1 = out[1]
    assert (r1["n_events"], r1["med_cents"], r1["mad_cents"]) == (6, 300, 100)
    # only the whale exceeds 3*MAD=300: dev 99700 (devs 200 are not > 300)
    assert r1["n_outliers"] == 1
    # constant user: MAD 0 → no deviation, no outliers
    r2 = out[2]
    assert (r2["med_cents"], r2["mad_cents"], r2["n_outliers"]) == (1000, 0, 0)


def test_robust_outliers_mad_zero_flags_any_deviation(spark):
    from rrdtool_1_x_spark.operators.sessions import robust_outliers

    # >half identical → MAD 0; the single deviating value is an outlier
    df = spark.createDataFrame(
        [(1, 5.0), (1, 5.0), (1, 5.0), (1, 7.0)], "user_id long, value double"
    )
    r = robust_outliers(df).collect()[0]
    assert r["mad_cents"] == 0 and r["n_outliers"] == 1


def test_json_field_stats_missing_and_malformed(spark):
    from rrdtool_1_x_spark.operators.sessions import json_field_stats

    df = spark.createDataFrame(
        [
            ("a", '{"k": 3}'),
            ("a", '{"k": 7}'),
            ("a", '{"other": 1}'),   # missing field
            ("b", "not json"),       # malformed
            ("b", '{"k": -2}'),
        ],
        "event_type string, props string",
    )
    out = {r["event_type"]: r for r in json_field_stats(df).collect()}
    a, b = out["a"], out["b"]
    assert (a["n_events"], a["n_present"], a["val_sum"]) == (3, 2, 10)
    assert (a["val_min"], a["val_max"]) == (3, 7)
    assert (b["n_events"], b["n_present"], b["val_sum"]) == (2, 1, -2)


def test_robust_outliers_null_values_excluded(spark):
    from rrdtool_1_x_spark.operators.sessions import robust_outliers

    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (1, 3.0), (1, 5.0)],
        "user_id long, value double",
    )
    r = robust_outliers(df).collect()[0]
    # the NULL row carries no magnitude: n=3, median of {100,300,500}
    assert (r["n_events"], r["med_cents"]) == (3, 300)


def test_session_paths_hand_case(spark):
    from rrdtool_1_x_spark.operators.sessions import session_paths

    # user 1 session: a b c b c → 3-grams: "a b c","b c b","c b c";
    # after a 1-hour gap: a b c again → "a b c" occurs twice overall
    us = 1_000_000
    rows = [
        (1, 1, 0 * us, "a"), (1, 2, 1 * us, "b"), (1, 3, 2 * us, "c"),
        (1, 4, 3 * us, "b"), (1, 5, 4 * us, "c"),
        (1, 6, 7200 * us, "a"), (1, 7, 7201 * us, "b"), (1, 8, 7202 * us, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tus long, event_type string"
    )
    out = {r["path"]: r for r in session_paths(df, n=3, gap=1800 * us).collect()}
    assert out["a > b > c"]["n_occurrences"] == 2
    assert out["a > b > c"]["n_sessions"] == 2
    assert out["b > c > b"]["n_occurrences"] == 1
    # no path crosses the session boundary (e.g. "b > c > a" must not exist)
    assert "b > c > a" not in out


def test_session_paths_null_step_drops_ngram(spark):
    """A NULL event type mid-sequence must NOT collapse 'a > NULL > c'
    into the genuine shorter path 'a > c' — every n-gram containing the
    NULL position is dropped (NULL-propagating, like SQL '||')."""
    from rrdtool_1_x_spark.operators.sessions import session_paths

    us = 1_000_000
    rows = [
        # user 1: a, NULL, c, d  → only "NULL-free" 3-grams survive: none
        # until (c? no: c d needs a third) — zero paths from user 1
        (1, 1, 0 * us, "a"), (1, 2, 1 * us, None),
        (1, 3, 2 * us, "c"), (1, 4, 3 * us, "d"),
        # user 2: genuine a c d → exactly one path "a > c > d"
        (2, 5, 0 * us, "a"), (2, 6, 1 * us, "c"), (2, 7, 2 * us, "d"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tus long, event_type string"
    )
    out = {r["path"]: r for r in session_paths(df, n=3, gap=1800 * us).collect()}
    # the NULL-step user contributes nothing; no 'a > c > d' collision
    assert out["a > c > d"]["n_occurrences"] == 1
    assert out["a > c > d"]["n_sessions"] == 1
    assert "a > c" not in out and len(out) == 1


def test_phrase_search_adjacency_and_order(spark):
    from rrdtool_1_x_spark.datapipe.retrieval import phrase_search

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the quick brown cat"),
            (2, "quick the brown"),           # words present, wrong order
            (3, "the quick red brown"),       # not adjacent
        ],
        "doc_id long, text string",
    )
    out = phrase_search(df, ["the quick brown"]).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["n_hits"], r["first_pos"]) == (1, 2, 1)


def test_scd2_merge_all_four_paths(spark):
    from rrdtool_1_x_spark.operators.scd import scd2_merge

    dim = spark.createDataFrame(
        [
            (1, "gold", 0, None),     # will change → close + reopen
            (2, "silver", 0, None),   # no-op update
            (3, "bronze", 0, None),   # no update at all
            (4, "old", 0, 50),        # closed history — untouched
            (4, "gold", 50, None),    # current open row for key 4
        ],
        "k long, seg string, valid_from long, valid_to long",
    )
    upd = spark.createDataFrame(
        [(1, "platinum", 100), (2, "silver", 100), (9, "new", 100)],
        "k long, seg string, ts long",
    )
    out = scd2_merge(dim, upd, key="k", attrs=["seg"]).collect()
    rows = {(r["k"], r["seg"], r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {
        (1, "gold", 0, 100),        # closed at change
        (1, "platinum", 100, None), # reopened
        (2, "silver", 0, None),     # no-op stays open
        (3, "bronze", 0, None),     # untouched open
        (4, "old", 0, 50),          # history verbatim
        (4, "gold", 50, None),      # untouched open (no update)
        (9, "new", 100, None),      # brand-new key
    }


def test_scd2_merge_guards_late_and_duplicate_updates(spark):
    """Late updates (ts <= open row's valid_from) are rejected as no-ops
    — never an inverted validity interval — and a batch with several
    rows per key is reduced to its latest-ts row before the merge."""
    from rrdtool_1_x_spark.operators.scd import scd2_merge

    dim = spark.createDataFrame(
        [(1, "gold", 100, None), (2, "silver", 100, None)],
        "k long, seg string, valid_from long, valid_to long",
    )
    upd = spark.createDataFrame(
        [
            (1, "stale", 50),       # late: arrives before valid_from
            (2, "bronze", 150),     # duplicate key: superseded ...
            (2, "platinum", 200),   # ... by this latest-ts row
        ],
        "k long, seg string, ts long",
    )
    out = scd2_merge(dim, upd, key="k", attrs=["seg"]).collect()
    rows = {(r["k"], r["seg"], r["valid_from"], r["valid_to"]) for r in out}
    assert rows == {
        (1, "gold", 100, None),       # late update ignored, still open
        (2, "silver", 100, 200),      # closed at the LATEST ts only
        (2, "platinum", 200, None),   # one reopen, from the 200 row
    }
    # no inverted intervals anywhere
    assert all(
        r["valid_to"] is None or r["valid_to"] >= r["valid_from"]
        for r in out
    )


def test_event_transitions_hand_case(spark):
    """Session boundaries break transitions; probabilities are exact
    per-from ratios; NULL event types drop the adjacent transitions."""
    from rrdtool_1_x_spark.operators.sessions import event_transitions

    us = 1_000_000
    rows = [
        (1, 1, 0 * us, "a"), (1, 2, 1 * us, "b"), (1, 3, 2 * us, "a"),
        (1, 4, 3 * us, "c"),
        # new session after 1h: a->b again, NOT c->a across the gap
        (1, 5, 7200 * us, "a"), (1, 6, 7201 * us, "b"),
        # NULL mid-stream: b->NULL and NULL->c both dropped
        (2, 7, 0 * us, "b"), (2, 8, 1 * us, None), (2, 9, 2 * us, "c"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, tus long, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): r
        for r in event_transitions(df, gap=1800 * us).collect()
    }
    assert got[("a", "b")]["n"] == 2
    assert got[("a", "c")]["n"] == 1
    assert got[("b", "a")]["n"] == 1
    assert ("c", "a") not in got  # session boundary
    assert not any(f is None or t is None for f, t in got)
    # P(b|a) = 2/3, P(c|a) = 1/3 exactly
    assert got[("a", "b")]["p"] == round(2 / 3, 6)
    assert got[("a", "c")]["p"] == round(1 / 3, 6)
