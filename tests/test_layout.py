"""Z-order layout: Morton key correctness and the physical pruning claim
— a z-ordered file set answers a 2-D range query reading FEWER row groups
than the natural time-ordered layout (measured from parquet footer
statistics, the exact mechanism scan pruning uses)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.datapipe.layout import (
    bucket_sql,
    rowgroup_hit_fraction,
    write_zorder_layout,
    zorder_bucket,
    zorder_expr,
)

SF = "/root/testdata/sf0.001"


def test_zorder_hand_values(spark):
    """z(3, 5) = 0b100111 = 39; one-dimensional inputs spread onto the
    even (x) / odd (y) bit positions."""
    row = spark.range(1).select(
        zorder_expr("3", "5", 4).alias("z35"),
        zorder_expr("7", "0", 4).alias("zx"),
        zorder_expr("0", "7", 4).alias("zy"),
        zorder_expr("15", "15", 4).alias("zfull"),
    ).first()
    assert row["z35"] == 39
    assert row["zx"] == 0b010101  # x bits land on even positions
    assert row["zy"] == 0b101010  # y bits land on odd positions
    assert row["zfull"] == 0b11111111


def test_zorder_bucket_bounds(spark):
    """Bucketization clamps to [lo, hi] and maps the closed range into
    [0, 2^bits): lo -> 0, hi -> floor((hi-lo)*2^bits/(hi-lo+1)) — always
    strictly below 2^bits, so no interleave bit ever overflows."""
    df = spark.createDataFrame(
        [(v,) for v in (-5, 0, 500, 999, 2000)], "v long"
    )
    got = [
        r["b"]
        for r in df.select(zorder_bucket("v", 0, 999, 10).alias("b"))
        .orderBy("b")
        .collect()
    ]
    assert got[0] == 0 and got[1] == 0  # clamp below + lo
    assert got[-1] == 999 * 1024 // 1000 == 1022  # hi (and 2000 clamps to it)
    assert got[-2] == 1022
    assert 0 < got[2] < 1022
    # the SQL-string form is the same expression
    assert "DIV" in bucket_sql("v", 0, 999, 10)


def test_zorder_layout_prunes_2d_box(spark, tmp_path):
    """Write the events table twice — time-ordered (the natural arrival
    layout) and z-ordered on (user_id, minute) — and measure row-group
    min/max intersection for a narrow-user all-time box: the z layout
    must touch strictly fewer row groups while returning identical rows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("tus"),
    )
    lo_u, hi_u = ev.agg(F.min("user_id"), F.max("user_id")).first()
    lo_t, hi_t = ev.agg(F.min("tus"), F.max("tus")).first()

    nat = str(tmp_path / "natural")
    (
        ev.repartitionByRange(8, "tus")
        .sortWithinPartitions("tus")
        .write.parquet(nat)
    )
    zo = str(tmp_path / "zorder")
    write_zorder_layout(
        ev, zo, "user_id", "tus", (lo_u, hi_u), (lo_t, hi_t), bits=10,
        num_files=8,
    )

    box = {"user_id": (lo_u, lo_u + max((hi_u - lo_u) // 8, 0))}
    frac_nat = rowgroup_hit_fraction(nat, box)
    frac_z = rowgroup_hit_fraction(zo, box)
    # time-ordered files all span the full user domain
    assert frac_nat == 1.0
    assert frac_z < frac_nat
    # the layout changes physical order only: same query, same rows
    pred = (F.col("user_id") >= box["user_id"][0]) & (
        F.col("user_id") <= box["user_id"][1]
    )
    a = sorted(
        r["event_id"] for r in spark.read.parquet(nat).filter(pred).collect()
    )
    b = sorted(
        r["event_id"] for r in spark.read.parquet(zo).filter(pred).collect()
    )
    assert a == b and len(a) > 0
    # a 2-D box (narrow user AND narrow time) prunes deeper than either
    # one-dimensional layout can: the natural layout still reads every
    # user-spanning group inside the time slice
    box2 = {
        "user_id": box["user_id"],
        "tus": (lo_t, lo_t + (hi_t - lo_t) // 4),
    }
    assert rowgroup_hit_fraction(zo, box2) <= frac_z


def test_hilbert_reference_bijective_unit_step():
    """The order-n Hilbert index is a bijection onto [0, 4^n) and every
    consecutive index moves exactly ONE grid cell — the no-jump property
    Morton lacks (z-order jumps across quadrant seams)."""
    from rrdtool_1_x_spark.datapipe.layout import hilbert_xy2d

    for bits in (1, 2, 3, 4):
        n = 1 << bits
        pos = {}
        for x in range(n):
            for y in range(n):
                pos[hilbert_xy2d(bits, x, y)] = (x, y)
        assert sorted(pos) == list(range(n * n))
        for d in range(n * n - 1):
            (x1, y1), (x2, y2) = pos[d], pos[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1


def test_hilbert_expr_matches_reference(spark):
    """The SQL aggregate fold equals the Python reference on the full
    16x16 grid (every rotate/flip branch exercised)."""
    from rrdtool_1_x_spark.datapipe.layout import hilbert_expr, hilbert_xy2d

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    got = {
        (r["x"], r["y"]): r["d"]
        for r in df.select(
            "x", "y", hilbert_expr("x", "y", 4).alias("d")
        ).collect()
    }
    assert all(d == hilbert_xy2d(4, x, y) for (x, y), d in got.items())


def test_with_hilbert_matches_expr(spark):
    """The unrolled per-level projection chain (with_hilbert — the
    codegen form the queries use) is bit-identical to the aggregate-fold
    Column AND the Python reference on the full 16x16 grid."""
    from rrdtool_1_x_spark.datapipe.layout import (
        hilbert_expr,
        hilbert_xy2d,
        with_hilbert,
    )

    df = spark.createDataFrame(
        [(x, y) for x in range(16) for y in range(16)], "x long, y long"
    )
    rows = (
        with_hilbert(df, "x", "y", 4, "d_new")
        .withColumn("d_old", hilbert_expr("x", "y", 4))
        .collect()
    )
    assert len(rows) == 256
    for r in rows:
        assert r["d_new"] == r["d_old"] == hilbert_xy2d(4, r["x"], r["y"])


def test_with_hilbert_rejects_column_collisions(spark):
    """A clear error (not a silent shadow) when the input frame already
    carries the output name or one of the _hx/_hy/_hd temps the chained
    projections reference by name."""
    from rrdtool_1_x_spark.datapipe.layout import with_hilbert

    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="already exists"):
        with_hilbert(df.withColumn("d", F.lit(0)), "x", "y", 4, "d")
    with pytest.raises(ValueError, match="collide"):
        with_hilbert(df.withColumn("_hx", F.lit(0)), "x", "y", 4, "d")


def test_hilbert_layout_prunes_like_zorder(spark, tmp_path):
    """The Hilbert layout prunes the same 2-D boxes the z-order layout
    does (both are tight-box layouts at the same bit budget) and returns
    identical query results; BASELINE.md records the measured fractions
    side by side."""
    from rrdtool_1_x_spark.datapipe.layout import write_hilbert_layout

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("tus"),
    )
    lo_u, hi_u = ev.agg(F.min("user_id"), F.max("user_id")).first()
    lo_t, hi_t = ev.agg(F.min("tus"), F.max("tus")).first()

    nat = str(tmp_path / "natural")
    (
        ev.repartitionByRange(8, "tus")
        .sortWithinPartitions("tus")
        .write.parquet(nat)
    )
    hi = str(tmp_path / "hilbert")
    write_hilbert_layout(
        ev, hi, "user_id", "tus", (lo_u, hi_u), (lo_t, hi_t), bits=10,
        num_files=8,
    )
    box = {"user_id": (lo_u, lo_u + max((hi_u - lo_u) // 8, 0))}
    assert rowgroup_hit_fraction(nat, box) == 1.0
    frac_h = rowgroup_hit_fraction(hi, box)
    assert frac_h < 1.0
    pred = (F.col("user_id") >= box["user_id"][0]) & (
        F.col("user_id") <= box["user_id"][1]
    )
    a = sorted(
        r["event_id"] for r in spark.read.parquet(nat).filter(pred).collect()
    )
    b = sorted(
        r["event_id"] for r in spark.read.parquet(hi).filter(pred).collect()
    )
    assert a == b and len(a) > 0
