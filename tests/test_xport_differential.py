"""Differential gate for the W4/W5 baseline rows: the stub-cairo
xport/graphv subset binary (tests/rrdmini.ensure_xport_binary) must
produce the SAME values as the engine's Query path on the same series —
the proof that the reference numbers wbench.py --ref records for W4/W5
measure a correctly-working reference xport, not a miscompiled stub.

W4: xport of a 5-CDEF RPN chain (UN/IF, arith, GT) — row-for-row value
compare against Query.xport. W5: graphv PRINT of MAXIMUM/AVERAGE/
PERCENT(95) VDEFs — formatted-string compare against Query.print_.
"""

from __future__ import annotations

import re
import subprocess

import pytest

from rrdtool_1_x_spark.catalog import DSDef, RRADef, create
from rrdtool_1_x_spark.operators.cdp import consolidate
from rrdtool_1_x_spark.operators.pdp import pdp_table
from rrdtool_1_x_spark.plans.graph import Query

from tests.goldens import close
from tests.rrdmini import ensure_xport_binary

XBIN = ensure_xport_binary()
pytestmark = pytest.mark.skipif(
    XBIN is None, reason="reference xport subset build unavailable"
)

STEP = 300
START = 1200000300  # on the grid
N = 400


def _vals():
    # deterministic, with gaps (skipped updates -> NaN rows) so the
    # c1=v,UN,0,v,IF branch is exercised on both sides
    out = []
    for i in range(1, N + 1):
        if i % 37 in (5, 6):
            continue
        out.append((START + STEP * i, ((i * 13) % 207) / 2.0))
    return out


@pytest.fixture(scope="module")
def rrd(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("xportdiff")
    rrd = str(tmp / "x.rrd")
    subprocess.run(
        [XBIN.replace("rrdminix", "rrdmini"), "create", rrd,
         "--start", str(START), "--step", str(STEP),
         "DS:a:GAUGE:600:U:U", f"RRA:AVERAGE:0.5:1:{N + 10}"],
        check=True, capture_output=True,
    )
    ups = [f"{t}:{v}" for t, v in _vals()]
    for k in range(0, len(ups), 100):
        subprocess.run(
            [XBIN.replace("rrdminix", "rrdmini"), "update", rrd]
            + ups[k : k + 100],
            check=True, capture_output=True,
        )
    return rrd


@pytest.fixture(scope="module")
def engine(spark):
    df = spark.createDataFrame(
        [("s", "a", float(t), v) for t, v in _vals()],
        "series_id string, ds_name string, ts double, value double",
    )
    pdp = pdp_table(df, STEP, "GAUGE", 600, start=float(START)).cache()
    rollups = {0: consolidate(pdp, STEP, 1, "AVERAGE", 0.5).cache()}
    ds = create(
        "x", step=STEP, ds=[DSDef(name="a", dst="GAUGE", heartbeat=600)],
        rra=[RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=N + 10)],
        start=START,
    )
    return ds, rollups


END = START + STEP * N

_CDEFS = [
    ("c1", "v,UN,0,v,IF"),
    ("c2", "c1,1.1,*"),
    ("c3", "c2,100,GT,100,c2,IF"),
    ("c4", "c3,c1,+"),
    ("c5", "c4,2,/"),
]


def test_w4_xport_cdef_chain_matches(spark, rrd, engine):
    ds, rollups = engine
    ref = subprocess.run(
        [XBIN, "xport", "-s", str(START), "-e", str(END),
         "--step", str(STEP), f"DEF:v={rrd}:a:AVERAGE"]
        + [f"CDEF:{n}={r}" for n, r in _CDEFS]
        + ["XPORT:c5:out"],
        check=True, capture_output=True, text=True,
    )
    want = [
        float(m) for m in re.findall(r"<v>([^<]+)</v>", ref.stdout)
    ]
    assert len(want) >= N - 5
    q = Query(start=START, end=END, step=STEP).def_(
        "v", rollups, ds, "a", "AVERAGE", last_up=END
    )
    for n, r in _CDEFS:
        q = q.cdef(n, r)
    got = [
        r["c5"]
        for r in q.xport("c5", "out").execute(spark).frame
        .orderBy("ts").collect()
    ]
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        w = None if w != w else w  # reference NaN -> engine NULL
        assert close(g, w), f"row {i}: got {g}, want {w}"


def test_w5_graphv_vdef_prints_match(spark, rrd, engine):
    ds, rollups = engine
    ref = subprocess.run(
        [XBIN, "graphv", "/dev/null", "-s", str(START), "-e", str(END),
         f"DEF:v={rrd}:a:AVERAGE",
         "VDEF:vmax=v,MAXIMUM", "VDEF:vavg=v,AVERAGE",
         "VDEF:vp95=v,95,PERCENT",
         "PRINT:vmax:%lf", "PRINT:vavg:%lf", "PRINT:vp95:%lf"],
        check=True, capture_output=True, text=True,
    )
    want = re.findall(r"print\[\d+\] = (\S+)", ref.stdout)
    assert len(want) == 3
    res = (
        Query(start=START, end=END, step=STEP)
        .def_("v", rollups, ds, "a", "AVERAGE", last_up=END)
        .vdef("vmax", "v,MAXIMUM")
        .vdef("vavg", "v,AVERAGE")
        .vdef("vp95", "v,95,PERCENT")
        .print_("vmax", "%lf")
        .print_("vavg", "%lf")
        .print_("vp95", "%lf")
        .execute(spark)
    )
    assert res.prints == want


@pytest.fixture(scope="module")
def lstore(spark, tmp_path_factory):
    from rrdtool_1_x_spark.catalog import DatasetDef
    from rrdtool_1_x_spark.sources.store import DatasetStore

    tmp = tmp_path_factory.mktemp("xportlocal")
    ds = DatasetDef(
        name="x", step=STEP,
        ds=[DSDef(name="a", dst="GAUGE", heartbeat=600)],
        rra=[RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=N + 10)],
        start=START,
    )
    store = DatasetStore.create(spark, str(tmp / "st"), ds)
    df = spark.createDataFrame(
        [("s", "a", float(t), v) for t, v in _vals()],
        "series_id string, ds_name string, ts double, value double",
    )
    store.update(df)
    return store


def test_local_query_matches_reference_w4_w5(spark, rrd, lstore):
    """plans.local.LocalQuery (pyarrow+numpy, no Spark job) against the
    reference subset binary on BOTH wbench rows: the W4 CDEF-chain xport
    row-for-row and the W5 VDEF PRINT strings — the gate that the
    interactive local tier wbench compares to the reference is itself
    reference-exact."""
    from rrdtool_1_x_spark.plans.local import LocalQuery

    ref = subprocess.run(
        [XBIN, "xport", "-s", str(START), "-e", str(END),
         "-m", "100000", "--step", str(STEP), f"DEF:v={rrd}:a:AVERAGE"]
        + [f"CDEF:{n}={r}" for n, r in _CDEFS]
        + ["XPORT:c5:out"],
        check=True, capture_output=True, text=True,
    )
    want = [float(m) for m in re.findall(r"<v>([^<]+)</v>", ref.stdout)]
    q = LocalQuery(lstore, START, END, step=STEP).def_(
        "v", "a", "AVERAGE", series_id="s"
    )
    for n, r in _CDEFS:
        q = q.cdef(n, r)
    got = q.xport("c5", "out").execute().frame["c5"].to_numpy()
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        g = None if g != g else g
        w = None if w != w else w
        assert close(g, w), f"row {i}: got {g}, want {w}"

    refp = subprocess.run(
        [XBIN, "graphv", "/dev/null", "-s", str(START), "-e", str(END),
         "-w", "100000",
         f"DEF:v={rrd}:a:AVERAGE",
         "VDEF:vmax=v,MAXIMUM", "VDEF:vavg=v,AVERAGE",
         "VDEF:vp95=v,95,PERCENT",
         "PRINT:vmax:%lf", "PRINT:vavg:%lf", "PRINT:vp95:%lf"],
        check=True, capture_output=True, text=True,
    )
    wantp = re.findall(r"print\[\d+\] = (\S+)", refp.stdout)
    gotp = (
        LocalQuery(lstore, START, END)
        .def_("v", "a", "AVERAGE", series_id="s")
        .vdef("vmax", "v,MAXIMUM")
        .vdef("vavg", "v,AVERAGE")
        .vdef("vp95", "v,95,PERCENT")
        .print_("vmax", "%lf")
        .print_("vavg", "%lf")
        .print_("vp95", "%lf")
        .execute()
        .prints
    )
    assert gotp == wantp


def test_reduce_boundary_rule_matches_reference(spark, rrd, engine, lstore):
    """rrd_reduce_data's boundary rule (src/rrd_graph.c:840-861): with
    --step 2x the archive step and a range whose start/end are NOT
    aligned to the new step, the partial edge windows are forced
    unknown and their source rows discarded. START/END here are odd
    multiples of 300, so both offsets are nonzero — the exact case the
    ceil-grouping consolidation used to get wrong. Checked row-for-row
    on the distributed Query AND LocalQuery, plus a VDEF AVERAGE over
    the reduced frame (the boundary rows must not leak into scalars)."""
    from rrdtool_1_x_spark.plans.local import LocalQuery

    ref = subprocess.run(
        [XBIN, "xport", "-s", str(START), "-e", str(END),
         "-m", "100000", "--step", "600", f"DEF:v={rrd}:a:AVERAGE",
         "XPORT:v:out"],
        check=True, capture_output=True, text=True,
    )
    want = [float(m) for m in re.findall(r"<v>([^<]+)</v>", ref.stdout)]
    ds, rollups = engine
    q = (
        Query(start=START, end=END, step=600)
        .def_("v", rollups, ds, "a", "AVERAGE", last_up=END)
        .xport("v", "out")
    )
    got = [
        r["v"] for r in q.execute(spark).frame.orderBy("ts").collect()
    ]
    assert len(got) == len(want), (len(got), len(want))
    for i, (g, w) in enumerate(zip(got, want)):
        w = None if w != w else w
        assert close(g, w), f"dist row {i}: got {g}, want {w}"
    lq = (
        LocalQuery(lstore, START, END, step=600)
        .def_("v", "a", "AVERAGE", series_id="s")
        .xport("v", "out")
    )
    lgot = lq.execute().frame["v"].to_numpy()
    assert len(lgot) == len(want)
    for i, (g, w) in enumerate(zip(lgot, want)):
        g = None if g != g else g
        w = None if w != w else w
        assert close(g, w), f"local row {i}: got {g}, want {w}"

    # VDEF over the reduced DEF: reference graphv with --step 600
    refp = subprocess.run(
        [XBIN, "graphv", "/dev/null", "-s", str(START), "-e", str(END),
         "-w", "100000", "--step", "600",
         f"DEF:v={rrd}:a:AVERAGE",
         "VDEF:vavg=v,AVERAGE", "VDEF:vp90=v,90,PERCENT",
         "PRINT:vavg:%lf", "PRINT:vp90:%lf"],
        check=True, capture_output=True, text=True,
    )
    wantp = re.findall(r"print\[\d+\] = (\S+)", refp.stdout)
    res = (
        Query(start=START, end=END, step=600)
        .def_("v", rollups, ds, "a", "AVERAGE", last_up=END)
        .vdef("vavg", "v,AVERAGE")
        .vdef("vp90", "v,90,PERCENT")
        .print_("vavg", "%lf")
        .print_("vp90", "%lf")
        .execute(spark)
    )
    assert res.prints == wantp
    lres = (
        LocalQuery(lstore, START, END, step=600)
        .def_("v", "a", "AVERAGE", series_id="s")
        .vdef("vavg", "v,AVERAGE")
        .vdef("vp90", "v,90,PERCENT")
        .print_("vavg", "%lf")
        .print_("vp90", "%lf")
        .execute()
    )
    assert lres.prints == wantp


def test_local_fallback_predict_byte_identical(spark, lstore, capsys):
    """The LocalQuery fallback contract (cli.xport_result): an RPN token
    outside the local tier's op set (PREDICT here) raises
    LocalUnsupported at execute time and the CLI rebuilds the same query
    on the distributed path — ``--local`` is a latency hint, never a
    capability restriction. Byte-identical xport output either way, for
    both the fallback chain and (control) a local-supported chain."""
    from rrdtool_1_x_spark.cli import main
    from rrdtool_1_x_spark.plans.local import LocalQuery, LocalUnsupported

    base = [
        "-s", str(START), "-e", str(START + STEP * 50),
        "--step", str(STEP),
        f"DEF:v={lstore.path}:a:AVERAGE",
    ]
    pred = ["CDEF:p=1800,1,1800,v,PREDICT", "XPORT:p:pred"]
    supp = ["CDEF:c=v,UN,0,v,IF,2,*", "XPORT:c:twice"]

    # the local tier itself must refuse PREDICT (the contract the CLI
    # fallback rests on), and accept the control chain
    lq = (
        LocalQuery(lstore, START, START + STEP * 50, step=STEP)
        .def_("v", "a", "AVERAGE", series_id="s")
        .cdef("p", "1800,1,1800,v,PREDICT")
        .xport("p", "pred")
    )
    with pytest.raises(LocalUnsupported):
        lq.execute()

    for extra in (pred, supp):
        assert main(["xport"] + base + extra) == 0
        dist_out = capsys.readouterr().out
        assert main(["xport", "--local"] + base + extra) == 0
        local_out = capsys.readouterr().out
        assert local_out == dist_out
        assert "<v>" in dist_out


def test_circular_cdef_clean_diagnostic(spark, engine, lstore):
    """Mutually-referencing CDEFs (a=b,…, b=a,…) must fail with a clean
    ValueError in BOTH tiers, not recurse to RecursionError ('done' is
    only recorded after evaluation completes, so without an in-progress
    guard the resolvers re-enter forever). Self-reference too."""
    from rrdtool_1_x_spark.plans.local import LocalQuery

    lq = (
        LocalQuery(lstore, START, START + STEP * 10, step=STEP)
        .def_("v", "a", "AVERAGE", series_id="s")
        .cdef("x", "y,1,+")
        .cdef("y", "x,1,+")
        .xport("x", "loop")
    )
    with pytest.raises(ValueError, match="circular CDEF"):
        lq.execute()

    ds, rollups = engine
    q = (
        Query(start=START, end=START + STEP * 10, step=STEP)
        .def_("v", rollups, ds, "a", "AVERAGE", last_up=END)
        .cdef("x", "y,1,+")
        .cdef("y", "x,1,+")
        .xport("x", "loop")
    )
    with pytest.raises(ValueError, match="circular CDEF"):
        q.execute(spark)

    q2 = (
        Query(start=START, end=START + STEP * 10, step=STEP)
        .def_("v", rollups, ds, "a", "AVERAGE", last_up=END)
        .cdef("x", "x,1,+")
        .xport("x", "loop")
    )
    with pytest.raises(ValueError, match="circular CDEF"):
        q2.execute(spark)
