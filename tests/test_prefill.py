"""create --source / --template prefill, mirroring the reference's
tests/create-with-source-1..4 and tests/create-from-template-1 scenarios
(rrd_prefill_data, src/rrd_create.c:2626-2760; populate semantics
src/rrd_modify.c:407-561)."""

from __future__ import annotations

import math
import os
import subprocess

import pytest
from pyspark.sql import functions as F

from rrdtool_1_x_spark.catalog import DSDef, RRADef, create
from rrdtool_1_x_spark.cli import main
from rrdtool_1_x_spark.sources.prefill import create_prefilled, template_dataset
from rrdtool_1_x_spark.sources.store import SAMPLE_SCHEMA, DatasetStore

ST = 1300000000
RRAS = [
    RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=100),
    RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=5, row_cnt=2),
    RRADef(cf="MIN", xff=0.5, pdp_cnt=5, row_cnt=2),
    RRADef(cf="MAX", xff=0.5, pdp_cnt=5, row_cnt=2),
    RRADef(cf="LAST", xff=0.5, pdp_cnt=5, row_cnt=2),
]


def _gauge_ds(name="a"):
    return DSDef(name=name, dst="GAUGE", heartbeat=120)


def _mk_source(spark, path, updates, ds_names=("a",), start=ST - 1):
    d = create(
        os.path.basename(path), step=60,
        ds=[_gauge_ds(n) for n in ds_names],
        rra=[RRADef(**vars(r)) for r in RRAS], start=start,
    )
    store = DatasetStore.create(spark, path, d)
    rows = []
    for i, (t, vals) in enumerate(updates):
        for n, v in zip(ds_names, vals):
            rows.append((os.path.basename(path), n, float(t), float(v)))
    store.update(spark.createDataFrame(rows, SAMPLE_SCHEMA))
    return store


def _updates(n=51, v0=10, dv=20, start=ST):
    return [(start + i * 60, (float(v0 + i * dv),)) for i in range(n)]


def _rra_rows(store, i, within_retention=True):
    t = store._read(f"rra_{i}")
    if t is None:
        return {}
    if within_retention:
        last = store.last()
        res = store.dataset.resolution(i)
        lo = (last - last % res) - store.dataset.retention(i)
        t = t.filter(F.col("ts") > float(lo))
    return {
        (r["series_id"], r["ds_name"], int(r["ts"])): r["value"]
        for r in t.collect()
    }


def test_create_with_source_same_layout(spark, tmp_path):
    """create-with-source-1: a new dataset with the same layout prefilled
    from a populated one carries identical archive data (within
    retention), and chaining the prefill a second time stays identical."""
    a1 = _mk_source(spark, str(tmp_path / "a1"), _updates())
    d2 = create("a2", step=60, ds=[_gauge_ds()], rra=[RRADef(**vars(r)) for r in RRAS])
    a2 = create_prefilled(spark, str(tmp_path / "a2"), d2, sources=[a1])
    assert a2.last() == a1.last()
    for i in range(len(RRAS)):
        r1 = {k[1:]: v for k, v in _rra_rows(a1, i).items()}  # drop series id
        r2 = {k[1:]: v for k, v in _rra_rows(a2, i).items()}
        assert r1.keys() == r2.keys(), f"rra_{i} keys"
        for k in r1:
            assert r1[k] == pytest.approx(r2[k], rel=1e-12), (i, k)
    # chain: a3 from a2 still matches (create-with-source-1 data-match-again)
    d3 = create("a3", step=60, ds=[_gauge_ds()], rra=[RRADef(**vars(r)) for r in RRAS])
    a3 = create_prefilled(spark, str(tmp_path / "a3"), d3, sources=[a2])
    for i in range(len(RRAS)):
        assert {k[1:]: v for k, v in _rra_rows(a2, i).items()} == pytest.approx(
            {k[1:]: v for k, v in _rra_rows(a3, i).items()}, rel=1e-12
        )


def test_create_with_source_added_and_swapped_ds(spark, tmp_path):
    """create-with-source-1 a4/a6: adding a DS leaves it unknown while the
    matched-by-name DS prefills, regardless of DS order."""
    a1 = _mk_source(spark, str(tmp_path / "a1"), _updates())
    d4 = create(
        "a4", step=60, ds=[_gauge_ds("b"), _gauge_ds("a")],
        rra=[RRADef(**vars(r)) for r in RRAS],
    )
    a4 = create_prefilled(spark, str(tmp_path / "a4"), d4, sources=[a1])
    rows = _rra_rows(a4, 0)
    names = {k[1] for k in rows}
    assert names == {"a"}  # DS b has no source data -> unknown
    src = {k[2]: v for k, v in _rra_rows(a1, 0).items()}
    got = {k[2]: v for k, v in rows.items()}
    assert got == pytest.approx(src, rel=1e-12)


def test_create_with_source_two_sources(spark, tmp_path):
    """create-with-source-2: two single-DS sources merge into one two-DS
    dataset that matches the natively-updated two-DS dataset."""
    upd = _updates(n=151)
    a1 = _mk_source(spark, str(tmp_path / "a1"), upd)
    b1 = _mk_source(
        spark, str(tmp_path / "b1"),
        [(t, (2 * v[0],)) for t, v in upd], ds_names=("b",),
    )
    ab1 = _mk_source(
        spark, str(tmp_path / "ab1"),
        [(t, (v[0], 2 * v[0])) for t, v in upd], ds_names=("a", "b"),
    )
    d = create(
        "ab2", step=60, ds=[_gauge_ds("a"), _gauge_ds("b")],
        rra=[RRADef(**vars(r)) for r in RRAS],
    )
    ab2 = create_prefilled(spark, str(tmp_path / "ab2"), d, sources=[a1, b1])
    for i in range(len(RRAS)):
        want = {k[1:]: v for k, v in _rra_rows(ab1, i).items()}
        got = {k[1:]: v for k, v in _rra_rows(ab2, i).items()}
        assert want.keys() == got.keys(), f"rra_{i}"
        for k in want:
            assert want[k] == pytest.approx(got[k], rel=1e-12)


def test_create_with_source_mapping(spark, tmp_path):
    """create-with-source-and-mapping: DS:new=old pulls the old name's
    data into the new name."""
    a1 = _mk_source(spark, str(tmp_path / "a1"), _updates())
    d = create("m1", step=60, ds=[_gauge_ds("x")], rra=[RRADef(**vars(r)) for r in RRAS])
    m1 = create_prefilled(
        spark, str(tmp_path / "m1"), d, sources=[a1], mapping={"x": "a"}
    )
    src = {k[2]: v for k, v in _rra_rows(a1, 0).items()}
    got = {(k[1], k[2]): v for k, v in _rra_rows(m1, 0).items()}
    assert got == pytest.approx({("x", t): v for t, v in src.items()}, rel=1e-12)


def test_create_with_source_index_mapping(spark, tmp_path):
    """create-with-source-and-mapping-1: four sources where the DS name
    alone is ambiguous. Unmapped DS:a pulls the FIRST source holding an
    `a` (coverage walk makes earlier sources win full ties);
    ``DS:a=a[3]``/``DS:c=a[1]`` restrict the match to the 1-based source
    index (find_matching_candidates, src/rrd_create.c:2410-2420)."""
    upd = _updates()
    mk = lambda p, mul, names: _mk_source(
        spark, str(tmp_path / p),
        [(t, tuple(mul * v for v in vals)) for t, vals in upd], ds_names=names,
    )
    ax1 = mk("ax1", 1, ("a",))
    bx1 = mk("bx1", 2, ("b",))
    ay1 = mk("ay1", 3, ("a",))
    by1 = mk("by1", 4, ("b",))
    sources = [ax1, bx1, ay1, by1]

    # unmapped: DS:a matches ax1 (source 1) and ay1 (source 3); ax1's
    # identical-layout archives fully cover every bin first, so values
    # equal ax1's — the reference's match-ac1_a1 diff
    d = create(
        "u1", step=60, ds=[_gauge_ds("a"), _gauge_ds("c")],
        rra=[RRADef(**vars(r)) for r in RRAS],
    )
    u1 = create_prefilled(spark, str(tmp_path / "u1"), d, sources=sources)
    for i in range(len(RRAS)):
        want = {k[2]: v for k, v in _rra_rows(ax1, i).items()}
        got = _rra_rows(u1, i)
        assert {k[1] for k in got} == {"a"}  # c: no source -> unknown
        assert {k[2]: v for k, v in got.items()} == pytest.approx(want, rel=1e-12)

    # indexed mapping: a=a[3] -> ay1 (3x values), c=a[1] -> ax1 (1x) —
    # the reference's match-ac1 diff against the natively-updated ac1
    d = create(
        "m1", step=60, ds=[_gauge_ds("a"), _gauge_ds("c")],
        rra=[RRADef(**vars(r)) for r in RRAS],
    )
    m1 = create_prefilled(
        spark, str(tmp_path / "m1"), d, sources=sources,
        mapping={"a": ("a", 3), "c": ("a", 1)},
    )
    for i in range(len(RRAS)):
        a_want = {k[2]: v for k, v in _rra_rows(ay1, i).items()}
        c_want = {k[2]: v for k, v in _rra_rows(ax1, i).items()}
        got = _rra_rows(m1, i)
        assert {k[2]: v for k, v in got.items() if k[1] == "a"} == pytest.approx(
            a_want, rel=1e-12
        ), f"rra_{i} a"
        assert {k[2]: v for k, v in got.items() if k[1] == "c"} == pytest.approx(
            c_want, rel=1e-12
        ), f"rra_{i} c"

    # argv surface: DS:new=old[idx] grammar through the CLI
    p = str(tmp_path / "m2")
    rc = main(
        ["create", p, "--step", "60",
         "--source", str(tmp_path / "ax1"), "--source", str(tmp_path / "bx1"),
         "--source", str(tmp_path / "ay1"), "--source", str(tmp_path / "by1"),
         "DS:a=a[3]:GAUGE:120:U:U", "DS:c=a[1]:GAUGE:120:U:U",
         "RRA:AVERAGE:0.5:1:100"]
    )
    assert rc == 0
    m2 = DatasetStore(spark, p)
    got = _rra_rows(m2, 0)
    assert {k[2]: v for k, v in got.items() if k[1] == "a"} == pytest.approx(
        {k[2]: v for k, v in _rra_rows(ay1, 0).items()}, rel=1e-12
    )
    assert {k[2]: v for k, v in got.items() if k[1] == "c"} == pytest.approx(
        {k[2]: v for k, v in _rra_rows(ax1, 0).items()}, rel=1e-12
    )


def test_reconsolidation_from_finer_rra(spark, tmp_path):
    """A coarse target bin with no exact-resolution source coverage is
    re-consolidated from the finer AVERAGE archive with coverage
    weighting (prefill_bin + prefill_consolidate/finish)."""
    a1 = _mk_source(spark, str(tmp_path / "a1"), _updates())
    # target: only a coarse 10-pdp AVERAGE (no 10-pdp source RRA exists)
    d = create(
        "c1", step=60, ds=[_gauge_ds()],
        rra=[RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=10, row_cnt=5)],
    )
    c1 = create_prefilled(spark, str(tmp_path / "c1"), d, sources=[a1])
    got = {k[2]: v for k, v in _rra_rows(c1, 0).items()}
    assert got, "coarse prefill produced no rows"
    # oracle: mean of the source's fine AVERAGE rows in each 600 s window
    fine = {k[2]: v for k, v in _rra_rows(a1, 0, within_retention=False).items()}
    for T, v in got.items():
        member = [fine[t] for t in range(T - 540, T + 60, 60) if t in fine]
        assert member, T
        assert v == pytest.approx(sum(member) / len(member), rel=1e-9)


def test_create_from_template(spark, tmp_path):
    """create-from-template-1: definitions copy, last_up carries over when
    no start/sources, appended clashing DS errors, and template+source
    equals plain source prefill."""
    a1 = _mk_source(spark, str(tmp_path / "a1"), _updates())
    t = template_dataset(a1, "t1")
    assert [d.name for d in t.ds] == ["a"] and len(t.rra) == len(RRAS)
    assert t.step == 60
    with pytest.raises(ValueError, match="Duplicate DS name"):
        template_dataset(a1, "t2", extra_ds=[_gauge_ds("a")])
    # template + source == plain prefill with the same defs
    t3 = template_dataset(a1, "t3")
    s3 = create_prefilled(spark, str(tmp_path / "t3"), t3, sources=[a1])
    for i in range(len(RRAS)):
        assert {k[1:]: v for k, v in _rra_rows(a1, i).items()} == pytest.approx(
            {k[1:]: v for k, v in _rra_rows(s3, i).items()}
        )


def test_cli_create_with_source_and_template(spark, tmp_path):
    """argv surface: --source, --template, DS:new=old mapping."""
    p1 = str(tmp_path / "s1")
    rc = main(
        ["create", p1, "--start", str(ST - 1), "--step", "60",
         "DS:a:GAUGE:120:U:U", "RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:2"]
    )
    assert rc == 0
    rc = main(["update", p1] + [f"{t}:{v[0]}" for t, v in _updates()])
    assert rc == 0
    src = DatasetStore(spark, p1)
    # the CLI writes samples under series id = dataset name; a
    # single-series source prefill relabels to the target's id
    p2 = str(tmp_path / "s2")
    rc = main(
        ["create", p2, "--step", "60", "--source", p1,
         "DS:a:GAUGE:120:U:U", "RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:2"]
    )
    assert rc == 0
    new = DatasetStore(spark, p2)
    assert new.last() == src.last()
    # a single-series source merges under the NEW dataset's series id
    # (the file-is-the-series model), so later updates to s2 extend the
    # prefilled history instead of forking a second series
    got = _rra_rows(new, 0)
    assert {k[0] for k in got} == {"s2"}
    assert {k[1:]: v for k, v in got.items()} == pytest.approx(
        {k[1:]: v for k, v in _rra_rows(src, 0).items()}, rel=1e-12
    )
    # template copies the layout
    p3 = str(tmp_path / "s3")
    rc = main(["create", p3, "--template", p1])
    assert rc == 0
    t = DatasetStore(spark, p3)
    assert [d.name for d in t.dataset.ds] == ["a"]
    assert t.last() == src.last()  # template last_up carries over
    # mapping: DS:x=a
    p4 = str(tmp_path / "s4")
    rc = main(
        ["create", p4, "--step", "60", "--source", p1,
         "DS:x=a:GAUGE:120:U:U", "RRA:AVERAGE:0.5:1:100"]
    )
    assert rc == 0
    m = DatasetStore(spark, p4)
    got = {(k[1], k[2]): v for k, v in _rra_rows(m, 0).items()}
    want = {("x", k[2]): v for k, v in _rra_rows(src, 0).items()}
    assert got == pytest.approx(want)


def test_prefill_differential_reference(spark, tmp_path):
    """Cross-engine: the reference binary's create --source output (via
    fetch) matches the engine's prefilled fetch row-for-row."""
    from tests.rrdmini import ensure_binary

    binpath = ensure_binary()
    if binpath is None:
        pytest.skip("reference toolchain unavailable")
    updates = _updates()
    last = updates[-1][0]
    r1 = str(tmp_path / "r1.rrd")
    args = ["DS:a:GAUGE:120:U:U", "RRA:AVERAGE:0.5:1:100", "RRA:AVERAGE:0.5:5:20",
            "RRA:MIN:0.5:5:20", "RRA:MAX:0.5:5:20", "RRA:LAST:0.5:5:20"]
    subprocess.run(
        [binpath, "create", r1, "--start", str(ST - 1), "--step", "60"] + args,
        check=True,
    )
    subprocess.run(
        [binpath, "update", r1] + [f"{t}:{v[0]:g}" for t, v in updates], check=True
    )
    r2 = str(tmp_path / "r2.rrd")
    subprocess.run(
        [binpath, "create", r2, "--start", str(last), "--step", "60",
         "--source", r1] + args,
        check=True,
    )

    def ref_fetch(path, cf, res):
        out = subprocess.run(
            [binpath, "fetch", path, cf, "-r", str(res),
             "-s", str(ST), "-e", str(last)],
            check=True, capture_output=True, text=True,
        ).stdout
        rows = {}
        for line in out.splitlines():
            if ":" not in line:
                continue
            tss, vs = line.split(":", 1)
            v = float(vs.split()[0])
            rows[int(tss)] = None if math.isnan(v) else v
        return rows

    rras = [RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=100),
            RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=5, row_cnt=20),
            RRADef(cf="MIN", xff=0.5, pdp_cnt=5, row_cnt=20),
            RRADef(cf="MAX", xff=0.5, pdp_cnt=5, row_cnt=20),
            RRADef(cf="LAST", xff=0.5, pdp_cnt=5, row_cnt=20)]
    d1 = create("e1", step=60, ds=[_gauge_ds()], rra=rras, start=ST - 1)
    e1 = DatasetStore.create(spark, str(tmp_path / "e1"), d1)
    e1.update(spark.createDataFrame(
        [("e1", "a", float(t), v[0]) for t, v in updates], SAMPLE_SCHEMA
    ))
    d2 = create("e2", step=60, ds=[_gauge_ds()],
                rra=[RRADef(**vars(r)) for r in rras])
    e2 = create_prefilled(spark, str(tmp_path / "e2"), d2, sources=[e1], start=last)

    for cf, res in [("AVERAGE", 60), ("AVERAGE", 300), ("MIN", 300),
                    ("MAX", 300), ("LAST", 300)]:
        want = ref_fetch(r2, cf, res)
        df, plan = e2.fetch(cf, ST, last, res)
        got = {int(r["ts"]): r["value"] for r in df.collect()}
        common = sorted(set(want) & set(got))
        assert common, (cf, res)
        mismatches = [
            (t, want[t], got[t]) for t in common
            if (want[t] is None) != (got[t] is None)
            or (want[t] is not None and got[t] != pytest.approx(want[t], rel=1e-9))
        ]
        assert not mismatches, (cf, res, mismatches[:5])
