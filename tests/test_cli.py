"""The rrdtool-compatible CLI: a reference user's command sequence ports
verbatim (create → update → fetch → xport → graphv PRINT → info/first/
last/lastupdate → dump/restore → tune → resize → list)."""

from __future__ import annotations

import json

import pytest

from rrdtool_1_x_spark.cli import main

START = 920804400
UPDATES = [
    (920804700, 12345), (920805000, 12357), (920805300, 12363),
    (920805600, 12363), (920805900, 12363), (920806200, 12373),
    (920806500, 12383), (920806800, 12393), (920807100, 12399),
]


@pytest.fixture(scope="module")
def ds_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "speed")
    rc = main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:6:100",
    ])
    assert rc == 0
    rc = main(["update", p] + [f"{t}:{v}" for t, v in UPDATES])
    assert rc == 0
    return p


def test_cli_fetch(ds_path, capsys):
    rc = main([
        "fetch", ds_path, "AVERAGE", "-r", "300",
        "-s", str(START), "-e", str(UPDATES[-1][0]),
    ])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0].strip() == "speed"
    rows = {
        int(l.split(":")[0]): l.split(":")[1].strip()
        for l in out[2:] if ":" in l
    }
    # known COUNTER rate at the first full step (12357-12345)/300 = 0.04
    assert abs(float(rows[920805000]) - 0.04) < 1e-12


def test_cli_scalars(ds_path, capsys):
    for cmd, want in [("first", None), ("last", str(UPDATES[-1][0]))]:
        assert main([cmd, ds_path]) == 0
        got = capsys.readouterr().out.strip()
        if want is not None:
            assert got == want
    assert main(["info", ds_path]) == 0
    info = capsys.readouterr().out
    assert 'ds[speed].type = "COUNTER"' in info and "step = 300" in info
    assert main(["lastupdate", ds_path]) == 0
    lu = capsys.readouterr().out.splitlines()
    assert lu[0].strip() == "speed" and lu[2].startswith(str(UPDATES[-1][0]))


def test_cli_xport_json_and_graphv(ds_path, capsys):
    rc = main([
        "xport", "--json", "-s", str(START), "-e", str(UPDATES[-1][0]),
        "--step", "300",
        f"DEF:v={ds_path}:speed:AVERAGE",
        "CDEF:kmh=v,3600,*",
        "XPORT:kmh:km/h",
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["meta"]["legend"] == ["km/h"]
    vals = [r[0] for r in doc["data"] if r[0] is not None]
    assert any(abs(v - 144.0) < 1e-9 for v in vals)  # 0.04 * 3600

    rc = main([
        "graphv", "/dev/null", "-s", str(START), "-e", str(UPDATES[-1][0]),
        f"DEF:v={ds_path}:speed:AVERAGE",
        "CDEF:kmh=v,3600,*",
        "VDEF:vmax=kmh,MAXIMUM",
        "PRINT:vmax:max %.2lf",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "graph_step = 300" in out
    assert 'print[0] = "max 144.00"' in out


def test_cli_dump_restore_roundtrip(ds_path, tmp_path, capsys):
    xml = str(tmp_path / "d.xml")
    assert main(["dump", ds_path, xml]) == 0
    restored = str(tmp_path / "restored")
    assert main(["restore", xml, restored]) == 0
    assert main(["last", restored]) == 0
    assert capsys.readouterr().out.strip() == str(UPDATES[-1][0])


def test_cli_tune_resize_list(ds_path, capsys):
    assert main(["tune", ds_path, "--heartbeat", "speed:900"]) == 0
    assert main(["info", ds_path]) == 0
    assert "ds[speed].minimal_heartbeat = 900" in capsys.readouterr().out
    assert main(["resize", ds_path, "0", "GROW", "100"]) == 0
    assert main(["info", ds_path]) == 0
    assert "rra[0].rows = 700" in capsys.readouterr().out
    import os

    assert main(["list", os.path.dirname(ds_path)]) == 0
    assert "speed" in capsys.readouterr().out.split()
    # --recursive descends and prints root-relative paths (rrd_list_rec)
    parent = os.path.dirname(os.path.dirname(ds_path))
    assert main(["list", "--recursive", parent]) == 0
    listed = capsys.readouterr().out.split()
    rel = os.path.relpath(ds_path, parent)
    assert rel in listed


def test_cli_daemon_routing(spark, tmp_path, capsys):
    """-d/--daemon routes update/fetch/flushcached through a running
    rrdcached-protocol server, and the daemon path is output-identical to
    the library path — the reference's TESTS_STYLE matrix runs every test
    both ways (tests/functions:232-271; rrdc_fetch src/rrd_fetch.c:198-205)."""
    from rrdtool_1_x_spark.sources.store import DatasetStore
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon
    from rrdtool_1_x_spark.streaming.ingest import StreamingIngest

    create_argv = [
        "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]
    specs = [f"{t}:{v}" for t, v in UPDATES]
    fetch_argv = ["AVERAGE", "-s", str(START), "-e", str(UPDATES[-1][0])]

    lib = str(tmp_path / "lib")
    assert main(["create", lib] + create_argv) == 0
    assert main(["update", lib] + specs) == 0
    assert main(["fetch", lib] + fetch_argv) == 0
    out_lib = capsys.readouterr().out

    dmn = str(tmp_path / "dmn")
    assert main(["create", dmn] + create_argv) == 0
    store = DatasetStore(spark, dmn)
    daemon = IngestDaemon(StreamingIngest(store), write_interval=1e9)
    with DaemonServer(daemon) as srv:
        addr = f"127.0.0.1:{srv.address[1]}"
        assert main(["update", dmn, "-d", addr] + specs) == 0
        assert store._read("samples") is None  # buffered in the daemon
        assert main(["flushcached", "-d", addr, dmn]) == 0
        assert store._read("samples").count() == len(UPDATES)
        assert main(["fetch", dmn, "-d", addr] + fetch_argv) == 0
        out_dmn = capsys.readouterr().out
    assert out_dmn == out_lib

    # first/last route through the daemon too (LAST flushes pending first)
    store_fl = DatasetStore(spark, dmn)
    with DaemonServer(
        IngestDaemon(StreamingIngest(store_fl), write_interval=1e9)
    ) as srv:
        addr = f"127.0.0.1:{srv.address[1]}"
        newer = UPDATES[-1][0] + 300
        assert main(["update", dmn, "-d", addr, f"{newer}:99999"]) == 0
        assert main(["last", dmn, "-d", addr]) == 0
        assert capsys.readouterr().out.strip() == str(newer)
        assert main(["first", dmn, "-d", addr]) == 0
        assert int(capsys.readouterr().out.strip()) == store_fl.first(0)

    # RRDCACHED_ADDRESS env routing, second lifecycle run (matrix rerun)
    env = str(tmp_path / "env")
    assert main(["create", env] + create_argv) == 0
    store2 = DatasetStore(spark, env)
    with DaemonServer(
        IngestDaemon(StreamingIngest(store2), write_interval=1e9)
    ) as srv:
        import os

        os.environ["RRDCACHED_ADDRESS"] = f"127.0.0.1:{srv.address[1]}"
        try:
            assert main(["update", env] + specs) == 0
            assert main(["flushcached", env]) == 0
            assert main(["fetch", env] + fetch_argv) == 0
        finally:
            del os.environ["RRDCACHED_ADDRESS"]
    assert capsys.readouterr().out == out_lib


def test_cli_xport_output_dir_and_daemon_flush(ds_path, spark, tmp_path, capsys):
    """xport --output writes the distributed CSV sink (part files whose
    concatenation equals the in-memory formatter's rows), and -d flushes
    the referenced series through the daemon before reading — the
    reference's rrdc_flush_if_daemon in graph/xport option handling."""
    import os

    from rrdtool_1_x_spark.sources.store import DatasetStore
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon
    from rrdtool_1_x_spark.streaming.ingest import StreamingIngest

    argv = [
        "-s", str(START), "-e", str(UPDATES[-1][0]), "--step", "300",
        f"DEF:v={ds_path}:speed:AVERAGE", "XPORT:v:speed",
    ]
    out_dir = str(tmp_path / "xout")
    assert main(["xport", "--output", out_dir] + argv) == 0
    parts = sorted(
        f"{out_dir}/rows/{p}" for p in os.listdir(f"{out_dir}/rows")
        if p.startswith("part-")
    )
    body = "".join(open(p).read() for p in parts)
    assert main(["xport"] + argv) == 0  # XML path still fine
    assert "<xport>" in capsys.readouterr().out
    # distributed rows carry the same quoted %.7e cells, one per grid slot:
    # rows run (start, end] with ts = interval END (rrd_fetch alignment;
    # an aligned end gains no extra step — tests/xport1 golden convention)
    n_rows = (UPDATES[-1][0] - START) // 300
    assert body.count("\n") == n_rows
    assert '"4.0000000e-02"' in body  # the known first full-step rate

    # -d: pending daemon values are flushed before the query reads
    dmn = str(tmp_path / "dflush")
    assert main([
        "create", dmn, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    store = DatasetStore(spark, dmn)
    with DaemonServer(
        IngestDaemon(StreamingIngest(store), write_interval=1e9)
    ) as srv:
        addr = f"127.0.0.1:{srv.address[1]}"
        assert main(["update", dmn, "-d", addr]
                    + [f"{t}:{v}" for t, v in UPDATES]) == 0
        assert store._read("samples") is None  # still buffered
        assert main([
            "xport", "--json", "-d", addr,
            "-s", str(START), "-e", str(UPDATES[-1][0]), "--step", "300",
            f"DEF:v={dmn}:speed:AVERAGE", "XPORT:v",
        ]) == 0
        doc = json.loads(capsys.readouterr().out)
        vals = [v[0] for v in doc["data"] if v[0] is not None]
        assert vals, "daemon flush-before-read should surface the updates"
        assert abs(vals[0] - 0.04) < 1e-12


def test_cli_tune_modify_positionals(spark, tmp_path, capsys):
    """tune's modify-style positionals (handle_modify via rrd_tune,
    src/rrd_modify.c:1311-1415): DS: adds with exact backfill, DEL: drops,
    RRA: adds, RRA#idx:[+-=]n resizes, DELRRA: removes."""
    from rrdtool_1_x_spark.sources.store import DatasetStore

    p = str(tmp_path / "mod")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    assert main(["update", p] + [f"{t}:{v}" for t, v in UPDATES]) == 0

    assert main(["tune", p, "DS:alt:GAUGE:600:U:U"]) == 0
    assert main(["tune", p, "RRA:MAX:0.5:2:100", "RRA#0:+50", "RRA#1:=80"]) == 0
    d = DatasetStore(spark, p).dataset
    assert [x.name for x in d.ds] == ["speed", "alt"]
    assert [(r.cf, r.row_cnt) for r in d.rra] == [("AVERAGE", 650), ("MAX", 80)]
    # the added MAX archive backfilled exactly from raw samples
    st = DatasetStore(spark, p)
    got = {int(r["ts"]): r["value"] for r in st._read("rra_1").collect()}
    assert got and max(got.values()) > 0

    assert main(["tune", p, "DELRRA:1", "DEL:alt"]) == 0
    d = DatasetStore(spark, p).dataset
    assert [x.name for x in d.ds] == ["speed"]
    assert [r.cf for r in d.rra] == ["AVERAGE"]
    assert main(["tune", p, "RRA#0:?10"]) == 1
    assert "invalid operation" in capsys.readouterr().err


def test_cli_updatev(spark, tmp_path, capsys):
    """updatev reports the CDPs written by this call in the reference's
    [<ts>]RRA[<CF>][<pdp>]DS[<name>] format (src/rrd_update.c:2437-2448),
    and refuses daemon routing like the reference."""
    p = str(tmp_path / "uv")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:6:100",
    ]) == 0
    assert main(["updatev", p] + [f"{t}:{v}" for t, v in UPDATES[:3]]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == "return_value = 0"
    cdps = [l for l in out[1:] if l.startswith("[")]
    # 3 readings -> 2 known fine CDPs (the first COUNTER reading has no
    # previous sample; unknown rows are not materialized), no 6-step yet
    assert len(cdps) == 2
    assert cdps[0].startswith(f"[{UPDATES[1][0]}]RRA[AVERAGE][1]DS[speed] = ")
    assert "RRA[AVERAGE][6]" not in "".join(cdps)

    # the next batch crosses an 1800s boundary: the coarse CDP appears
    assert main(["updatev", p] + [f"{t}:{v}" for t, v in UPDATES[3:8]]) == 0
    out = capsys.readouterr().out.splitlines()
    coarse = [l for l in out if "RRA[AVERAGE][6]" in l]
    assert len(coarse) == 1 and coarse[0].startswith("[920806200]")

    import os

    os.environ["RRDCACHED_ADDRESS"] = "127.0.0.1:1"
    try:
        assert main(["updatev", p, "920809000:1"]) == 1
    finally:
        del os.environ["RRDCACHED_ADDRESS"]
    assert "cannot be used" in capsys.readouterr().err


def test_cli_graphv_elements_bounds(ds_path, capsys, tmp_path):
    """graphv LINE/AREA/STACK elements resolve through data_proc and the
    info list carries the autoscale bounds (rrd_graph_v value_min/max);
    stacked areas raise the max, skipscale lines don't."""
    base = [
        str(tmp_path / "g.png"), "-s", str(START), "-e", str(UPDATES[-1][0]),
        f"DEF:v={ds_path}:speed:AVERAGE", "CDEF:kmh=v,3600,*",
    ]
    assert main(["graphv"] + base + ["AREA:kmh#ff0000:rate",
                                     "STACK:kmh:again"]) == 0
    out = capsys.readouterr().out
    vmin = float(out.split("value_min = ")[1].splitlines()[0])
    vmax = float(out.split("value_max = ")[1].splitlines()[0])
    # 2x max rate = 288, snapped outward to the sensible grid value 300
    # (si_unit + expand_range, src/rrd_graph.c:613-700)
    assert vmin == 0.0 and abs(vmax - 300.0) < 1e-6

    assert main(["graphv"] + base + [
        "LINE1:kmh#0000ff:rate", "LINE2:1000:ceiling:skipscale",
    ]) == 0
    out = capsys.readouterr().out
    vmax2 = float(out.split("value_max = ")[1].splitlines()[0])
    assert abs(vmax2 - 200.0) < 1e-6  # skipscale excluded; 144 snaps to 200

    # -l/-u expand-only bounds vs --rigid (src/rrd_graph.c:1486-1528)
    line = ["LINE1:kmh#0000ff:rate"]
    assert main(["graphv", "-l", "-10", "-u", "50"] + base + line) == 0
    out = capsys.readouterr().out
    assert "value_min = -1.0000000000e+01" in out  # user floor kept
    assert "value_max = 2.0000000000e+02" in out   # data expands past -u, snapped
    assert main(["graphv", "-l", "-10", "-u", "50", "--rigid"] + base + line) == 0
    out = capsys.readouterr().out
    assert "value_max = 5.0000000000e+01" in out   # rigid pins the limit


def test_cli_def_step_reduce_options(ds_path, capsys):
    """DEF :step= and :reduce= options (getKeyValueArgument,
    src/rrd_graph_helper.c:644): the fetched rows re-consolidate to the
    wished step under the given CF."""
    assert main([
        "xport", "--json", "-s", str(START), "-e", str(UPDATES[-1][0]),
        f"DEF:v={ds_path}:speed:AVERAGE:step=900:reduce=MAX",
        "XPORT:v:vmax",
    ]) == 0
    doc = json.loads(capsys.readouterr().out)
    assert doc["meta"]["step"] == 900
    vals = [v[0] for v in doc["data"] if v[0] is not None]
    # MAX of the 3 fine rates in each 900 s window; first window holds
    # rates 0.04, 0.02 -> 0.04
    assert vals[0] == 0.04


def test_cli_multi_series_defs(spark, tmp_path, capsys):
    """A multi-series store is ambiguous for a DEF (the reference's file IS
    the series): without :series= the CLI refuses; with it, the DEF reads
    exactly that series."""
    from rrdtool_1_x_spark.sources.store import DatasetStore

    p = str(tmp_path / "multi")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100",
    ]) == 0
    rows = [
        (sid, "v", float(START + 300 * (i + 1)), base + i)
        for sid, base in (("s1", 10.0), ("s2", 100.0))
        for i in range(4)
    ]
    st = DatasetStore(spark, p)
    st.update(spark.createDataFrame(
        rows, "series_id string, ds_name string, ts double, value double"))

    argv = ["xport", "--json", "-s", str(START), "-e", str(START + 1200),
            f"DEF:a={p}:v:AVERAGE", "XPORT:a"]
    assert main(argv) == 1
    assert "multiple series" in capsys.readouterr().err

    argv2 = ["xport", "--json", "-s", str(START), "-e", str(START + 1200),
             f"DEF:a={p}:v:AVERAGE:series=s2", "XPORT:a"]
    assert main(argv2) == 0
    doc = json.loads(capsys.readouterr().out)
    vals = [v[0] for v in doc["data"] if v[0] is not None]
    assert vals == [100.0, 101.0, 102.0, 103.0]


def test_cli_multi_ds_defs(spark, tmp_path, capsys):
    """Two DEFs addressing different DSs of ONE dataset must each resolve
    to their own column — regression: the DEF scan didn't filter ds_name,
    so every DEF saw every DS and the grid join fanned out (peak read 40
    instead of 25 on the classic in/out traffic graph)."""
    p = str(tmp_path / "net")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:inb:COUNTER:600:U:U", "DS:outb:COUNTER:600:U:U",
        "RRA:AVERAGE:0.5:1:100",
    ]) == 0
    assert main(["update", p,
                 f"{START + 300}:3000:1500", f"{START + 600}:6000:3000",
                 f"{START + 900}:12000:4500", f"{START + 1200}:15000:7500"]) == 0
    assert main([
        "graphv", str(tmp_path / "g.png"), "-s", str(START),
        "-e", str(START + 1200),
        f"DEF:i={p}:inb:AVERAGE", f"DEF:o={p}:outb:AVERAGE",
        "CDEF:io=i,o,+", "AREA:i#00ff00:in", "STACK:o:out",
        "VDEF:m=io,MAXIMUM", "PRINT:m:peak %.1lf",
    ]) == 0
    out = capsys.readouterr().out
    assert 'print[0] = "peak 25.0"' in out, out
    assert "value_max = 2.5000000000e+01" in out


def test_cli_create_overwrite_semantics(spark, tmp_path, capsys):
    """create truncates an existing dataset by default (stale archives must
    not survive, like re-creating a .rrd file) and fails with
    -O/--no-overwrite (tests/create-no-overwrite)."""
    p = str(tmp_path / "ow")
    argv = ["--start", str(START), "--step", "300",
            "DS:speed:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]
    assert main(["create", p] + argv) == 0
    assert main(["update", p, f"{START + 300}:42"]) == 0
    # re-create: the old data is gone
    assert main(["create", p] + argv) == 0
    from rrdtool_1_x_spark.sources.store import DatasetStore

    assert DatasetStore(spark, p)._read("samples") is None
    # -O refuses to clobber
    assert main(["create", p, "-O"] + argv) == 1
    assert "File exists" in capsys.readouterr().err


def test_cli_batch_mode(spark, tmp_path, capsys, monkeypatch):
    """``rrdtool -`` batch mode (src/rrd_tool.c:519-700): one command per
    stdin line, OK/ERROR per command, shell built-ins, keeps going after
    errors."""
    import io
    import os

    from rrdtool_1_x_spark.cli import batch_main

    monkeypatch.chdir(tmp_path)
    script = "\n".join([
        "mkdir lake",
        "cd lake",
        "pwd",
        "create s1 --start %d --step 300 DS:v:GAUGE:600:U:U RRA:AVERAGE:0.5:1:100" % START,
        "update s1 %d:42 %d:44" % (START + 300, START + 600),
        "nosuchcmd x",
        "fetch s1 AVERAGE -s %d -e %d" % (START, START + 600),
        "ls",
        "quit",
        "update never:reached 1:2",
    ])
    assert batch_main(io.StringIO(script)) == 0
    out = capsys.readouterr().out.splitlines()
    assert out[0] == str(tmp_path / "lake")  # pwd after cd
    oks = [l for l in out if l.startswith("OK u:")]
    assert len(oks) == 3  # create, update, fetch each acknowledged
    assert any(l.startswith("ERROR: unknown command") for l in out)
    assert "- s1" in out  # dataset dir lists like a file
    assert any(l.startswith(f"{START + 300}: ") for l in out)  # fetch rows
    assert not any("never:reached" in l for l in out)  # quit stops the loop
    os.chdir("/root/repo")


def test_cli_errors(capsys):
    assert main(["nosuchcmd"]) == 1
    assert "unknown command" in capsys.readouterr().err
    assert main(["fetch", "/nonexistent/path", "AVERAGE"]) == 1
    assert "ERROR" in capsys.readouterr().err


def test_create_atomic_no_destroy_on_bad_spec(spark, tmp_path):
    """A failed re-create must not destroy the existing dataset: args are
    validated and sources opened before anything is removed, and the new
    tree is built in a temp dir swapped in only on success
    (≙ rrd_create writing a temp file, src/rrd_create.c:1043-1078)."""
    import os

    p = str(tmp_path / "atomic")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    assert main(["update", p, "920804700:12345", "920805000:12357"]) == 0

    # malformed DS spec → error, old data fully intact
    assert main(["create", p, "DS:bogus", "RRA:AVERAGE:0.5:1:600"]) != 0
    from rrdtool_1_x_spark.sources.store import DatasetStore

    st = DatasetStore(spark, p)
    assert st.last() == 920805000
    # unreadable --source → error, old data intact
    assert main([
        "create", p, "--source", str(tmp_path / "nope"),
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) != 0
    assert DatasetStore(spark, p).last() == 920805000
    assert not [n for n in os.listdir(tmp_path) if ".create-tmp." in n]


def test_create_in_place_restructure(spark, tmp_path):
    """`create X --source X` — the reference's in-place restructure reads
    the old dataset as its own prefill source (rrd_create temp-file dance);
    the data must survive into the new layout."""
    p = str(tmp_path / "self")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    assert main(["update", p] + [f"{t}:{v}" for t, v in UPDATES]) == 0

    # restructure in place: same DS, extra RRA, prefilled from itself
    assert main([
        "create", p, "--source", p, "--step", "300",
        "DS:speed:COUNTER:600:U:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:MAX:0.5:1:600",
    ]) == 0
    from rrdtool_1_x_spark.sources.store import DatasetStore

    st = DatasetStore(spark, p)
    assert len(st.dataset.rra) == 2
    # the AVERAGE archive kept its consolidated rates
    rows = {int(r["ts"]): r["value"] for r in st._read("rra_0").collect()
            if r["value"] is not None}
    assert abs(rows[920805000] - 0.04) < 1e-12


def test_update_daemon_with_template_errors(spark, tmp_path):
    """--daemon plus --template must error like the reference
    (rrd_update.c:590) instead of silently writing direct and racing the
    daemon's buffered rows."""
    p = str(tmp_path / "dt")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    assert main([
        "update", p, "-d", "127.0.0.1:1", "--template", "speed",
        "920804700:12345",
    ]) != 0
    # and the head did NOT advance: no silent direct write happened
    from rrdtool_1_x_spark.sources.store import DatasetStore

    assert DatasetStore(spark, p)._read("samples") is None


def test_dump_auto_distributed(spark, tmp_path, monkeypatch):
    """Above the slot threshold, plain `dump` renders executor-side and
    streams fragments into the output file — byte-identical to the
    driver-side writer."""
    from rrdtool_1_x_spark import cli as cli_mod

    p = str(tmp_path / "big")
    assert main([
        "create", p, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    assert main(["update", p] + [f"{t}:{v}" for t, v in UPDATES]) == 0

    drv, dist = str(tmp_path / "drv.xml"), str(tmp_path / "dist.xml")
    assert main(["dump", p, drv]) == 0  # below threshold: driver path
    monkeypatch.setattr(cli_mod, "DUMP_DRIVER_MAX_SLOTS", 10)
    assert main(["dump", p, dist]) == 0  # above: auto-distributed
    a, b = open(drv).read(), open(dist).read()
    assert a == b and "<database>" in a


def test_list1_semantics(spark, tmp_path, capsys):
    """Mirror of the reference's tests/list1 matrix: empty dir lists
    nothing; a dataset path lists its own name; plain mode lists datasets
    AND subdirectories (regular non-rrd files skipped); recursive mode
    lists datasets only; no parameters prints Usage."""
    import os

    root = str(tmp_path / "ldir")
    os.makedirs(root)
    assert main(["list", root]) == 0
    assert capsys.readouterr().out.strip() == ""  # empty dir

    first = str(tmp_path / "first")
    assert main([
        "create", first, "--start", str(START), "--step", "300",
        "DS:speed:COUNTER:600:U:U", "RRA:AVERAGE:0.5:1:600",
    ]) == 0
    assert main(["list", first]) == 0  # single dataset path → its name
    assert capsys.readouterr().out.split() == ["first"]

    import shutil

    shutil.copytree(first, f"{root}/first")
    shutil.copytree(first, f"{root}/second")
    shutil.copytree(first, f"{root}/third")
    assert main(["list", root]) == 0
    assert len(capsys.readouterr().out.split()) == 3

    open(f"{root}/not_an_rrd", "w").write("x")  # plain file: skipped
    assert main(["list", root]) == 0
    assert len(capsys.readouterr().out.split()) == 3

    os.makedirs(f"{root}/new_dir")  # plain dir: listed in plain mode
    assert main(["list", root]) == 0
    assert len(capsys.readouterr().out.split()) == 4

    os.makedirs(f"{root}/new_dir2")
    shutil.copytree(first, f"{root}/new_dir2/fourth")
    shutil.copytree(first, f"{root}/new_dir2/fifth")
    assert main(["list", "--recursive", root]) == 0
    listed = capsys.readouterr().out.split()
    assert len(listed) == 5  # datasets only, root-relative paths
    assert "new_dir2/fourth" in listed and "new_dir" not in listed

    assert main(["list"]) == 1  # Usage
    assert "Usage" in capsys.readouterr().err


def test_rrdcreate_diagnostics_and_duration_grammar(spark, tmp_path, capsys):
    """Mirror of the reference's tests/rrdcreate: bad create argv must be
    diagnosed (zero/negative/non-numeric step, invalid suffix, misaligned
    RRA steps/rows, missing heartbeat/max, min>max), and the duration
    grammar must be exactly equivalent to raw counts (the ct.out/dur.out
    info identity)."""
    p = str(tmp_path / "junk")
    base_ds = "DS:v:GAUGE:5:U:U"
    base_rra = "RRA:AVERAGE:0.5:1:100"

    def fails(*args):
        rc = main(["create", str(tmp_path / "foo"), "--start", "now", *args])
        assert rc != 0, args
        capsys.readouterr()

    fails("--step", "0", base_ds, base_rra)        # zero step
    fails("--step", "-1", base_ds, base_rra)       # negative step
    fails("--step", "one", base_ds, base_rra)      # non-numeric step
    fails("--step", "2H", base_ds, base_rra)       # invalid suffix (case!)
    fails("--step", "10s", base_ds, "RRA:AVERAGE:0.5:15s:1h")  # misaligned steps
    fails("--step", "10s", base_ds, "RRA:AVERAGE:0.5:10s:75s") # misaligned rows
    fails("--step", "5s", base_ds, "RRA:AVERAGE:0.5:15s:10s")  # zero rows
    fails("--step", "5s", "DS:v:GAUGE:5", "RRA:AVERAGE:0.5:15s:10s")   # no min/max
    fails("--step", "5s", "DS:v:GAUGE:xx:U:U", "RRA:AVERAGE:0.5:15s:1m")  # bad hb
    fails("--step", "5s", "DS:v:GAUGE:30s:5:3", "RRA:AVERAGE:0.5:15s:1m")  # min>max
    fails("--step", "5s", "DS:v:GAUGE:30s:53", "RRA:AVERAGE:0.5:15s:1m")   # no max

    def info_of(*args):
        assert main(["create", p, *args]) == 0
        assert main(["info", p]) == 0
        out = capsys.readouterr().out
        import shutil

        shutil.rmtree(p)
        return out

    ct = info_of(
        "--start", "0", "--step", "1",
        "DS:watts:GAUGE:300:0:24000",
        "RRA:AVERAGE:0.5:1:864000", "RRA:AVERAGE:0.5:60:129600",
        "RRA:AVERAGE:0.5:3600:13392", "RRA:AVERAGE:0.5:86400:3660",
    )
    dur = info_of(
        "--start", "0", "--step", "1s",
        "DS:watts:GAUGE:5m:0:24000",
        "RRA:AVERAGE:0.5:1s:10d", "RRA:AVERAGE:0.5:1m:90d",
        "RRA:AVERAGE:0.5:1h:18M", "RRA:AVERAGE:0.5:1d:10y",
    )
    assert ct == dur  # 1-sec PDP equivalents, byte-identical info


def test_graph1_golden_print(spark, tmp_path, capsys):
    """Mirror of tests/graph1's checkable data output: graphv with a
    hyphenated DEF vname and VDEF MAXIMUM prints exactly "0.040000"
    (the committed graph1.output golden line)."""
    p = str(tmp_path / "graph1")
    assert main([
        "create", p, "--start", "920804400", "DS:speed:COUNTER:600:U:U",
        "RRA:AVERAGE:0.5:1:24", "RRA:AVERAGE:0.5:6:10",
    ]) == 0
    vals = [12345, 12357, 12363, 12363, 12363, 12373, 12383, 12393,
            12399, 12405, 12411, 12415, 12420, 12422, 12423]
    assert main(["update", p] + [
        f"{920804400 + 300 * (i + 1)}:{v}" for i, v in enumerate(vals)
    ]) == 0
    assert main([
        "graphv", str(tmp_path / "g.out"),
        "--start", "920804400", "--end", "920808000",
        f"DEF:my-speed={p}:speed:AVERAGE",
        "VDEF:o=my-speed,MAXIMUM", "PRINT:o:%lf",
    ]) == 0
    assert 'print[0] = "0.040000"' in capsys.readouterr().out


def test_dcounter1_via_daemon_matrix(spark, tmp_path, capsys):
    """The reference's TESTS_STYLE=rrdcached matrix run of dcounter1-style
    flows: dataset provisioned with daemon CREATE, all updates through the
    daemon socket, fetch -d — rows must equal the direct library path."""
    import re

    from rrdtool_1_x_spark.sources.store import DatasetStore
    from rrdtool_1_x_spark.streaming.daemon import DaemonServer, IngestDaemon
    from rrdtool_1_x_spark.streaming.ingest import StreamingIngest

    create_argv = [
        "--start", "1300000000", "--step", "60s",
        "DS:dv:DDERIVE:300:U:U", "DS:wh:DCOUNTER:300:0:U",
        "RRA:AVERAGE:0.5:1:600", "RRA:AVERAGE:0.5:10:144",
    ]
    try:
        src = open("/root/reference/tests/dcounter1").read()
    except OSError:
        import pytest as _pytest

        _pytest.skip("reference tests not available")
    specs = re.findall(r"\b(\d{10}:[0-9.]+:[0-9.]+)\b", src)[:120]
    # NOTE: the rrdcached wire FETCH carries no resolution argument
    # (src/rrd_daemon.c:3083), so -r cannot ride the daemon path in the
    # reference either — the matrix compares the default-resolution read
    fetch_argv = ["AVERAGE", "-s", "1300000000", "-e", "1300007200"]

    lib = str(tmp_path / "lib")
    assert main(["create", lib] + create_argv) == 0
    assert main(["update", lib] + specs) == 0
    assert main(["fetch", lib] + fetch_argv) == 0
    out_lib = capsys.readouterr().out

    primary = str(tmp_path / "primary")
    assert main(["create", primary] + create_argv) == 0
    store = DatasetStore(spark, primary)
    with DaemonServer(
        IngestDaemon(StreamingIngest(store), write_interval=1e9)
    ) as srv:
        addr = f"127.0.0.1:{srv.address[1]}"
        # provision THROUGH the daemon, update through the socket in
        # batches, then read with the daemon-routed fetch
        from rrdtool_1_x_spark.streaming.daemon import DaemonClient

        with DaemonClient(addr) as c:
            code, msg, _ = c.command(
                "CREATE cd2 -b 1300000000 -s 60 "
                "DS:dv:DDERIVE:300:U:U DS:wh:DCOUNTER:300:0:U "
                "RRA:AVERAGE:0.5:1:600 RRA:AVERAGE:0.5:10:144"
            )
            assert code == 0, msg
            for lo in range(0, len(specs), 40):
                code, msg, _ = c.command(
                    "UPDATE cd2 " + " ".join(specs[lo : lo + 40])
                )
                assert code == 0, msg
        assert main(
            ["fetch", str(tmp_path / "cd2"), "-d", addr] + fetch_argv
        ) == 0
        out_dmn = capsys.readouterr().out
    assert out_dmn == out_lib


def test_update_time_grammar(spark, tmp_path, capsys):
    """rrd_update time syntaxes (src/rrd_update.c:1315-1420): AT-style
    via '@', numeric via ':', exact-'N' now, negative = now-relative,
    extra readings and junk times error like the reference."""
    import os
    import subprocess
    import time as _t

    from rrdtool_1_x_spark.sources.store import DatasetStore

    p = str(tmp_path / "g")
    assert main(["create", p, "--start", "1300000000", "--step", "300",
                 "DS:a:GAUGE:600:U:U", "RRA:LAST:0.5:1:500"]) == 0
    # @-syntax: AT-spec time, values split on ':'
    assert main(["update", p, "12:00 20110320@7"]) == 0
    # numeric, fractional, and then now-ish anchors
    assert main(["update", p, "1300600000.5:9"]) == 0
    st = DatasetStore(spark, p)
    rows = {int(r["ts"]): r["value"] for r in st._read("samples").collect()}
    import calendar, time as _tt
    os.environ["TZ"] = os.environ.get("TZ", "UTC")
    from rrdtool_1_x_spark.timeparse import parse_at_time
    assert rows[parse_at_time("12:00 20110320")] == 7.0
    assert rows[1300600000] == 9.0  # fractional second floor on read ts
    # N and negative-relative land near now
    t0 = _t.time()
    assert main(["update", p, "N:1"]) == 0
    assert main(["update", p, "-5:2"]) == 0  # now-5 < N: dropped as late
    got = DatasetStore(spark, p)
    last = got.last()
    assert abs(last - t0) < 60
    # errors: lowercase n, extra data, missing separator, start/end ref
    for bad, msg in [
        (["update", p, "n:5"], "Cannot convert 'n' to float"),
        (["update", p, f"{int(t0)+100}:1:2"], "found extra data"),
        (["update", p, "12345"], "expected timestamp not found"),
        (["update", p, "end-1h@5"], "makes no sense here"),
    ]:
        assert main(bad) != 0
        assert msg in capsys.readouterr().err


def test_update_at_syntax_matches_reference(spark, tmp_path, capsys):
    """Differential: '@'-separated AT-style update times resolve to the
    same samples the reference writes (fetch rows compared)."""
    import os
    import subprocess
    import time as _tt

    from tests.rrdmini import ensure_binary

    binpath = ensure_binary()
    if binpath is None:
        pytest.skip("reference build unavailable")
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "Europe/Zurich"
    _tt.tzset()
    try:
        rrd = str(tmp_path / "a.rrd")
        env = os.environ.copy()
        subprocess.run(
            [binpath, "create", rrd, "--start", "1426800000", "--step", "60",
             "DS:a:GAUGE:120:U:U", "RRA:LAST:0.5:1:2000"],
            check=True, capture_output=True, env=env,
        )
        specs = [
            "00:01 20150320@1", "00:03 20150320@2",
            "00:05 20150320+30s@3", "noon 20150320@4",
        ]
        for sp in specs:
            subprocess.run([binpath, "update", rrd, sp], check=True,
                           capture_output=True, env=env)
        p = subprocess.run(
            [binpath, "fetch", rrd, "LAST", "-s", "1426800000",
             "-e", "00:00 20150321"],
            check=True, capture_output=True, text=True, env=env,
        )
        ref = {}
        for line in p.stdout.splitlines()[1:]:
            ts, v = line.split(":")
            if "nan" not in v:
                ref[int(ts)] = float(v)

        ds = str(tmp_path / "ds")
        assert main(["create", ds, "--start", "1426800000", "--step", "60",
                     "DS:a:GAUGE:120:U:U", "RRA:LAST:0.5:1:2000"]) == 0
        assert main(["update", ds] + specs) == 0
        assert main(["fetch", ds, "LAST", "-s", "1426800000",
                     "-e", "00:00 20150321"]) == 0
        got = {}
        for line in capsys.readouterr().out.splitlines():
            if ":" in line and line[:1].isdigit():
                ts, v = line.split(":")
                if "nan" not in v.lower():
                    got[int(ts)] = float(v)
        # the 150 s gap between the 00:03 and 00:05+30s updates exceeds
        # the 120 s heartbeat, so only the 00:01->00:03 interval's slots
        # carry values — in BOTH engines
        assert got == ref and len(ref) >= 2
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        _tt.tzset()


def test_cli_equals_form_long_options(ds_path, capsys):
    """getopt_long's --option=value spelling works everywhere the spaced
    form does (the reference tests themselves use --imgformat=PNG)."""
    rc = main([
        "fetch", ds_path, "AVERAGE", "--resolution=300",
        f"--start={START}", f"--end={UPDATES[-1][0]}",
    ])
    assert rc == 0
    out = capsys.readouterr().out.splitlines()
    rows = {int(l.split(":")[0]): l.split(":")[1].strip()
            for l in out[2:] if ":" in l}
    assert abs(float(rows[920805000]) - 0.04) < 1e-12
    rc = main([
        "graphv", "-", f"--start={START}", f"--end={UPDATES[-1][0]}",
        "--imgformat=PNG",
        f"DEF:v={ds_path}:speed:AVERAGE", "VDEF:m=v,MAXIMUM",
        "PRINT:m:%.2lf",
    ])
    assert rc == 0
    assert 'print[0] = "0.04"' in capsys.readouterr().out


def test_cli_equals_form_guards(ds_path, tmp_path, capsys):
    """The = spelling hits the same guards as the spaced form: updatev
    refuses --daemon=, xport --maxrows= caps rows."""
    rc = main(["updatev", "--daemon=localhost:1", str(tmp_path / "x"),
               "100:1"])
    assert rc != 0
    assert "daemon" in capsys.readouterr().err.lower()
    rc = main([
        "xport", "--json", f"--start={START}", f"--end={UPDATES[-1][0]}",
        "--maxrows=4",
        f"DEF:v={ds_path}:speed:AVERAGE", "XPORT:v:v",
    ])
    assert rc == 0
    doc = json.loads(capsys.readouterr().out)
    assert len(doc["data"]) <= 5


def test_graphv_missing_ds_and_Z(ds_path, capsys, tmp_path):
    """-Z/--use-nan-for-all-missing-data: a DEF naming a DS the archive
    doesn't carry is an error by default (No DS called ...) and an
    all-NaN series under -Z (ALLOW_MISSING_DS)."""
    argv = [
        "graphv", "-", "-s", str(START), "-e", str(UPDATES[-1][0]),
        f"DEF:v={ds_path}:nosuch:AVERAGE",
        "VDEF:m=v,MAXIMUM", "PRINT:m:%6.2lf",
    ]
    rc = main(argv)
    out = capsys.readouterr()
    assert rc != 0
    assert "No DS called 'nosuch'" in out.err + out.out
    rc = main(argv[:2] + ["-Z"] + argv[2:])
    out = capsys.readouterr().out
    assert rc == 0
    assert "nan" in out.lower()  # the PRINT of an all-NaN max


def test_graph_option_validation_errors(ds_path, capsys):
    base = [
        "graph", "-", "-s", str(START), "-e", str(UPDATES[-1][0]),
        f"DEF:v={ds_path}:speed:AVERAGE", "LINE1:v#ff0000",
    ]
    for extra, msg in [
        (["--units", "mi"], "invalid argument for --units"),
        (["--graph-type", "XY"], "Graph type 1 is not implemented"),
        (["--graph-type", "POLAR"], "unsupported graphics type"),
        (["--left-axis-formatter", "bogus"], "Unknown left axis formatter"),
        (["--right-axis-formatter", "bogus"], "Unknown right axis formatter"),
        (["--font-render-mode", "fuzzy"], "unknown font-render-mode"),
        (["--graph-render-mode", "fuzzy"], "unknown graph-render-mode"),
    ]:
        rc = main(base[:2] + extra + base[2:])
        out = capsys.readouterr()
        assert rc != 0, extra
        assert msg in out.err + out.out, (extra, out)


def test_graph_accepts_compat_options(ds_path, tmp_path, capsys):
    """The accepted-for-compatibility knobs parse without error and the
    real ones change the output: --no-minor, --utc, --week-fmt,
    --left-axis-format, --units si (log), --allow-shrink, -F."""
    png = str(tmp_path / "g.png")
    rc = main([
        "graph", png, "-s", str(START), "-e", str(UPDATES[-1][0]),
        "--no-minor", "--utc", "--week-fmt", "KW%V",
        "--left-axis-format", "%.1f", "--alt-y-mrtg", "--interlaced",
        "--no-gridfit", "--disable-rrdtool-tag",
        "--font-render-mode", "light", "--graph-render-mode", "mono",
        "--font-smoothing-threshold", "8", "--graph-type", "TIME",
        "--allow-shrink", "--force-rules-legend",
        f"DEF:v={ds_path}:speed:AVERAGE", "LINE1:v#ff0000",
        "HRULE:1e9#0000ff:way-out",
    ])
    capsys.readouterr()
    assert rc == 0
    assert open(png, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_graphv_allow_shrink_bounds(ds_path, capsys):
    """--allow-shrink lets rigid -l/-u bounds contract to the data
    (src/rrd_graph.c:1505-1520); without it rigid bounds stand."""
    base = [
        "graphv", "-", "-s", str(START), "-e", str(UPDATES[-1][0]),
        "-l", "-10", "-u", "20", "--rigid",
        f"DEF:v={ds_path}:speed:AVERAGE", "LINE1:v#ff0000",
    ]
    assert main(base) == 0
    out = capsys.readouterr().out
    rigid_min = [l for l in out.splitlines() if l.startswith("value_min")][0]
    assert "-1.0000000000e+01" in rigid_min
    assert main(base[:2] + ["--allow-shrink"] + base[2:]) == 0
    out2 = capsys.readouterr().out
    shrunk_min = [l for l in out2.splitlines() if l.startswith("value_min")][0]
    shrunk_max = [l for l in out2.splitlines() if l.startswith("value_max")][0]
    # counter rates here are tiny non-negative values: min rises to the
    # data floor, max drops below the rigid 20
    assert "-1.0000000000e+01" not in shrunk_min
    assert "2.0000000000e+01" not in shrunk_max


def test_graphv_rigid_allow_shrink_snaps_to_grid(ds_path, capsys):
    """rigid + --allow-shrink bounds still pass through expand_range
    (src/rrd_graph.c:3968 gates on `!rigid || allow_shrink`): after
    shrinking to the data they snap outward to the sensible-value grid,
    so the published bounds equal the plain autoscale run's."""

    def bounds(extra):
        assert main([
            "graphv", "-", "-s", str(START), "-e", str(UPDATES[-1][0]),
            *extra, f"DEF:v={ds_path}:speed:AVERAGE", "LINE1:v#ff0000",
        ]) == 0
        out = capsys.readouterr().out
        return [l for l in out.splitlines()
                if l.startswith(("value_min", "value_max"))]

    auto = bounds([])
    shrunk = bounds(["-l", "-10", "-u", "20", "--rigid", "--allow-shrink"])
    assert auto == shrunk


def test_xport_local_byte_identical_to_distributed(spark, tmp_path, capsys):
    """`xport --local` (plans.local driver tier, no Spark job) must emit
    byte-identical XML and JSON to the distributed path for the same
    query — DEF + CDEF chain + a reduced --step, over a store built
    through the normal CLI create/update flow."""
    from rrdtool_1_x_spark.cli import main

    rrd = str(tmp_path / "l.rrd")
    base = 1300000200
    assert main(["create", rrd, "--start", str(base), "--step", "300",
                 "DS:a:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:200"]) == 0
    ups = [f"{base + 300 * i}:{(i * 7) % 53}" for i in range(1, 101)
           if i % 17 != 3]
    assert main(["update", rrd, *ups]) == 0
    q = ["-s", str(base), "-e", str(base + 300 * 100),
         f"DEF:v={rrd}:a:AVERAGE",
         "CDEF:c=v,UN,0,v,IF,2,*", "XPORT:c:out"]
    for extra in ([], ["--step", "600"], ["--json"]):
        assert main(["xport", *extra, *q]) == 0
        dist = capsys.readouterr().out
        assert main(["xport", "--local", *extra, *q]) == 0
        loc = capsys.readouterr().out
        assert loc == dist, f"--local output differs for {extra}"
    # guard: --output (distributed CSV sink) refuses the local tier
    rc = main(["xport", "--local", "--output", str(tmp_path / "o"), *q])
    err = capsys.readouterr().err
    assert rc != 0 and "drop --local" in err


def test_xport_local_guards(spark, tmp_path, capsys, monkeypatch):
    """--local guard behavior: a multi-series store without :series=
    gets the same actionable error as the distributed path; an
    RRDCACHED_ADDRESS inherited from the environment is IGNORED (the
    local tier reads the store directly) while an explicit -d refuses."""
    import pandas as pd

    from rrdtool_1_x_spark.catalog import DatasetDef, DSDef, RRADef
    from rrdtool_1_x_spark.cli import main
    from rrdtool_1_x_spark.sources.store import DatasetStore

    base = 1310000100
    ds = DatasetDef(
        name="m", step=300, ds=[DSDef(name="a", dst="GAUGE", heartbeat=600)],
        rra=[RRADef(cf="AVERAGE", xff=0.5, pdp_cnt=1, row_cnt=100)],
        start=base,
    )
    path = str(tmp_path / "multi")
    store = DatasetStore.create(spark, path, ds)
    rows = [
        (sid, "a", float(base + 300 * i), float(i))
        for sid in ("s1", "s2") for i in range(1, 20)
    ]
    store.update(spark.createDataFrame(
        rows, "series_id string, ds_name string, ts double, value double"
    ))
    q = ["-s", str(base), "-e", str(base + 300 * 19),
         f"DEF:v={path}:a:AVERAGE", "XPORT:v:out"]
    rc = main(["xport", "--local", *q])
    err = capsys.readouterr().err
    assert rc != 0 and "holds multiple series" in err
    # :series= resolves it
    q2 = ["-s", str(base), "-e", str(base + 300 * 19),
          f"DEF:v={path}:a:AVERAGE:series=s2", "XPORT:v:out"]
    assert main(["xport", "--local", *q2]) == 0
    out = capsys.readouterr().out
    assert "<xport>" in out
    # env daemon address must not poison --local; explicit -d refuses
    monkeypatch.setenv("RRDCACHED_ADDRESS", "127.0.0.1:42217")
    assert main(["xport", "--local", *q2]) == 0
    capsys.readouterr()
    rc = main(["xport", "--local", "-d", "127.0.0.1:42217", *q2])
    err = capsys.readouterr().err
    assert rc != 0 and "does not support --daemon" in err
