"""rrdtool-compatible command line over the engine.

``python -m rrdtool_1_x_spark <command> ...`` accepts the reference CLI's
grammar for the data commands, so reference invocations port verbatim
with the .rrd path swapped for a dataset directory:

  create <ds> [--start t] [--step s] DS:name:DST:hb:min:max... RRA:CF:xff:steps:rows...
  update <ds> [--template a:b] <ts:v[:v...]>...
  fetch  <ds> <CF> [-r res] [-s start] [-e end] [-a]
  xport  [-s|-e|--step|--maxrows|--json|--enumds|--showtime] DEF:.. CDEF:.. XPORT:..
  graphv <file.png|-> DEF:.. CDEF:.. VDEF:.. PRINT:..  (info keys; renders
         the image + layout coordinates when a filename is given)
  graph  <file.png|-> [-w|-h|-t|-v|-l|-u|-r|-c TAG#rgb|-x none|-y none]
         DEF:.. CDEF:.. VDEF:.. LINE/AREA/TICK/STACK.. GPRINT/PRINT/COMMENT..
  info/first/last/lastupdate <ds> · list <root> · dump/restore · tune · resize
  flushcached -d <addr> <ds>...

``-d/--daemon addr`` (or RRDCACHED_ADDRESS) routes update/fetch/flushcached
through a running DaemonServer over the rrdcached wire protocol, like
rrdc_* in librrd (src/rrd_client.c; src/rrd_fetch.c:198-205).

Reference grammars: rrd_create argv (src/rrd_create.c:77-240), rrd_update
(src/rrd_update.c:675-788), rrd_fetch (src/rrd_fetch.c:62-213), rrd_xport
(src/rrd_xport.c:76-242), rrd_tune / rrd_resize. Times are AT-style via
timeparse (src/rrd_parsetime.c). ``graph`` renders a real PNG through
the in-repo rasterizer (render.py — numpy raster + built-in bitmap font,
no cairo); graphv renders too and reports rrd_graph_v's info keys.
"""

from __future__ import annotations

import re as _re
import sys
import time as _time

from rrdtool_1_x_spark.catalog import DSDef, RRADef, create as _create_def
from rrdtool_1_x_spark.timeparse import parse_at_time


def _spark():
    from rrdtool_1_x_spark.session import get_spark

    return get_spark("rrdtool-cli", cpus=None)


def _store(path: str):
    from rrdtool_1_x_spark.sources.store import DatasetStore

    return DatasetStore(_spark(), path)


def _num_or_none(s: str):
    return None if s in ("U", "u", "") else float(s)


_DUR_MULT = {
    "s": 1, "m": 60, "h": 3600, "d": 86400, "w": 7 * 86400,
    "M": 31 * 86400, "y": 366 * 86400,  # case-sensitive: m=min, M=month
}


def _duration(s: str, divisor: int = 1) -> int:
    """``rrd_scaled_duration`` port (src/rrd_utils.c:235-284): a positive
    count with an optional case-sensitive s/m/h/d/w/M/y suffix. A bare
    count inhibits scaling; a suffixed value is converted to seconds and
    must divide evenly by ``divisor`` (the step for RRA steps, the RRA
    resolution for RRA rows — tests/rrdcreate's misalignment diagnostics)."""
    if not s or not s[0].isdigit():
        raise ValueError("value must be (suffixed) positive number")
    i = 0
    while i < len(s) and s[i].isdigit():
        i += 1
    value, suffix = int(s[:i]), s[i:]
    if suffix:
        if suffix not in _DUR_MULT:
            raise ValueError("value has trailing garbage")
        value *= _DUR_MULT[suffix]
    if value == 0:
        raise ValueError("value must be positive")
    if suffix and divisor:
        if value % divisor:
            raise ValueError("value would truncate when scaled")
        value //= divisor
    return value


def _parse_ds(spec: str) -> DSDef:
    # DS:name:DST:heartbeat:min:max  |  DS:name:COMPUTE:rpn
    parts = spec.split(":")
    if parts[0] != "DS":
        raise ValueError(f"bad DS spec {spec!r}")
    if len(parts) < 3:
        raise ValueError(f"invalid DS format in {spec!r}")
    name, dst = parts[1], parts[2].upper()
    if dst == "COMPUTE":
        return DSDef(name=name, dst="COMPUTE", cdef=":".join(parts[3:]))
    # heartbeat, min AND max are all required (parseDS diagnoses a
    # missing separator/heartbeat/max — tests/rrdcreate)
    if len(parts) < 4:
        raise ValueError(f"failed to parse heartbeat in {spec!r}")
    if len(parts) < 6:
        raise ValueError(f"failed to parse min/max in {spec!r}")
    hb = _duration(parts[3])
    mn = _num_or_none(parts[4])
    mx = _num_or_none(parts[5])
    return DSDef(name=name, dst=dst, heartbeat=hb, min_val=mn, max_val=mx)


def _parse_rra(spec: str, step: int = 300) -> RRADef:
    # RRA:CF:xff:steps:rows (basic); HW family accepted with its params.
    # ``steps``/``rows`` accept duration forms (RRA:AVERAGE:0.5:1m:10d):
    # steps scale by the dataset step, rows by the archive resolution
    # (parseRRA's rrd_scaled_duration calls, src/rrd_create.c:370-420)
    parts = spec.split(":")
    if parts[0] != "RRA":
        raise ValueError(f"bad RRA spec {spec!r}")
    cf = parts[1].upper()
    if cf in ("AVERAGE", "MIN", "MAX", "LAST"):
        pdp_cnt = _duration(parts[3], step)
        row_cnt = _duration(parts[4], step * pdp_cnt)
        return RRADef(cf=cf, xff=float(parts[2]), pdp_cnt=pdp_cnt, row_cnt=row_cnt)
    if cf in ("HWPREDICT", "MHWPREDICT"):
        # RRA:HWPREDICT:rows:alpha:beta:period[:rra-num] — without the
        # rra-num wire-up argument the four contingent archives are
        # created implicitly (create_hw_contingent_rras; tests/tune2)
        params = {"alpha": float(parts[3]), "beta": float(parts[4]),
                  "period": int(parts[5])}
        if len(parts) < 7:
            params["auto_contingent"] = True
        return RRADef(cf=cf, row_cnt=int(parts[2]), pdp_cnt=1, params=params)
    if cf in ("SEASONAL", "DEVSEASONAL"):
        # RRA:SEASONAL:period:gamma:rra-num[:smoothing-window=f]
        params = {"gamma": float(parts[3])}
        for p in parts[4:]:
            if p.startswith("smoothing-window="):
                params["smoothing_window"] = float(p.split("=", 1)[1])
        return RRADef(cf=cf, row_cnt=int(parts[2]), pdp_cnt=1, params=params)
    if cf == "DEVPREDICT":
        return RRADef(cf=cf, row_cnt=int(parts[2]), pdp_cnt=1)
    if cf == "FAILURES":
        # RRA:FAILURES:rows:threshold:window:rra-num
        return RRADef(
            cf=cf, row_cnt=int(parts[2]), pdp_cnt=1,
            params={"threshold": int(parts[3]), "window": int(parts[4])},
        )
    raise ValueError(f"unknown RRA CF {cf!r}")


def _opt(args: list[str], *names: str, default=None, flag: bool = False):
    """Pop `name value`, `--name=value`, or a bare flag from args — the
    two spellings getopt_long accepts for every long option."""
    for n in names:
        if n in args:
            i = args.index(n)
            args.pop(i)
            if flag:
                return True
            return args.pop(i)
        if not flag and n.startswith("--"):
            pre = n + "="
            for i, a in enumerate(args):
                if a.startswith(pre):
                    args.pop(i)
                    return a[len(pre):]
    return default if not flag else False


def _daemon_addr(args: list[str]) -> str | None:
    """``-d/--daemon addr`` or the RRDCACHED_ADDRESS environment variable —
    the reference's daemon-address resolution (src/rrd_client.c
    rrdc_connect; rrd_fetch.c:198-205 routes through rrdc_fetch when either
    is set)."""
    import os

    return _opt(args, "-d", "--daemon") or os.environ.get("RRDCACHED_ADDRESS")


def _client(addr: str):
    from rrdtool_1_x_spark.streaming.daemon import DaemonClient

    return DaemonClient(addr)


def _series_of(path: str) -> str:
    return path.rstrip("/").rsplit("/", 1)[-1]


def _at(s: str | None, default: int) -> int:
    if s is None:
        return default
    try:
        return int(s)
    except ValueError:
        return parse_at_time(s)


def _at_pair(
    start_s: str | None, end_s: str | None, default_end: int
) -> tuple[int, int]:
    """Resolve a -s/-e pair like the reference CLIs: either side may
    reference the other ('-s e-1d', '-e s+1h' — rrd_proc_start_end),
    start defaults to end-24h, end to ``default_end``."""
    from rrdtool_1_x_spark.timeparse import proc_start_end

    if start_s is not None and end_s is not None:
        return proc_start_end(start_s, end_s)
    end = _at(end_s, default_end)
    if start_s is None:
        return end - 86400, end
    try:
        return int(start_s), end
    except ValueError:
        return parse_at_time(start_s, end=end), end


def cmd_create(args: list[str]) -> int:
    """≙ rrdtool create, incl. --source prefill and --template definition
    copy (src/rrd_create.c:77-258; prefill :1043-1078)."""
    path = args.pop(0)
    no_overwrite = _opt(args, "--no-overwrite", "-O", flag=True)
    start = _opt(args, "--start", "-b")
    step = _opt(args, "--step", "-s")
    import os as _os
    import shutil as _shutil

    exists = _os.path.exists(f"{path.rstrip('/')}/meta.json")
    if exists and no_overwrite:
        # ≙ create -O: O_EXCL open fails on an existing file
        # (src/rrd_create.c opt_no_overwrite; tests/create-no-overwrite)
        raise ValueError(f"creating '{path}': File exists")
    sources = []
    while (s := _opt(args, "--source", "-r")) is not None:
        sources.append(s)
    template = _opt(args, "--template", "-t")
    # DS:new=old[idx]:... declares a prefill mapping (parseDS mapping
    # grammar DS_RE, src/rrd_create.c:310-326 + mapping_t); the optional
    # [idx] is a 1-based --source index restricting where `old` may match
    mapping: dict[str, str | tuple[str, int]] = {}
    ds_specs = []
    for a in args:
        if not a.startswith("DS:"):
            continue
        head, rest = a.split(":", 2)[1], a.split(":", 2)[2]
        if "=" in head:
            new, old = head.split("=", 1)
            m = _re.fullmatch(r"([^\[\]]+)(?:\[([0-9]+)\])?", old)
            if m is None:
                raise ValueError(f"invalid DS mapping: {a}")
            mapping[new] = (m.group(1), int(m.group(2))) if m.group(2) else m.group(1)
            a = f"DS:{new}:{rest}"
        ds_specs.append(a)
    step_i = 300 if step is None else _duration(step)
    ds = [_parse_ds(a) for a in ds_specs]
    rra = [_parse_rra(a, step_i) for a in args if a.startswith("RRA:")]
    name = path.rstrip("/").rsplit("/", 1)[-1]
    start_i = None if start is None else _at(start, 0)

    from rrdtool_1_x_spark.sources.prefill import create_prefilled, template_dataset
    from rrdtool_1_x_spark.sources.store import DatasetStore

    spark = _spark()
    # open --source/--template stores BEFORE touching the target: the
    # reference's `create X --source X` in-place restructure reads the old
    # data as prefill input (rrd_create writes a temp file and reads the
    # existing one as source, src/rrd_create.c:1043-1078)
    src_stores = [DatasetStore(spark, s) for s in sources]
    if template is not None:
        tpl_store = DatasetStore(spark, template)
        dataset = template_dataset(
            tpl_store, name,
            extra_ds=ds, extra_rra=rra,
            step=None if step is None else _duration(step),
            start=start_i,
        )
        if start_i is None and not sources:
            # last update time carries over from the template when neither
            # --start nor sources set it (src/rrd_create.c:1032-1035)
            dataset.start = tpl_store.last()
    else:
        dataset = _create_def(
            name=name, step=step_i, ds=ds, rra=rra,
            start=start_i,
        )
    # build into a temp sibling and swap in only on success, so a failed
    # create (bad spec, unreadable source) never destroys the old dataset
    tmp = f"{path.rstrip('/')}.create-tmp.{_os.getpid()}"
    _shutil.rmtree(tmp, ignore_errors=True)
    try:
        create_prefilled(
            spark, tmp, dataset,
            sources=src_stores,
            start=dataset.start,
            mapping=mapping or None,
        )
        if exists:
            # default create truncates: a re-created dataset starts empty
            # like a re-created .rrd file — stale archives must not survive
            _shutil.rmtree(path)
        _os.rename(tmp, path)
    except BaseException:
        _shutil.rmtree(tmp, ignore_errors=True)
        raise
    return 0


def cmd_update(args: list[str]) -> int:
    path = args.pop(0)
    daemon = _daemon_addr(args)
    template = _opt(args, "--template", "-t")
    if daemon is not None:
        if template is not None:
            # ≙ rrd_update.c:590: the daemon protocol does not carry a
            # column reordering; silently writing direct instead would race
            # the daemon's buffered rows (monotonicity filter drops them)
            raise ValueError(
                "The caching daemon cannot be used together with templates yet."
            )
        # ≙ rrdc_update (src/rrd_client.c:1284-1340): ship the raw value
        # specs to the daemon; it buffers and age-flushes them.
        with _client(daemon) as c:
            c.update(_series_of(path), list(args))
        return 0
    store = _store(path)
    ds_names = (
        template.split(":") if template else [d.name for d in store.dataset.ds]
    )
    rows = []
    series = path.rstrip("/").rsplit("/", 1)[-1]
    for spec in args:
        # two time syntaxes (src/rrd_update.c:1315-1328): any '@' in the
        # spec makes the FIRST '@' the separator and the left side an
        # AT-style time ("now-1h@5:6"); otherwise the first ':' separates
        # a numeric time. Values always split on ':'.
        if "@" in spec:
            tstr, rest = spec.split("@", 1)
            try:
                ts = float(parse_at_time(tstr))
            except Exception as e:
                if "START" in str(e) or "END" in str(e):
                    # ≙ rrd_update.c:1387-1391
                    raise ValueError(
                        "specifying time relative to the 'start' or 'end' "
                        f"makes no sense here: {tstr}"
                    ) from None
                raise ValueError(f"ds time: {tstr}: {e}") from None
        elif ":" in spec:
            tstr, rest = spec.split(":", 1)
            # exactly "N" means now (src/rrd_update.c:1395 strcmp; a
            # lowercase n fails the float parse like the reference's
            # strtod diagnostic). A NEGATIVE time is relative to now
            # (rrd_update.c:1404-1407).
            if tstr == "N":
                ts = _time.time()
            else:
                try:
                    ts = float(tstr)
                except ValueError:
                    raise ValueError(
                        "error while parsing time in get_time_from_reading"
                        f" - Cannot convert '{tstr}' to float"
                    ) from None
                if ts < 0.0:
                    ts = _time.time() + ts
        else:
            raise ValueError(
                f"expected timestamp not found in data source from {spec}"
            )
        vals = rest.split(":")
        if len(vals) > len(ds_names):
            # ≙ rrd_update.c:1340: more readings than data sources
            raise ValueError(
                "found extra data on update argument: "
                + ":".join(vals[len(ds_names):])
            )
        for name, sval in zip(ds_names, vals):
            rows.append(
                (series, name, float(ts),
                 None if sval.upper() == "U" else float(sval))
            )
    from rrdtool_1_x_spark.sources.store import SAMPLE_SCHEMA

    store.update(_spark().createDataFrame(rows, SAMPLE_SCHEMA))
    return 0


def cmd_updatev(args: list[str]) -> int:
    """≙ rrdtool updatev (rrd_update_v, src/rrd_update.c:300-360): like
    update, then report every CDP written as a result, keyed
    ``[<ts>]RRA[<CF>][<pdp_cnt>]DS[<name>] = <value>``
    (src/rrd_update.c:2437-2448) plus the leading return_value. Written =
    rows whose window ended between the previous and the new last-update
    (the reference flushes a CDP when time passes its window end)."""
    import os

    if (
        "-d" in args
        or "--daemon" in args
        or any(a.startswith("--daemon=") for a in args)
        or os.environ.get("RRDCACHED_ADDRESS")
    ):
        # the reference forbids daemon routing for updatev (rrdupdate.pod:
        # "updatev requires direct disk access")
        raise ValueError("The --daemon option cannot be used with updatev")
    path = args[0]
    store = _store(path)
    try:
        prev_last = store.last()
    except Exception:
        prev_last = store.dataset.start or 0
    rc = cmd_update(list(args))
    print(f"return_value = {rc}")
    store = _store(path)  # fresh caches past the update
    new_last = store.last()
    d = store.dataset
    import math

    for i, rra in enumerate(d.rra):
        res = d.step * rra.pdp_cnt
        lo = prev_last - prev_last % res
        hi = new_last - new_last % res
        if hi <= lo:
            continue
        t = store._read(f"rra_{i}")
        if t is None:
            continue
        import pyspark.sql.functions as _F

        rows = (
            t.filter((_F.col("ts") > float(lo)) & (_F.col("ts") <= float(hi)))
            .orderBy("ts", "ds_name")
            .collect()
        )
        for r in rows:
            v = r["value"]
            v = float("nan") if v is None or (isinstance(v, float) and math.isnan(v)) else v
            print(
                f"[{int(r['ts'])}]RRA[{rra.cf}][{rra.pdp_cnt}]"
                f"DS[{r['ds_name']}] = {v:0.10e}"
            )
    return rc


def fetch_table(args: list[str]):
    """The structured core of ``rrdtool fetch`` — shared by the CLI
    printer below and by ``binding.fetch`` (≙ rrd_fetch's out-params
    (start, end, step, ds_cnt, ds_namv, data)). Returns
    ``((start, end, step), ds_names, rows)`` with one value tuple per
    grid slot and None for unknown."""
    import math

    res = _opt(args, "-r", "--resolution")
    align = _opt(args, "-a", "--align-start", flag=True)
    daemon = _daemon_addr(args)
    end_s = _opt(args, "-e", "--end")
    start_s = _opt(args, "-s", "--start")
    path, cf = args.pop(0), args.pop(0).upper()

    def _clean(v):
        return None if v is None or (isinstance(v, float) and math.isnan(v)) else float(v)

    if daemon is not None:
        # ≙ rrdc_fetch (src/rrd_fetch.c:198-205, src/rrd_client.c:198-420):
        # the daemon flushes the series and serves rows over the wire.
        # Defaults still come from the dataset header (meta.json is local —
        # one daemon fronts one store on a shared filesystem, like
        # rrdcached and its clients share the .rrd files).
        from rrdtool_1_x_spark.sources.store import DatasetStore

        with _client(daemon) as c:
            # flush BEFORE deriving the default window: buffered updates
            # newer than the last stored sample must land inside it
            # (rrd_client.c rrdc_fetch sends FLUSH first)
            c.flush(_series_of(path))
            store = DatasetStore(None, path)
            start, end = _at_pair(start_s, end_s, store.last())
            w_start, w_end, w_step, ds_names, rows = c.fetch(
                _series_of(path), cf, start, end
            )
        table = [
            (int(ts), tuple(_clean(vals.get(n)) for n in ds_names))
            for ts, vals in rows
        ]
        return (int(w_start), int(w_end), int(w_step)), list(ds_names), table

    store = _store(path)
    start, end = _at_pair(start_s, end_s, store.last())
    pdf, plan = store.fetch_local(
        cf, start, end, None if res is None else int(res), align_start=align
    )
    ds_names = [d.name for d in store.dataset.ds]
    wide = pdf.pivot_table(index="ts", columns="ds_name", values="value",
                           dropna=False)
    table = [
        (int(ts), tuple(_clean(r.get(n)) for n in ds_names))
        for ts, r in wide.iterrows()
    ]
    return (plan.start, plan.end, plan.step), ds_names, table


def cmd_fetch(args: list[str]) -> int:
    # options first, positionals after — getopt permutes like the reference
    _range, ds_names, table = fetch_table(args)

    def _fmt(v) -> str:
        return f"{(float('nan') if v is None else v):0.10e}"

    # reference CLI layout: DS-name header, blank line, "ts: %0.10e ..." rows
    print(" ".join(f"{n:>18s}" for n in ds_names))
    print()
    for ts, vals in table:
        print(f"{ts}: " + " ".join(_fmt(v) for v in vals))
    return 0


def _parse_query_argv(args: list[str]):
    """Shared argv core of ``_build_query``/``_build_local_query``: pops
    the time/step/maxrows options and splits DEF statements into
    store-backed and pseudo (``sql//``/``cb//``) groups, resolving the
    stores. Range resolution stays with the callers (the distributed
    path flushes the daemon BEFORE reading ``last()``)."""
    from rrdtool_1_x_spark.sources.external import is_pseudo_path

    step = _opt(args, "--step")
    maxrows = _opt(args, "--maxrows", "-m")
    end_s = _opt(args, "-e", "--end")
    start_s = _opt(args, "-s", "--start")
    defs = [a for a in args if a.startswith("DEF:")]
    if not defs:
        raise ValueError("need at least one DEF")
    stores = {}
    parsed_defs = []
    pseudo_defs = []
    for d in defs:
        head, rest = d[4:].split("=", 1)
        if is_pseudo_path(rest):
            # sql// and cb// paths contain ':'-free segments only after the
            # scheme, so the DS/CF suffix splits off the right
            spath, ds_name, cf = rest.rsplit(":", 2)
            pseudo_defs.append((head, spath, ds_name))
            continue
        parts = rest.split(":")
        spath, ds_name, cf = parts[0], parts[1], parts[2].upper()
        # trailing key=value options (getKeyValueArgument,
        # src/rrd_graph_helper.c:644-664): step= and reduce=
        opts = dict(p.split("=", 1) for p in parts[3:] if "=" in p)
        if spath not in stores:
            stores[spath] = _store(spath)
        parsed_defs.append((head, spath, ds_name, cf, opts))
    return step, maxrows, start_s, end_s, parsed_defs, pseudo_defs, stores


def _apply_cdefs_vdefs(q, args: list[str]):
    """Shared CDEF:/VDEF: statement application (identical grammar on
    both query tiers)."""
    for a in args:
        if a.startswith(("CDEF:", "VDEF:")):
            if "=" not in a[5:]:
                # ≙ rrd_graph_helper's "can't parse argument" diagnostic
                # (the grammar is CDEF:vname=RPN, not CDEF:vname,RPN)
                raise ValueError(f"can't parse argument '{a}'")
            name, rpn = a[5:].split("=", 1)
            (q.cdef if a.startswith("CDEF:") else q.vdef)(name, rpn)
    return q


def _build_query(args: list[str], allow_missing_ds: bool = False):
    """Shared DEF/CDEF/VDEF parser for xport and graphv.

    ``allow_missing_ds`` (-Z/--use-nan-for-all-missing-data,
    ALLOW_MISSING_DS at src/rrd_graph.c:1079): a DEF naming a DS the
    archive doesn't carry becomes an all-NaN series instead of the
    "No DS called ..." error."""
    from rrdtool_1_x_spark.plans.graph import Query
    from rrdtool_1_x_spark.sources.external import fetch_pseudo

    daemon = _daemon_addr(args)
    (step, maxrows, start_s, end_s,
     parsed_defs, pseudo_defs, stores) = _parse_query_argv(args)
    if daemon is not None and stores:
        # ≙ rrd_graph/rrd_xport --daemon: flush every referenced file's
        # pending values before reading (rrdc_flush_if_daemon,
        # src/rrd_graph.c graph option handling) — the data path then
        # reads the store directly like the reference does
        with _client(daemon) as c:
            for spath in stores:
                try:
                    c.flush(_series_of(spath))
                except RuntimeError:
                    pass  # series unknown to the daemon: nothing buffered
    if stores:
        last = max(s.last() for s in stores.values())
    else:
        last = int(_time.time())
    start, end = _at_pair(start_s, end_s, last)
    import os as _os

    # the reference evaluates NEWDAY/LTIME... in the process's local zone
    # (TZ env var, tests/rpn2 runs under TZ=Europe/Zurich)
    q = Query(start=start, end=end,
              step=None if step is None else _duration(step),
              tz=_os.environ.get("TZ") or "UTC",
              maxrows=None if maxrows is None else int(maxrows))
    series_cache: dict[str, list[str]] = {}
    for vname, spath, ds_name, cf, opts in parsed_defs:
        store = stores[spath]
        if ds_name not in [d.name for d in store.dataset.ds]:
            if not allow_missing_ds:
                raise ValueError(f"No DS called '{ds_name}' in '{spath}'")
            # -Z: the ds_name filter in _fetch_defs matches nothing, so
            # the grid join pads the series to all-NaN — exactly the
            # reference's ALLOW_MISSING_DS contract
        rollups = {
            i: store._read(f"rra_{i}") for i in range(len(store.dataset.rra))
        }
        # a DEF addresses one file-like series: pick the store's single one,
        # honor an explicit :series= option, and refuse silent ambiguity on
        # multi-series stores (the join would fan the grid out otherwise)
        series = opts.get("series")
        if series is None:
            if spath not in series_cache:
                first = next((r for r in rollups.values() if r is not None), None)
                series_cache[spath] = [] if first is None else [
                    row["series_id"]
                    for row in first.select("series_id").distinct().limit(2).collect()
                ]
            sids = series_cache[spath]
            if len(sids) > 1:
                raise ValueError(
                    f"{spath} holds multiple series; add :series=<id> to the DEF"
                )
            series = sids[0] if sids else None
        q.def_(
            vname, rollups, store.dataset, ds_name, cf,
            step=int(opts["step"]) if "step" in opts else None,
            last_up=store.last(),
            reduce_cf=opts.get("reduce"),
            series_id=series,
        )
    for vname, spath, ds_name in pseudo_defs:
        frame, _, _, astep = fetch_pseudo(
            _spark(), spath, ds_name, start, end,
            None if step is None else int(step),
        )
        q.def_frame(vname, frame, astep)
    return _apply_cdefs_vdefs(q, args)


def _local_series_ids(store, limit: int = 2) -> list[str]:
    """Distinct series ids of a store's first archive, read driver-side
    (pyarrow, no Spark job) — the local tier's input to the same
    multi-series ambiguity guard the distributed builder applies."""
    import os as _os

    import pyarrow.dataset as pads

    _, data_dir = store._current("rra_0")
    if not _os.path.isdir(data_dir):
        return []
    dset = pads.dataset(
        data_dir, format="parquet",
        partitioning="hive" if store._partition_cols() else None,
    )
    seen: list[str] = []
    for batch in dset.to_batches(columns=["series_id"]):
        for s in batch.column(0).unique().to_pylist():
            if s not in seen:
                seen.append(s)
                if len(seen) >= limit:
                    return seen
    return seen


def _build_local_query(args: list[str]):
    """The LocalQuery twin of ``_build_query`` for ``xport --local``:
    same DEF/CDEF/VDEF grammar over DatasetStore files, executed
    driver-side (plans.local — pyarrow + numpy, no Spark job). Scope of
    the local tier: store paths only; ``sql//``/``cb//`` pseudo sources
    and an EXPLICIT -d/--daemon refuse (a daemon address inherited from
    RRDCACHED_ADDRESS is ignored — the local tier reads the store
    directly, so daemon-buffered values not yet flushed are not
    visible; flush first or use the distributed path)."""
    from rrdtool_1_x_spark.plans.local import LocalQuery

    if any(
        a in ("-d", "--daemon") or a.startswith("--daemon=") for a in args
    ):
        raise ValueError("--local does not support --daemon (use the"
                         " distributed path)")
    (step, maxrows, start_s, end_s,
     parsed_defs, pseudo_defs, stores) = _parse_query_argv(args)
    if pseudo_defs:
        raise ValueError(
            "--local does not support sql///cb// pseudo sources"
        )
    last = max(s.last() for s in stores.values())
    start, end = _at_pair(start_s, end_s, last)
    first_store = stores[parsed_defs[0][1]]
    q = LocalQuery(
        first_store, start, end,
        step=None if step is None else _duration(step),
        maxrows=None if maxrows is None else int(maxrows),
    )
    series_cache: dict[str, list[str]] = {}
    for vname, spath, ds_name, cf, opts in parsed_defs:
        store = stores[spath]
        if ds_name not in [x.name for x in store.dataset.ds]:
            raise ValueError(f"No DS called '{ds_name}' in '{spath}'")
        # same ambiguity guard as the distributed builder: a DEF
        # addresses one file-like series
        series = opts.get("series")
        if series is None:
            if spath not in series_cache:
                series_cache[spath] = _local_series_ids(store)
            sids = series_cache[spath]
            if len(sids) > 1:
                raise ValueError(
                    f"{spath} holds multiple series; add :series=<id>"
                    " to the DEF"
                )
            series = sids[0] if sids else None
        q.def_(
            vname, ds_name, cf,
            step=int(opts["step"]) if "step" in opts else None,
            reduce_cf=opts.get("reduce"),
            series_id=series,
            store=store,
        )
    return _apply_cdefs_vdefs(q, args)


def xport_result(args: list[str]):
    """The structured core of ``rrdtool xport`` — query build + XPORT
    statement parse + execute; shared by the CLI formatter below and by
    ``binding.xport`` (≙ rrd_xport's argv core).

    ``--local`` routes through plans.local.LocalQuery: identical rows
    and formatting (the formatters accept both result kinds), no Spark
    job — the reference's single-process xport latency for interactive
    windows over store files. An RPN token outside the local tier's op
    set (PREV/PREDICT…) raises ``LocalUnsupported`` at execute time;
    the query is rebuilt on the distributed path, so ``--local`` is a
    latency hint, never a capability restriction (byte-identical output
    either way — pinned by tests/test_xport_differential.py)."""
    local = _opt(args, "--local", flag=True)

    def apply_xports(q, argv):
        for a in argv:
            if a.startswith("XPORT:"):
                parts = a[6:].split(":", 1)
                q.xport(parts[0], parts[1] if len(parts) > 1 else "")
        return q

    if local:
        from rrdtool_1_x_spark.plans.local import LocalUnsupported

        largs = list(args)  # option pops must not consume the
        # distributed rebuild's view of the argv
        try:
            return apply_xports(_build_local_query(largs), largs).execute()
        except LocalUnsupported:
            pass
    return apply_xports(_build_query(args), args).execute(_spark())


def cmd_xport(args: list[str]) -> int:
    from rrdtool_1_x_spark import xport as xp

    as_json = _opt(args, "--json", "-j", flag=True)
    enumds = _opt(args, "--enumds", flag=True)
    showtime = _opt(args, "--showtime", "-t", flag=True)
    timefmt = _opt(args, "--timefmt")
    out_dir = _opt(args, "--output")
    # incompatible-flag check BEFORE any query executes (and by flag,
    # not frame duck-typing — a pandas frame answers hasattr for any
    # column name)
    if out_dir is not None and "--local" in args:
        raise ValueError(
            "--output (distributed CSV sink) needs the distributed path"
            " — drop --local"
        )
    res = xport_result(args)
    if out_dir is not None:
        # cluster-scale sink: ordered CSV parts written by executors
        # (xport.write_csv) — the in-memory formatters below collect the
        # window on the driver, which caps how big a range can export
        xp.write_csv(res, out_dir)
        return 0
    n_rows = (res.end - res.start) // res.step + 1
    if n_rows > 1_000_000:
        print(
            f"WARNING: xport window is {n_rows} rows; the in-memory "
            "formatter materializes it on the driver — use --output <dir> "
            "for a distributed CSV export",
            file=sys.stderr,
        )
    if as_json:
        print(xp.to_json(res, showtime=showtime, timefmt=timefmt))
    else:
        print(xp.to_xml(res, enumds=enumds, showtime=showtime, timefmt=timefmt))
    return 0


def _parse_element(spec: str):
    """LINE<w>/AREA/TICK/STACK:<src>[#color][:legend][:STACK][:skipscale]
    (rrd_graph_helper.c parse_line/parse_area/parse_tick/parse_stack);
    returns (kind, source, legend, stack, skipscale, color, width,
    fraction) — color #RRGGBB[AA] or None (an uncolored element plots
    invisibly but still scales), LINE<w> width, TICK fraction."""
    head, _, rest = spec.partition(":")
    kind = "".join(ch for ch in head if ch.isalpha()).upper()
    wdigits = "".join(ch for ch in head if ch.isdigit() or ch == ".")
    width = float(wdigits) if wdigits else 1.0
    parts = rest.split(":")
    # src[#color[#color2]] — the second color makes an AREA a vertical
    # gradient fill (rrd_graph.c parse_area gradient syntax)
    chunks = parts[0].split("#")
    src_s = chunks[0]
    color = f"#{chunks[1]}" if len(chunks) > 1 and chunks[1] else None
    color2 = f"#{chunks[2]}" if len(chunks) > 2 and chunks[2] else None
    try:
        source = float(src_s)
    except ValueError:
        source = src_s
    tail = parts[1:]
    stack = "STACK" in tail
    skipscale = "skipscale" in tail
    legend = ""
    fraction = 0.1
    dashes = None
    dash_offset = 0.0
    gradheight = 50.0
    for p in tail:
        if p in ("STACK", "skipscale") or p == "":
            continue
        if p.startswith("gradheight="):
            gradheight = float(p.partition("=")[2])
            continue
        if p == "dashes" or p.startswith("dashes="):
            # LINE ...:dashes[=on[,off[,on,off...]]] (parse_line)
            spec = p.partition("=")[2]
            dashes = (
                tuple(float(x) for x in spec.split(",")) if spec else (5.0, 5.0)
            )
            continue
        if p.startswith("dash-offset="):
            dash_offset = float(p.partition("=")[2])
            continue
        if kind == "TICK" and not legend:
            # the first extra TICK field may be the fraction — numeric
            try:
                fraction = float(p)
                continue
            except ValueError:
                pass
        if not legend:
            legend = p  # first non-option field; options may follow it
    return (kind, source, legend, stack, skipscale, color, width, fraction,
            dashes, dash_offset, color2, gradheight)


_SENSIBLE = (
    1000.0, 900.0, 800.0, 750.0, 700.0, 600.0, 500.0, 400.0, 300.0, 250.0,
    200.0, 125.0, 100.0, 90.0, 80.0, 75.0, 70.0, 60.0, 50.0, 40.0, 30.0,
    25.0, 20.0, 10.0, 9.0, 8.0, 7.0, 6.0, 5.0, 4.0, 3.5, 3.0, 2.5, 2.0,
    1.8, 1.5, 1.2, 1.0, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1, 0.0,
)


def _expand_range(vmin: float, vmax: float, base: float = 1000.0):
    """si_unit + expand_range (src/rrd_graph.c:613-700): snap the autoscale
    bounds outward to the sensible-value grid at the data's SI magnitude."""
    import math

    m = max(abs(vmin), abs(vmax))
    if not (m > 0) or math.isinf(m) or math.isnan(m):
        return vmin, vmax
    magfact = base ** math.floor(math.log(m) / math.log(base))
    smin, smax = vmin / magfact, vmax / magfact
    for i in range(1, len(_SENSIBLE)):
        if not _SENSIBLE[i] > 0:
            break
        if _SENSIBLE[i - 1] >= smin and _SENSIBLE[i] <= smin:
            vmin = _SENSIBLE[i] * magfact
        if -_SENSIBLE[i - 1] <= smin and -_SENSIBLE[i] >= smin:
            vmin = -_SENSIBLE[i - 1] * magfact
        if _SENSIBLE[i - 1] >= smax and _SENSIBLE[i] <= smax:
            vmax = _SENSIBLE[i - 1] * magfact
        if -_SENSIBLE[i - 1] <= smax and -_SENSIBLE[i] >= smax:
            vmax = -_SENSIBLE[i] * magfact
    return vmin, vmax


def _final_bounds(bounds, lo_opt, up_opt, rigid, alt=None, base=1000.0,
                  expand=True, allow_shrink=False):
    """-l/-u/--rigid adjust the autoscale bounds exactly like the
    reference (src/rrd_graph.c:1486-1528): data expands past the user
    limits unless rigid; a crossed pair is pulled back together; then
    si_unit + expand_range (src/rrd_graph.c:613-700, :3963-3969) snap the
    published bounds outward to the sensible-value grid (tests/graph2:
    0.0302..0.04 data → 3.0e-02 / 4.0e-02).

    ``alt`` selects the alternative autoscale branches of expand_range
    (src/rrd_graph.c:636-668, mutually exclusive with the sensible-value
    snap): "A" (--alt-autoscale) pads both sides by 10% of the amplitude
    — or by 55% of the shortfall against fact = 2*10^(floor(log10(
    max|bound|/magfact))-2) when the amplitude is smaller, so flat-ish
    series stay visible; "J" (--alt-autoscale-min) pads only the bottom
    by 10%; "M" (--alt-autoscale-max) pads only the top by 10%."""
    import math

    vmin, vmax = bounds
    umin = float("nan") if lo_opt is None else float(lo_opt)
    umax = float("nan") if up_opt is None else float(up_opt)
    if math.isnan(umin) or (not rigid and umin > vmin):
        umin = vmin
    if math.isnan(umax) or (not rigid and umax < vmax):
        umax = vmax
    # --allow-shrink (src/rrd_graph.c:1505-1520): rigid user limits may
    # still SHRINK toward the data (never expand past it)
    if allow_shrink and rigid:
        if not math.isnan(umin) and umin < vmin:
            umin = vmin
        if not math.isnan(umax) and umax > vmax:
            umax = vmax
    if umin > umax:
        umin = 0.99 * umax if umin > 0 else 1.01 * umax
    if alt == "A":
        delt = umax - umin
        adj = delt * 0.1
        m = max(abs(umin), abs(umax))
        if m > 0 and math.isfinite(m):
            magfact = base ** math.floor(math.log(m) / math.log(base))
            fact = 2.0 * 10.0 ** (math.floor(math.log10(m / magfact)) - 2)
            if delt < fact:
                adj = (fact - delt) * 0.55
        umin -= adj
        umax += adj
    elif alt == "J":
        adj = (umax - umin) * 0.1
        umin -= adj
    elif alt == "M":
        adj = (umax - umin) * 0.1
        umax += adj
    elif (not rigid or allow_shrink) and expand:
        # src/rrd_graph.c:3968: rigid WITHOUT allow-shrink skips the
        # sensible-grid expansion; rigid+--allow-shrink still snaps the
        # (possibly shrunk) bounds outward to the sensible-value grid
        umin, umax = _expand_range(umin, umax, base)
    return umin, umax


def cmd_graphv(args: list[str]) -> int:
    """``rrdtool graphv``: the graph pipeline reporting rrd_graph_v's
    info list (key = value lines). With an image FILENAME it also renders
    the image and reports the layout coordinates the reference pushes
    (graph_left/top/width/height + image dims, src/rrd_graph.c:3937-3947);
    "-" keeps the data-only info form (no image blob in the info list)."""
    # first positional is the image filename in the reference
    fname = None
    if args and not any(args[0].startswith(p) for p in (
        "DEF:", "CDEF:", "VDEF:", "PRINT:", "LINE", "AREA:", "TICK:", "STACK:", "-",
    )):
        fname = args.pop(0)
    try:
        o = _graph_options(args)
    except _GraphOptError as e:
        print(e, file=sys.stderr)
        return 1
    lo_opt, up_opt, rigid = o["lo_opt"], o["up_opt"], o["rigid"]
    galt = "A" if o["alt_autoscale"] else (
        "J" if o["alt_as_min"] else ("M" if o["alt_as_max"] else None))
    jsontime = _opt(args, "--add-jsontime", flag=True)
    prints = [a[6:] for a in args if a.startswith("PRINT:")]
    gprints = [a[7:] for a in args if a.startswith("GPRINT:")]
    comments = [a[8:] for a in args if a.startswith("COMMENT:")]
    rules = _parse_rules(args)
    elements = [
        a for a in args
        if a.startswith(("AREA:", "TICK:", "STACK:"))
        or (a.startswith("LINE") and ":" in a)
    ]
    q = _build_query(args, allow_missing_ds=o["allow_missing_ds"])
    for p in prints:
        vname, fmt = p.split(":", 1)
        q.print_(vname, fmt)
    # GPRINT — rendered-legend prints; the legacy 2-arg form
    # GPRINT:vname:CF:fmt creates an implicit VDEF from the CF
    # (rrd_graph_helper.c parse_gprint legacy translation)
    _CF2VDEF = {"AVERAGE": "AVERAGE", "MIN": "MINIMUM", "MAX": "MAXIMUM",
                "LAST": "LAST"}
    for i, g in enumerate(gprints):
        parts = g.split(":")
        if len(parts) >= 3 and parts[1].upper() in _CF2VDEF:
            vname = f"__gp{i}"
            q.vdef(vname, f"{parts[0]},{_CF2VDEF[parts[1].upper()]}")
            q.print_(vname, ":".join(parts[2:]))
        else:
            q.print_(parts[0], ":".join(parts[1:]))
    for e in elements:
        (kind, source, legend, stack, skipscale, color, width, fraction,
         dashes, dash_offset, color2, gradheight) = _parse_element(e)
        q.element(kind, source, legend=legend, stack=stack, skipscale=skipscale,
                  color=color, width=width, fraction=fraction,
                  dashes=dashes, dash_offset=dash_offset,
                  color2=color2, gradheight=gradheight)
        if jsontime:
            # --add-jsontime publishes the plotted element values as an
            # xport-style JSON block after the info keys
            q.xport(source, legend=legend)
    res = q.execute(_spark())
    rendering = fname is not None and fname != "-"
    if rendering:
        # render like the reference's rrd_graph_v and report the layout
        # (GPRINT/COMMENT strings land in the image legend, PRINT lines
        # stay info keys below; same escape stripping as cmd_graph)
        legend_lines = res.prints[len(prints):] + [
            _re.sub(r"(\\[jlnrcs])+$", "", c) for c in comments
        ]
        cv = _paint(res, o, legend_lines, rules)
        with open(fname, "wb") as fh:
            fh.write(cv.to_bytes(o["imgformat"]))
        gl, gt, gw, gh = cv.graph_box
        print(f"graph_left = {gl}")
        print(f"graph_top = {gt}")
        print(f"graph_width = {gw}")
        print(f"graph_height = {gh}")
        print(f"image_width = {cv.w}")
        print(f"image_height = {cv.h}")
    # graphv's key = value output (rrd_graph_v info list)
    # graphv publishes the ALIGNED-DOWN window start (rrd_graph's im->start),
    # while res.start is the first row's ts (= aligned start + step)
    print(f"graph_start = {res.start - res.step}")
    print(f"graph_end = {res.end}")
    print(f"graph_step = {res.step}")
    if res.bounds is not None:
        if rendering:
            # publish the bounds of the axis that was actually painted
            # (base/--y-grid gating like _paint); the data-only form keeps
            # the legacy default-base call the goldens pin
            umin, umax = _final_bounds(
                res.bounds, lo_opt, up_opt, rigid,
                alt=None if o["y_grid_spec"] is not None else galt,
                base=o["base"], expand=o["y_grid_spec"] is None,
                allow_shrink=o["allow_shrink"],
            )
        else:
            umin, umax = _final_bounds(res.bounds, lo_opt, up_opt, rigid,
                                       alt=galt,
                                       allow_shrink=o["allow_shrink"])
        print(f"value_min = {umin:0.10e}")
        print(f"value_max = {umax:0.10e}")
    for i, line in enumerate(res.prints):
        print(f'print[{i}] = "{line}"')
    if jsontime:
        from rrdtool_1_x_spark import xport as xp

        js = xp.to_json(res, showtime=True, precision=10)
        print(f"datapoints = BLOB_SIZE:{len(js)}")
        print(js)
    return 0


def _parse_rules(args: list[str]) -> list:
    """HRULE:value#color[:legend] / VRULE:time#color[:legend]
    (src/rrd_graph_helper.c parse_hvrule) — drawn over the elements,
    clipped to the plot area, never scaling the axes."""
    rules = []
    for a in args:
        if not a.startswith(("HRULE:", "VRULE:")):
            continue
        kind = a[0]
        body = a.split(":", 1)[1]
        valspec, _, rest = body.partition("#")
        rcolor, _, rleg = rest.partition(":")
        if kind == "V":
            val = float(parse_at_time(valspec))
        else:
            val = float(valspec)
        rules.append((kind, val, f"#{rcolor}", rleg))
    return rules


class _GraphOptError(Exception):
    """Bad graph option — message printed as the reference's rrd_set_error."""


def _graph_options(args: list[str]) -> dict:
    """The shared ``rrdtool graph``/``graphv`` rendering-option parse —
    pops every render option from ``args`` (graphv strips them even when
    it stays data-only) and returns them as a dict for ``_paint``."""
    o: dict = {}
    o["width"] = int(_opt(args, "-w", "--width", default="400"))
    o["height"] = int(_opt(args, "-h", "--height", default="100"))
    o["title"] = _opt(args, "-t", "--title", default="")
    o["vlabel"] = _opt(args, "-v", "--vertical-label", default="")
    o["lo_opt"] = _opt(args, "-l", "--lower-limit")
    o["up_opt"] = _opt(args, "-u", "--upper-limit")
    o["rigid"] = _opt(args, "-r", "--rigid", flag=True)
    x_grid_opt = _opt(args, "-x", "--x-grid", default="")
    y_grid_opt = _opt(args, "-y", "--y-grid", default="")
    o["x_grid_off"] = x_grid_opt == "none"
    o["y_grid_off"] = y_grid_opt == "none"
    o["x_grid_spec"] = None
    o["y_grid_spec"] = None
    if x_grid_opt and not o["x_grid_off"]:
        from rrdtool_1_x_spark.render import parse_xgrid_spec

        o["x_grid_spec"] = parse_xgrid_spec(x_grid_opt)
    if y_grid_opt and not o["y_grid_off"]:
        g, _, l = y_grid_opt.partition(":")
        o["y_grid_spec"] = (float(g), max(1, int(l or 1)))
    # --right-axis scale:shift (+ label/format) — the second y axis
    # (src/rrd_graph.c:5255-5287 option cases 1002-1004)
    right_axis_opt = _opt(args, "--right-axis")
    o["right_axis"] = None
    if right_axis_opt is not None:
        try:
            ra_scale_s, _, ra_shift_s = right_axis_opt.partition(":")
            o["right_axis"] = (float(ra_scale_s), float(ra_shift_s))
        except ValueError:
            raise _GraphOptError("ERROR: invalid right-axis format expected scale:shift")
        if o["right_axis"][0] == 0:
            raise _GraphOptError("ERROR: the second_axis_scale must not be 0")
    o["right_axis_label"] = _opt(args, "--right-axis-label", default="")
    o["right_axis_format"] = _opt(args, "--right-axis-format")
    o["legend_position"] = _opt(args, "--legend-position", default="south").lower()
    if o["legend_position"] not in ("north", "south", "west", "east"):
        raise _GraphOptError("ERROR: unknown legend-position")
    o["legend_direction"] = _opt(args, "--legend-direction",
                            default="topdown").lower()
    if o["legend_direction"] not in ("topdown", "bottomup", "bottomup2"):
        raise _GraphOptError("ERROR: unknown legend-direction")
    o["tabwidth"] = float(_opt(args, "-T", "--tabwidth", default="40"))
    grid_dash_opt = _opt(args, "--grid-dash")
    o["grid_dash"] = None
    if grid_dash_opt is not None:
        try:
            on_s, _, off_s = grid_dash_opt.partition(":")
            o["grid_dash"] = (float(on_s), float(off_s))
        except ValueError:
            raise _GraphOptError("ERROR: expected grid-dash format float:float")
    o["dynamic_labels"] = _opt(args, "--dynamic-labels", flag=True)
    o["pango_markup"] = _opt(args, "-P", "--pango-markup", flag=True)
    # --font FONTTAG:size[:font] (repeated): without a face name the
    # bitmap default keeps one cell size, so DEFAULT's size sets an
    # integer glyph scale (size/8 rounded, min 1) — pixel-golden stable.
    # Naming a face (the reference resolves it through pango; we have no
    # font files) switches DEFAULT to the antialiased COVERAGE tier
    # (render.glyph_coverage) at the exact requested pixel size, where
    # --font-render-mode and --font-smoothing-threshold gain raster
    # effect. Other tags are accepted for CLI compatibility.
    o["font_scale"] = 1
    o["font_px"] = None
    while True:
        fspec = _opt(args, "-n", "--font")
        if fspec is None:
            break
        parts = fspec.split(":")
        if len(parts) < 2:
            raise _GraphOptError("ERROR: font invalid, expected FONTTAG:size[:font]")
        if parts[0].upper() == "DEFAULT" and float(parts[1]) > 0:
            o["font_scale"] = max(1, round(float(parts[1]) / 8))
        if (
            parts[0].upper() == "DEFAULT"
            and len(parts) >= 3
            and parts[2].strip()
        ):
            o["font_px"] = float(parts[1]) if float(parts[1]) > 0 else 8.0
    # --left-axis-format/-formatter + --right-axis-formatter
    # (src/rrd_graph.c:5288-5319 cases 1012-1014): printf format for the
    # left labels; numeric/timestamp/duration formatter switch per axis
    o["left_axis_format"] = _opt(args, "--left-axis-format")
    for key, optname, err in (
        ("left_axis_formatter", "--left-axis-formatter",
         "ERROR: Unknown left axis formatter"),
        ("right_axis_formatter", "--right-axis-formatter",
         "ERROR: Unknown right axis formatter"),
    ):
        val = _opt(args, optname, default="numeric")
        if val not in ("numeric", "timestamp", "duration"):
            raise _GraphOptError(err)
        o[key] = val
    # --week-fmt (case 1010): strftime format of the week-grid x labels
    # (reference mutable default "Week %V", src/rrd_graph.c:90)
    o["week_fmt"] = _opt(args, "--week-fmt", default="Week %V")
    # --units si (LONGOPT_UNITS_SI): force SI labels on the log axis
    units_opt = _opt(args, "--units")
    o["units_si"] = False
    if units_opt is not None:
        if units_opt != "si":
            raise _GraphOptError(
                f"ERROR: invalid argument for --units: {units_opt}"
            )
        o["units_si"] = True
    o["no_minor"] = _opt(args, "-I", "--no-minor", flag=True)
    o["utc"] = _opt(args, "--utc", flag=True)  # FORCE_UTC_TIME (case 1016)
    # -Z: a DEF naming a missing DS becomes an all-NaN series instead of
    # an error (ALLOW_MISSING_DS, src/rrd_graph.c:1016,1079)
    o["allow_missing_ds"] = _opt(
        args, "-Z", "--use-nan-for-all-missing-data", flag=True
    )
    # -F: never suppress out-of-range HRULE/VRULE legends
    # (FORCE_RULES_LEGEND, src/rrd_graph.c:2163)
    o["force_rules_legend"] = _opt(
        args, "-F", "--force-rules-legend", flag=True
    )
    # --allow-shrink (case 1015): lets rigid bounds shrink to the data
    o["allow_shrink"] = _opt(args, "--allow-shrink", flag=True)
    # --graph-type: TIME is the only implemented type — XY parses in the
    # reference but fails at render ("Graph type %i is not implemented")
    gtype = _opt(args, "--graph-type", default="TIME").upper()
    if gtype not in ("TIME", "XY"):
        raise _GraphOptError(f"ERROR: unsupported graphics type '{gtype}'")
    if gtype == "XY":
        raise _GraphOptError("ERROR: Graph type 1 is not implemented")
    # Three of these are no-ops in the REFERENCE itself, so accepting
    # them without effect is exact parity: --alt-y-mrtg is kept "to save
    # old apps from crashing" (src/rrd_graph.c:5020), --interlaced is
    # "not supported at the moment" (case 'i', :5367), and --no-gridfit
    # toggles a flag whose only consumer — the apply_gridfit call at
    # :3981 — is commented out. --font-render-mode and
    # --font-smoothing-threshold tune cairo/pango antialiasing in the
    # reference; here they take raster effect in the coverage-AA text
    # tier (--font with a face name) and are accepted no-ops under the
    # pixel-golden bitmap default.
    _opt(args, "--alt-y-mrtg", flag=True)
    _opt(args, "-i", "--interlaced", flag=True)
    _opt(args, "-N", "--no-gridfit", flag=True)
    _opt(args, "--disable-rrdtool-tag", flag=True)  # tag is never drawn
    frm = _opt(args, "-R", "--font-render-mode", default="normal")
    if frm not in ("normal", "light", "mono"):
        raise _GraphOptError(
            f"ERROR: unknown font-render-mode '{frm}'"
        )
    o["font_render_mode"] = frm
    grm = _opt(args, "-G", "--graph-render-mode", default="normal")
    if grm not in ("normal", "mono"):
        raise _GraphOptError(
            f"ERROR: unknown graph-render-mode '{grm}'"
        )
    fst = _opt(args, "-B", "--font-smoothing-threshold")
    o["font_smoothing_threshold"] = float(fst) if fst is not None else None
    o["alt_autoscale"] = _opt(args, "-A", "--alt-autoscale", flag=True)
    o["alt_as_min"] = _opt(args, "-J", "--alt-autoscale-min", flag=True)
    o["alt_as_max"] = _opt(args, "-M", "--alt-autoscale-max", flag=True)
    o["alt_y_grid"] = _opt(args, "-Y", "--alt-y-grid", flag=True)
    units_exp = _opt(args, "-X", "--units-exponent")
    o["units_exponent"] = int(units_exp) if units_exp is not None else None
    o["slope_mode"] = _opt(args, "-E", "--slope-mode", flag=True)
    o["base"] = float(_opt(args, "-b", "--base", default="1000"))
    o["only_graph"] = _opt(args, "-j", "--only-graph", flag=True)
    units_len = _opt(args, "-L", "--units-length")
    o["units_length"] = int(units_len) if units_len is not None else None
    o["logarithmic"] = _opt(args, "-o", "--logarithmic", flag=True)
    o["full_size"] = _opt(args, "-D", "--full-size-mode", flag=True)
    o["no_legend"] = _opt(args, "-g", "--no-legend", flag=True)
    o["imginfo"] = _opt(args, "-f", "--imginfo")
    o["lazy"] = _opt(args, "-z", "--lazy", flag=True)
    o["zoom"] = float(_opt(args, "-m", "--zoom", default="1"))
    o["border"] = int(_opt(args, "--border", default="2"))
    o["watermark"] = _opt(args, "-W", "--watermark", default="")
    o["imgformat"] = _opt(args, "-a", "--imgformat", default="PNG").upper()
    if o["imgformat"] not in ("PNG", "SVG", "EPS", "PDF"):
        raise _GraphOptError(
            "ERROR: supported imgformats are PNG, SVG, EPS and PDF, "
            f"not {o['imgformat']}"
        )
    o["colors"] = {}
    while True:
        c = _opt(args, "-c", "--color")
        if c is None:
            break
        tag, _, val = c.partition("#")
        o["colors"][tag.upper()] = f"#{val}"
    return o


def _paint(res, o: dict, legend_lines, rules):
    """Shared graph/graphv painter: autoscale-final bounds + render_graph
    over the resolved query, returning the canvas (zoom applied)."""
    from rrdtool_1_x_spark.render import render_graph

    bounds = res.bounds or (0.0, 1.0)
    # -A/-J/-M pick the alternative expand_range branches; an explicit
    # --y-grid step suppresses ALL bound massaging (the reference gates
    # the whole expand_range body on isnan(ygridstep))
    alt = "A" if o["alt_autoscale"] else "J" if o["alt_as_min"] else (
        "M" if o["alt_as_max"] else None)
    umin, umax = _final_bounds(
        bounds, o["lo_opt"], o["up_opt"], o["rigid"],
        alt=None if o["y_grid_spec"] is not None else alt,
        base=o["base"], expand=o["y_grid_spec"] is None,
        allow_shrink=o["allow_shrink"],
    )
    rows = [tuple(r) for r in res.plots.collect()] if res.plots is not None else []
    cv = render_graph(
        rows,
        res.elements or [],
        (umin, umax),
        res.start - res.step,
        res.end,
        width=o["width"],
        height=o["height"],
        title=o["title"],
        vertical_label=o["vlabel"],
        legend_lines=legend_lines,
        colors=o["colors"],
        x_grid=not o["x_grid_off"],
        y_grid=not o["y_grid_off"],
        x_grid_spec=o["x_grid_spec"],
        y_grid_spec=o["y_grid_spec"],
        units_exponent=o["units_exponent"],
        slope_mode=o["slope_mode"],
        base=o["base"],
        only_graph=o["only_graph"],
        units_length=o["units_length"],
        tz_localtime=_time.gmtime if o["utc"] else _time.localtime,
        rules=rules,
        logarithmic=o["logarithmic"],
        full_size=o["full_size"],
        no_legend=o["no_legend"],
        border=o["border"],
        watermark=o["watermark"],
        backend=o["imgformat"].lower(),
        right_axis=o["right_axis"],
        right_axis_label=o["right_axis_label"],
        right_axis_format=o["right_axis_format"],
        alt_y_grid=o["alt_y_grid"],
        legend_position=o["legend_position"],
        legend_direction=o["legend_direction"],
        tabwidth=o["tabwidth"],
        font_scale=o["font_scale"],
        font_px=o["font_px"],
        font_render_mode=o["font_render_mode"],
        font_smoothing_threshold=o["font_smoothing_threshold"],
        grid_dash=o["grid_dash"],
        dynamic_labels=o["dynamic_labels"],
        pango_markup=o["pango_markup"],
        no_minor=o["no_minor"],
        week_fmt=o["week_fmt"],
        units_si=o["units_si"],
        axis_format=o["left_axis_format"],
        axis_formatter=o["left_axis_formatter"],
        right_axis_formatter=o["right_axis_formatter"],
        force_rules_legend=o["force_rules_legend"],
    )
    if o["zoom"] != 1.0:
        cv.zoom(o["zoom"])
    return cv


def cmd_graph(args: list[str]) -> int:
    """``rrdtool graph`` with REAL image output: the graphv data pipeline
    (DEF fetch/alignment -> CDEF/VDEF -> data_proc paint values + bounds)
    feeds the numpy rasterizer (render.py), PNG-encoded by the in-repo
    codec. PRINT lines go to stdout, GPRINT/COMMENT lines into the image
    legend, and the last stdout line is the image size WxH like the
    reference CLI (src/rrd_tool.c handle_request_graph).

    ``-w/-h`` size the plot area (image adds margins, same convention as
    rrd_graph); ``--maxrows`` defaults to the plot width so each pixel
    column maps to one consolidated row (data_fetch reduce,
    src/rrd_graph.c:1055-1070)."""
    if not args:
        print("ERROR: graph needs a filename", file=sys.stderr)
        return 1
    fname = args.pop(0)
    try:
        o = _graph_options(args)
    except _GraphOptError as e:
        print(e, file=sys.stderr)
        return 1
    width, lazy = o["width"], o["lazy"]
    imginfo, imgformat = o["imginfo"], o["imgformat"]
    if "--maxrows" not in args and not any(
        a.startswith("--maxrows=") for a in args
    ):
        args += ["--maxrows", str(width)]

    if lazy and fname != "-":
        # lazy_check (src/rrd_graph.c:3458-3486): keep the existing image
        # when it is younger than one pixel column's worth of time; report
        # its PNG dims and skip all data work
        import os as _os
        import struct as _struct

        try:
            st = _os.stat(fname)
            start_s = _opt(list(args), "-s", "--start")
            end_s = _opt(list(args), "-e", "--end")
            from rrdtool_1_x_spark.timeparse import proc_start_end

            l_start, l_end = proc_start_end(start_s or "end-24h", end_s or "now")
            if _time.time() - st.st_mtime <= max(1, (l_end - l_start) / width):
                with open(fname, "rb") as fh:
                    head = fh.read(24)
                if head[:8] == b"\x89PNG\r\n\x1a\n":
                    w_png, h_png = _struct.unpack(">II", head[16:24])
                    print(f"{w_png}x{h_png}")
                    return 0
        except OSError:
            pass  # no existing image: fall through and render

    prints = [a[6:] for a in args if a.startswith("PRINT:")]
    gprints = [a[7:] for a in args if a.startswith("GPRINT:")]
    comments = [a[8:] for a in args if a.startswith("COMMENT:")]
    rules = _parse_rules(args)
    elements = [
        a for a in args
        if a.startswith(("AREA:", "TICK:", "STACK:"))
        or (a.startswith("LINE") and ":" in a)
    ]
    q = _build_query(args, allow_missing_ds=o["allow_missing_ds"])
    n_plain = len(prints)
    for p in prints:
        vname, fmt = p.split(":", 1)
        q.print_(vname, fmt)
    _CF2VDEF = {"AVERAGE": "AVERAGE", "MIN": "MINIMUM", "MAX": "MAXIMUM",
                "LAST": "LAST"}
    for i, g in enumerate(gprints):
        parts = g.split(":")
        if len(parts) >= 3 and parts[1].upper() in _CF2VDEF:
            vname = f"__gp{i}"
            q.vdef(vname, f"{parts[0]},{_CF2VDEF[parts[1].upper()]}")
            q.print_(vname, ":".join(parts[2:]))
        else:
            q.print_(parts[0], ":".join(parts[1:]))
    for e in elements:
        (kind, source, legend, stack, skipscale, color, ew, fraction,
         dashes, dash_offset, color2, gradheight) = _parse_element(e)
        q.element(kind, source, legend=legend, stack=stack, skipscale=skipscale,
                  color=color, width=ew, fraction=fraction,
                  dashes=dashes, dash_offset=dash_offset,
                  color2=color2, gradheight=gradheight)
    res = q.execute(_spark())
    # strip trailing alignment escapes (\l \r \c \j \n) — flow layout is
    # simplified to one legend item per line
    legend_lines = res.prints[n_plain:] + [
        _re.sub(r"(\\[jlnrcs])+$", "", c) for c in comments
    ]
    cv = _paint(res, o, legend_lines, rules)
    png = cv.to_bytes(imgformat)
    if fname == "-":
        sys.stdout.buffer.write(png)
    else:
        with open(fname, "wb") as fh:
            fh.write(png)
    if imginfo:
        # --imginfo fmt: C-style "%s %lu %lu" over (filename, w, h) —
        # printed first, like rrd_graph's calcpr[0] (rrd_cgi drawgraph)
        pyfmt = imginfo.replace("%lu", "%d")
        print(pyfmt % (fname, cv.w, cv.h))
    for line in res.prints[:n_plain]:
        print(line)
    print(f"{cv.w}x{cv.h}")
    return 0


def cmd_info(args: list[str]) -> int:
    for k, v in _store(args[0]).info().items():
        if isinstance(v, str):
            print(f'{k} = "{v}"')
        else:
            print(f"{k} = {v}")
    return 0


def cmd_list(args: list[str]) -> int:
    from rrdtool_1_x_spark.sources.store import list_datasets

    recursive = _opt(args, "--recursive", "-r", flag=True)
    if not args:
        # ≙ rrd_list with no dirname (tests/list1: "list without
        # parameters displays Usage")
        print("Usage: rrdtool list [--recursive] <dirname>", file=sys.stderr)
        return 1
    for name in list_datasets(args[0], recursive=recursive):
        print(name)
    return 0


def cmd_first(args: list[str]) -> int:
    daemon = _daemon_addr(args)
    idx = int(_opt(args, "--rraindex", default="0"))
    path = args.pop(0)
    if daemon is not None:
        with _client(daemon) as c:
            _, msg, _ = c.command(f"FIRST {_series_of(path)} {idx}")
        print(msg)
        return 0
    print(_store(path).first(idx))
    return 0


def cmd_last(args: list[str]) -> int:
    daemon = _daemon_addr(args)
    path = args.pop(0)
    if daemon is not None:
        # the daemon flushes the series' pending buffer before answering
        with _client(daemon) as c:
            _, msg, _ = c.command(f"LAST {_series_of(path)}")
        print(msg)
        return 0
    print(_store(path).last())
    return 0


def cmd_lastupdate(args: list[str]) -> int:
    rows = _store(args[0]).lastupdate().collect()
    names = [r["ds_name"] for r in rows]
    print(" " + " ".join(names))
    print()
    if rows:
        ts = int(max(r["ts"] for r in rows))
        vals = " ".join(
            "U" if r["value"] is None else f"{r['value']:g}" for r in rows
        )
        print(f"{ts}: {vals}")
    return 0


# above this many archive slots, cmd_dump renders rows executor-side even
# without --distributed (the slot count comes from the header — no scan)
DUMP_DRIVER_MAX_SLOTS = 1_000_000


def cmd_dump(args: list[str]) -> int:
    from rrdtool_1_x_spark.sources.rrdxml import (
        assemble_dump,
        dump_xml,
        dump_xml_distributed,
    )

    distributed = _opt(args, "--distributed", flag=True)
    path = args.pop(0)
    store = _store(path)
    if distributed:
        # executor-side row rendering for archives too big for the driver;
        # the output argument names a fragment directory (cat in name order
        # or assemble_dump() to get the single file)
        dump_xml_distributed(store, args.pop(0))
        return 0
    out = args.pop(0) if args else "/dev/stdout"
    d = store.dataset
    slots = sum(r.row_cnt for r in d.rra) * max(
        1, sum(1 for ds in d.ds if ds.dst != "COMPUTE")
    )
    if slots > DUMP_DRIVER_MAX_SLOTS:
        # big archive: render distributed, then STREAM the ordered text
        # fragments into the output file — the driver copies bytes but
        # never materializes archive rows
        import shutil as _shutil
        import tempfile as _tempfile

        frag = _tempfile.mkdtemp(prefix="rrddump_")
        try:
            dump_xml_distributed(store, frag)
            assemble_dump(frag, out)
        finally:
            _shutil.rmtree(frag, ignore_errors=True)
        return 0
    dump_xml(store, out)
    return 0


def cmd_restore(args: list[str]) -> int:
    from rrdtool_1_x_spark.sources.rrdxml import restore_xml

    xml, target = args.pop(0), args.pop(0)
    restore_xml(_spark(), xml, target)
    return 0


def cmd_flushcached(args: list[str]) -> int:
    """≙ rrdtool flushcached (src/rrd_flushcached.c:31-95): ask the daemon
    to write one or more datasets' pending values now."""
    daemon = _daemon_addr(args)
    if daemon is None:
        raise ValueError("flushcached needs a daemon address (-d or RRDCACHED_ADDRESS)")
    with _client(daemon) as c:
        for path in args:
            c.flush(_series_of(path))
    return 0


def cmd_tune(args: list[str]) -> int:
    """≙ rrdtool tune (src/rrd_tune.c option table :80-120): heartbeat /
    min / max / data-source-type / data-source-rename plus the
    Holt-Winters parameter and aberrant-reset options."""
    from rrdtool_1_x_spark.sources import evolve as ev

    path = args.pop(0)
    store = _store(path)
    hb = _opt(args, "--heartbeat", "-h")
    mn = _opt(args, "--minimum", "-i")
    mx = _opt(args, "--maximum", "-a")
    dst = _opt(args, "--data-source-type", "-d")
    ren = _opt(args, "--data-source-rename", "-r")
    # non-reference extension: --recompute re-derives archives under a new
    # DST from the retained raw samples; the reference default is
    # header-only (history keeps its old-type rates, tests/tune1 mod2)
    recompute = _opt(args, "--recompute", flag=True)
    if hb:
        name, v = hb.split(":")
        ev.tune_ds(store, name, heartbeat=int(float(v)))
    if mn:
        name, v = mn.split(":")
        ev.tune_ds(store, name, min_val=_num_or_none(v))
    if mx:
        name, v = mx.split(":")
        ev.tune_ds(store, name, max_val=_num_or_none(v))
    if dst:
        name, v = dst.split(":")
        ev.retype_ds(store, name, v, recompute=recompute)
    if ren:
        old, new = ren.split(":")
        ev.rename_ds(store, old, new)
    hw: dict[str, float] = {}
    for opt, key in [
        (("-x", "--alpha"), "alpha"), (("-y", "--beta"), "beta"),
        (("-z", "--gamma"), "gamma"),
        (("-v", "--gamma-deviation"), "gamma_deviation"),
        (("-p", "--deltapos"), "deltapos"),
        (("-n", "--deltaneg"), "deltaneg"),
        (("-f", "--failure-threshold"), "failure_threshold"),
        (("-w", "--window-length"), "window_length"),
        (("-s", "--smoothing-window"), "smoothing_window"),
        (("-S", "--smoothing-window-deviation"), "smoothing_window_deviation"),
    ]:
        v = _opt(args, *opt)
        if v is not None:
            hw[key] = float(v)
    if hw:
        ev.tune_hw(store, **hw)
    ab = _opt(args, "-b", "--aberrant-reset")
    if ab:
        ev.aberrant_reset(store, ab)
    # modify-style positionals, handled after options like the reference
    # (handle_modify via rrd_tune, src/rrd_modify.c:1311-1415):
    # DS:<spec> adds, DEL:<name> drops, RRA:<spec> adds, DELRRA:<idx>
    # drops, RRA#<idx>:[+-=]<rows> resizes
    for a in args:
        if a.startswith("DEL:"):
            ev.del_ds(store, a[4:])
        elif a.startswith("DS:"):
            ev.add_ds(store, _parse_ds(a), recompute=True)
        elif a.startswith("DELRRA:"):
            ev.del_rra(store, int(a[7:]))
        elif a.startswith("RRA#"):
            idx_s, _, op = a[4:].partition(":")
            sign, n = op[0], int(op[1:])
            idx = int(idx_s)
            if sign == "+":
                ev.resize_rra(store, idx, n)
            elif sign == "-":
                ev.resize_rra(store, idx, -n)
            elif sign == "=":
                ev.resize_rra(
                    store, idx, n - store.dataset.rra[idx].row_cnt
                )
            else:
                raise ValueError(
                    f"Failed to parse RRA# command: invalid operation: {sign}"
                )
        elif a.startswith("RRA:"):
            ev.add_rra(store, _parse_rra(a, store.dataset.step))
    return 0


def cmd_resize(args: list[str]) -> int:
    from rrdtool_1_x_spark.sources.evolve import resize_rra

    path, idx, how, rows = args[0], int(args[1]), args[2].upper(), int(args[3])
    resize_rra(_store(path), idx, rows if how == "GROW" else -rows)
    return 0


def cmd_version(args: list[str]) -> int:
    print("rrdtool_1_x_spark (rrdtool 1.x compatible engine on Apache Spark)")
    return 0


COMMANDS = {
    "create": cmd_create,
    "update": cmd_update,
    "updatev": cmd_updatev,
    "fetch": cmd_fetch,
    "xport": cmd_xport,
    "graphv": cmd_graphv,
    "graph": cmd_graph,
    # the reference ships rrdcgi as a sibling binary; here it rides the
    # same entry point (python -m rrdtool_1_x_spark cgi [--filter] tmpl)
    "cgi": lambda args: __import__(
        "rrdtool_1_x_spark.cgi", fromlist=["main"]
    ).main(args),
    "info": cmd_info,
    "list": cmd_list,
    "first": cmd_first,
    "last": cmd_last,
    "lastupdate": cmd_lastupdate,
    "flushcached": cmd_flushcached,
    "dump": cmd_dump,
    "restore": cmd_restore,
    "tune": cmd_tune,
    "resize": cmd_resize,
    "version": cmd_version,
    "v": cmd_version,
}


def batch_main(stream=None) -> int:
    """≙ ``rrdtool -`` remote/batch mode (src/rrd_tool.c:519-700): read one
    command per stdin line, print ``OK u:<user> s:<sys> r:<real>`` after
    each success or ``ERROR: ...`` and keep going; the shell-ish built-ins
    cd / pwd / mkdir / ls / quit operate on dataset directories (a dataset
    dir lists as ``- <name>`` like a .rrd file, other dirs as ``d <name>``)."""
    import os
    import shlex
    import time as _t

    stream = sys.stdin if stream is None else stream
    t0 = _t.time()
    for raw in stream:
        line = raw.strip()
        if not line:
            continue
        try:
            argv = shlex.split(line)
        except ValueError as e:
            print(f"ERROR: {e}")
            continue
        cmd = argv[0]
        if cmd == "quit":
            return 0
        if cmd == "cd":
            try:
                os.chdir(argv[1])
            except OSError as e:
                print(f"ERROR: chdir {argv[1]} {e.strerror}")
            continue
        if cmd == "pwd":
            print(os.getcwd())
            continue
        if cmd == "mkdir":
            try:
                os.mkdir(argv[1])
            except OSError as e:
                print(f"ERROR: mkdir {argv[1]}: {e.strerror}")
            continue
        if cmd == "ls":
            for name in sorted(os.listdir(".")):
                if os.path.isdir(name):
                    kind = "-" if os.path.isfile(f"{name}/meta.json") else "d"
                    print(f"{kind} {name}")
            continue
        fn = COMMANDS.get(cmd)
        if fn is None:
            print(f"ERROR: unknown command {cmd!r}")
            continue
        u0 = os.times()
        try:
            rc = fn(argv[1:])
        except Exception as e:
            print(f"ERROR: {e}")
            continue
        u1 = os.times()
        if rc == 0:
            print(
                f"OK u:{u1.user - u0.user:1.2f} s:{u1.system - u0.system:1.2f} "
                f"r:{_t.time() - t0:1.2f}"
            )
    return 0


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    if not args or args[0] in ("-h", "--help", "help"):
        print("usage: python -m rrdtool_1_x_spark <command> ...")
        print("commands:", " ".join(sorted(COMMANDS)), "-")
        return 0
    if args[0] == "-":
        return batch_main()
    cmd = args.pop(0)
    fn = COMMANDS.get(cmd)
    if fn is None:
        print(f"ERROR: unknown command {cmd!r}", file=sys.stderr)
        return 1
    try:
        return fn(args)
    except Exception as e:  # reference CLI prints ERROR: and exits nonzero
        print(f"ERROR: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
