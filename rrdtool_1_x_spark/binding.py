"""python-rrdtool–compatible binding.

The reference ships a CPython extension (``bindings/python/
rrdtoolmodule.c``) whose module-level functions take rrdtool-CLI argv
strings and return structured Python values; many users consume rrdtool
exclusively through it (``import rrdtool; rrdtool.create(...)``). This
module re-exposes the same surface — same function names, same argument
convention (strings, or lists/tuples of strings, flattened like
``convert_args``, rrdtoolmodule.c:92-160), same return shapes, same
exception types — over this engine:

* ``create/update/resize/tune/flushcached`` → ``None`` (raise
  ``OperationalError`` on failure, like rrd_get_error()).
* ``updatev/info/graphv`` → the rrd_info dict
  (``_rrdtool_util_info2dict``, rrdtoolmodule.c:202-249).
* ``fetch`` → ``((start, end, step), ds_names, rows)`` with ``None`` for
  unknown (rrdtoolmodule.c:419-489).
* ``graph`` → ``(xsize, ysize, calcpr-list-or-None)``
  (rrdtoolmodule.c:593-641).
* ``xport`` → ``{"meta": {...}, "data": [...]}`` (rrdtoolmodule.c:696-784).
* ``first/last`` → int; ``lastupdate`` → ``{"date": datetime, "ds":
  {name: float|None}}`` (rrdtoolmodule.c:1041-1110); ``list`` → [names].
* ``register_fetch_cb/clear_fetch_cb`` → the process-global ``cb//``
  callback (rrdtoolmodule.c:1116-1320): the callable is invoked with
  kwargs ``(filename, cf, start, end, step)`` and must return
  ``{"start": int, "step": int, "data": {ds: [values]}}``.

Commands run through the CLI layer (one shared, golden-tested parser),
with stdout/stderr captured; value-returning entry points build their
structures from the same internals the CLI prints from.
"""

from __future__ import annotations

import builtins
import contextlib
import io
import math
import re


class OperationalError(Exception):
    """≙ rrdtool.OperationalError — the command failed (rrd_get_error)."""


class ProgrammingError(Exception):
    """≙ rrdtool.ProgrammingError — bad argument types/shape."""


def lib_version() -> str:
    """≙ rrdtool.lib_version() → the rrd library version this engine
    mirrors (reference VERSION file)."""
    return "1.9.0"


def _argv(args) -> list[str]:
    """Flatten (str | list[str] | tuple[str, ...]) varargs —
    ``convert_args`` (rrdtoolmodule.c:92-160)."""
    # NB: this module exports a ``list`` function (the reference binding's
    # name) — builtins.list below is deliberate
    out: builtins.list[str] = []
    for a in args:
        if isinstance(a, (builtins.list, tuple)):
            for x in a:
                if not isinstance(x, str):
                    raise ProgrammingError(
                        "arguments must be strings or lists of strings"
                    )
                out.append(x)
        elif isinstance(a, str):
            out.append(a)
        else:
            raise ProgrammingError(
                "arguments must be strings or lists of strings"
            )
    return out


def _run(cmd: str, argv: list[str], capture_stdout: bool = True) -> str:
    from rrdtool_1_x_spark import cli

    out, err = io.StringIO(), io.StringIO()
    stdout_cm = (
        contextlib.redirect_stdout(out) if capture_stdout
        else contextlib.nullcontext()
    )
    try:
        with stdout_cm, contextlib.redirect_stderr(err):
            rc = cli.COMMANDS[cmd]([*argv])
    except (OperationalError, ProgrammingError):
        raise
    except Exception as e:  # internal errors surface like rrd_get_error
        msg = err.getvalue().strip()
        raise OperationalError(msg or f"{cmd}: {e}") from e
    if rc != 0:
        raise OperationalError(err.getvalue().strip() or f"{cmd} failed")
    return out.getvalue()


_KV_RE = re.compile(r"^([^=]+?) = (.*)$")


def _typed(v: str):
    """Parse one printed info value back to its type the way
    ``_rrdtool_util_info2dict`` keeps rrd_info's typed values."""
    if v.startswith('"') and v.endswith('"'):
        return v[1:-1]
    try:
        return int(v)
    except ValueError:
        pass
    try:
        f = float(v)
        return None if math.isnan(f) else f
    except ValueError:
        return v


def _parse_info(text: str) -> dict:
    out: dict = {}
    lines = text.splitlines()
    i = 0
    while i < len(lines):
        m = _KV_RE.match(lines[i])
        if m:
            key, val = m.group(1), m.group(2)
            if val.startswith("BLOB_SIZE:"):
                # a size-framed blob: the next lines carry exactly that
                # many bytes (rrd_info RD_I_BLO → PyBytes)
                size = int(val[10:])
                blob = "\n".join(lines[i + 1:])
                out[key] = blob.encode()[:size]
                break
            out[key] = _typed(val)
        i += 1
    return out


# ------------------------------------------------------------- commands

def create(*args) -> None:
    """≙ rrdtool.create(args..) — rrdcreate grammar."""
    _run("create", _argv(args))


def update(*args) -> None:
    """≙ rrdtool.update(args..) — rrdupdate grammar."""
    _run("update", _argv(args))


def updatev(*args) -> dict:
    """≙ rrdtool.updatev(args..) → info dict of the CDPs the update
    completed (one key per [ts]RRA[cf][cnt]DS[name])."""
    return _parse_info(_run("updatev", _argv(args)))


def tune(*args) -> None:
    """≙ rrdtool.tune(args..) — rrdtune grammar."""
    _run("tune", _argv(args))


def resize(*args) -> None:
    """≙ rrdtool.resize(filename, rra-num, GROW|SHRINK, rows)."""
    _run("resize", _argv(args))


def flushcached(*args) -> None:
    """≙ rrdtool.flushcached([-d addr] filename..)."""
    _run("flushcached", _argv(args))


def dump(*args) -> None:
    """≙ rrdtool.dump(filename[, outfile]) — XML to outfile, or to real
    stdout with one argument (the reference streams it)."""
    _run("dump", _argv(args), capture_stdout=False)


def fetch(*args):
    """≙ rrdtool.fetch(args..) → ((start, end, step), ds_names_tuple,
    [row value tuples, None for unknown])."""
    argv = _argv(args)
    if _fetch_cb is not None and any(a.startswith("cb//") for a in argv):
        return _fetch_via_cb(argv)
    from rrdtool_1_x_spark.cli import fetch_table

    try:
        rng, names, table = fetch_table(argv)
    except (OperationalError, ProgrammingError):
        raise
    except Exception as e:
        raise OperationalError(str(e)) from e
    return rng, tuple(names), [vals for _ts, vals in table]


def graph(*args):
    """≙ rrdtool.graph(args..) → (xsize, ysize, calcpr or None); renders
    the image to the given filename ("-" streams it to real stdout)."""
    argv = _argv(args)
    stream = bool(argv) and argv[0] == "-"
    if stream:
        import tempfile

        fmt = "png"
        for i, a in enumerate(argv):
            if a in ("-a", "--imgformat") and i + 1 < len(argv):
                fmt = argv[i + 1].lower()
        tmp = tempfile.NamedTemporaryFile(suffix=f".{fmt}", delete=False)
        tmp.close()
        argv = [tmp.name] + argv[1:]
    out = _run("graph", argv)
    if stream:
        import os
        import sys

        with open(argv[0], "rb") as fh:
            sys.stdout.buffer.write(fh.read())
        os.unlink(argv[0])
    lines = [ln for ln in out.splitlines() if ln]
    m = re.match(r"^(\d+)x(\d+)$", lines[-1]) if lines else None
    if m is None:
        raise OperationalError("graph produced no size line")
    calcpr = lines[:-1]
    return int(m.group(1)), int(m.group(2)), calcpr or None


def graphv(*args) -> dict:
    """≙ rrdtool.graphv(args..) → the rrd_graph_v info dict (graph_left/
    top/width/height, image dims, graph_start/end, value_min/max,
    print[i], …); renders the image when a filename is given."""
    return _parse_info(_run("graphv", _argv(args)))


def xport(*args) -> dict:
    """≙ rrdtool.xport(args..) → {"meta": {start, end, step, rows,
    columns, legend}, "data": [value tuples, None for unknown]}."""
    argv = _argv(args)
    from rrdtool_1_x_spark.cli import xport_result
    from rrdtool_1_x_spark.xport import _collect_rows

    try:
        res = xport_result(argv)
        rows = _collect_rows(res)
    except (OperationalError, ProgrammingError):
        raise
    except Exception as e:
        raise OperationalError(str(e)) from e

    def _clean(v):
        return None if v is None or (isinstance(v, float) and math.isnan(v)) else v

    data = [tuple(_clean(v) for v in row) for _t, row in rows]
    return {
        "meta": {
            "start": res.start,
            "end": res.end,
            "step": res.step,
            "rows": len(data),
            "columns": len(res.legends),
            "legend": [*res.legends],
        },
        "data": data,
    }


def info(*args) -> dict:
    """≙ rrdtool.info(filename) → the rrd_info header dict."""
    argv = _argv(args)
    if not argv:
        raise ProgrammingError("info needs a filename")
    from rrdtool_1_x_spark.cli import _store

    try:
        return dict(_store(argv[0]).info())
    except (OperationalError, ProgrammingError):
        raise
    except Exception as e:
        raise OperationalError(str(e)) from e


def first(*args) -> int:
    """≙ rrdtool.first(filename[, --rraindex n]) → UNIX timestamp."""
    return int(_run("first", _argv(args)).strip())


def last(*args) -> int:
    """≙ rrdtool.last(filename) → UNIX timestamp."""
    return int(_run("last", _argv(args)).strip())


def lastupdate(*args) -> dict:
    """≙ rrdtool.lastupdate(filename) → {"date": datetime, "ds":
    {name: float | None}}."""
    import datetime

    argv = _argv(args)
    if not argv:
        raise ProgrammingError("lastupdate needs a filename")
    from rrdtool_1_x_spark.cli import _store

    try:
        rows = _store(argv[0]).lastupdate().collect()
    except (OperationalError, ProgrammingError):
        raise
    except Exception as e:
        raise OperationalError(str(e)) from e
    if not rows:
        raise OperationalError("no updates stored")
    ts = int(max(r["ts"] for r in rows))
    ds = {
        r["ds_name"]: (None if r["value"] is None else float(r["value"]))
        for r in rows
    }
    return {"date": datetime.datetime.fromtimestamp(ts), "ds": ds}


def list(*args):  # noqa: A001 — the reference binding exports this name
    """≙ rrdtool.list(dirname[, -r]) → list of dataset names."""
    out = _run("list", _argv(args))
    return [ln for ln in out.splitlines() if ln]


def cgi(*args) -> None:
    """CLI passthrough for the rrdcgi template expander (not part of the
    reference python binding; provided for completeness)."""
    _run("cgi", _argv(args), capture_stdout=False)


# --------------------------------------------------- fetch callback (cb//)

_fetch_cb = None


def _cb_frame(spark, path: str, start: int, end: int, step: int):
    """Adapt the python-rrdtool callback contract to CallbackRegistry's
    DataFrame contract so ``cb//`` DEFs in graph/xport work too. The DEF
    layer doesn't thread the CF down (the reference passes it through);
    AVERAGE is reported, matching what consolidation does next."""
    ret = _call_fetch_cb(f"cb//{path}", "AVERAGE", start, end, step)
    cstart, cstep, data = ret["start"], ret["step"], ret["data"]
    rows = []
    for name, vals in data.items():
        for i, v in enumerate(vals):
            rows.append(
                (path, name, float(cstart + (i + 1) * cstep),
                 None if v is None else float(v))
            )
    return spark.createDataFrame(
        rows, "series_id string, ds_name string, ts double, value double"
    )


def _call_fetch_cb(filename: str, cf: str, start: int, end: int, step: int):
    if _fetch_cb is None:
        raise OperationalError(
            "use rrdtool.register_fetch_cb to register a fetch callback"
        )
    ret = _fetch_cb(filename=filename, cf=cf, start=start, end=end, step=step)
    # the same contract checks as _rrdtool_fetch_cb_wrapper
    if not isinstance(ret, dict):
        raise OperationalError("expected callback method to be a dict")
    for key, typ in (("step", int), ("start", int), ("data", dict)):
        if key not in ret:
            raise OperationalError(
                f"expected '{key}' key in callback return value"
            )
        if not isinstance(ret[key], typ):
            raise OperationalError(
                f"the '{key}' key in callback return value must be "
                f"{typ.__name__}"
            )
    if ret["start"] == 0 or ret["start"] > start:
        raise OperationalError(
            "expected 'start' value in callback return dict to be equal or "
            "earlier than passed start timestamp"
        )
    return ret


def _fetch_via_cb(argv: list[str]):
    """rrdtool.fetch over a cb// pseudo-path: the callback IS the data
    source (rrd_fetch_cb_wrapper, rrdtoolmodule.c:1120-1320)."""
    from rrdtool_1_x_spark.cli import _opt
    from rrdtool_1_x_spark.timeparse import proc_start_end

    args = [*argv]
    res = _opt(args, "-r", "--resolution")
    _opt(args, "-a", "--align-start", flag=True)
    end_s = _opt(args, "-e", "--end")
    start_s = _opt(args, "-s", "--start")
    path, cf = args.pop(0), args.pop(0).upper()
    import time as _time

    now = int(_time.time())
    start, end = proc_start_end(start_s or "end-24h", end_s or "now", now)
    step = int(res) if res else 300
    start -= start % step
    end -= end % step
    ret = _call_fetch_cb(path, cf, start, end, step)
    cstart, cstep, data = ret["start"], ret["step"], ret["data"]
    names = tuple(data.keys())
    nrows = max((len(v) for v in data.values()), default=0)
    rows = [
        tuple(
            (None if data[n][i] is None else float(data[n][i]))
            if i < len(data[n]) else None
            for n in names
        )
        for i in range(nrows)
    ]
    return (cstart, cstart + nrows * cstep, cstep), names, rows


def register_fetch_cb(cb) -> None:
    """≙ rrdtool.register_fetch_cb(callable): the callable serves every
    ``cb//`` path; invoked with kwargs (filename, cf, start, end, step)
    and must return {"start": int, "step": int, "data": {ds: [values]}}."""
    global _fetch_cb
    if not callable(cb):
        raise ProgrammingError("argument must be callable")
    _fetch_cb = cb
    from rrdtool_1_x_spark.sources.external import CALLBACKS

    CALLBACKS.register_default(_cb_frame)


def clear_fetch_cb() -> None:
    """≙ rrdtool.clear_fetch_cb()."""
    global _fetch_cb
    _fetch_cb = None
    from rrdtool_1_x_spark.sources.external import CALLBACKS

    CALLBACKS.clear_default()
