"""xport output formatting: the tabular JSON/XML writers.

Reference: rrd_xport.c formatters (src/rrd_xport.c:614-996); golden shapes
in tests/xport1.json.output / tests/xport1.xml.output:

* JSON: {"about", "meta": {start, end, step, legend[]}, "data": [[...]]}
  with 7-significant-digit scientific floats and null for unknown.
* XML: <xport><meta>…<rows><columns><legend>…<data><row><t>…<v0>…
  with "NaN" for unknown.

Rows run t = start, start+step, …, end ((end-start)/step + 1 rows, the
reference's row loop src/rrd_xport.c:413-424); the value shown at t is the
consolidated interval ending at t.
"""

from __future__ import annotations

import json
import time as _time

from rrdtool_1_x_spark.plans.graph import QueryResult


def _fmt(v: float | None) -> str:
    return "NaN" if v is None else "%.7e" % v


def _fmt_t(t: int, timefmt: str | None) -> str:
    """--timefmt: strftime the row time (rrd_xport_format_sv,
    src/rrd_xport.c:668-674; UTC here — sessions pin UTC)."""
    return str(t) if timefmt is None else _time.strftime(timefmt, _time.gmtime(t))


def _collect_rows(res: QueryResult) -> list[tuple[int, list[float | None]]]:
    vals = {int(r["ts"]): r for r in res.frame.collect()}
    names = [c for c in res.frame.columns if c != "ts"]
    out = []
    for t in range(res.start, res.end + 1, res.step):
        r = vals.get(t)
        row = [None if r is None else r[n] for n in names]
        out.append((t, row))
    return out


def to_json(res: QueryResult, showtime: bool = False, timefmt: str | None = None) -> str:
    """Assembled by hand so numbers print in the reference's 7-significant-
    digit scientific notation (json.dumps would reformat them).

    ``--showtime`` prepends the row time as a QUOTED string (the xmljson
    formatter, src/rrd_xport.c:917-924)."""
    rows = _collect_rows(res)
    lines = [
        '{ "about": "RRDtool graph JSON output",',
        '  "meta": {',
        f'    "start": {res.start},',
        f'    "end": {res.end},',
        f'    "step": {res.step},',
        '    "legend": [',
    ]
    for i, leg in enumerate(res.legends):
        comma = "," if i + 1 < len(res.legends) else ""
        lines.append(f"      {json.dumps(leg)}{comma}")
    lines += ["          ]", "     },", '  "data": [']
    for i, (t, row) in enumerate(rows):
        cells = ["null" if v is None else _fmt(v) for v in row]
        if showtime:
            cells = [json.dumps(_fmt_t(t, timefmt)), *cells]
        comma = "," if i + 1 < len(rows) else ""
        lines.append(f"    [ {', '.join(cells)} ]{comma}")
    lines += ["  ]", "}"]
    return "\n".join(lines)


def to_xml(
    res: QueryResult,
    enumds: bool = False,
    showtime: bool = True,
    timefmt: str | None = None,
) -> str:
    """``enumds`` numbers the value tags <v0><v1>… (the reference's
    --enumds); default is plain <v> per column (rrd_xport.c formatters).

    ``showtime`` controls the <t> tag per row — the reference's xmljson
    formatter only writes it under -t (src/rrd_xport.c:925-932); it
    defaults to True here because the golden shapes
    (tests/xport1.xml.output, produced with ``--enumds -t``) carry it and
    a time-less row set is rarely what a caller wants."""
    rows = _collect_rows(res)
    lines = [
        '<?xml version="1.0" encoding="ISO-8859-1"?>',
        "",
        "<xport>",
        "  <meta>",
        f"    <start>{res.start}</start>",
        f"    <end>{res.end}</end>",
        f"    <step>{res.step}</step>",
        f"    <rows>{len(rows)}</rows>",
        f"    <columns>{len(res.legends)}</columns>",
        "    <legend>",
    ]
    lines += [f"      <entry>{leg}</entry>" for leg in res.legends]
    lines += ["    </legend>", "  </meta>", "  <data>"]
    for t, row in rows:
        if enumds:
            cells = "".join(f"<v{i}>{_fmt(v)}</v{i}>" for i, v in enumerate(row))
        else:
            cells = "".join(f"<v>{_fmt(v)}</v>" for v in row)
        tcell = f"<t>{_fmt_t(t, timefmt)}</t>" if showtime else ""
        lines.append(f"    <row>{tcell}{cells}</row>")
    lines += ["  </data>", "</xport>", ""]
    return "\n".join(lines)


def to_csv(res: QueryResult, sep: str = ",", timefmt: str | None = None) -> str:
    """The reference's separated-values writer (rrd_xport_format_sv,
    src/rrd_xport.c:614-706): quoted "time" + quoted legends header,
    unquoted time cell, quoted %.7e values ("NaN" for unknown), CRLF line
    endings. ``sep``: ',' (csv), '\\t' (tsv), ';' (ssv)."""
    rows = _collect_rows(res)
    out = [sep.join(['"time"', *[f'"{leg.lstrip()}"' for leg in res.legends]])]
    for t, row in rows:
        out.append(
            sep.join([_fmt_t(t, timefmt), *[f'"{_fmt(v)}"' for v in row]])
        )
    return "\r\n".join(out) + "\r\n"
