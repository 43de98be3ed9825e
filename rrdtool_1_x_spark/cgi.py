"""rrdcgi — the reference's CGI template expander (src/rrd_cgi.c),
rebuilt over the engine's ``graph`` command.

A template is HTML with ``<RRD::TAG arg ...>`` directives. Supported tag
set (the full rrd_cgi table, src/rrd_cgi.c:505-528):

* ``<RRD::CV name>`` / ``<RRD::CV::QUOTE name>`` / ``<RRD::CV::PATH
  name>`` — QUERY_STRING values (raw / HTML-quoted / path-sanitized)
* ``<RRD::GETENV var>`` / ``<RRD::SETENV var val>``
* ``<RRD::GETVAR name>`` / ``<RRD::SETVAR name val>`` /
  ``<RRD::SETCONSTVAR name val>`` (consts win; later SETVAR is ignored)
* ``<RRD::GOODFOR seconds>`` — records the Expires horizon
* ``<RRD::INCLUDE file>`` — inlines the file
* ``<RRD::TIME::NOW fmt>`` / ``<RRD::TIME::LAST ds fmt>`` /
  ``<RRD::TIME::STRFTIME START|END start end fmt>`` (AT-style times)
* ``<RRD::GRAPH args...>`` — runs the real ``graph`` renderer; without
  an ``--imginfo``/``-g`` option the default ``<img src="./%s"
  width="%lu" height="%lu" />`` template is appended (drawgraph,
  src/rrd_cgi.c:913-941); the expansion is the formatted imginfo line
  and the graph's PRINT lines become available to…
* ``<RRD::PRINT n>`` — the n-th PRINT line of the most recent GRAPH
* ``<RRD::INTERNAL VERSION>`` — engine version tag

Directive arguments are themselves variable-expanded first (CV/GETENV/
GETVAR/TIME tags nest inside GRAPH arguments — rrd_expand_vars,
src/rrd_cgi.c:320-344). Argument scanning honors double quotes.

Run: ``python -m rrdtool_1_x_spark cgi [--filter] template.html`` —
without ``--filter`` a Content-Type (+ optional Expires) header block is
emitted first, like the reference CGI binary.
"""

from __future__ import annotations

import html
import io
import os
import re
import sys
import time
import urllib.parse

_TAG_START = "<RRD::"


def _scan_tag(text: str, pos: int) -> tuple[str, str, int] | None:
    """At ``pos`` (pointing at '<RRD::'), return (tagname, argstr, end)
    where end is the index just past the closing '>'. Quote-aware."""
    i = pos + 1
    n = len(text)
    while i < n and (text[i].isalnum() or text[i] == ":"):
        i += 1
    tag = text[pos + 1 : i].upper()
    args_start = i
    in_q = None
    depth = 0  # nested <RRD::...> directives inside the arguments
    while i < n:
        c = text[i]
        if in_q:
            if c == in_q:
                in_q = None
        elif c in "\"'":
            in_q = c
        elif text.startswith(_TAG_START, i):
            depth += 1
        elif c == ">":
            if depth:
                depth -= 1
            else:
                return tag, text[args_start:i].strip(), i + 1
        i += 1
    return None


def _scanargs(s: str) -> list[str]:
    """Whitespace-split honoring double/single quotes (scanargs,
    src/rrd_cgi.c:670-760)."""
    out: list[str] = []
    cur: list[str] = []
    in_q = None
    for c in s:
        if in_q:
            if c == in_q:
                in_q = None
            else:
                cur.append(c)
        elif c in "\"'":
            in_q = c
        elif c.isspace():
            if cur:
                out.append("".join(cur))
                cur = []
        else:
            cur.append(c)
    if cur:
        out.append("".join(cur))
    return out


class CgiContext:
    def __init__(self, environ: dict | None = None):
        self.env = dict(environ if environ is not None else os.environ)
        self.query = urllib.parse.parse_qs(
            self.env.get("QUERY_STRING", ""), keep_blank_values=True
        )
        self.vars: dict[str, str] = {}
        self.consts: set[str] = set()
        self.calcpr: list[str] = []  # [imginfo, print0, print1, ...]
        self.goodfor = 0


def _cv(ctx: CgiContext, name: str) -> str:
    vals = ctx.query.get(name)
    return vals[0] if vals else ""


_VAR_TAGS = ("CV", "CV::QUOTE", "CV::PATH", "GETENV", "GETVAR",
             "TIME::LAST", "TIME::NOW", "TIME::STRFTIME", "INTERNAL")


def _handle(tag: str, argstr: str, ctx: CgiContext, depth: int = 0) -> str:
    args = _scanargs(_expand_vars(argstr, ctx, depth))
    try:
        if tag == "RRD::CV":
            return _cv(ctx, args[0]) if args else "[ERROR: not enough arguments for RRD::CV]"
        if tag == "RRD::CV::QUOTE":
            return html.escape(_cv(ctx, args[0])) if args else ""
        if tag == "RRD::CV::PATH":
            # strip anything path-dangerous (cgigetqp): keep one simple
            # component, no separators or parent refs
            v = _cv(ctx, args[0]) if args else ""
            return re.sub(r"[^-_A-Za-z0-9.]", "", v.replace("..", ""))
        if tag == "RRD::GETENV":
            return ctx.env.get(args[0], "") if args else ""
        if tag == "RRD::SETENV":
            if len(args) >= 2:
                ctx.env[args[0]] = args[1]
                os.environ[args[0]] = args[1]
            return ""
        if tag == "RRD::GETVAR":
            return ctx.vars.get(args[0], "") if args else ""
        if tag in ("RRD::SETVAR", "RRD::SETCONSTVAR"):
            if len(args) >= 2:
                name, val = args[0], args[1]
                if name not in ctx.consts:
                    ctx.vars[name] = val
                    if tag == "RRD::SETCONSTVAR":
                        ctx.consts.add(name)
            return ""
        if tag == "RRD::GOODFOR":
            ctx.goodfor = int(args[0]) if args else 0
            return ""
        if tag == "RRD::INCLUDE":
            if not args:
                return "[ERROR: RRD::INCLUDE needs a filename]"
            if depth > 8:
                return "[ERROR: RRD::INCLUDE nesting too deep]"
            with open(args[0], encoding="utf-8") as fh:
                # the reference splices the file into the scan buffer, so
                # directives inside included templates expand too
                body, _ = expand_template(fh.read(), ctx, depth + 1)
                return body
        if tag == "RRD::TIME::NOW":
            if len(args) != 1:
                return "[ERROR: expected <RRD::TIME::NOW strftime-format>]"
            return time.strftime(args[0], time.localtime(time.time()))
        if tag == "RRD::TIME::LAST":
            if len(args) != 2:
                return "[ERROR: expected <RRD::TIME::LAST file.rrd strftime-format>]"
            from .sources.store import DatasetStore
            from .session import get_spark

            last = DatasetStore(get_spark(), args[0]).last()
            return time.strftime(args[1], time.localtime(int(last)))
        if tag == "RRD::TIME::STRFTIME":
            if len(args) != 4:
                return "[ERROR: expected <RRD::TIME::STRFTIME START|END start end fmt>]"
            from .timeparse import proc_start_end

            start, end = proc_start_end(args[1], args[2])
            t = start if args[0].upper() == "START" else end
            return time.strftime(args[3], time.localtime(int(t)))
        if tag == "RRD::INTERNAL":
            if args and args[0].upper() == "VERSION":
                return "rrdtool-1.x-spark"
            return "[ERROR: Unknown RRD::INTERNAL command]"
        if tag == "RRD::GRAPH":
            return _draw_graph(args, ctx)
        if tag == "RRD::PRINT":
            if len(args) == 1 and ctx.calcpr:
                idx = int(args[0]) + 1  # calcpr[0] is the imginfo line
                if idx < len(ctx.calcpr):
                    return ctx.calcpr[idx]
            return "[ERROR: RRD::PRINT argument error]"
    except Exception as exc:  # directive errors become visible inline
        return f"[ERROR {exc}]"
    return f"[ERROR: unknown directive {tag}]"


def _draw_graph(args: list[str], ctx: CgiContext) -> str:
    """Run the real graph renderer, capture its stdout, and return the
    imginfo line; PRINT lines are stored for <RRD::PRINT n>."""
    from . import cli

    if not any(a in ("--imginfo", "-f") for a in args):
        args = args + ["--imginfo", '<img src="./%s" width="%lu" height="%lu" />']
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        rc = cli.cmd_graph(list(args))
    finally:
        sys.stdout = old
    if rc != 0:
        return "[ERROR: graph failed]"
    lines = buf.getvalue().splitlines()
    # stdout layout: imginfo line, PRINT lines..., WxH size line
    ctx.calcpr = lines[:-1] if lines else []
    return ctx.calcpr[0] if ctx.calcpr else ""


def _expand_vars(text: str, ctx: CgiContext, depth: int = 0) -> str:
    """Recursively expand the nest-safe directives inside arguments
    (rrd_expand_vars, src/rrd_cgi.c:320-344)."""
    if depth > 8 or _TAG_START not in text:
        return text
    out = []
    pos = 0
    while True:
        i = text.find(_TAG_START, pos)
        if i < 0:
            out.append(text[pos:])
            return "".join(out)
        hit = _scan_tag(text, i)
        if hit is None:
            out.append(text[pos:])
            return "".join(out)
        tag, argstr, end = hit
        name = tag[len("RRD::"):]
        out.append(text[pos:i])
        if name in _VAR_TAGS:
            out.append(_handle(tag, argstr, ctx, depth + 1))
        else:
            out.append(text[i:end])  # leave non-nestable tags in place
        pos = end


def expand_template(
    text: str, ctx: CgiContext | None = None, depth: int = 0
) -> tuple[str, CgiContext]:
    """One full expansion pass over a template (the reference's main
    buffer loop, src/rrd_cgi.c:498-536). ``depth`` tracks INCLUDE
    nesting so directive expansion inside included files terminates."""
    ctx = ctx or CgiContext()
    out = []
    pos = 0
    while True:
        i = text.find(_TAG_START, pos)
        if i < 0:
            out.append(text[pos:])
            break
        hit = _scan_tag(text, i)
        if hit is None:
            out.append(text[pos:])
            break
        tag, argstr, end = hit
        out.append(text[pos:i])
        out.append(_handle(tag, argstr, ctx, depth))
        pos = end
    return "".join(out), ctx


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    filter_mode = False
    if "--filter" in args:
        args.remove("--filter")
        filter_mode = True
    if not args:
        print("Usage: rrdcgi [--filter] template", file=sys.stderr)
        return 1
    with open(args[0], encoding="utf-8") as fh:
        text = fh.read()
    body, ctx = expand_template(text)
    if not filter_mode:
        sys.stdout.write("Content-Type: text/html\n")
        if ctx.goodfor > 0:
            exp = time.strftime(
                "%a, %d %b %Y %H:%M:%S GMT",
                time.gmtime(time.time() + ctx.goodfor),
            )
            sys.stdout.write(f"Expires: {exp}\n")
        sys.stdout.write("\n")
    sys.stdout.write(body)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
