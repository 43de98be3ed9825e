"""Renderer tests (render.py): pixel-exact raster assertions against
fabricated plot rows (no Spark), plus one CLI end-to-end drive that
writes a real PNG through the full DEF→CDEF→data_proc→raster pipeline."""

from __future__ import annotations

import numpy as np
import pytest

from rrdtool_1_x_spark.plans.graph import GraphElement
from rrdtool_1_x_spark.render import (
    CHAR_H,
    CHAR_W,
    Canvas,
    glyph,
    parse_color,
    pick_xgrid,
    pick_ygrid,
    render_graph,
    si_label,
)


def _rows(vals, start=1000, step=10, base=0.0):
    return [(start + (i + 1) * step, v, base) for i, v in enumerate(vals)]


def _img(cv):
    return np.clip(np.round(cv.img), 0, 255).astype(np.uint8)


def test_parse_color():
    rgb, a = parse_color("#FF8000")
    assert list(rgb) == [255, 128, 0] and a == 1.0
    rgb, a = parse_color("#00000080")
    assert a == pytest.approx(128 / 255)
    with pytest.raises(ValueError):
        parse_color("#F00")


def test_canvas_primitives_and_clip():
    cv = Canvas(20, 10, background="#000000")
    cv.rect(2, 3, 5, 4, "#ff0000")
    img = _img(cv)
    assert (img[3:5, 2:6] == [255, 0, 0]).all()
    assert (img[0, 0] == [0, 0, 0]).all()
    cv.clip = (0, 0, 9, 4)
    cv.rect(8, 3, 12, 8, "#00ff00")  # clipped to x<=9, y<=4
    img = _img(cv)
    assert (img[3:5, 8:10] == [0, 255, 0]).all()
    assert (img[5, 8] == [0, 0, 0]).all()  # below clip untouched
    assert (img[3, 10] == [0, 0, 0]).all()  # right of clip untouched


def test_glyphs_are_5x7_and_distinct():
    seen = set()
    for ch in "0123456789ABCXYZabcxyz:%/-. ":
        g = glyph(ch)
        assert g.shape == (7, 5)
        seen.add(g.tobytes())
    assert len(seen) == len("0123456789ABCXYZabcxyz:%/-. ")  # no collisions
    # spot-check '1': center column solid
    g1 = glyph("1")
    assert g1[:, 2].all()


def test_pick_ygrid_ladder():
    step, labfact, magfact, mag = pick_ygrid(0.0, 100.0, 100)
    assert step in (20.0, 50.0)  # >= 15 px apart on 100 px for range 100
    step, _, magfact, mag = pick_ygrid(0.0, 2_000_000.0, 100)
    assert mag == 2 and magfact == 1_000_000.0  # M magnitude
    assert si_label(1_500_000.0, magfact, mag) == "1.5 M"
    assert si_label(2_000_000.0, magfact, mag) == "2 M"


def test_pick_xgrid_duration_keyed():
    assert pick_xgrid(0, 1800)[3] == "%H:%M"
    minor, major, lab, fmt = pick_xgrid(0, 7 * 24 * 3600)
    assert fmt == "%a %d" and major == 24 * 3600
    assert pick_xgrid(0, 200 * 24 * 3600)[3] == "%b"


def _find_plot_area(cv, canvas_color="#ffffff"):
    """Locate the white canvas rect in the rendered image."""
    img = _img(cv)
    white = (img == [255, 255, 255]).all(axis=2)
    ys, xs = np.nonzero(white)
    return ys.min(), ys.max(), xs.min(), xs.max()


def test_line_constant_lands_on_value_row():
    """LINE at constant v=5 with bounds (0,10) must paint its color on
    exactly the middle row of the plot area, full width."""
    el = GraphElement("LINE", "v", color="#ff0000", legend="")
    rows = _rows([5.0] * 50)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1500, width=100,
                      height=51, x_grid=False, y_grid=False)
    img = _img(cv)
    red = (img == [255, 0, 0]).all(axis=2)
    y0, y1, x0, x1 = _find_plot_area(cv)
    mid = (y0 + y1) // 2
    # full-width red line on the middle row (width 100, 50 data points)
    assert red[mid, x0 + 2 : x1 - 1].all()
    assert not red[mid - 3, x0 + 2 : x1 - 1].any()


def test_area_fills_from_base_and_respects_gaps():
    el = GraphElement("AREA", "v", color="#0000ff")
    vals = [8.0] * 20 + [None] * 5 + [4.0] * 25
    rows = _rows(vals)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1500, width=100,
                      height=50, x_grid=False, y_grid=False)
    img = _img(cv)
    blue = (img == [0, 0, 255]).all(axis=2)
    y0, y1, x0, x1 = _find_plot_area(cv)
    h = y1 - y0
    # early columns: filled from bottom up to 80%
    assert blue[y1 - 2, x0 + 5] and blue[y0 + int(0.25 * h), x0 + 5]
    # gap columns: nothing
    gap_x = x0 + int(0.44 * (x1 - x0))
    assert not blue[:, gap_x].any()
    # late columns: filled only to 40%
    assert blue[y1 - 2, x1 - 5] and not blue[y0 + int(0.25 * h), x1 - 5]


def test_stack_rides_on_base():
    e1 = GraphElement("AREA", "a", color="#00ff00")
    e2 = GraphElement("AREA", "b", color="#ff0000", stack=True)
    # rows carry (ts, plot0, base0, plot1, base1): a=4 fills 0..4,
    # b stacked plots 4..7
    rows = [(1000 + 10 * (i + 1), 4.0, 0.0, 7.0, 4.0) for i in range(30)]
    cv = render_graph(rows, [e1, e2], (0.0, 10.0), 1000, 1300, width=60,
                      height=50, x_grid=False, y_grid=False)
    img = _img(cv)
    # full-width fills leave no white canvas at the bottom, so compute the
    # layout directly: left = 8 + 7*CHAR_W (no vlabel), top = 4 (no title)
    x0, y0 = 8 + 7 * CHAR_W, 4
    x1, y1 = x0 + 60 - 1, y0 + 50 - 1
    h = y1 - y0
    xmid = (x0 + x1) // 2
    green = (img == [0, 255, 0]).all(axis=2)
    red = (img == [255, 0, 0]).all(axis=2)
    assert green[y1 - 1, xmid]  # bottom: first area
    assert red[y0 + int(0.45 * h), xmid]  # 4..7 band: stacked area
    assert not red[y1 - 1, xmid]  # stacked area does NOT reach the base


def test_tick_marks():
    el = GraphElement("TICK", "v", color="#ff00ff", fraction=0.5)
    vals = [0.0, 1.0, 0.0, 1.0, 0.0, None, 1.0, 0.0]
    rows = _rows(vals, step=10)
    cv = render_graph(rows, [el], (0.0, 1.0), 1000, 1080, width=80,
                      height=40, x_grid=False, y_grid=False)
    img = _img(cv)
    magenta = (img == [255, 0, 255]).all(axis=2)
    y0, y1, x0, x1 = _find_plot_area(cv)
    # ticks rise from the bottom to half height at value!=0 columns only
    assert magenta[y1 - 1].sum() == 3  # three nonzero known values
    assert magenta[y1 - int(0.4 * (y1 - y0))].sum() == 3
    assert not magenta[y0 + 2].any()  # fraction 0.5 stays in lower half


def test_uncolored_element_draws_nothing():
    el = GraphElement("LINE", "v", color=None)
    cv = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                      width=40, height=30, x_grid=False, y_grid=False)
    img = _img(cv)
    y0, y1, x0, x1 = _find_plot_area(cv)
    # the entire plot area stays canvas-white
    assert (img[y0 : y1 + 1, x0 : x1 + 1] == [255, 255, 255]).all()


def test_legend_swatches_and_title():
    els = [GraphElement("LINE", "v", color="#123456", legend="traffic")]
    cv = render_graph(_rows([1.0] * 10), els, (0.0, 2.0), 1000, 1100,
                      width=60, height=30, title="My Title",
                      legend_lines=["max 42"])
    img = _img(cv)
    swatch = (img == [0x12, 0x34, 0x56]).all(axis=2)
    assert swatch.any()  # legend color box present
    # title glyphs render near the top in font color (pure black)
    black = (img == [0, 0, 0]).all(axis=2)
    assert black[: CHAR_H + 6].any()


def test_grids_toggle():
    el = GraphElement("LINE", "v", color="#ff0000")
    rows = _rows([5.0] * 50, step=60)
    on = render_graph(rows, [el], (0.0, 10.0), 1000, 4000, width=100, height=50)
    off = render_graph(rows, [el], (0.0, 10.0), 1000, 4000, width=100,
                       height=50, x_grid=False, y_grid=False)
    # grid pixels (blended gray/red verticals) exist only when enabled
    d_on = np.abs(_img(on).astype(int) - _img(off).astype(int)).sum()
    assert d_on > 0
    y0, y1, x0, x1 = _find_plot_area(off)
    inner = _img(off)[y0 : y1 + 1, x0 : x1 + 1]
    line_rows = ((inner == [255, 0, 0]).all(axis=2)).any(axis=1)
    # without grids the plot area holds only the line + canvas
    uniq = {tuple(px) for row in inner for px in row}
    assert uniq <= {(255, 255, 255), (255, 0, 0)}
    assert line_rows.sum() <= 2


def test_hrule_vrule():
    el = GraphElement("LINE", "v", color="#00ff00")
    rows = _rows([2.0] * 40)
    cv = render_graph(
        rows, [el], (0.0, 10.0), 1000, 1400, width=80, height=51,
        x_grid=False, y_grid=False,
        rules=[("H", 5.0, "#ff0000", "limit"), ("V", 1200.0, "#0000ff", ""),
               ("H", 50.0, "#123123", "")],  # out of range: not drawn
    )
    img = _img(cv)
    y0, y1, x0, x1 = _find_plot_area(cv)
    red = (img == [255, 0, 0]).all(axis=2)
    blue = (img == [0, 0, 255]).all(axis=2)
    mid = (y0 + y1) // 2
    xv = x0 + int(round((1200 - 1000) / 400 * (x1 - x0)))
    row = red[mid, x0 + 3 : x1 - 3].copy()
    row[xv - (x0 + 3)] = True  # the VRULE crossing paints over one pixel
    assert row.all()  # HRULE at 5.0 = middle row
    assert blue[y0 + 2 : y1 - 2, xv].all()  # VRULE column
    assert not ((img == [0x12, 0x31, 0x23]).all(axis=2)).any()  # clipped rule
    # legend swatch for the labelled rule
    assert red[y1 + 5 :].any()


def test_logarithmic_scale():
    """Log axis: equal RATIOS take equal pixel distances — 1→10 and
    10→100 must land the same span apart."""
    el = GraphElement("LINE", "v", color="#ff0000")
    cv = render_graph(_rows([50.0] * 10), [el], (1.0, 100.0), 1000, 1100,
                      width=40, height=101, x_grid=False, y_grid=False,
                      logarithmic=True)
    img = _img(cv)
    y0, y1, x0, x1 = _find_plot_area(cv)
    red_rows = np.nonzero((img == [255, 0, 0]).all(axis=2).any(axis=1))[0]
    # v=50 on log(1..100): frac = log10(50)/2 ≈ 0.849 → near the top
    expect = y1 - int(round((np.log10(50) / 2) * 100))
    assert abs(red_rows[0] - expect) <= 1
    # decade gridlines drawn when y_grid on
    cv2 = render_graph(_rows([50.0] * 10), [el], (1.0, 100.0), 1000, 1100,
                       width=40, height=101, x_grid=False, y_grid=True,
                       logarithmic=True)
    assert np.abs(_img(cv2).astype(int) - img.astype(int)).sum() > 0


def test_full_size_and_no_legend():
    el = GraphElement("LINE", "v", color="#ff0000", legend="leg")
    cv = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                      width=300, height=150, full_size=True)
    assert (cv.w, cv.h) == (300, 150)
    small = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                         width=60, height=30, no_legend=True)
    with_leg = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                            width=60, height=30)
    assert small.h < with_leg.h  # legend rows trimmed from the image


def test_dashed_line_pattern():
    el = GraphElement("LINE", "v", color="#ff0000", dashes=(4.0, 4.0))
    cv = render_graph(_rows([5.0] * 50), [el], (0.0, 10.0), 1000, 1500,
                      width=100, height=51, x_grid=False, y_grid=False)
    img = _img(cv)
    y0, y1, x0, x1 = _find_plot_area(cv)
    mid = (y0 + y1) // 2
    row = (img[mid] == [255, 0, 0]).all(axis=1)
    on = int(row.sum())
    assert 0 < on < (x1 - x0)  # gaps exist
    # runs alternate with period 8: no run longer than 5 consecutive px
    runs, cur = [], 0
    for v in row[x0 : x1 + 1]:
        if v:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    assert runs and max(runs) <= 5


def test_zoom_border_watermark():
    el = GraphElement("LINE", "v", color="#ff0000")
    cv = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                      width=60, height=30, border=0, watermark="wm")
    img = _img(cv)
    # border 0: corner pixel is plain background, no bevel shade
    assert (img[0, 0] == [0xF5, 0xF5, 0xF5]).all()
    # watermark gray pixels near the bottom-right
    assert ((img[-12:] == [0x80, 0x80, 0x80]).all(axis=2)).any()
    w0, h0 = cv.w, cv.h
    cv.zoom(2.0)
    assert (cv.w, cv.h) == (2 * w0, 2 * h0)


def test_svg_backend():
    """SVG output: well-formed XML, shared layout coordinates, native
    dasharray, clipPath on element paint, legend text present."""
    import xml.etree.ElementTree as ET

    els = [
        GraphElement("AREA", "a", color="#00c000", legend="fill"),
        GraphElement("LINE", "b", color="#ff0000", legend="line",
                     dashes=(4.0, 2.0)),
    ]
    rows = [(1000 + 10 * (i + 1), 4.0, 0.0, 7.0, 0.0) for i in range(30)]
    cv = render_graph(rows, els, (0.0, 10.0), 1000, 1300, width=60,
                      height=40, title="T", backend="svg")
    data = cv.to_bytes("SVG")
    root = ET.fromstring(data)
    ns = "{http://www.w3.org/2000/svg}"
    assert root.tag == f"{ns}svg"
    lines = [e for e in root.iter(f"{ns}line") if e.get("stroke") == "#ff0000"]
    assert lines and all(e.get("stroke-dasharray") == "4.0,2.0" for e in lines)
    assert all(e.get("clip-path") for e in lines)  # confined to plot area
    texts = [e.text for e in root.iter(f"{ns}text")]
    assert "T" in texts and "fill" in texts and "line" in texts
    greens = [e for e in root.iter(f"{ns}rect") if e.get("fill") == "#00c000"]
    assert len(greens) > 30  # column fills + legend swatch
    cv.zoom(2.0)
    root2 = ET.fromstring(cv.to_bytes("SVG"))
    assert int(root2.get("width")) == 2 * int(root.get("width"))
    assert root2.get("viewBox") == root.get("viewBox")  # vector scale


def test_parse_xgrid_spec():
    from rrdtool_1_x_spark.render import parse_xgrid_spec

    assert parse_xgrid_spec("MINUTE:10:HOUR:1:HOUR:4:0:%X") == (
        600, 3600, 4 * 3600, "%X",
    )
    # the strftime format may contain ':'
    assert parse_xgrid_spec("HOUR:1:DAY:1:DAY:1:0:%H:%M")[3] == "%H:%M"
    with pytest.raises(ValueError):
        parse_xgrid_spec("MINUTE:10")
    with pytest.raises(ValueError):
        parse_xgrid_spec("PARSEC:1:HOUR:1:HOUR:4:0:%X")


def test_custom_grid_specs_and_units_exponent():
    el = GraphElement("LINE", "v", color="#ff0000")
    rows = _rows([5_000_000.0] * 30, step=60)
    # y-grid 2e6:1 with units-exponent 0 → labels in raw units
    cv = render_graph(rows, [el], (0.0, 10_000_000.0), 1000, 2800,
                      width=80, height=60, x_grid=False,
                      y_grid_spec=(2_000_000.0, 1), units_exponent=0)
    img = _img(cv)
    black = (img == [0, 0, 0]).all(axis=2)
    assert black[:, : 8 + 7 * CHAR_W].any()  # labels rendered at left
    # explicit x-grid spec draws major lines every 600 s over a 1800-s span
    cv2 = render_graph(rows, [el], (0.0, 10_000_000.0), 1000, 2800,
                       width=90, height=60, y_grid=False,
                       x_grid_spec=(300, 600, 600, "%H:%M"))
    # MGRID verticals at the 600-s marks: blended red-gray columns exist
    img2 = _img(cv2)
    y0, y1, x0, x1 = _find_plot_area(cv2)
    mg = np.abs(img2[y0 + 2 : y1 - 2, x0 : x1 + 1].astype(int)
                - [255, 255, 255]).sum(axis=2)
    cols = (mg > 30).all(axis=0)
    assert cols.sum() >= 2  # at least two full-height grid verticals


def test_step_vs_slope_mode():
    """Default LINE drawing is step-wise (each value held over its
    interval); --slope-mode connects points directly. A two-level series
    distinguishes them: midway between the points, steps sit ON a level,
    slope sits BETWEEN the levels."""
    el = GraphElement("LINE", "v", color="#ff0000")
    rows = [(1000 + 100 * (i + 1), 2.0 if i < 5 else 8.0, 0.0) for i in range(10)]
    kw = dict(width=101, height=101, x_grid=False, y_grid=False)
    steps = render_graph(rows, [el], (0.0, 10.0), 1000, 2000, **kw)
    slope = render_graph(rows, [el], (0.0, 10.0), 1000, 2000,
                         slope_mode=True, **kw)
    x0, y0 = 8 + 7 * CHAR_W, 4
    y_low, y_high = y0 + int(0.8 * 100), y0 + int(0.2 * 100)
    red_s = (_img(steps) == [255, 0, 0]).all(axis=2)
    red_m = (_img(slope) == [255, 0, 0]).all(axis=2)
    x_flat = x0 + 20  # inside the first (low) plateau
    assert red_s[y_low, x_flat] and not red_s[y_high, x_flat]
    # the step jump is a vertical run at the boundary column
    xj = x0 + 50
    assert red_s[y_high + 5 : y_low - 5, xj - 1 : xj + 2].any(axis=1).all()
    # slope mode: between the two defining points the line passes through
    # intermediate heights, not the plateau rows
    y_mid = (y_low + y_high) // 2
    assert red_m[y_mid - 3 : y_mid + 4, x0 + 45 : x0 + 56].any()


def test_only_graph_and_base():
    el = GraphElement("LINE", "v", color="#ff0000", legend="x")
    rows = _rows([5.0] * 20)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1200, width=50,
                      height=30, title="T", only_graph=True)
    assert (cv.w, cv.h) == (50, 30)  # nothing but the plot area
    # --base 1024: magnitude labels snap at 1024-steps (1.5 k at 1536)
    from rrdtool_1_x_spark.render import pick_ygrid, si_label

    step, _lf, magfact, mag = pick_ygrid(0.0, 4096.0, 100, base=1024.0)
    assert magfact == 1024.0 and mag == 1
    assert si_label(2048.0, magfact, mag) == "2 k"


def test_cli_graph_svg(tmp_path, spark, capsys):
    from rrdtool_1_x_spark.cli import main

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, f"{base + 300}:5", f"{base + 600}:7"]) == 0
    out = str(tmp_path / "g.svg")
    assert main(["graph", out, "-a", "SVG", "-s", str(base),
                 "-e", str(base + 600), "-w", "100", "-h", "40",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000:v"]) == 0
    capsys.readouterr()
    body = open(out, "rb").read()
    assert body.startswith(b"<?xml") and b"<svg" in body


def test_cli_graph_lazy(tmp_path, spark, capsys):
    from rrdtool_1_x_spark.cli import main

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, f"{base + 300}:5", f"{base + 600}:7"]) == 0
    out = str(tmp_path / "g.png")
    argv = ["graph", out, "-s", str(base), "-e", str(base + 600),
            "-w", "100", "-h", "40", f"DEF:v={ds}:v:AVERAGE",
            "LINE1:v#ff0000"]
    assert main(argv) == 0
    size1 = capsys.readouterr().out.strip().splitlines()[-1]
    mtime = __import__("os").stat(out).st_mtime
    # lazy: image is fresh (mtime now >> one pixel column of a 600s/100px
    # window), so the graph must NOT be regenerated
    assert main(["graph", out, "-z"] + argv[2:]) == 0
    size2 = capsys.readouterr().out.strip().splitlines()[-1]
    assert size2 == size1
    assert __import__("os").stat(out).st_mtime == mtime


def test_cli_graph_pipeline(tmp_path, spark, capsys):
    """create → update → graph via the CLI: PNG on disk, size line and
    PRINT output on stdout, GPRINT only in the image legend."""
    from rrdtool_1_x_spark.cli import main
    from rrdtool_1_x_spark.datapipe.codecs import decode_png

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900  # step-aligned so each PDP holds one update value
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:200"]) == 0
    ups = [f"{base + i * 300}:{100 + (i % 7) * 50}" for i in range(1, 100)]
    assert main(["update", ds] + ups) == 0
    out = str(tmp_path / "g.png")
    rc = main(["graph", out, "-s", str(base), "-e", str(base + 99 * 300),
               "-w", "200", "-h", "80", "-t", "T", "-v", "vv",
               f"DEF:v={ds}:v:AVERAGE",
               "AREA:v#00c000:level",
               "LINE1:250#0000ff:avg",
               "VDEF:m=v,MAXIMUM",
               "GPRINT:m:max %.0lf",
               "PRINT:m:pmax %.0lf"])
    assert rc == 0
    cap = capsys.readouterr().out.strip().splitlines()
    assert cap[0] == "pmax 400"
    assert cap[1].count("x") == 1  # WxH size line
    img = decode_png(open(out, "rb").read())
    w, h = (int(t) for t in cap[1].split("x"))
    assert img.shape == (h, w, 3)
    # the AREA color must appear, and the constant blue line as well
    assert ((img == [0, 0xC0, 0]).all(axis=2)).any()
    assert ((img == [0, 0, 255]).all(axis=2)).any()


def _text_mask(s):
    """Expected pixel mask of a string in the bitmap font."""
    m = np.zeros((7, len(s) * CHAR_W), bool)
    for i, ch in enumerate(s):
        m[:, i * CHAR_W : i * CHAR_W + 5] = glyph(ch).astype(bool)
    return m


def test_right_axis_scale_shift_labels_pixel_exact():
    """--right-axis 2:1 with a custom format: right labels are
    left*2+1 at every left grid line, pixel-exact in the right gutter;
    the image widens by one label gutter."""
    el = GraphElement("LINE", "v", color="#ff0000", legend="")
    rows = _rows([5.0] * 50)
    base_cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                           width=100, height=51, x_grid=False)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                      width=100, height=51, x_grid=False,
                      right_axis=(2.0, 1.0), right_axis_format="%.0f")
    assert cv.w == base_cv.w + 7 * CHAR_W
    img = _img(cv)
    font = (img == [0, 0, 0]).all(axis=2)
    left = 8 + 7 * CHAR_W
    x1 = left + 100 - 1
    y1 = 4 + 51 - 1
    # right axis line drawn the full plot height
    assert font[4:y1 + 1, x1 + 1].all()
    for v, lab in [(0.0, "1"), (5.0, "11"), (10.0, "21")]:
        y = y1 - round(v / 10 * 50)
        region = font[y - 4 : y + 3, x1 + 8 : x1 + 8 + len(lab) * CHAR_W]
        exp = _text_mask(lab)
        ok = np.ones(7, bool)
        if y - 4 <= y1 + 1 < y + 3:  # x-axis overshoot crosses this row
            ok[y1 + 1 - (y - 4)] = False
        assert (region[ok] == exp[ok]).all(), (v, lab)


def test_right_axis_default_si_format_and_label():
    """Default numeric formatter picks ONE SI magnitude from the mid grid
    value (scale 1000 -> k labels); --right-axis-label reserves and draws
    a rotated unit on the right edge."""
    el = GraphElement("LINE", "v", color="#ff0000", legend="")
    rows = _rows([5.0] * 50)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                      width=100, height=51, x_grid=False,
                      right_axis=(1000.0, 0.0))
    img = _img(cv)
    font = (img == [0, 0, 0]).all(axis=2)
    left = 8 + 7 * CHAR_W
    x1 = left + 100 - 1
    y1 = 4 + 51 - 1
    for v, lab in [(0.0, "0 k"), (5.0, "5 k"), (10.0, "10 k")]:
        y = y1 - round(v / 10 * 50)
        region = font[y - 4 : y + 3, x1 + 8 : x1 + 8 + len(lab) * CHAR_W]
        exp = _text_mask(lab)
        ok = np.ones(7, bool)
        if y - 4 <= y1 + 1 < y + 3:  # x-axis overshoot crosses this row
            ok[y1 + 1 - (y - 4)] = False
        assert (region[ok] == exp[ok]).all(), (v, lab)
    cv2 = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                       width=100, height=51, x_grid=False,
                       right_axis=(1000.0, 0.0), right_axis_label="bits")
    assert cv2.w == cv.w + 2 * CHAR_W
    img2 = _img(cv2)
    font2 = (img2 == [0, 0, 0]).all(axis=2)
    # rotated unit text occupies the rightmost gutter columns
    assert font2[:, x1 + 8 + 7 * CHAR_W :].any()


def test_cli_graph_right_axis(tmp_path, spark, capsys):
    """End-to-end: --right-axis scale:shift + label + format through the
    CLI; bad specs error out like the reference."""
    from rrdtool_1_x_spark.cli import main
    from rrdtool_1_x_spark.datapipe.codecs import decode_png

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, f"{base + 300}:5", f"{base + 600}:7"]) == 0
    out = str(tmp_path / "g.png")
    argv = ["graph", out, "-s", str(base), "-e", str(base + 600),
            "-w", "100", "-h", "40", f"DEF:v={ds}:v:AVERAGE",
            "LINE1:v#ff0000"]
    assert main(argv) == 0
    w0 = decode_png(open(out, "rb").read()).shape[1]
    capsys.readouterr()
    assert main(argv[:2] + ["--right-axis", "8:0", "--right-axis-label",
                            "bps", "--right-axis-format", "%.1f"]
                + argv[2:]) == 0
    sz = capsys.readouterr().out.strip().splitlines()[-1]
    w1, h1 = map(int, sz.split("x"))
    assert w1 == w0 + 7 * 6 + 2 * 6  # label gutter + rotated unit
    assert decode_png(open(out, "rb").read()).shape[1] == w1
    # scale 0 refused (reference: "the second_axis_scale must not be 0")
    assert main(argv[:2] + ["--right-axis", "0:0"] + argv[2:]) == 1
    # malformed spec refused
    assert main(argv[:2] + ["--right-axis", "abc"] + argv[2:]) == 1


def test_alt_y_grid_decimal_ladder():
    """-Y/--alt-y-grid: the range-sized decimal ladder (ALTYGRID,
    src/rrd_graph.c:2362-2414). Range 10 -> step 2 with labfact 5, labels
    '0' and '10' in the %2.0f format (no SI suffix), minors at 2/4/6/8."""
    el = GraphElement("LINE", "v", color="#ff0000", legend="")
    rows = _rows([5.0] * 50)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                      width=100, height=51, x_grid=False, alt_y_grid=True)
    img = _img(cv)
    font = (img == [0, 0, 0]).all(axis=2)
    left = 8 + 7 * CHAR_W
    x1 = left + 100 - 1
    y1 = 4 + 51 - 1
    for v, lab in [(10.0, "10")]:
        y = y1 - round(v / 10 * 50)
        x_start = left - 4 - len(lab) * CHAR_W
        region = font[y - 4 : y + 3, x_start : x_start + len(lab) * CHAR_W]
        assert (region == _text_mask(lab)).all(), (v, lab)
    # no SI suffix anywhere: the ' k'/' m' column left of the axis stays
    # clear except the two labels; minors at 2/4/6/8 are grid-colored
    mgrid = parse_color("#e0505080")[0]
    for v in (2.0, 4.0, 6.0, 8.0):
        y = y1 - round(v / 10 * 50)
        row = img[y, left + 2 : x1 - 2]
        # minor grid alpha-blended onto white canvas: not pure white
        assert not (row == [255, 255, 255]).all(), v


def test_cli_graphv_alt_autoscale_bounds(tmp_path, spark, capsys):
    """-A/-J/-M autoscale branches (expand_range, src/rrd_graph.c:636-668)
    on exact rates 1..3: -A pads both sides by 10% of the amplitude,
    -J only the bottom, -M only the top; the sensible-value snap is
    bypassed."""
    from rrdtool_1_x_spark.cli import main

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900  # multiple of 300
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, f"{base + 300}:1", f"{base + 600}:2",
                 f"{base + 900}:3"]) == 0
    argv = ["graphv", "-", "-s", str(base), "-e", str(base + 900),
            f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000"]

    def bounds_of(extra):
        capsys.readouterr()
        assert main(argv[:2] + extra + argv[2:]) == 0
        out = capsys.readouterr().out
        mn = float(_re_search(r"value_min = (\S+)", out))
        mx = float(_re_search(r"value_max = (\S+)", out))
        return mn, mx

    import re as _re

    def _re_search(pat, s):
        return _re.search(pat, s).group(1)

    assert bounds_of(["--alt-autoscale"]) == (pytest.approx(0.8),
                                              pytest.approx(3.2))
    assert bounds_of(["-J"]) == (pytest.approx(0.8), pytest.approx(3.0))
    assert bounds_of(["-M"]) == (pytest.approx(1.0), pytest.approx(3.2))
    # default: sensible-value snap instead (the reference loop keeps
    # overwriting: smin 1.0 matches both the 1.2/1.0 and 1.0/0.8 pairs,
    # landing on 0.8)
    mn, mx = bounds_of([])
    assert mn == pytest.approx(0.8) and mx == pytest.approx(3.0)


def test_cli_graph_alt_flags_render(tmp_path, spark, capsys):
    """-Y and -J through the graph CLI produce a PNG."""
    from rrdtool_1_x_spark.cli import main

    ds = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, f"{base + 300}:5", f"{base + 600}:7"]) == 0
    out = str(tmp_path / "g.png")
    assert main(["graph", out, "-s", str(base), "-e", str(base + 600),
                 "-w", "100", "-h", "40", "-Y", "-J",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000"]) == 0
    assert open(out, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"


def _mk_rrd(tmp_path, main):
    ds = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds, "--start", str(base - 10), "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, f"{base + 300}:5", f"{base + 600}:7"]) == 0
    return ds, base


def test_cli_graph_eps(tmp_path, spark, capsys):
    """--imgformat EPS: EPSF-3.0 program with a correct BoundingBox,
    balanced gsave/grestore, fill + stroke + text ops, showpage."""
    from rrdtool_1_x_spark.cli import main

    ds, base = _mk_rrd(tmp_path, main)
    out = str(tmp_path / "g.eps")
    assert main(["graph", out, "-a", "EPS", "-s", str(base),
                 "-e", str(base + 600), "-w", "100", "-h", "40",
                 "-t", "T(itle)", f"DEF:v={ds}:v:AVERAGE",
                 "AREA:v#00c00080:lvl", "LINE2:6#0000ff:six"]) == 0
    sz = capsys.readouterr().out.strip().splitlines()[-1]
    w, h = map(int, sz.split("x"))
    t = open(out, "rb").read().decode("latin-1")
    assert t.startswith("%!PS-Adobe-3.0 EPSF-3.0")
    assert f"%%BoundingBox: 0 0 {w} {h}" in t
    assert t.count("gsave") == t.count("grestore")
    assert "rectfill" in t and "lineto stroke" in t and ") show" in t
    assert r"(T\(itle\))" in t  # parens escaped in PS strings
    assert t.rstrip().endswith("%%EOF")


def test_cli_graph_pdf(tmp_path, spark, capsys):
    """--imgformat PDF: a well-formed single-page PDF 1.4 — every xref
    offset points at its object, /Length matches the content stream, and
    the MediaBox equals the reported image size."""
    import re

    from rrdtool_1_x_spark.cli import main

    ds, base = _mk_rrd(tmp_path, main)
    out = str(tmp_path / "g.pdf")
    assert main(["graph", out, "-a", "PDF", "-s", str(base),
                 "-e", str(base + 600), "-w", "100", "-h", "40",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000:v"]) == 0
    sz = capsys.readouterr().out.strip().splitlines()[-1]
    w, h = map(int, sz.split("x"))
    body = open(out, "rb").read()
    assert body.startswith(b"%PDF-1.4")
    assert f"/MediaBox [0 0 {w} {h}]".encode() in body
    sx = int(re.search(rb"startxref\n(\d+)\n%%EOF", body).group(1))
    assert body[sx : sx + 4] == b"xref"
    offs = [int(m) for m in re.findall(rb"(\d{10}) 00000 n", body)]
    assert len(offs) == 5
    for i, off in enumerate(offs, start=1):
        tag = f"{i} 0 obj".encode()
        assert body[off : off + len(tag)] == tag, (i, off)
    ln = int(re.search(rb"/Length (\d+)", body).group(1))
    st = body.index(b"stream\n") + 7
    assert body[st + ln : st + ln + 10] == b"\nendstream"
    content = body[st : st + ln]
    assert b" re f" in content and b" l S" in content and b"Tj ET" in content


def _color_rows(cv, color):
    img = _img(cv)
    rgb = [int(color[1:3], 16), int(color[3:5], 16), int(color[5:7], 16)]
    ys, xs = np.nonzero((img == rgb).all(axis=2))
    return ys, xs


def test_legend_position_north_west_east():
    """--legend-position: north puts the legend block between title and
    plot; west/east reserve a side column (src/rrd_graph.c:3595-3660)."""
    els = [GraphElement("LINE", "v", color="#123456", legend="tr")]
    rows = _rows([None] * 10)  # no plotted pixels: only swatch+text carry
    south = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                         height=30, x_grid=False, y_grid=False)
    north = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                         height=30, x_grid=False, y_grid=False,
                         legend_position="north")
    # same canvas size — the block moves, it doesn't grow the image
    assert (north.w, north.h) == (south.w, south.h)
    ys_s, _ = _color_rows(south, "#123456")
    ys_n, _ = _color_rows(north, "#123456")
    # south: swatch below the plot; north: swatch above it
    plot_top = 4
    assert ys_s.min() > plot_top + 30
    assert ys_n.max() < plot_top + 30
    west = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                        height=30, x_grid=False, y_grid=False,
                        legend_position="west")
    east = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                        height=30, x_grid=False, y_grid=False,
                        legend_position="east")
    side_w = 2 * CHAR_W + 24
    assert west.w == south.w + side_w and east.w == south.w + side_w
    _, xs_w = _color_rows(west, "#123456")
    _, xs_e = _color_rows(east, "#123456")
    left_plot = 8 + 7 * CHAR_W  # south layout's plot left edge
    assert xs_w.max() < left_plot + side_w  # swatch in the left column
    assert xs_e.min() > left_plot + 60  # swatch right of the plot


def test_legend_direction_bottomup():
    """--legend-direction bottomup reverses legend item order
    (src/rrd_graph.c:3296-3330)."""
    els = [GraphElement("LINE", "a", color="#aa0000", legend="A"),
           GraphElement("LINE", "b", color="#00aa00", legend="B")]
    rows = [(1000 + 10 * (i + 1), None, 0.0, None, 0.0) for i in range(10)]
    td = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                      height=30, x_grid=False, y_grid=False)
    bu = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                      height=30, x_grid=False, y_grid=False,
                      legend_direction="bottomup")
    y_red_td = _color_rows(td, "#aa0000")[0]
    y_grn_td = _color_rows(td, "#00aa00")[0]
    y_red_bu = _color_rows(bu, "#aa0000")[0]
    y_grn_bu = _color_rows(bu, "#00aa00")[0]
    # swatch rows live below the plot; topdown: A above B, bottomup: B above A
    pl = 4 + 30
    assert y_red_td[y_red_td > pl].min() < y_grn_td[y_grn_td > pl].min()
    assert y_red_bu[y_red_bu > pl].min() > y_grn_bu[y_grn_bu > pl].min()


def test_tabwidth_expands_to_stop():
    """\\t in legend text advances to the next --tabwidth pixel stop."""
    els = [GraphElement("LINE", "v", color="#123456", legend="a\tb")]
    rows = _rows([1.0] * 10)
    cv = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                      height=30, x_grid=False, y_grid=False, tabwidth=30)
    # 'a' ends at px 6 -> next stop at 30 px -> 4 spaces -> "a    b"
    ref = render_graph(rows, [GraphElement("LINE", "v", color="#123456",
                                           legend="a    b")],
                       (0.0, 2.0), 1000, 1100, width=60, height=30,
                       x_grid=False, y_grid=False)
    assert (_img(cv) == _img(ref)).all()


def test_font_scale_doubles_glyphs():
    """--font DEFAULT:16 doubles the bitmap cell: the title's glyph rows
    span ~14 px instead of 7 and margins scale with the cell."""
    els = [GraphElement("LINE", "v", color="#ff0000", legend="")]
    rows = _rows([1.0] * 10)
    s1 = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                      height=30, title="T", x_grid=False, y_grid=False)
    s2 = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                      height=30, title="T", x_grid=False, y_grid=False,
                      font_scale=2)
    assert s2.w > s1.w and s2.h > s1.h  # label gutters scale
    # title band only (above the y-axis overshoot at top-4): s1 top=16,
    # s2 top=24
    black1 = (_img(s1)[:11] == [0, 0, 0]).all(axis=2)
    black2 = (_img(s2)[:19] == [0, 0, 0]).all(axis=2)
    span1 = np.ptp(np.nonzero(black1)[0])
    span2 = np.ptp(np.nonzero(black2)[0])
    assert span1 == 6 and span2 == 13  # 7 rows -> 14 rows


def test_cli_graph_legend_font_options(tmp_path, spark, capsys):
    from rrdtool_1_x_spark.cli import main

    ds, base = _mk_rrd(tmp_path, main)
    out = str(tmp_path / "g.png")
    assert main(["graph", out, "-s", str(base), "-e", str(base + 600),
                 "-w", "100", "-h", "40", "--legend-position", "east",
                 "--legend-direction", "bottomup", "--tabwidth", "30",
                 "--font", "DEFAULT:16:", f"DEF:v={ds}:v:AVERAGE",
                 "LINE1:v#ff0000:v"]) == 0
    assert open(out, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"
    capsys.readouterr()
    assert main(["graph", out, "--legend-position", "diagonal",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000"]) == 1


def test_gradient_area_fades_down():
    """AREA:v#col#col2 fades from color at the value edge to color2 over
    gradheight px (gfx_add_rect_fadey, src/rrd_gfx.c:111-145)."""
    el = GraphElement("AREA", "v", color="#ff0000", color2="#0000ff",
                      gradheight=20.0)
    rows = _rows([8.0] * 30)
    cv = render_graph(rows, [el], (0.0, 10.0), 1000, 1300, width=60,
                      height=51, x_grid=False, y_grid=False)
    img = _img(cv)
    x0, y0 = 8 + 7 * CHAR_W, 4
    xmid = x0 + 30
    y_top = y0 + 50 - round(8.0 / 10 * 50)  # value edge row
    top_px = img[y_top + 1, xmid]
    below_px = img[min(y_top + 19, y0 + 49), xmid]
    # near the edge: red dominates; 20 px down: blue dominates
    assert top_px[0] > top_px[2]
    assert below_px[2] > below_px[0]
    # solid-color render differs everywhere in the fill band
    solid = render_graph(rows, [GraphElement("AREA", "v", color="#ff0000")],
                         (0.0, 10.0), 1000, 1300, width=60, height=51,
                         x_grid=False, y_grid=False)
    assert (_img(cv) != _img(solid)).any()


def test_grid_dash_segments():
    """--grid-dash on:off breaks grid lines into segments; 1:1 stays
    within the same pixel budget but alternates."""
    el = GraphElement("LINE", "v", color="#ff0000")
    rows = _rows([5.0] * 50, step=60)
    solid = render_graph(rows, [el], (0.0, 10.0), 1000, 4000, width=100,
                         height=50)
    dashed = render_graph(rows, [el], (0.0, 10.0), 1000, 4000, width=100,
                          height=50, grid_dash=(2.0, 4.0))
    di, si = _img(dashed).astype(int), _img(solid).astype(int)
    assert np.abs(di - si).sum() > 0
    # dashed grid paints fewer non-canvas pixels inside the plot area
    x0, y0 = 8 + 7 * CHAR_W, 4
    inner_d = di[y0 : y0 + 50, x0 : x0 + 100]
    inner_s = si[y0 : y0 + 50, x0 : x0 + 100]
    assert (inner_d != 255).sum() < (inner_s != 255).sum()


def test_dynamic_labels_swatch_shapes():
    """--dynamic-labels: LINE legends get a diagonal stroke instead of a
    filled box (src/rrd_graph.c:3383-3407)."""
    els = [GraphElement("LINE", "v", color="#123456", legend="tr")]
    rows = _rows([None] * 10)
    box = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                       height=30, x_grid=False, y_grid=False)
    dyn = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                       height=30, x_grid=False, y_grid=False,
                       dynamic_labels=True)
    n_box = ((_img(box) == [0x12, 0x34, 0x56]).all(axis=2)).sum()
    n_dyn = ((_img(dyn) == [0x12, 0x34, 0x56]).all(axis=2)).sum()
    assert 0 < n_dyn < n_box  # a stroke, not a filled box


def test_pango_markup_stripped():
    """--pango-markup renders the plain text of the markup (the bitmap
    face has no styled variants)."""
    els = [GraphElement("LINE", "v", color="#123456",
                        legend="<b>bold</b> x")]
    rows = _rows([None] * 10)
    marked = render_graph(rows, els, (0.0, 2.0), 1000, 1100, width=60,
                          height=30, x_grid=False, y_grid=False,
                          title="<i>T</i>", pango_markup=True)
    plain = render_graph(
        rows, [GraphElement("LINE", "v", color="#123456", legend="bold x")],
        (0.0, 2.0), 1000, 1100, width=60, height=30, x_grid=False,
        y_grid=False, title="T")
    assert (_img(marked) == _img(plain)).all()


def test_cli_graph_grid_dash_gradient(tmp_path, spark, capsys):
    from rrdtool_1_x_spark.cli import main

    ds, base = _mk_rrd(tmp_path, main)
    out = str(tmp_path / "g.png")
    assert main(["graph", out, "-s", str(base), "-e", str(base + 600),
                 "-w", "100", "-h", "40", "--grid-dash", "2:2",
                 "--dynamic-labels", "-P",
                 f"DEF:v={ds}:v:AVERAGE",
                 "AREA:v#00c000#ffffff:lvl:gradheight=30"]) == 0
    assert open(out, "rb").read()[:8] == b"\x89PNG\r\n\x1a\n"
    capsys.readouterr()
    assert main(["graph", out, "--grid-dash", "nope",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000"]) == 1


def test_graphv_renders_image_with_coordinates(tmp_path, spark, capsys):
    """graphv with a filename renders the image AND reports the layout
    keys rrd_graph_v pushes (src/rrd_graph.c:3937-3947); '-' stays
    data-only."""
    from rrdtool_1_x_spark.cli import main

    ds = str(tmp_path / "gv")
    assert main(["create", ds, "--start", "920804400", "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds] + [f"{920804400 + 300*i}:{i%7}"
                                  for i in range(1, 20)]) == 0
    capsys.readouterr()
    png = str(tmp_path / "gv.png")
    assert main(["graphv", png, "-s", "920804400", "-e", "920810100",
                 "-w", "200", "-h", "80",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000:v",
                 "VDEF:m=v,MAXIMUM", "PRINT:m:%1.0lf"]) == 0
    out = capsys.readouterr().out
    kv = dict(
        l.split(" = ", 1) for l in out.splitlines() if " = " in l
    )
    assert kv["graph_width"] == "200" and kv["graph_height"] == "80"
    assert int(kv["graph_left"]) > 0 and int(kv["graph_top"]) > 0
    assert int(kv["image_width"]) > 200 and int(kv["image_height"]) > 80
    assert kv["print[0]"] == '"6"'
    with open(png, "rb") as fh:
        assert fh.read(8) == b"\x89PNG\r\n\x1a\n"
    # data-only "-" form: no layout keys, no image
    assert main(["graphv", "-", "-s", "920804400", "-e", "920810100",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000:v"]) == 0
    out2 = capsys.readouterr().out
    assert "graph_left" not in out2 and "graph_start = 920804400" in out2


def test_graphv_comment_in_rendered_legend(tmp_path, spark, capsys):
    """graphv's rendered image includes COMMENT legend lines (escape-
    stripped) just like cmd_graph — one extra legend row grows the
    image height."""
    from rrdtool_1_x_spark.cli import main

    ds = str(tmp_path / "gc")
    assert main(["create", ds, "--start", "920804400", "--step", "300",
                 "DS:v:GAUGE:600:U:U", "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds, "920804700:1", "920805000:2"]) == 0
    capsys.readouterr()
    base_args = ["-s", "920804400", "-e", "920805600",
                 f"DEF:v={ds}:v:AVERAGE", "LINE1:v#ff0000:v"]
    assert main(["graphv", str(tmp_path / "a.png")] + base_args) == 0
    h1 = int(dict(
        l.split(" = ", 1) for l in capsys.readouterr().out.splitlines()
        if " = " in l)["image_height"])
    assert main(["graphv", str(tmp_path / "b.png")] + base_args
                + ["COMMENT:data source\\l"]) == 0
    h2 = int(dict(
        l.split(" = ", 1) for l in capsys.readouterr().out.splitlines()
        if " = " in l)["image_height"])
    assert h2 > h1


def test_gradient_area_negative_values_screen_space():
    """The reference's gradient is a SCREEN-space cairo pattern: color
    above fading to color2 below, even when the area hangs under the
    base (negative values) — the base edge is then the color end."""
    el = GraphElement("AREA", "v", color="#ff0000", color2="#0000ff",
                      gradheight=0.0)
    rows = _rows([-8.0] * 30, base=0.0)
    cv = render_graph(rows, [el], (-10.0, 0.0), 1000, 1300, width=60,
                      height=51, x_grid=False, y_grid=False)
    img = _img(cv)
    x0, y0 = 8 + 7 * CHAR_W, 4
    xmid = x0 + 30
    col = img[y0:y0 + 51, xmid]
    painted = [c for c in col if not (c == [255, 255, 255]).all()]
    assert len(painted) > 30
    top, bot = painted[2], painted[-3]
    assert top[0] > top[2]  # red-dominant near the base (screen top)
    assert bot[2] > bot[0]  # blue-dominant near the value edge (bottom)


# ------------------------------------------- option-table close-out batch

def test_no_minor_suppresses_minor_grid():
    el = GraphElement("LINE", "v", color="#ff0000")
    kw = dict(width=120, height=60, x_grid=True, y_grid=True)
    cv = render_graph(_rows([3.0] * 20), [el], (0.0, 10.0), 1000, 1200, **kw)
    cv2 = render_graph(_rows([3.0] * 20), [el], (0.0, 10.0), 1000, 1200,
                       no_minor=True, **kw)
    img, img2 = _img(cv), _img(cv2)
    # minor gridlines disappear: strictly fewer non-background pixels
    n1 = (img != 255).any(axis=2).sum()
    n2 = (img2 != 255).any(axis=2).sum()
    assert n2 < n1


def test_week_fmt_substitution():
    # 3-week range picks the week row; custom --week-fmt text appears
    start, end = 1_000_000_000, 1_000_000_000 + 21 * 86400
    minor, major, lab, fmt = pick_xgrid(start, end)
    assert fmt == "Week %V"
    _, _, _, fmt2 = pick_xgrid(start, end, week_fmt="KW%V")
    assert fmt2 == "KW%V"


def test_log_axis_default_label_is_exponent_form():
    """Default log labels are %3.0e (horizontal_log_grid); --units=si
    switches to the SI ladder."""
    el = GraphElement("LINE", "v", color="#ff0000")
    kw = dict(width=160, height=80, x_grid=False, y_grid=True,
              logarithmic=True)
    cv = render_graph(_rows([50.0] * 10), [el], (1.0, 100.0), 1000, 1100,
                      **kw)
    cv_si = render_graph(_rows([50.0] * 10), [el], (1.0, 100.0), 1000, 1100,
                         units_si=True, **kw)
    # the two label styles paint differently in the left margin
    assert np.abs(_img(cv).astype(int) - _img(cv_si).astype(int)).sum() > 0


def test_left_axis_format_and_formatters():
    el = GraphElement("LINE", "v", color="#ff0000")
    kw = dict(width=160, height=80, x_grid=False, y_grid=True)
    base = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                        **kw)
    fmt = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                       axis_format="%.2f", **kw)
    dur = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                       axis_formatter="duration", **kw)
    ts = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                      axis_formatter="timestamp", axis_format="%M:%S", **kw)
    imgs = [_img(c) for c in (base, fmt, dur, ts)]
    for i in range(1, 4):
        assert np.abs(imgs[0].astype(int) - imgs[i].astype(int)).sum() > 0


def test_force_rules_legend():
    # HRULE far outside the bounds: legend suppressed by default,
    # painted with force_rules_legend (reference -F)
    el = GraphElement("LINE", "v", color="#ff0000")
    kw = dict(width=80, height=40, x_grid=False, y_grid=False)
    rules = [("H", 99.0, "#0000ff", "out-of-range rule")]
    cv = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                      rules=rules, **kw)
    cvf = render_graph(_rows([5.0] * 10), [el], (0.0, 10.0), 1000, 1100,
                       rules=rules, force_rules_legend=True, **kw)
    # forced version has a blue legend swatch below the plot, default not
    blue = lambda img: ((img == [0, 0, 255]).all(axis=2)).sum()
    assert blue(_img(cv)) == 0
    assert blue(_img(cvf)) > 0


def test_glyph_coverage_area_exact_and_cached():
    """The AA tier's box-filter resampler is EXACT area sampling: total
    coverage times the output pixel's input-space area equals the
    glyph's ink area at every cell size (no ink gained or lost), values
    stay in [0,1], and the cache returns the same (read-only) array."""
    from rrdtool_1_x_spark.render import glyph_coverage

    ink = float(glyph("A").sum())
    for hh, ww in ((8, 6), (12, 9), (11, 7), (24, 18), (5, 4)):
        cov = glyph_coverage("A", hh, ww)
        assert cov.shape == (hh, ww)
        assert cov.min() >= 0.0 and cov.max() <= 1.0
        area = cov.sum() * (8.0 * 6.0) / (hh * ww)
        assert abs(area - ink) < 1e-9, (hh, ww, area, ink)
    assert glyph_coverage("A", 12, 9) is glyph_coverage("A", 12, 9)
    assert not glyph_coverage("A", 12, 9).flags.writeable


def test_aa_text_modes_have_raster_effect():
    """Canvas AA text: normal mode paints FRACTIONAL edge pixels
    (grayscale AA), mono is bilevel (only full-on/off), light is
    strictly lighter than normal, and a smoothing threshold at/above
    the size forces bilevel — every --font knob changes the raster."""
    def draw(mode, px=11.0, threshold=None):
        cv = Canvas(80, 20, background="#ffffff")
        cv.aa_font = {"px": px, "cell_h": 11, "cell_w": 8,
                      "mode": mode, "threshold": threshold}
        cv.text(2, 2, "Ag", "#000000")
        return _img(cv)[:, :, 0].astype(float)

    normal = draw("normal")
    frac = (normal > 0) & (normal < 255)
    assert frac.any(), "normal AA must produce fractional edge pixels"
    mono = draw("mono")
    assert set(np.unique(mono)) <= {0.0, 255.0}
    light = draw("light")
    assert light.sum() > normal.sum()  # lighter = less ink
    assert (light != normal).any()
    forced = draw("normal", threshold=12.0)  # px 11 <= threshold -> mono
    assert set(np.unique(forced)) <= {0.0, 255.0}
    assert (forced == mono).all()


def test_render_graph_font_knobs(tmp_path):
    """render_graph: --font with a face name (font_px) activates the AA
    tier — output differs from the bitmap default, carries gray
    antialiased text pixels, and fractional sizes move the layout; the
    default path stays byte-identical to a run with no font args
    (pixel-golden stability)."""
    el = GraphElement("LINE", "v", color="#ff0000", legend="load")
    rows = _rows([5.0] * 50)
    base = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                        title="AA title")
    again = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                         title="AA title")
    assert (_img(base) == _img(again)).all()
    # at exactly 8px the box filter is the identity resample — the AA
    # tier reproduces the bitmap face pixel-for-pixel (tier-consistency
    # invariant: AA is a strict generalization of the default)
    aa8 = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                       title="AA title", font_px=8.0)
    assert (_img(aa8) == _img(base)).all()
    aa_big = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                          title="AA title", font_px=13.0)
    assert _img(aa_big).shape != _img(base).shape  # layout follows size
    mono = render_graph(rows, [el], (0.0, 10.0), 1000, 1500,
                        title="AA title", font_px=13.0,
                        font_render_mode="mono")
    assert _img(mono).shape == _img(aa_big).shape
    assert (_img(mono) != _img(aa_big)).any()


def test_cli_graph_font_face_aa(spark, tmp_path, capsys):
    """CLI: --font DEFAULT:12:SomeFace activates the AA tier (output
    differs from the default bitmap run), --font-render-mode mono
    changes the AA raster, --font-smoothing-threshold forces bilevel,
    and size-only --font keeps the golden-stable bitmap tier."""
    from rrdtool_1_x_spark.cli import main

    ds_path = str(tmp_path / "t.rrd")
    base = 999_999_900
    assert main(["create", ds_path, "--start", str(base - 10), "--step",
                 "300", "DS:speed:GAUGE:600:U:U",
                 "RRA:AVERAGE:0.5:1:100"]) == 0
    assert main(["update", ds_path, f"{base + 300}:5",
                 f"{base + 600}:7"]) == 0

    def png(extra):
        out = str(tmp_path / f"f{len(extra)}_{abs(hash(tuple(extra)))}.png")
        assert main([
            "graph", out, "-s", str(base), "-e", str(base + 600),
            "-w", "120", "-h", "40",
            f"DEF:v={ds_path}:speed:AVERAGE", "LINE2:v#ff0000:speed",
            "--title", "aa knobs",
        ] + extra) == 0
        capsys.readouterr()
        return open(out, "rb").read()

    plain = png([])
    named = png(["--font", "DEFAULT:12:DejaVu Sans"])
    assert named != plain
    mono = png(["--font", "DEFAULT:12:DejaVu Sans",
                "--font-render-mode", "mono"])
    assert mono != named
    thr = png(["--font", "DEFAULT:12:DejaVu Sans",
               "--font-smoothing-threshold", "14"])
    assert thr == mono  # 12px under a 14px threshold renders bilevel
    # size-only --font keeps the bitmap tier (golden-stable scale path)
    scaled = png(["--font", "DEFAULT:16"])
    assert scaled != plain and scaled != named
