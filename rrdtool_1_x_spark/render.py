"""PNG graph renderer — the ``rrdtool graph`` image surface, rebuilt on
numpy + the in-repo PNG encoder (datapipe.codecs.encode_png); no cairo,
no fonts on disk (a built-in 5x7 bitmap face).

What is mirrored from the reference (cited, not copied):

* the element paint chain (LINE segments between interval ends, AREA
  fills from the stack base, TICK fraction marks) consumes data_proc's
  plotted values + bases — the SAME numbers the oracle-gated graphv
  ``print``/bounds path produces (src/rrd_graph.c:2245-2380 graph_paint);
* autoscale bounds arrive already adjusted by -l/-u/--rigid +
  expand_range (src/rrd_graph.c:1486-1528, :613-700);
* y-grid steps come from the 1/2/5 x 10^k ladder with SI-magnitude
  labels (src/rrd_graph.c:1974-2040 draw_horizontal_grid / si_unit);
* x-grid/label intervals follow a duration-keyed table in the spirit of
  the reference's xlab_elem list (src/rrd_graph.c:127-157);
* default colors match the reference's graph_col defaults
  (src/rrd_graph.c:187-201): BACK f5f5f5, CANVAS ffffff, SHADEA c0c0c0,
  SHADEB 9f9f9f, GRID 90909080, MGRID e05050, FONT/AXIS/FRAME black,
  ARROW red.

Deliberate simplifications (documented, not hidden): no anti-aliasing
(1-px crisp lines make pixel-exact tests possible), one legend item per
line instead of the reference's \\l/\\n flow layout, PNG only.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# 5x7 bitmap font (column-major, bit 0 = top row) — ASCII 32..126.
# The classic LCD-ROM face, public domain.
# ---------------------------------------------------------------------------

_FONT = {
    " ": (0x00, 0x00, 0x00, 0x00, 0x00),
    "!": (0x00, 0x00, 0x5F, 0x00, 0x00),
    '"': (0x00, 0x07, 0x00, 0x07, 0x00),
    "#": (0x14, 0x7F, 0x14, 0x7F, 0x14),
    "$": (0x24, 0x2A, 0x7F, 0x2A, 0x12),
    "%": (0x23, 0x13, 0x08, 0x64, 0x62),
    "&": (0x36, 0x49, 0x55, 0x22, 0x50),
    "'": (0x00, 0x05, 0x03, 0x00, 0x00),
    "(": (0x00, 0x1C, 0x22, 0x41, 0x00),
    ")": (0x00, 0x41, 0x22, 0x1C, 0x00),
    "*": (0x14, 0x08, 0x3E, 0x08, 0x14),
    "+": (0x08, 0x08, 0x3E, 0x08, 0x08),
    ",": (0x00, 0x50, 0x30, 0x00, 0x00),
    "-": (0x08, 0x08, 0x08, 0x08, 0x08),
    ".": (0x00, 0x60, 0x60, 0x00, 0x00),
    "/": (0x20, 0x10, 0x08, 0x04, 0x02),
    "0": (0x3E, 0x51, 0x49, 0x45, 0x3E),
    "1": (0x00, 0x42, 0x7F, 0x40, 0x00),
    "2": (0x42, 0x61, 0x51, 0x49, 0x46),
    "3": (0x21, 0x41, 0x45, 0x4B, 0x31),
    "4": (0x18, 0x14, 0x12, 0x7F, 0x10),
    "5": (0x27, 0x45, 0x45, 0x45, 0x39),
    "6": (0x3C, 0x4A, 0x49, 0x49, 0x30),
    "7": (0x01, 0x71, 0x09, 0x05, 0x03),
    "8": (0x36, 0x49, 0x49, 0x49, 0x36),
    "9": (0x06, 0x49, 0x49, 0x29, 0x1E),
    ":": (0x00, 0x36, 0x36, 0x00, 0x00),
    ";": (0x00, 0x56, 0x36, 0x00, 0x00),
    "<": (0x08, 0x14, 0x22, 0x41, 0x00),
    "=": (0x14, 0x14, 0x14, 0x14, 0x14),
    ">": (0x00, 0x41, 0x22, 0x14, 0x08),
    "?": (0x02, 0x01, 0x51, 0x09, 0x06),
    "@": (0x32, 0x49, 0x79, 0x41, 0x3E),
    "A": (0x7E, 0x11, 0x11, 0x11, 0x7E),
    "B": (0x7F, 0x49, 0x49, 0x49, 0x36),
    "C": (0x3E, 0x41, 0x41, 0x41, 0x22),
    "D": (0x7F, 0x41, 0x41, 0x22, 0x1C),
    "E": (0x7F, 0x49, 0x49, 0x49, 0x41),
    "F": (0x7F, 0x09, 0x09, 0x09, 0x01),
    "G": (0x3E, 0x41, 0x49, 0x49, 0x7A),
    "H": (0x7F, 0x08, 0x08, 0x08, 0x7F),
    "I": (0x00, 0x41, 0x7F, 0x41, 0x00),
    "J": (0x20, 0x40, 0x41, 0x3F, 0x01),
    "K": (0x7F, 0x08, 0x14, 0x22, 0x41),
    "L": (0x7F, 0x40, 0x40, 0x40, 0x40),
    "M": (0x7F, 0x02, 0x0C, 0x02, 0x7F),
    "N": (0x7F, 0x04, 0x08, 0x10, 0x7F),
    "O": (0x3E, 0x41, 0x41, 0x41, 0x3E),
    "P": (0x7F, 0x09, 0x09, 0x09, 0x06),
    "Q": (0x3E, 0x41, 0x51, 0x21, 0x5E),
    "R": (0x7F, 0x09, 0x19, 0x29, 0x46),
    "S": (0x46, 0x49, 0x49, 0x49, 0x31),
    "T": (0x01, 0x01, 0x7F, 0x01, 0x01),
    "U": (0x3F, 0x40, 0x40, 0x40, 0x3F),
    "V": (0x1F, 0x20, 0x40, 0x20, 0x1F),
    "W": (0x3F, 0x40, 0x38, 0x40, 0x3F),
    "X": (0x63, 0x14, 0x08, 0x14, 0x63),
    "Y": (0x07, 0x08, 0x70, 0x08, 0x07),
    "Z": (0x61, 0x51, 0x49, 0x45, 0x43),
    "[": (0x00, 0x7F, 0x41, 0x41, 0x00),
    "\\": (0x02, 0x04, 0x08, 0x10, 0x20),
    "]": (0x00, 0x41, 0x41, 0x7F, 0x00),
    "^": (0x04, 0x02, 0x01, 0x02, 0x04),
    "_": (0x40, 0x40, 0x40, 0x40, 0x40),
    "`": (0x00, 0x01, 0x02, 0x04, 0x00),
    "a": (0x20, 0x54, 0x54, 0x54, 0x78),
    "b": (0x7F, 0x48, 0x44, 0x44, 0x38),
    "c": (0x38, 0x44, 0x44, 0x44, 0x20),
    "d": (0x38, 0x44, 0x44, 0x48, 0x7F),
    "e": (0x38, 0x54, 0x54, 0x54, 0x18),
    "f": (0x08, 0x7E, 0x09, 0x01, 0x02),
    "g": (0x0C, 0x52, 0x52, 0x52, 0x3E),
    "h": (0x7F, 0x08, 0x04, 0x04, 0x78),
    "i": (0x00, 0x44, 0x7D, 0x40, 0x00),
    "j": (0x20, 0x40, 0x44, 0x3D, 0x00),
    "k": (0x7F, 0x10, 0x28, 0x44, 0x00),
    "l": (0x00, 0x41, 0x7F, 0x40, 0x00),
    "m": (0x7C, 0x04, 0x18, 0x04, 0x78),
    "n": (0x7C, 0x08, 0x04, 0x04, 0x78),
    "o": (0x38, 0x44, 0x44, 0x44, 0x38),
    "p": (0x7C, 0x14, 0x14, 0x14, 0x08),
    "q": (0x08, 0x14, 0x14, 0x18, 0x7C),
    "r": (0x7C, 0x08, 0x04, 0x04, 0x08),
    "s": (0x48, 0x54, 0x54, 0x54, 0x20),
    "t": (0x04, 0x3F, 0x44, 0x40, 0x20),
    "u": (0x3C, 0x40, 0x40, 0x20, 0x7C),
    "v": (0x1C, 0x20, 0x40, 0x20, 0x1C),
    "w": (0x3C, 0x40, 0x30, 0x40, 0x3C),
    "x": (0x44, 0x28, 0x10, 0x28, 0x44),
    "y": (0x0C, 0x50, 0x50, 0x50, 0x3C),
    "z": (0x44, 0x64, 0x54, 0x4C, 0x44),
    "{": (0x00, 0x08, 0x36, 0x41, 0x00),
    "|": (0x00, 0x00, 0x7F, 0x00, 0x00),
    "}": (0x00, 0x41, 0x36, 0x08, 0x00),
    "~": (0x08, 0x04, 0x08, 0x10, 0x08),
}

CHAR_W, CHAR_H = 6, 8  # 5x7 glyph + 1px spacing


def glyph(ch: str) -> np.ndarray:
    """(7, 5) bool bitmap for one character."""
    cols = _FONT.get(ch, _FONT["?"])
    g = np.zeros((7, 5), dtype=bool)
    for x, col in enumerate(cols):
        for y in range(7):
            g[y, x] = bool(col & (1 << y))
    return g


def text_size(s: str) -> tuple[int, int]:
    return CHAR_H, CHAR_W * len(s)


# -- anti-aliased text tier (behind --font) ---------------------------------
#
# The reference draws text through cairo/pango with grayscale
# antialiasing (rrd_graph_helper/gfx text path, src/rrd_graph.c:4691+);
# the default renderer here is the pixel-golden-stable 5x7 bitmap face.
# When the user asks for a font (--font FONTTAG:size:name), text routes
# through a from-scratch COVERAGE rasterizer instead: each glyph's 8x6
# ink grid is box-filtered onto the requested cell size, so edge pixels
# carry fractional coverage that multiplies the paint alpha — true
# area-sampled antialiasing, no library. --font-render-mode and
# --font-smoothing-threshold gain raster effect in this tier (mono =
# bilevel threshold at 0.5 coverage, the cairo ANTIALIAS_NONE analogue;
# light = lighter gamma; sizes at/below the smoothing threshold render
# bilevel, matching the reference knob's meaning). The 5x7 default path
# is untouched, keeping every existing pixel golden byte-identical.

_COV_CACHE: dict = {}


def _box_matrix(n_out: int, n_in: int) -> np.ndarray:
    """(n_out, n_in) area-overlap weights: row o holds the fraction of
    output pixel o covered by each input cell under uniform rescale —
    rows sum to 1, so M @ g @ M'.T is exact box-filter coverage."""
    s = n_in / n_out  # input units per output pixel
    m = np.zeros((n_out, n_in))
    for o in range(n_out):
        a, b = o * s, (o + 1) * s
        for k in range(int(np.floor(a)), min(int(np.ceil(b)), n_in)):
            m[o, k] = max(0.0, min(b, k + 1) - max(a, k))
    return m / s


def glyph_coverage(ch: str, cell_h: int, cell_w: int) -> np.ndarray:
    """(cell_h, cell_w) float coverage in [0,1] of one glyph, the 8x6
    ink grid (5x7 face + its spacing row/col) area-resampled to the
    requested cell — cached per (char, cell)."""
    key = (ch, cell_h, cell_w)
    hit = _COV_CACHE.get(key)
    if hit is not None:
        return hit
    g = np.zeros((8, 6))
    g[:7, :5] = glyph(ch)
    cov = _box_matrix(cell_h, 8) @ g @ _box_matrix(cell_w, 6).T
    cov = np.clip(cov, 0.0, 1.0)
    cov.setflags(write=False)
    _COV_CACHE[key] = cov
    return cov


# ---------------------------------------------------------------------------
# Canvas
# ---------------------------------------------------------------------------


def parse_color(spec: str) -> tuple[np.ndarray, float]:
    """#RRGGBB[AA] → (rgb float array, alpha in [0,1])."""
    s = spec.lstrip("#")
    if len(s) not in (6, 8):
        raise ValueError(f"bad color {spec!r}")
    rgb = np.array([int(s[i : i + 2], 16) for i in (0, 2, 4)], dtype=np.float64)
    alpha = int(s[6:8], 16) / 255.0 if len(s) == 8 else 1.0
    return rgb, alpha


class Canvas:
    """uint8 RGB raster with alpha-blending primitives. y grows down."""

    def __init__(self, width: int, height: int, background: str = "#f5f5f5"):
        rgb, _ = parse_color(background)
        self.img = np.ones((height, width, 3), dtype=np.float64) * rgb
        self.h, self.w = height, width
        # optional (x0, y0, x1, y1) inclusive clip rect — element painting
        # sets it to the plot area so fills/lines never bleed into margins
        self.clip: tuple[int, int, int, int] | None = None

    def _bounds(self) -> tuple[int, int, int, int]:
        if self.clip is None:
            return 0, 0, self.w - 1, self.h - 1
        cx0, cy0, cx1, cy1 = self.clip
        return max(0, cx0), max(0, cy0), min(self.w - 1, cx1), min(self.h - 1, cy1)

    def _blend(self, ys, xs, color: str) -> None:
        rgb, a = parse_color(color)
        self.img[ys, xs] = (1 - a) * self.img[ys, xs] + a * rgb

    def rect(self, x0: int, y0: int, x1: int, y1: int, color: str) -> None:
        bx0, by0, bx1, by1 = self._bounds()
        x0, x1 = max(bx0, min(x0, x1)), min(bx1, max(x0, x1))
        y0, y1 = max(by0, min(y0, y1)), min(by1, max(y0, y1))
        if x1 < x0 or y1 < y0:
            return
        self._blend(slice(y0, y1 + 1), slice(x0, x1 + 1), color)

    def hline(self, y: int, x0: int, x1: int, color: str, width: int = 1) -> None:
        self.rect(x0, y, x1, y + width - 1, color)

    def vline(self, x: int, y0: int, y1: int, color: str, width: int = 1) -> None:
        self.rect(x, y0, x + width - 1, y1, color)

    def vspan(self, x: int, y0: int, y1: int, color: str) -> None:
        """Filled 1-px-wide vertical span (AREA fill column)."""
        self.rect(x, min(y0, y1), x, max(y0, y1), color)

    def vspan_fade(self, x: int, y_top: int, y_bot: int, color: str,
                   color2: str, gradheight: float) -> None:
        """Gradient AREA column (gfx_add_rect_fadey,
        src/rrd_gfx.c:111-145): the reference's cairo pattern fades in
        SCREEN space — ``color`` above, ``color2`` below — regardless of
        which edge carries the value (a negative AREA keeps color at the
        top/base edge, like cairo). Here: ``color`` at y_top fading
        linearly to ``color2`` over ``gradheight`` px downward (<=0:
        across the whole span), then ``color2`` to y_bot."""
        y_top, y_bot = min(y_top, y_bot), max(y_top, y_bot)
        bx0, by0, bx1, by1 = self._bounds()
        if x < bx0 or x > bx1:
            return
        ya, yb = max(y_top, by0), min(y_bot, by1)
        if ya > yb:
            return
        rgb1, a1 = parse_color(color)
        rgb2, a2 = parse_color(color2)
        gh = gradheight if gradheight > 0 else max(1.0, y_bot - y_top)
        ys = np.arange(ya, yb + 1)
        t = np.clip((ys - y_top) / gh, 0.0, 1.0)[:, None]
        rgb = (1 - t) * rgb1 + t * rgb2
        a = ((1 - t) * a1 + t * a2)
        self.img[ys, x] = (1 - a) * self.img[ys, x] + a * rgb

    def line(
        self,
        x0: int,
        y0: int,
        x1: int,
        y1: int,
        color: str,
        width: float = 1.0,
        dashes: tuple | None = None,
        dash_state: list | None = None,
    ) -> None:
        """Bresenham segment; widths > 1 thicken perpendicular-ish.
        ``dashes`` is an (on, off, ...) pixel-run pattern; ``dash_state``
        is a one-element mutable distance counter so the pattern runs
        continuously across the segments of one polyline."""
        w = max(1, int(round(width)))
        dx, dy = abs(x1 - x0), abs(y1 - y0)
        sx = 1 if x0 < x1 else -1
        sy = 1 if y0 < y1 else -1
        err = dx - dy
        x, y = x0, y0
        steep = dy > dx
        bx0, by0, bx1, by1 = self._bounds()
        cycle = sum(dashes) if dashes else 0.0
        state = dash_state if dash_state is not None else [0.0]
        while True:
            pen_on = True
            if dashes and cycle > 0:
                t = state[0] % cycle
                for run in dashes:
                    if t < run:
                        break
                    t -= run
                    pen_on = not pen_on
                state[0] += 1
            if pen_on and bx0 <= x <= bx1 and by0 <= y <= by1:
                if w == 1:
                    self._blend(y, x, color)
                elif steep:  # widen horizontally
                    self.rect(x - (w - 1) // 2, y, x + w // 2, y, color)
                else:  # widen vertically
                    self.rect(x, y - (w - 1) // 2, x, y + w // 2, color)
            if x == x1 and y == y1:
                break
            e2 = 2 * err
            if e2 > -dy:
                err -= dy
                x += sx
            if e2 < dx:
                err += dx
                y += sy

    font_scale: int = 1  # --font DEFAULT:size → integer glyph upscale
    # AA text tier (glyph_coverage): {"cell_h", "cell_w", "mode",
    # "threshold", "px"} — set by graph() when --font names a face
    aa_font: dict | None = None

    def _blend_cov(self, y0: int, x0: int, cov: np.ndarray, color: str) -> None:
        """Alpha-blend a coverage patch: per-pixel alpha = paint alpha x
        fractional coverage (the rasterized-text compositing rule)."""
        rgb, a = parse_color(color)
        gh, gw = cov.shape
        ys, xs = max(0, -y0), max(0, -x0)
        ye, xe = min(gh, self.h - y0), min(gw, self.w - x0)
        if ye <= ys or xe <= xs:
            return
        alpha = (a * cov[ys:ye, xs:xe])[..., None]
        region = self.img[y0 + ys : y0 + ye, x0 + xs : x0 + xe]
        self.img[y0 + ys : y0 + ye, x0 + xs : x0 + xe] = (
            (1 - alpha) * region + alpha * rgb
        )

    def _text_aa(self, x: int, y: int, s: str, color: str, rotate: bool) -> None:
        f = self.aa_font
        ch_h, ch_w = f["cell_h"], f["cell_w"]
        mono = f["mode"] == "mono" or (
            f.get("threshold") is not None and f["px"] <= f["threshold"]
        )
        for i, c in enumerate(s):
            cov = glyph_coverage(c, ch_h, ch_w)
            if mono:
                cov = (cov >= 0.5).astype(float)
            elif f["mode"] == "light":
                # lighter rendering: push partial coverage down (gamma
                # > 1) — thinner-looking stems, the cairo "light" hint
                cov = cov ** 1.6
            if rotate:
                self._blend_cov(y - i * ch_w, x, np.rot90(cov, 1), color)
            else:
                self._blend_cov(y, x + i * ch_w, cov, color)

    def text(self, x: int, y: int, s: str, color: str = "#000000", rotate: bool = False) -> None:
        """Draw ``s`` with its top-left at (x, y); ``rotate`` turns the
        string 90° counter-clockwise (vertical label). ``font_scale``
        nearest-neighbor-upscales the 5x7 glyphs (the bitmap stand-in for
        the reference's --font size handling); when ``aa_font`` is set
        the coverage rasterizer paints antialiased glyphs instead."""
        if self.aa_font is not None:
            self._text_aa(x, y, s, color, rotate)
            return
        fs = max(1, int(self.font_scale))
        for i, ch in enumerate(s):
            g = glyph(ch)
            if fs > 1:
                g = np.kron(g, np.ones((fs, fs), dtype=g.dtype))
            if rotate:
                g = np.rot90(g, 1)  # CCW: text reads bottom-to-top
                gy, gx = y - i * CHAR_W * fs, x
            else:
                gy, gx = y, x + i * CHAR_W * fs
            ys, xs = np.nonzero(g)
            ys, xs = ys + gy, xs + gx
            keep = (ys >= 0) & (ys < self.h) & (xs >= 0) & (xs < self.w)
            if keep.any():
                self._blend(ys[keep], xs[keep], color)

    def to_bytes(self, fmt: str = "PNG") -> bytes:
        if fmt.upper() != "PNG":
            raise ValueError(f"raster canvas renders PNG, not {fmt}")
        return self.to_png()

    def zoom(self, factor: float) -> None:
        """Nearest-neighbor rescale of the finished raster (--zoom; the
        reference scales vectors pre-paint via cairo, we scale pixels)."""
        if factor == 1.0 or factor <= 0:
            return
        nh, nw = max(1, int(round(self.h * factor))), max(1, int(round(self.w * factor)))
        yi = (np.arange(nh) / factor).astype(int).clip(0, self.h - 1)
        xi = (np.arange(nw) / factor).astype(int).clip(0, self.w - 1)
        self.img = self.img[yi][:, xi]
        self.h, self.w = nh, nw
        if getattr(self, "graph_box", None) is not None:
            self.graph_box = tuple(int(round(v * factor)) for v in self.graph_box)

    def to_png(self) -> bytes:
        from .datapipe.codecs import encode_png

        return encode_png(np.clip(np.round(self.img), 0, 255).astype(np.uint8))


class SVGCanvas:
    """Vector backend with the same drawing surface as Canvas — emits SVG
    elements instead of blending pixels (--imgformat SVG; the reference
    renders SVG through cairo's vector surface, src/rrd_graph.c imgformat
    handling). Text uses the viewer's monospace face at the bitmap font's
    cell metrics, so layout coordinates are shared with the raster path."""

    def __init__(self, width: int, height: int, background: str = "#f5f5f5"):
        self.h, self.w = height, width
        self.clip: tuple[int, int, int, int] | None = None
        self._clip_id = 0
        self._defs: list[str] = []
        self.el: list[str] = [
            f'<rect x="0" y="0" width="{width}" height="{height}" '
            f'fill="{self._fill(background)}"/>'
        ]
        self._bg = background
        self._zoom = 1.0

    @staticmethod
    def _fill(color: str) -> str:
        return color[:7]

    @staticmethod
    def _opacity(color: str) -> str:
        if len(color) == 9:
            a = int(color[7:9], 16) / 255.0
            return f' fill-opacity="{a:.3f}" stroke-opacity="{a:.3f}"'
        return ""

    def _clip_attr(self) -> str:
        if self.clip is None:
            return ""
        x0, y0, x1, y1 = self.clip
        cid = f"clip{self._clip_id}"
        self._defs.append(
            f'<clipPath id="{cid}"><rect x="{x0}" y="{y0}" '
            f'width="{x1 - x0 + 1}" height="{y1 - y0 + 1}"/></clipPath>'
        )
        self._clip_id += 1
        return f' clip-path="url(#{cid})"'

    def rect(self, x0: int, y0: int, x1: int, y1: int, color: str) -> None:
        x0, x1 = min(x0, x1), max(x0, x1)
        y0, y1 = min(y0, y1), max(y0, y1)
        self.el.append(
            f'<rect x="{x0}" y="{y0}" width="{x1 - x0 + 1}" '
            f'height="{y1 - y0 + 1}" fill="{self._fill(color)}"'
            f"{self._opacity(color)}{self._clip_attr()}/>"
        )

    def hline(self, y: int, x0: int, x1: int, color: str, width: int = 1) -> None:
        self.rect(x0, y, x1, y + width - 1, color)

    def vline(self, x: int, y0: int, y1: int, color: str, width: int = 1) -> None:
        self.rect(x, y0, x + width - 1, y1, color)

    def vspan(self, x: int, y0: int, y1: int, color: str) -> None:
        self.rect(x, min(y0, y1), x, max(y0, y1), color)

    def vspan_fade(self, x, y_top, y_bot, color, color2, gradheight) -> None:
        # vector backends flatten the gradient to the primary color
        self.vspan(x, y_top, y_bot, color)

    def line(
        self, x0, y0, x1, y1, color, width=1.0, dashes=None, dash_state=None
    ) -> None:
        dash = (
            f' stroke-dasharray="{",".join(str(d) for d in dashes)}"'
            if dashes
            else ""
        )
        self.el.append(
            f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y1}" '
            f'stroke="{self._fill(color)}" stroke-width="{max(1, round(width))}"'
            f"{self._opacity(color)}{dash}{self._clip_attr()}/>"
        )

    font_scale: int = 1

    def text(self, x: int, y: int, s: str, color: str = "#000000", rotate: bool = False) -> None:
        import html as _html

        fs = max(1, int(self.font_scale))
        # AA tier: --font size passes through as the exact pixel size
        px = getattr(self, "font_px", None) or CHAR_H * fs
        esc = _html.escape(s)
        tr = f' transform="rotate(-90 {x} {y})"' if rotate else ""
        self.el.append(
            f'<text x="{x}" y="{y + px - 2:g}" font-family="monospace" '
            f'font-size="{px:g}px" fill="{self._fill(color)}"{tr}>{esc}</text>'
        )

    def zoom(self, factor: float) -> None:
        self._zoom *= factor
        self.h = int(round(self.h * factor))
        self.w = int(round(self.w * factor))
        if getattr(self, "graph_box", None) is not None:
            self.graph_box = tuple(int(round(v * factor)) for v in self.graph_box)

    def to_bytes(self, fmt: str = "SVG") -> bytes:
        if fmt.upper() != "SVG":
            raise ValueError(f"vector canvas renders SVG, not {fmt}")
        base_w = int(round(self.w / self._zoom))
        base_h = int(round(self.h / self._zoom))
        head = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{self.w}" '
            f'height="{self.h}" viewBox="0 0 {base_w} {base_h}">\n'
        )
        defs = f"<defs>{''.join(self._defs)}</defs>\n" if self._defs else ""
        return (head + defs + "\n".join(self.el) + "\n</svg>\n").encode()


class DocCanvas:
    """Vector backend for the print formats (--imgformat EPS|PDF — the
    last two entries of the reference's imgformat enum,
    src/rrd_graph.h:98-101, rendered there through cairo's PS/PDF
    surfaces). Records neutral drawing ops on the shared Canvas surface
    and serializes them as either an EPSF-3.0 PostScript program or a
    minimal PDF 1.4 document (Courier text at the bitmap cell metrics,
    so layout coordinates are shared with the raster path). Alpha is
    flattened to opaque RGB — PostScript has no transparency model."""

    font_scale: int = 1

    def __init__(self, width: int, height: int, background: str = "#f5f5f5"):
        self.h, self.w = height, width
        self.clip: tuple[int, int, int, int] | None = None
        self._zoom = 1.0
        # op tuples: ("rect", x0, y0, x1, y1, color, clip)
        #            ("line", x0, y0, x1, y1, color, width, dashes, clip)
        #            ("text", x, y, s, color, rotate)
        self.ops: list[tuple] = [
            ("rect", 0, 0, width - 1, height - 1, background, None)
        ]

    def rect(self, x0: int, y0: int, x1: int, y1: int, color: str) -> None:
        x0, x1 = min(x0, x1), max(x0, x1)
        y0, y1 = min(y0, y1), max(y0, y1)
        self.ops.append(("rect", x0, y0, x1, y1, color, self.clip))

    def hline(self, y: int, x0: int, x1: int, color: str, width: int = 1) -> None:
        self.rect(x0, y, x1, y + width - 1, color)

    def vline(self, x: int, y0: int, y1: int, color: str, width: int = 1) -> None:
        self.rect(x, y0, x + width - 1, y1, color)

    def vspan(self, x: int, y0: int, y1: int, color: str) -> None:
        self.rect(x, min(y0, y1), x, max(y0, y1), color)

    def vspan_fade(self, x, y_top, y_bot, color, color2, gradheight) -> None:
        # vector backends flatten the gradient to the primary color
        self.vspan(x, y_top, y_bot, color)

    def line(
        self, x0, y0, x1, y1, color, width=1.0, dashes=None, dash_state=None
    ) -> None:
        self.ops.append(
            ("line", x0, y0, x1, y1, color, max(1.0, float(width)),
             tuple(dashes) if dashes else None, self.clip)
        )

    def text(self, x: int, y: int, s: str, color: str = "#000000",
             rotate: bool = False) -> None:
        self.ops.append(("text", x, y, s, color, rotate))

    def zoom(self, factor: float) -> None:
        self._zoom *= factor
        self.h = int(round(self.h * factor))
        self.w = int(round(self.w * factor))
        if getattr(self, "graph_box", None) is not None:
            self.graph_box = tuple(int(round(v * factor)) for v in self.graph_box)

    @staticmethod
    def _rgb(color: str) -> tuple[float, float, float]:
        return (int(color[1:3], 16) / 255.0, int(color[3:5], 16) / 255.0,
                int(color[5:7], 16) / 255.0)

    # -- EPS ---------------------------------------------------------------
    def _to_eps(self) -> bytes:
        bh = int(round(self.h / self._zoom))
        out = [
            "%!PS-Adobe-3.0 EPSF-3.0",
            f"%%BoundingBox: 0 0 {self.w} {self.h}",
            "%%Pages: 1",
            "%%EndComments",
            f"/Courier findfont "
            f"{getattr(self, 'font_px', None) or CHAR_H * max(1, int(self.font_scale)):g} "
            "scalefont setfont",
        ]
        if self._zoom != 1.0:
            out.append(f"{self._zoom:.4f} {self._zoom:.4f} scale")

        def Y(y: float) -> float:  # PostScript is bottom-up
            return bh - y

        for op in self.ops:
            kind = op[0]
            if kind == "rect":
                _, x0, y0, x1, y1, color, clip = op
                r, g, b = self._rgb(color)
                out.append(f"{r:.3f} {g:.3f} {b:.3f} setrgbcolor")
                pre, post = self._eps_clip(clip, Y)
                out += pre
                out.append(
                    f"{x0} {Y(y1 + 1):.0f} {x1 - x0 + 1} {y1 - y0 + 1} rectfill"
                )
                out += post
            elif kind == "line":
                _, x0, y0, x1, y1, color, w, dashes, clip = op
                r, g, b = self._rgb(color)
                out.append(f"{r:.3f} {g:.3f} {b:.3f} setrgbcolor")
                pre, post = self._eps_clip(clip, Y)
                out += pre
                if dashes:
                    out.append(f"[{' '.join(str(d) for d in dashes)}] 0 setdash")
                out.append(f"{w:.1f} setlinewidth")
                out.append(
                    f"newpath {x0} {Y(y0):.0f} moveto {x1} {Y(y1):.0f} "
                    "lineto stroke"
                )
                if dashes:
                    out.append("[] 0 setdash")
                out += post
            else:  # text
                _, x, y, s, color, rotate = op
                r, g, b = self._rgb(color)
                esc = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
                out.append(f"{r:.3f} {g:.3f} {b:.3f} setrgbcolor")
                if rotate:
                    out.append(
                        f"gsave {x} {Y(y):.0f} translate 90 rotate "
                        f"0 0 moveto ({esc}) show grestore"
                    )
                else:
                    out.append(f"{x} {Y(y + CHAR_H - 2):.0f} moveto ({esc}) show")
        out += ["showpage", "%%EOF", ""]
        return "\n".join(out).encode("latin-1", "replace")

    @staticmethod
    def _eps_clip(clip, Y):
        if clip is None:
            return [], []
        x0, y0, x1, y1 = clip
        return (
            [f"gsave {x0} {Y(y1 + 1):.0f} {x1 - x0 + 1} {y1 - y0 + 1} rectclip"],
            ["grestore"],
        )

    # -- PDF ---------------------------------------------------------------
    def _to_pdf(self) -> bytes:
        bh = int(round(self.h / self._zoom))

        def Y(y: float) -> float:  # PDF user space is bottom-up
            return bh - y

        body: list[str] = []
        if self._zoom != 1.0:
            body.append(f"{self._zoom:.4f} 0 0 {self._zoom:.4f} 0 0 cm")
        for op in self.ops:
            kind = op[0]
            if kind == "rect":
                _, x0, y0, x1, y1, color, clip = op
                r, g, b = self._rgb(color)
                seg = []
                if clip:
                    cx0, cy0, cx1, cy1 = clip
                    seg.append(
                        f"q {cx0} {Y(cy1 + 1):.0f} {cx1 - cx0 + 1} "
                        f"{cy1 - cy0 + 1} re W n"
                    )
                seg.append(
                    f"{r:.3f} {g:.3f} {b:.3f} rg {x0} {Y(y1 + 1):.0f} "
                    f"{x1 - x0 + 1} {y1 - y0 + 1} re f"
                )
                if clip:
                    seg.append("Q")
                body += seg
            elif kind == "line":
                _, x0, y0, x1, y1, color, w, dashes, clip = op
                r, g, b = self._rgb(color)
                seg = ["q"]
                if clip:
                    cx0, cy0, cx1, cy1 = clip
                    seg.append(
                        f"{cx0} {Y(cy1 + 1):.0f} {cx1 - cx0 + 1} "
                        f"{cy1 - cy0 + 1} re W n"
                    )
                if dashes:
                    seg.append(f"[{' '.join(str(d) for d in dashes)}] 0 d")
                seg.append(
                    f"{r:.3f} {g:.3f} {b:.3f} RG {w:.1f} w "
                    f"{x0} {Y(y0):.0f} m {x1} {Y(y1):.0f} l S"
                )
                seg.append("Q")
                body += seg
            else:  # text
                _, x, y, s, color, rotate = op
                r, g, b = self._rgb(color)
                esc = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
                if rotate:
                    tm = f"0 1 -1 0 {x} {Y(y):.0f} Tm"
                else:
                    tm = f"1 0 0 1 {x} {Y(y + CHAR_H - 2):.0f} Tm"
                fpx = getattr(self, "font_px", None) or CHAR_H * max(
                    1, int(self.font_scale))
                body.append(
                    f"BT /F1 {fpx:g} Tf "
                    f"{r:.3f} {g:.3f} {b:.3f} rg {tm} "
                    f"({esc}) Tj ET"
                )
        stream = "\n".join(body).encode("latin-1", "replace")
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 {self.w} "
                f"{self.h}] /Contents 4 0 R /Resources << /Font "
                "<< /F1 5 0 R >> >> >>"
            ).encode(),
            (f"<< /Length {len(stream)} >>\nstream\n".encode() + stream
             + b"\nendstream"),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>",
        ]
        out = bytearray(b"%PDF-1.4\n")
        offsets = []
        for i, obj in enumerate(objs, start=1):
            offsets.append(len(out))
            out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
        for off in offsets:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    def to_bytes(self, fmt: str = "EPS") -> bytes:
        f = fmt.upper()
        if f == "EPS":
            return self._to_eps()
        if f == "PDF":
            return self._to_pdf()
        raise ValueError(f"document canvas renders EPS/PDF, not {fmt}")


# ---------------------------------------------------------------------------
# Grid selection
# ---------------------------------------------------------------------------

_SI_SYM = {0: "", 1: "k", 2: "M", 3: "G", 4: "T", 5: "P", 6: "E",
           -1: "m", -2: "u", -3: "n", -4: "p", -5: "f", -6: "a"}


def si_label(v: float, magfact: float, mag: int) -> str:
    """Y-axis label: value scaled by the axis' common SI magnitude
    (draw_horizontal_grid keeps ONE magnitude for the whole axis)."""
    sv = v / magfact
    s = f"{sv:.1f}" if abs(sv) < 10 and sv != int(sv) else f"{sv:.0f}"
    return f"{s} {_SI_SYM.get(mag, '?')}".rstrip()


def pick_ygrid(vmin: float, vmax: float, area_h: int, base: float = 1000.0):
    """Pick the horizontal-grid step from the 1/2/5 ladder so lines are
    >= 15 px apart and labels land on round multiples; returns
    (gridstep, labfact, magfact, mag). ``base`` is the SI magnitude base
    (--base; 1024 for byte quantities)."""
    import math

    rng = vmax - vmin
    if not (rng > 0) or not np.isfinite(rng):
        rng = 1.0
    # smallest 1/2/5 step keeping >= 15 px between lines
    min_step = rng * 15.0 / max(area_h, 1)
    exp = math.floor(math.log10(min_step)) if min_step > 0 else 0
    step = None
    for mult in (1.0, 2.0, 5.0, 10.0):
        cand = mult * 10.0**exp
        if cand >= min_step:
            step = cand
            break
    if step is None:
        step = 10.0**(exp + 1)
    labfact = 1 if area_h / (rng / step) >= 25 else 2
    m = max(abs(vmin), abs(vmax), step)
    mag = int(math.floor(math.log(m) / math.log(base))) if m > 0 else 0
    mag = max(-6, min(6, mag))
    magfact = base**mag
    return step, labfact, magfact, mag


# duration-keyed x-grid table (spirit of rrd_graph.c:127-157 xlab):
# (max range s, minor grid s, major grid s, label every s, strftime fmt)
_XLAB = (
    (60 * 30, 60, 5 * 60, 5 * 60, "%H:%M"),
    (60 * 60 * 2, 5 * 60, 20 * 60, 20 * 60, "%H:%M"),
    (60 * 60 * 8, 15 * 60, 3600, 3600, "%H:%M"),
    (60 * 60 * 24, 3600, 4 * 3600, 4 * 3600, "%H:%M"),
    (60 * 60 * 48, 2 * 3600, 8 * 3600, 8 * 3600, "%a %H:%M"),
    (60 * 60 * 24 * 8, 6 * 3600, 24 * 3600, 24 * 3600, "%a %d"),
    (60 * 60 * 24 * 35, 24 * 3600, 7 * 24 * 3600, 7 * 24 * 3600, None),
    (60 * 60 * 24 * 240, 7 * 24 * 3600, 30 * 24 * 3600, 30 * 24 * 3600, "%b"),
    (float("inf"), 30 * 24 * 3600, 365 * 24 * 3600 // 4, 365 * 24 * 3600 // 4, "%b %Y"),
)


def pick_xgrid(start: int, end: int, week_fmt: str = "Week %V"):
    """``week_fmt`` substitutes the week row's label format (--week-fmt;
    the reference's mutable ``week_fmt[]`` default "Week %V",
    src/rrd_graph.c:90,147)."""
    rng = end - start
    for max_rng, minor, major, lab, fmt in _XLAB:
        if rng <= max_rng:
            return minor, major, lab, week_fmt if fmt is None else fmt
    return _XLAB[-1][1:]


_XGRID_UNITS = {
    "SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400,
    "WEEK": 7 * 86400, "MONTH": 30 * 86400, "YEAR": 365 * 86400,
}


def parse_xgrid_spec(spec: str):
    """--x-grid GTM:GST:MTM:MST:LTM:LST:LPR:LFM (rrd_graph option table):
    minor-grid unit:count, major-grid unit:count, label unit:count,
    label precision (ignored — our labels sit under their tick), and the
    strftime format (which may itself contain ':'). Returns the same
    (minor, major, labstep, fmt) tuple pick_xgrid yields."""
    parts = spec.split(":", 7)
    if len(parts) < 8:
        raise ValueError(
            "bad --x-grid: expected GTM:GST:MTM:MST:LTM:LST:LPR:LFM"
        )
    def _unit(name: str) -> int:
        try:
            return _XGRID_UNITS[name.upper()]
        except KeyError:
            raise ValueError(f"bad --x-grid time unit {name!r}") from None

    minor = _unit(parts[0]) * int(parts[1])
    major = _unit(parts[2]) * int(parts[3])
    lab = _unit(parts[4]) * int(parts[5])
    fmt = parts[7]
    return minor, major, lab, fmt


# ---------------------------------------------------------------------------
# Graph rendering
# ---------------------------------------------------------------------------

DEFAULT_COLORS = {
    # the reference's graph_col defaults (src/rrd_graph.c:187-201)
    "BACK": "#f5f5f5",
    "CANVAS": "#ffffff",
    "SHADEA": "#c0c0c0",
    "SHADEB": "#9f9f9f",
    "GRID": "#90909080",
    "MGRID": "#e0505080",
    "FONT": "#000000",
    "AXIS": "#000000",
    "FRAME": "#000000",
    "ARROW": "#ff0000",
}


def render_graph(
    rows: list,
    elements: list,
    bounds: tuple[float, float],
    start: int,
    end: int,
    width: int = 400,
    height: int = 100,
    title: str = "",
    vertical_label: str = "",
    legend_lines: list | None = None,
    colors: dict | None = None,
    x_grid: bool = True,
    y_grid: bool = True,
    tz_localtime=None,
    rules: list | None = None,
    x_grid_spec: tuple | None = None,
    y_grid_spec: tuple | None = None,
    units_exponent: int | None = None,
    slope_mode: bool = False,
    base: float = 1000.0,
    only_graph: bool = False,
    units_length: int | None = None,
    logarithmic: bool = False,
    full_size: bool = False,
    no_legend: bool = False,
    border: int = 2,
    watermark: str = "",
    backend: str = "png",
    right_axis: tuple[float, float] | None = None,
    right_axis_label: str = "",
    right_axis_format: str | None = None,
    alt_y_grid: bool = False,
    legend_position: str = "south",
    legend_direction: str = "topdown",
    tabwidth: float = 40.0,
    font_scale: int = 1,
    font_px: float | None = None,
    font_render_mode: str = "normal",
    font_smoothing_threshold: float | None = None,
    grid_dash: tuple[float, float] | None = None,
    dynamic_labels: bool = False,
    pango_markup: bool = False,
    no_minor: bool = False,
    week_fmt: str = "Week %V",
    units_si: bool = False,
    axis_format: str | None = None,
    axis_formatter: str = "numeric",
    right_axis_formatter: str = "numeric",
    force_rules_legend: bool = False,
) -> "Canvas":
    """Rasterize a resolved graph.

    ``rows``: list of (ts, plot0, base0, plot1, base1, ...) tuples — the
    collected data_proc frame (driver-side by nature: a graph has at most
    ~width points after the maxrows reduction). ``elements``: the
    GraphElement list (kind/color/width/fraction/legend/stack).
    ``bounds``: final (vmin, vmax) after limits + expand_range.
    ``legend_lines``: extra text lines under the legend (GPRINT output).
    ``rules``: HRULE/VRULE entries ("H"|"V", value-or-ts, color, legend) —
    drawn over the elements, clipped to the plot area, never scaling the
    axes (src/rrd_graph.c:2382-2414 hrule/vrule painting). ``width``/
    ``height`` size the PLOT AREA; the image adds margins — same
    convention as the reference.

    ``right_axis``: (scale, shift) — a SECOND y axis on the right whose
    labels are ``left_value*scale + shift`` at each left grid line; never
    scales the data (src/rrd_graph.c:2567-2652 second_axis label loop,
    :3157-3165 right axis line+arrow, :3625-3627 extra Xylabel width).
    ``right_axis_label``: rotated unit text on the right edge
    (second_axis_legend, src/rrd_graph.c:3233-3241).
    ``right_axis_format``: printf format for the right labels; default
    auto-scales ONE SI magnitude for the whole axis from the mid grid
    value (src/rrd_graph.c:2576-2597).

    ``legend_position`` north|south|west|east and ``legend_direction``
    topdown|bottomup[2] mirror --legend-position/--legend-direction
    (src/rrd_graph.c:3595-3660 layout, :3296-3330 direction): the legend
    block moves above the plot or into a side column, and bottomup
    reverses item order. ``tabwidth`` expands \\t to the next tab stop in
    pixels (gfx_text tabwidth). ``font_scale`` integer-upscales the
    bitmap face and every char-metric-derived margin — the stand-in for
    --font size handling (the reference scales a cairo font face)."""
    import time as _time

    font_scale = max(1, int(font_scale))
    # shadow the module char metrics with the scaled cell size — every
    # margin/label offset below derives from these
    CHAR_W, CHAR_H = 6 * font_scale, 8 * font_scale
    if font_px is not None:
        # AA tier (--font FONTTAG:size:name): the char cell follows the
        # requested pixel size exactly — fractional sizes move the
        # layout, unlike the integer-upscale default — and raster text
        # routes through the coverage rasterizer (Canvas.aa_font below)
        font_px = float(font_px)
        if font_px <= 0:
            font_px = 8.0
        CHAR_H = max(3, int(round(font_px)))
        CHAR_W = max(2, int(round(font_px * 6.0 / 8.0)))
        font_scale = max(1, int(round(font_px / 8.0)))

    if pango_markup:
        # --pango-markup: the bitmap face has no styled variants, so
        # markup renders as its plain text (tags stripped, entities kept)
        import re as _re_mod

        def _strip(s: str) -> str:
            return _re_mod.sub(r"<[^>]*>", "", s)

        title = _strip(title)
        vertical_label = _strip(vertical_label)
        right_axis_label = _strip(right_axis_label)
        watermark = _strip(watermark)
        elements = [
            type(el)(**{**el.__dict__, "legend": _strip(el.legend)})
            for el in elements
        ]
        legend_lines = [_strip(s) for s in (legend_lines or [])]

    def _tabs(s: str) -> str:
        if "\t" not in s:
            return s
        out = []
        for chx in s:
            if chx != "\t":
                out.append(chx)
                continue
            px = len(out) * CHAR_W
            nxt = (int(px / max(tabwidth, 1.0)) + 1) * max(tabwidth, 1.0)
            out.extend(" " * max(1, int(np.ceil((nxt - px) / CHAR_W))))
        return "".join(out)

    col = dict(DEFAULT_COLORS)
    if colors:
        col.update({k.upper(): v for k, v in colors.items()})
    localtime = tz_localtime or _time.gmtime

    vmin, vmax = bounds
    if not np.isfinite(vmin) or not np.isfinite(vmax):
        vmin, vmax = 0.0, 1.0
    elif vmin == vmax:
        # flat series: expand symmetrically around the value so the data
        # stays on-axis (reference identity_function fallback behavior)
        pad = abs(vmin) * 0.1 or 1.0
        vmin, vmax = vmin - pad, vmax + pad
    if logarithmic:
        # log scale needs a positive floor (the reference refuses
        # non-positive bounds; we clamp to 3 decades below the max)
        if vmax <= 0:
            vmax = 1.0
        if vmin <= 0:
            vmin = vmax / 1000.0

    # -- layout ------------------------------------------------------------
    if only_graph:
        # -j: just the data area — no margins, labels, legend, or frame
        no_legend = True
        title = vertical_label = watermark = ""
        border = 0
    if only_graph:
        right_axis = None
        right_axis_label = ""
    lab_chars = units_length if units_length is not None else 7
    left = 0 if only_graph else (
        8 + (2 * CHAR_W if vertical_label else 0) + lab_chars * CHAR_W
    )
    top = 0 if only_graph else 4 + (CHAR_H + 4 if title else 0)
    right = 0 if only_graph else 16
    if right_axis is not None:
        # reserve a right label gutter (the reference widens the image by
        # one more Xylabel, src/rrd_graph.c:3695-3697) + the rotated unit
        right += lab_chars * CHAR_W + (2 * CHAR_W if right_axis_label else 0)
    # unified legend items in draw order: element legends, rule legends,
    # GPRINT/COMMENT lines; bottomup (and bottomup2) reverses
    items: list[tuple[str | None, str, str]] = [] if no_legend else (
        [(el.color, el.legend,
          "line" if el.kind.upper().startswith("LINE") else "box")
         for el in elements if el.legend]
        # out-of-range rule legends are suppressed unless -F
        # (FORCE_RULES_LEGEND, src/rrd_graph.c:2163-2172)
        + [(r[2], r[3], "hrule" if r[0] == "H" else "vrule")
           for r in (rules or [])
           if r[3] and (force_rules_legend or (
               vmin <= r[1] <= vmax if r[0] == "H"
               else start <= r[1] <= end))]
        + [(None, line, "box") for line in (legend_lines or [])]
    )
    if legend_direction.lower().startswith("bottomup"):
        items.reverse()
    legend_pos = (legend_position or "south").lower()
    legend_rows = len(items)
    lb = legend_rows * (CHAR_H + 2)
    side_w = (
        max(len(t) for _c, t, _s in items) * CHAR_W + 24
        if legend_rows and legend_pos in ("west", "east") else 0
    )
    if legend_pos == "north":
        top += lb
    elif legend_pos == "west":
        left += side_w
    elif legend_pos == "east":
        right += side_w
    bottom = 0 if only_graph else (
        CHAR_H + 8 + (lb if legend_pos == "south" else 0) + 6
    )
    if full_size:
        # -D/--full-size-mode: width/height are the FINAL image dims
        # (src/rrd_graph.c full-size handling); shrink the plot area
        W, H = width, height
        width = max(10, W - left - right)
        height = max(10, H - top - bottom)
    else:
        W = left + width + right
        H = top + height + bottom
    canvas_cls = {"svg": SVGCanvas, "eps": DocCanvas, "pdf": DocCanvas}.get(
        backend.lower(), Canvas)
    cv = canvas_cls(W, H, background=col["BACK"])
    cv.font_scale = font_scale
    if font_px is not None:
        if isinstance(cv, Canvas):
            cv.aa_font = {
                "px": font_px,
                "cell_h": CHAR_H,
                "cell_w": CHAR_W,
                "mode": font_render_mode,
                "threshold": font_smoothing_threshold,
            }
        else:
            # vector backends: text is the viewer's face — the size knob
            # passes through as the exact pixel size
            cv.font_px = font_px

    # beveled border (SHADEA top/left, SHADEB bottom/right, --border px)
    if border > 0:
        cv.rect(0, 0, W - 1, border - 1, col["SHADEA"])
        cv.rect(0, 0, border - 1, H - 1, col["SHADEA"])
        cv.rect(0, H - border, W - 1, H - 1, col["SHADEB"])
        cv.rect(W - border, 0, W - 1, H - 1, col["SHADEB"])

    x0, y0 = left, top  # plot-area top-left
    x1, y1 = left + width - 1, top + height - 1
    # layout coordinates for graphv's info keys (rrd_graph_v pushes
    # graph_left/top/width/height + image dims, src/rrd_graph.c:3937-3947)
    cv.graph_box = (x0, y0, width, height)
    cv.rect(x0, y0, x1, y1, col["CANVAS"])

    def xtr(ts: float) -> int:
        return x0 + int(round((ts - start) / max(end - start, 1) * (width - 1)))

    import math as _math

    def ytr(v: float) -> int:
        if logarithmic:
            if v <= 0:
                return y1 + height  # off-canvas (clipped away)
            frac = (_math.log10(v) - _math.log10(vmin)) / (
                _math.log10(vmax) - _math.log10(vmin)
            )
        else:
            frac = (v - vmin) / (vmax - vmin)
        return y1 - int(round(frac * (height - 1)))

    # -- right-axis label formatter (second_axis label loop,
    # src/rrd_graph.c:2567-2652): sval = left*scale + shift; custom printf
    # format wins, else ONE SI magnitude chosen from the mid grid value
    _ra_state: dict = {}

    def _formatter_label(formatter: str, fmt: str | None, raw: float) -> str:
        """timestamp/duration axis label (VALUE_FORMATTER_TIMESTAMP /
        _DURATION, src/rrd_graph.c:2524-2562): strftime / strfduration of
        the RAW axis value, bypassing SI scaling; reference defaults
        default_timestamp_fmt / default_duration_fmt
        (src/rrd_graph.c:255-257)."""
        if formatter == "timestamp":
            try:
                return _time.strftime(
                    fmt or "%Y-%m-%d %H:%M:%S", localtime(int(raw))
                )
            except (OverflowError, OSError, ValueError):
                return f"{raw:f}"
        from rrdtool_1_x_spark.plans.graph import _strfduration

        return _strfduration(fmt or "%H:%02m:%02s", raw)

    def right_label(v: float) -> str:
        scale, shift = right_axis
        sval = v * scale + shift
        if right_axis_formatter in ("timestamp", "duration"):
            return _formatter_label(
                right_axis_formatter, right_axis_format, sval
            )
        if right_axis_format:
            try:
                return right_axis_format % sval
            except TypeError:
                return right_axis_format % (sval, "")
        if logarithmic:
            if units_si:
                mag = max(-6, min(6, int(_math.floor(
                    _math.log10(abs(sval)) / 3)))) if sval > 0 else 0
                return si_label(sval, 1000.0**mag, mag)
            return f"{sval:3.0e}"  # horizontal_log_grid default (%3.0e)
        if "magfact" not in _ra_state:
            mid = (vmin + vmax) / 2.0 * scale + shift
            m = abs(mid) or max(
                abs(vmin * scale + shift), abs(vmax * scale + shift), 1e-300
            )
            mag = int(np.floor(np.log10(m) / 3)) if m > 0 else 0
            _ra_state["mag"] = max(-6, min(6, mag))
            _ra_state["magfact"] = 1000.0 ** _ra_state["mag"]
        return si_label(sval, _ra_state["magfact"], _ra_state["mag"])

    # -- grid stroke: --grid-dash on:off segments every grid line
    # (src/rrd_graph.c:5230-5240 option, gfx_line grid_dash_on/off args)
    def _grid_h(y: int, c: str) -> None:
        if grid_dash is None:
            cv.hline(y, x0, x1, c)
            return
        on, off = max(grid_dash[0], 1.0), max(grid_dash[1], 0.0)
        xx = float(x0)
        while xx <= x1:
            cv.hline(y, int(xx), min(x1, int(xx + on - 1)), c)
            xx += on + off

    def _grid_v(x: int, c: str) -> None:
        if grid_dash is None:
            cv.vline(x, y0, y1, c)
            return
        on, off = max(grid_dash[0], 1.0), max(grid_dash[1], 0.0)
        yy = float(y0)
        while yy <= y1:
            cv.vline(x, int(yy), min(y1, int(yy + on - 1)), c)
            yy += on + off

    # -- grids -------------------------------------------------------------
    if y_grid and logarithmic:
        # decade lines labelled, 2..9 multiples as minor grid
        # (draw_horizontal_grid's logarithmic branch)
        dec = _math.floor(_math.log10(vmin))
        while 10.0**dec <= vmax * 1.001:
            v = 10.0**dec
            if v >= vmin * 0.999:
                y = ytr(max(v, vmin))
                _grid_h(y, col["MGRID"])
                # the reference's horizontal_log_grid has NO formatter
                # switch — primary_axis_formatter/-format only apply to
                # the linear axis (src/rrd_graph.c:2712-2846)
                if units_si:
                    # --units=si: SI ladder labels on the log axis
                    # (horizontal_log_grid FORCE_UNITS_SI branch)
                    mag = max(-6, min(6, int(_math.floor(dec / 3))))
                    lab = si_label(v, 1000.0**mag, mag)
                else:
                    lab = f"{v:3.0e}"  # default %3.0e log label
                cv.text(x0 - 4 - len(lab) * CHAR_W, y - CHAR_H // 2, lab,
                        col["FONT"])
                if right_axis is not None:
                    cv.text(x1 + 8, y - CHAR_H // 2, right_label(v),
                            col["FONT"])
            if not no_minor:
                for m in range(2, 10):
                    v2 = m * 10.0**dec
                    if vmin <= v2 <= vmax:
                        _grid_h(ytr(v2), col["GRID"])
            dec += 1
    elif y_grid:
        alt_fmt = None
        if y_grid_spec is not None:
            # --y-grid grid:label — explicit step + label multiple
            step, labfact = y_grid_spec
            m = max(abs(vmin), abs(vmax), step)
            mag = int(np.floor(np.log10(m) / 3)) if m > 0 else 0
            mag = max(-6, min(6, mag))
            magfact = 1000.0**mag
        elif alt_y_grid:
            # --alt-y-grid (ALTYGRID, src/rrd_graph.c:2362-2414): a
            # decimal ladder sized off the RANGE (5..15 lines), labels in
            # a width/precision-derived %f format instead of SI ladders
            rng = vmax - vmin
            if not (rng > 0) or not np.isfinite(rng):
                rng = 1.0
            step = 10.0 ** _math.floor(_math.log10(rng))
            if step == 0:
                step = 0.1  # "range is one -> 0.1 is reasonable scale"
            if rng / step < 5 and step >= 30:
                step /= 10
            if rng / step > 15:
                step *= 10
            if rng / step > 5:
                labfact = 1
                if rng / step > 8 or step < 1.8 * CHAR_H:
                    labfact = 2
            else:
                step /= 5
                labfact = 5
            mx = max(abs(vmax), abs(vmin))
            decimals = _math.ceil(_math.log10(mx)) if mx > 0 else 1
            if decimals <= 0:
                decimals = 1  # everything small: make place for zero
            fractionals = (
                _math.floor(_math.log10(step * labfact))
                if step * labfact > 0 else 0
            )
            if fractionals < 0:  # small amplitude: fixed decimals
                alt_fmt = f"%{decimals - fractionals + 1}.{-fractionals}f"
            else:
                alt_fmt = f"%{decimals + 1}.0f"
            magfact, mag = 1.0, 0
        else:
            step, labfact, magfact, mag = pick_ygrid(vmin, vmax, height, base)
        if units_exponent is not None:
            # --units-exponent: force the SI magnitude of the labels
            mag = max(-6, min(6, units_exponent // 3))
            magfact = 1000.0**mag
        k = np.ceil(vmin / step)
        i = 0
        while k * step <= vmax + 1e-12:
            v = k * step
            y = ytr(v)
            major = (round(k) % labfact) == 0
            if major or not no_minor:
                _grid_h(y, col["MGRID"] if major else col["GRID"])
            if major:
                if axis_formatter in ("timestamp", "duration"):
                    # formatter labels bypass SI scaling (raw axis value)
                    lab = _formatter_label(axis_formatter, axis_format, v)
                elif axis_format:
                    # --left-axis-format printf on the SI-scaled value
                    # (primary_axis_format branch, src/rrd_graph.c:2493)
                    try:
                        lab = (axis_format % (v / magfact)).strip()
                    except TypeError:
                        lab = (axis_format % (v / magfact, "")).strip()
                else:
                    lab = (alt_fmt % v).strip() if alt_fmt else si_label(
                        v, magfact, mag)
                cv.text(x0 - 4 - len(lab) * CHAR_W, y - CHAR_H // 2, lab, col["FONT"])
                if right_axis is not None:
                    cv.text(x1 + 8, y - CHAR_H // 2, right_label(v),
                            col["FONT"])
            k += 1
            i += 1
    if x_grid:
        minor, major, labstep, fmt = (
            x_grid_spec if x_grid_spec is not None
            else pick_xgrid(start, end, week_fmt)
        )
        t = (start // minor + 1) * minor
        while t <= end:
            x = xtr(t)
            is_major = t % major == 0
            if is_major or not no_minor:
                _grid_v(x, col["MGRID"] if is_major else col["GRID"])
            t += minor
        t = (start // labstep + 1) * labstep
        while t <= end:
            lab = _time.strftime(fmt, localtime(t))
            x = xtr(t)
            cv.text(x - len(lab) * CHAR_W // 2, y1 + 4, lab, col["FONT"])
            t += labstep

    # -- element painting (graph_paint, src/rrd_graph.c:2245-2380) ---------
    cv.clip = (x0, y0, x1, y1)  # confine paint to the plot area
    for i, el in enumerate(elements):
        if el.color is None:
            continue  # colorless elements scale but draw nothing
        kind = el.kind.upper()
        series = [(r[0], r[1 + 2 * i], r[2 + 2 * i]) for r in rows]
        if kind == "STACK":
            kind = "AREA" if i and elements[i - 1].kind.upper() in ("AREA", "STACK") else "LINE"
        if kind == "TICK":
            frac = el.fraction
            for ts, v, _b in series:
                if v is None or not np.isfinite(v) or v == 0:
                    continue
                x = xtr(ts)
                if frac >= 0:
                    cv.vline(x, y1 - int(frac * (height - 1)), y1, el.color)
                else:
                    cv.vline(x, y0, y0 + int(-frac * (height - 1)), el.color)
            continue
        if kind == "AREA":
            for j, (ts, v, b) in enumerate(series):
                if v is None or not np.isfinite(v):
                    continue
                xa = xtr(series[j - 1][0]) + 1 if j else x0
                xb = xtr(ts)
                yv, yb = ytr(v), ytr(b if b is not None else 0.0)
                for x in range(max(x0, xa), min(x1, xb) + 1):
                    if el.color2:
                        # gradient AREA: color at the value edge fading
                        # to color2 downward (gfx_add_rect_fadey)
                        cv.vspan_fade(x, min(yv, yb), max(yv, yb),
                                      el.color, el.color2, el.gradheight)
                    else:
                        cv.vspan(x, yb, yv, el.color)
            continue
        # LINE: step-wise by default (each value holds for its interval,
        # like the reference), straight segments under --slope-mode
        prev = None
        w = el.width
        dstate = [float(el.dash_offset or 0.0)]
        for j, (ts, v, _b) in enumerate(series):
            if v is None or not np.isfinite(v):
                prev = None
                continue
            x_end, yv = xtr(ts), ytr(v)
            if slope_mode:
                if prev is not None:
                    cv.line(prev[0], prev[1], x_end, yv, el.color, w,
                            dashes=el.dashes, dash_state=dstate)
                else:
                    cv.line(x_end, yv, x_end, yv, el.color, w,
                            dashes=el.dashes, dash_state=dstate)
            else:
                x_start = xtr(series[j - 1][0]) if j else x0
                if prev is not None and prev[1] != yv:
                    cv.line(x_start, prev[1], x_start, yv, el.color, w,
                            dashes=el.dashes, dash_state=dstate)
                cv.line(x_start, yv, x_end, yv, el.color, w,
                        dashes=el.dashes, dash_state=dstate)
            prev = (x_end, yv)

    # -- rules (drawn over elements, clipped, non-scaling) -----------------
    for kind, val, rcolor, _rleg in rules or []:
        if kind == "H":
            if vmin <= val <= vmax:
                cv.hline(ytr(val), x0, x1, rcolor)
        else:
            if start <= val <= end:
                cv.vline(xtr(val), y0, y1, rcolor)

    # -- axes + frame ------------------------------------------------------
    cv.clip = None
    if not only_graph:
        cv.hline(y1 + 1, x0 - 4, x1 + 8, col["AXIS"])  # x axis + overshoot
        cv.vline(x0 - 1, y0 - 4, y1 + 4, col["AXIS"])
        # arrow head at x-axis end
        for d in range(3):
            cv.vline(x1 + 5 + d, y1 + 1 - (2 - d), y1 + 1 + (2 - d),
                     col["ARROW"])
        if right_axis is not None:
            # right axis line + up arrow (src/rrd_graph.c:3157-3165)
            cv.vline(x1 + 1, y0 - 4, y1 + 4, col["AXIS"])
            for d in range(3):
                cv.hline(y0 - 5 - d, x1 + 1 - (2 - d), x1 + 1 + (2 - d),
                         col["ARROW"])
        # frame around the plot area (thin)
        for xx in (x0 - 1, x1 + 1):
            cv.vline(xx, y0 - 1, y1 + 1, col["FRAME"])
        for yy in (y0 - 1, y1 + 1):
            cv.hline(yy, x0 - 1, x1 + 1, col["FRAME"])

    # -- text --------------------------------------------------------------
    if title:
        cv.text((W - len(title) * CHAR_W) // 2, 4, _tabs(title), col["FONT"])
    if vertical_label:
        cv.text(6, (H + len(vertical_label) * CHAR_W) // 2, vertical_label,
                col["FONT"], rotate=True)
    if right_axis_label:
        # second_axis_legend, rotated on the right edge
        # (src/rrd_graph.c:3233-3241)
        cv.text(W - 6 - CHAR_H,
                (H + len(right_axis_label) * CHAR_W) // 2,
                right_axis_label, col["FONT"], rotate=True)
    if legend_pos == "north":
        ly, lx = 4 + (CHAR_H + 4 if title else 0), x0
    elif legend_pos == "west":
        ly, lx = y0, 8
    elif legend_pos == "east":
        ly, lx = y0, W - side_w + 8
    else:  # south (default)
        ly, lx = y1 + CHAR_H + 10, x0

    def _swatch(color: str, shape: str) -> None:
        if dynamic_labels and shape == "hrule":
            # [-] a horizontal stroke (src/rrd_graph.c:3383-3390)
            cv.hline(ly + (CHAR_H - 2) // 2, lx - 4, lx + 4, color)
        elif dynamic_labels and shape == "vrule":
            # [|] a vertical stroke
            cv.vline(lx, ly, ly + CHAR_H - 2, color)
        elif dynamic_labels and shape == "line":
            # [/] a diagonal stroke
            cv.line(lx - 4, ly + CHAR_H - 2, lx + 4, ly, color)
        else:
            cv.rect(lx - 4, ly, lx + 4, ly + CHAR_H - 2, color)
            cv.rect(lx - 4, ly, lx + 4, ly, "#000000")
            cv.rect(lx - 4, ly + CHAR_H - 2, lx + 4, ly + CHAR_H - 2,
                    "#000000")

    for lcolor, ltext, lshape in items:
        if lcolor is not None:
            _swatch(lcolor, lshape)
        cv.text(lx + 8, ly, _tabs(ltext), col["FONT"])
        ly += CHAR_H + 2
    if watermark:
        cv.text(W - len(watermark) * CHAR_W - 4, H - CHAR_H - 2, watermark,
                "#808080")
    return cv
