"""K4: driver-local HTML chart sinks (reference plots.py — the
``px.bar``/``px.imshow``/``go.Bar`` ``write_html`` chart layer).

The DATA halves of the reference's charts are checked queries
(``heatmap_chart_data``, ``bar_chart_data``, ``color_chart_data``);
this module is only the egress: render an already-aggregated small
result frame as a standalone HTML file — no plotly/browser dependency,
and like K3's ``write_local_csv`` it collects through Arrow, so it is
for small RESULT frames only, never distributed data.

- ``write_html_heatmap`` ≡ plots.py:27-40 (``px.imshow(text_auto=True)``)
- ``write_html_bar``     ≡ plots.py:14-24 (per-class ``px.bar(df, x, y)``)
  and, with ``colors=``, plots.py:43-50 (``go.Bar(marker_color=colors)``)
"""

from __future__ import annotations

import html

from pyspark.sql import DataFrame


def write_html_heatmap(df: DataFrame, path: str, index_col: str) -> None:
    """Render a pivoted matrix DataFrame (one index column + numeric
    value columns) to ``path`` as a self-contained HTML heatmap table.

    Cell backgrounds linearly interpolate white → a fixed accent color
    over the global min/max of all numeric cells (matching px.imshow's
    single shared scale), with the raw value printed in the cell
    (text_auto=True twin). Deterministic output: rows sorted by the
    index column, columns in DataFrame order.
    """
    pdf = df.toPandas().sort_values(index_col).reset_index(drop=True)
    value_cols = [c for c in pdf.columns if c != index_col]
    flat = [float(pdf[c][i]) for c in value_cols for i in range(len(pdf))]
    lo, hi = (min(flat), max(flat)) if flat else (0.0, 1.0)
    span = (hi - lo) or 1.0

    def cell(v: float) -> str:
        t = (float(v) - lo) / span
        # white → #1f77b4 ramp; flip text to white past mid-scale
        r, g, b = (int(255 + (c - 255) * t) for c in (31, 119, 180))
        fg = "#fff" if t > 0.55 else "#000"
        val = f"{v:g}"
        return (
            f'<td style="background:rgb({r},{g},{b});color:{fg};'
            f'text-align:right;padding:2px 6px">{html.escape(val)}</td>'
        )

    head = "".join(
        f"<th>{html.escape(str(c))}</th>" for c in [index_col, *value_cols]
    )
    rows = []
    for i in range(len(pdf)):
        tds = "".join(cell(pdf[c][i]) for c in value_cols)
        rows.append(
            f"<tr><th>{html.escape(str(pdf[index_col][i]))}</th>{tds}</tr>"
        )
    doc = (
        "<!doctype html><meta charset='utf-8'>"
        "<table style='border-collapse:collapse;font:12px monospace'>"
        f"<tr>{head}</tr>{''.join(rows)}</table>"
    )
    with open(path, "w") as f:
        f.write(doc)


def write_html_bar(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    colors: list[str] | None = None,
) -> None:
    """Render an (x, y) result frame to ``path`` as a self-contained
    SVG bar chart — the reference's per-class ``px.bar(df, x=x, y=y)
    .write_html`` (plots.py:23); with ``colors`` a per-bar palette,
    the ``go.Bar(marker_color=colors)`` color plot (plots.py:45-50).

    Deterministic output: bars sorted by the x column, heights scaled
    to the max y over a fixed 640×360 canvas, each bar labeled with its
    category and value. Driver-local egress like the heatmap sink.
    """
    pdf = df.toPandas().sort_values(x).reset_index(drop=True)
    xs = [str(v) for v in pdf[x]]
    ys = [float(v) for v in pdf[y]]
    hi = max([v for v in ys if v > 0], default=1.0)
    w_canvas, h_canvas, margin = 640, 360, 40
    n = max(len(xs), 1)
    slot = (w_canvas - 2 * margin) / n
    bars = []
    for i, (xv, yv) in enumerate(zip(xs, ys)):
        h = (h_canvas - 2 * margin) * max(yv, 0.0) / hi
        x0 = margin + i * slot + slot * 0.1
        y0 = h_canvas - margin - h
        fill = colors[i % len(colors)] if colors else "#1f77b4"
        label = html.escape(xv)
        bars.append(
            f'<rect x="{x0:.1f}" y="{y0:.1f}" width="{slot * 0.8:.1f}" '
            f'height="{h:.1f}" fill="{html.escape(fill)}">'
            f"<title>{label}: {yv:g}</title></rect>"
            f'<text x="{x0 + slot * 0.4:.1f}" y="{h_canvas - margin + 14:.1f}" '
            f'text-anchor="middle" font-size="10">{label}</text>'
            f'<text x="{x0 + slot * 0.4:.1f}" y="{y0 - 3:.1f}" '
            f'text-anchor="middle" font-size="9">{yv:g}</text>'
        )
    axis = (
        f'<line x1="{margin}" y1="{h_canvas - margin}" x2="{w_canvas - margin}" '
        f'y2="{h_canvas - margin}" stroke="#000"/>'
        f'<line x1="{margin}" y1="{margin}" x2="{margin}" '
        f'y2="{h_canvas - margin}" stroke="#000"/>'
        f'<text x="{margin - 4}" y="{margin + 4}" text-anchor="end" '
        f'font-size="10">{hi:g}</text>'
    )
    doc = (
        "<!doctype html><meta charset='utf-8'>"
        f"<svg xmlns='http://www.w3.org/2000/svg' width='{w_canvas}' "
        f"height='{h_canvas}' font-family='monospace'>"
        f"{axis}{''.join(bars)}</svg>"
    )
    with open(path, "w") as f:
        f.write(doc)


def write_dashboard_index(
    path: str,
    rows: list[list[tuple[str, str]]],
    title: str = "Dashboard",
) -> None:
    """K4's final piece: the static dashboard INDEX page embedding the
    chart HTML files — the reference's ``dash.html``/``dash2.html``
    (dash.html:1-78: a flex column of ``.plot_row`` divs, each div an
    ``<embed type="text/html" src=...>`` plus a caption). ``rows`` is a
    list of rows, each a list of ``(relative_src, caption)`` pairs.
    Pure driver-local string assembly — deterministic byte output for a
    given layout, no chart data involved."""
    row_html = []
    for row in rows:
        cells = "".join(
            '<div><embed type="text/html" '
            f'src="{html.escape(src)}"><p>{html.escape(caption)}</p></div>'
            for src, caption in row
        )
        row_html.append(f'<div class="plot_row">{cells}</div>')
    doc = (
        "<!DOCTYPE html>\n<head>\n<meta charset=\"utf-8\">\n"
        f"<title>{html.escape(title)}</title>\n<style>\n"
        "html, body { height: 100%; width: 100%; padding: 0; margin: 0; }\n"
        "main { height: 95%; width: 100%; display: flex;"
        " flex-direction: column; flex: 1; }\n"
        ".plot_row { flex: 1; width: 100%; height: 100%; display: flex; }\n"
        ".plot_row>div { flex: 1; margin: 1em; text-align: center;"
        " font-size: 12px; font-family: sans-serif; }\n"
        "p { margin-left: auto; margin-right: auto; text-align: center; }\n"
        "embed { flex: 1; width: 100%; height: 100%; }\n"
        "</style>\n</head>\n<body>\n<main>\n"
        + "\n".join(row_html)
        + "\n</main>\n</body>\n</html>\n"
    )
    with open(path, "w") as f:
        f.write(doc)
