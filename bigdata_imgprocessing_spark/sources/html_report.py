"""K4: driver-local HTML heatmap sink (reference plots.py:27-40,
dash.html:55-78 — the ``px.imshow(...).write_html`` chart layer).

The DATA half of the reference's heatmap (merge per-class frames on the
index column, transpose to class-rows × index-columns) is a checked
query (``heatmap_chart_data``); this module is only the egress: render
an already-pivoted small matrix as a standalone HTML file with an
inline linear color scale — no plotly/browser dependency, and like K3's
``write_local_csv`` it collects through Arrow, so it is for small
RESULT matrices only, never distributed data.
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
