"""S13 — image/report sinks: OG-image sparkline PNGs and sitemap XML.

The reference renders per-area/metric timeseries graphics as PNG blobs
for social-media OG cards and the landing page
(``despatch_ops_workers/og_images/generate.py``,
``db_etl_homepage_graphs/utils.py:98-262``) and emits a sitemap XML
(``despatch_ops_workers/sitemap/generate.py``) — driver-side
matplotlib/plotly consumers of engine output. SURVEY §2.1 originally
scoped these out; with the engine's own pure-Python PNG encoder
(``functions/multimodal.build_png``) the render becomes a REAL
distributed sink: series are assembled per key with one grouped
aggregation, rasterised inside Arrow batches (no image library, no
driver loop), and written by ``foreachPartition`` — executors write
their own partitions' files, the classic Spark file-sink shape.

The raster is deliberately minimal (filled sparkline on a plain
background) — the point is the distributed render-and-sink plumbing
with a bit-verifiable output: every emitted PNG round-trips through
``_parse_png``, so tests decode what was rendered.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

#: RGB palette: background, series fill, series line.
_BG = (247, 249, 250)
_FILL = (186, 216, 240)
_LINE = (0, 91, 171)


def render_sparkline_png(
    values: list, width: int = 120, height: int = 40, pad: int = 3
) -> bytes:
    """Rasterise a numeric series as a filled sparkline and encode it
    as a real RGB PNG (multimodal.build_png — forward scanline
    filtering, zlib DEFLATE). Deterministic: same series, same bytes.
    NaN/None values interpolate as gaps (column left at background)."""
    import numpy as np

    from ..functions.multimodal import build_png

    if width < 2 * pad + 2 or height < 2 * pad + 2:
        raise ValueError(f"raster {width}x{height} too small for pad {pad}")
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:] = _BG
    xs = [
        (i, float(v))
        for i, v in enumerate(values)
        if v is not None and v == v  # drop None/NaN
    ]
    if xs:
        lo = min(v for _, v in xs)
        hi = max(v for _, v in xs)
        span = (hi - lo) or 1.0
        n = max(len(values) - 1, 1)
        inner_w = width - 2 * pad - 1
        inner_h = height - 2 * pad - 1
        base_y = height - 1 - pad
        for i, v in xs:
            x = pad + round(i * inner_w / n)
            y = pad + round((hi - v) * inner_h / span)
            img[y:base_y + 1, x] = _FILL
            img[y, x] = _LINE
    return build_png(
        width, height, img.reshape(-1), color=2, filters=[0] * height
    )


def og_image_frame(
    df: DataFrame,
    key_cols: tuple = ("areaCode",),
    date_col: str = "date",
    value_col: str = "value",
    width: int = 120,
    height: int = 40,
) -> DataFrame:
    """Distributed OG-image render: one grouped aggregation assembles
    each key's date-ordered series (the only shuffle — keyed on the
    render key, carrying (date, value) pairs), then an Arrow-batched
    mapInPandas rasterises + PNG-encodes per row. Returns
    ``(key_cols..., png binary, n_points)`` — feed ``write_og_images``
    or any binary sink."""
    from collections.abc import Iterator

    import pandas as pd

    series = (
        df.groupBy(*key_cols)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col(date_col).alias("d"),
                                            F.col(value_col).alias("v")))
                ),
                lambda s: s.v,
            ).alias("__series")
        )
    )

    out_schema = (
        ", ".join(f"{c} string" for c in key_cols)
        + ", png binary, n_points int"
    )

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: pdf[c].astype(str) for c in key_cols}
            pngs, npts = [], []
            for series_vals in pdf["__series"]:
                vals = list(series_vals)
                pngs.append(render_sparkline_png(vals, width, height))
                npts.append(len(vals))
            out["png"] = pngs
            out["n_points"] = npts
            yield pd.DataFrame(out)

    return series.mapInPandas(render, out_schema)


def write_og_images(
    images: DataFrame, out_dir: str, key_cols: tuple = ("areaCode",)
) -> int:
    """File sink for ``og_image_frame`` output: executors write their
    own partitions' ``<key>.png`` files (foreachPartition — no driver
    collect). Returns the number of files written."""
    os.makedirs(out_dir, exist_ok=True)
    count = images.sparkSession.sparkContext.accumulator(0)

    def write(rows) -> None:
        for row in rows:
            name = "_".join(str(row[c]) for c in key_cols)
            with open(os.path.join(out_dir, f"{name}.png"), "wb") as fh:
                fh.write(bytes(row["png"]))
            count.add(1)

    images.foreachPartition(write)
    return count.value


def sitemap_xml(paths: list, base_url: str, lastmod: str) -> str:
    """Sitemap XML for the rendered report pages — the reference's
    despatch_ops_workers/sitemap/generate.py surface as a pure
    function (deterministic, sorted)."""
    from xml.sax.saxutils import escape

    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for p in sorted(paths):
        loc = escape(f"{base_url.rstrip('/')}/{p.lstrip('/')}")
        lines.append(
            f"  <url><loc>{loc}</loc>"
            f"<lastmod>{escape(lastmod)}</lastmod></url>"
        )
    lines.append("</urlset>")
    return "\n".join(lines)
