"""Sources & sinks (SURVEY.md §2.1)."""

from .housekeeping import archive_releases
from .registry import (
    load_metric_registry,
    register_metrics,
    resolve_metric_ids,
)
from .reports import (
    og_image_frame,
    render_sparkline_png,
    sitemap_xml,
    write_og_images,
)
from .tables import TABLES, load_table, register_views
from .warc import build_warc, parse_warc_bytes, read_warc

__all__ = [
    "TABLES",
    "archive_releases",
    "build_warc",
    "parse_warc_bytes",
    "read_warc",
    "load_metric_registry",
    "load_table",
    "og_image_frame",
    "register_metrics",
    "register_views",
    "render_sparkline_png",
    "resolve_metric_ids",
    "sitemap_xml",
    "write_og_images",
]
