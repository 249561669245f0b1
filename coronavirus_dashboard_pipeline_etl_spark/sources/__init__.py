"""Sources & sinks (SURVEY.md §2.1)."""

from .registry import (
    load_metric_registry,
    register_metrics,
    resolve_metric_ids,
)
from .tables import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "load_metric_registry",
    "load_table",
    "register_metrics",
    "register_views",
    "resolve_metric_ids",
]
