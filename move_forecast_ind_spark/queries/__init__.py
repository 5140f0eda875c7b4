"""Query registry package — importing this populates the registry."""

from __future__ import annotations

from . import relational  # noqa: F401
from .registry import REGISTRY, all_oracles, all_queries, bench_queries  # noqa: F401

# Further modules (aggregates, joins, windows, setops, pipeline, northstar,
# streaming_q, ml) are imported here as they land.
for _mod in (
    "aggregates",
    "joins",
    "windows",
    "setops",
    "pipeline",
    "northstar",
    "streaming_q",
    "ml",
    "extras",
    "corpus",
    "classic",
    "curation",
    "analytics",
    "linkage",
    "retrieval",
    "evaluation",
    "experiments",
    "diagnostics",
    "advanced",
    "forecast_suite",
    "behavior",
    "features",
):
    try:
        __import__(f"{__name__}.{_mod}")
    except ModuleNotFoundError as e:
        if e.name != f"{__name__}.{_mod}":
            raise
