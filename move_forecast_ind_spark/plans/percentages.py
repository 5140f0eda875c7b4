"""The percentage-precompute ETL as ONE join (SURVEY.md §2.3 J4, §3.3).

The reference computes, for every (branch, move_type, month, day), the share
of the branch's daily total that each move type represents — with a 4-level
Python loop over branch × move_type × 12 × 31, two full pandas mask-scans per
combination, a JSON resume checkpoint, and 1000-row upsert batches
(reference precompute_percentages.py:178-233). Complexity O(combos × groups).

Spark-first, the whole job is: two grouped sums, a tiny cross join, and one
left equi-join —

    moves   = facts.groupBy(branch, type, month, day).sum(count)
    totals  = facts.groupBy(branch,       month, day).sum(count)
              WHERE total > 0
    types   = facts.select(type).distinct()          (global, ref :156)
    pct     = (totals × broadcast(types)) LEFT JOIN moves
              ON (branch, move_type, month, day)
              SELECT ..., coalesce(move, 0)/total*100 AS avg_percentage

The cross join reproduces the reference's loop domain exactly: it iterates
ALL (branch × GLOBAL move_types × month × day) combinations and inserts
avg_percentage = 0.0 whenever the branch-day total is positive but that
move type had no moves (pandas ``.sum()`` of an empty mask is 0 —
reference precompute_percentages.py:196-215). An inner join of the two
aggregates would silently drop those zero rows, so serving would fall back
to the month average where the reference answers "0% — predicted 0 moves".

One shuffle per aggregate (map-side partials first) + one join shuffle on
the 4-part key. No loop, no checkpoint (task retry + idempotent overwrite
replace it — SURVEY.md §2.12 R1), no batching (the writer does that). At
100 TB: the move-type dimension is tiny (broadcast), group keys are
(branch≈110 × 12 × 31 × types) ≈ small, so the left join's build side is
broadcastable and AQE demotes the shuffle join to broadcast automatically;
output is a pure function of input, so a full overwrite of the derived
table is the correct "upsert" (S5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.rounding import r2, r4


def compute_percentages(
    facts: DataFrame,
    branch_col: str,
    type_col: str,
    date_col: str,
    count_col: str,
    types_from: DataFrame | None = None,
) -> DataFrame:
    """Derive the (branch, move_type, month, day) percentage table.

    Output columns: branch, move_type, month, day, move_count, total_count,
    avg_percentage — with sums pre-rounded (r2) and the percentage r4'd so
    the result hash-matches an ANSI-SQL oracle computing the same plan.

    ``types_from``: source frame for the GLOBAL move-type domain (defaults
    to ``facts``). Callers that pre-filter ``facts`` to a slice (the
    forecast tail) must pass the unfiltered fact table here — the
    reference's loop domain is the corpus-wide ``sorted(unique())``
    (precompute_percentages.py:156), and a type missing from the slice
    still owes its zero-percentage rows. The domain scan prunes to the
    single type column, so this costs a narrow column scan, not a second
    full-width pass.
    """
    month = F.month(date_col).alias("month")
    day = F.dayofmonth(date_col).alias("day")
    # Three pipelined subtrees over the same scan, NOT a shared materialized
    # pre-aggregate. Round 3 measured the alternatives at sf0.1 (BASELINE.md
    # noise section gives the ±5-7% floor): shared fine-grain aggregate with
    # no materialization = 1.15 s (Catalyst's column pruning differentiates
    # the three consumers, so ReuseExchange never fires and each consumer
    # re-aggregates), checkpoint_parquet(fine) = 1.8 s, localCheckpoint =
    # 1.7 s, per-(b,m,d) map_from_entries lookup = 1.2 s — versus 0.60-0.65 s
    # for this shape with the moves broadcast hint. The whole-stage-codegen'd
    # parallel scans beat every materialization at this data size; on a
    # 100 TB fact table, where a second scan is hours not milliseconds, flip
    # to a checkpointed fine-grain aggregate (see SCALE.md).
    moves = (
        facts.groupBy(
            F.col(branch_col).alias("branch"),
            F.col(type_col).alias("move_type"),
            month,
            day,
        ).agg(r2(F.sum(count_col)).alias("move_count"))
    )
    totals = (
        facts.groupBy(F.col(branch_col).alias("branch"), month, day)
        .agg(r2(F.sum(count_col)).alias("total_count"))
        .filter(F.col("total_count") > 0)  # div-zero guard, reference :209-215
    )
    # The reference's loop domain: every GLOBAL move type for every positive
    # branch-day total — zero-move combos yield avg_percentage = 0.0 rows
    # (reference precompute_percentages.py:156,196-215). NULL move types are
    # excluded from the domain: the reference's sorted(unique()) would crash
    # on them, and a NULL key row could never match the moves join anyway.
    types = (
        (types_from if types_from is not None else facts)
        .select(F.col(type_col).alias("move_type"))
        .filter(F.col(type_col).isNotNull())
        .distinct()
    )
    move_count = F.coalesce(F.col("move_count"), F.lit(0.0))
    # The day-grain aggregate is small by construction (branches × types ×
    # 366); the explicit broadcast skips AQE's demote-and-replan round —
    # measured ~15% off the query wall at sf0.1, and at any scale this join
    # build side stays dimension-sized.
    return (
        totals.crossJoin(F.broadcast(types))
        .join(F.broadcast(moves), on=["branch", "move_type", "month", "day"], how="left")
        .select(
            "branch",
            "move_type",
            "month",
            "day",
            move_count.alias("move_count"),
            "total_count",
            r4(move_count / F.col("total_count") * 100.0).alias(
                "avg_percentage"
            ),
        )
    )


def month_grain_percentages(pct: DataFrame) -> DataFrame:
    """Month-grain fallback table (reference main.py:102-110): the AVG of
    day-grain percentages per (branch, move_type, month).

    Averages the UNROUNDED ratio, not the r4'd avg_percentage: means of
    grid-aligned values land exactly on rounding midpoints, where cross-
    engine summation-order noise (~1e-13) flips the last rounded digit.
    """
    return pct.groupBy("branch", "move_type", "month").agg(
        r4(F.avg(F.col("move_count") / F.col("total_count") * 100.0)).alias(
            "month_avg_percentage"
        )
    )


def write_percentages(pct: DataFrame, path: str) -> None:
    """S5 sink: the derived table is a pure function of its input, so
    overwrite ≡ upsert (no MERGE needed without Delta). Partition by branch
    so the serving-side broadcast read prunes per branch."""
    pct.write.mode("overwrite").partitionBy("branch").parquet(path)


def write_percentages_jdbc(pct: DataFrame, url: str, table: str = "percentages") -> None:
    """S5 sink, JDBC backend: the reference's actual topology (the
    percentage precompute lands in Postgres via executemany batches,
    reference precompute_percentages.py:142,218-228). Executed here
    against embedded Derby (sources.formats.derby_url) — overwrite ≡
    upsert for this derived table exactly as in the parquet sink; Spark
    batches the inserts per partition."""
    from ..sources.formats import jdbc_write

    jdbc_write(pct, url, table, mode="overwrite")
