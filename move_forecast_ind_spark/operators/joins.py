"""Composite join operators Spark lacks as single primitives (SURVEY.md §2.3).

The reference's joins are N+1 point-lookup loops (reference main.py:91-110
via main.py:264,300) — here they're real joins; this module adds the
*harness-coverage* joins: as-of (nearest earlier key) and banded range join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    largest ``right_ts <= left_ts`` within the same ``on`` keys
    (``direction="backward"``, the default) or the smallest
    ``right_ts >= left_ts`` (``direction="forward"`` — the lead-time /
    next-reading variant pandas calls merge_asof(direction='forward')).

    Implementation is the scalable union+window pattern, NOT a per-group
    ``pd.merge_asof``: tag both sides, union, sort within key by (ts, side)
    and carry the last seen right value forward with
    ``last(..., ignorenulls=True)``. One shuffle on the key columns, no
    Python, no broadcast requirement — right side may be arbitrarily large.
    Skewed keys are handled by AQE skew-split since the window partitions by
    the same key the shuffle hashed on.

    Ties (right_ts == left_ts) match, the same contract as DuckDB ASOF JOIN
    and pandas merge_asof(direction='backward').
    """
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    lcols = [c for c in left.columns]
    lschema = left.schema
    rschema = right.schema
    # The right row travels as ONE struct so NULLs inside its value columns
    # survive: filling each value column independently with
    # last(ignorenulls) would pair an older row's non-null value with a
    # newer row's timestamp (diverging from merge_asof / ASOF JOIN).
    rv_struct = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(v).alias(v) for v in right_values],
    )
    # Struct type built from the right schema directly — field types AND
    # nullability mirror what the struct() projection produces, without
    # analyzing a throwaway plan for it (r10 construction-cost pass).
    rv_type = StructType(
        [StructField("__rts", rschema[right_ts].dataType, rschema[right_ts].nullable)]
        + [StructField(v, rschema[v].dataType, rschema[v].nullable) for v in right_values]
    )
    tagged_l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rv_type).alias("__rv"),
    )
    tagged_r = right.select(
        *[F.lit(None).cast(lschema[c].dataType).alias(c) for c in lcols if c not in on],
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        rv_struct.alias("__rv"),
    ).select(*tagged_l.columns)  # align column order for unionByName safety

    unioned = tagged_l.unionByName(tagged_r)
    # Right rows sort BEFORE left rows at equal ts (side 0 < 1) so ties
    # match in BOTH directions; forward is the same carry-last traversal
    # over a descending timeline (no second code path to keep correct).
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    ts_order = F.col("__ts") if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        "__rv_f", F.last("__rv", ignorenulls=True).over(w)
    )
    # Caller-supplied names ride selectExpr backtick-quoted: spaces,
    # hyphens, leading digits and reserved words must parse (ADVICE r10).
    out = filled.filter("__side = 1").selectExpr(
        *[f"`{c}`" for c in lcols],
        *[f"__rv_f.`{v}` AS `{v}{suffix}`" for v in right_values],
        f"__rv_f.__rts AS `{right_ts}{suffix}`",
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    equi: Sequence[str],
    condition: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi + inequality conjunct join. With at least one equi key Spark
    plans a hash/sort-merge join on the key and post-filters the band —
    shuffle ∝ key cardinality, scale-safe. A pure band join (no equi key)
    would fall to broadcast-nested-loop: bucketize first in that case."""
    if equi:
        cond = None
        for k in equi:
            c = left[k] == right[k]
            cond = c if cond is None else (cond & c)
        return left.join(right, cond & condition, how)
    return left.join(right, condition, how)
