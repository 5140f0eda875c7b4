"""Property test: the union+window as-of join must match pandas
merge_asof(direction='backward') on arbitrary keyed time series."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # key
        st.integers(min_value=0, max_value=1000),  # ts
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=25,
)


@given(left_rows=rows_strategy, right_rows=rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_asof_matches_merge_asof(spark, left_rows, right_rows):
    from move_forecast_ind_spark.operators.joins import asof_join

    # unique (key, ts) on the right: with duplicate equal timestamps both
    # implementations tie-break arbitrarily, which is out of contract
    right_map = {(k, t): v for k, t, v in right_rows}
    right_rows = [(k, t, v) for (k, t), v in right_map.items()]
    left_rows = [(i, k, t) for i, (k, t, _) in enumerate(left_rows)]

    left = spark.createDataFrame(
        left_rows or [(0, 0, 0)], "lid long, key long, ts long"
    )
    right = spark.createDataFrame(
        right_rows or [(99, -1, 0)], "key long, ts long, value long"
    )
    if not left_rows:
        left = left.filter("lid < 0")
    if not right_rows:
        right = right.filter("ts > 1000000")

    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts",
        right_values=["value"],
    )
    got = {
        r.lid: (r.value_asof, r.ts_asof)
        for r in out.collect()
    }

    lpdf = pd.DataFrame(left_rows, columns=["lid", "key", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(right_rows, columns=["key", "ts", "value"]).sort_values("ts")
    if len(lpdf) and len(rpdf):
        m = pd.merge_asof(
            lpdf, rpdf, on="ts", by="key", direction="backward",
            suffixes=("", "_r"),
        )
        expected = {
            int(r.lid): (
                None if pd.isna(r.value) else int(r.value),
                None if pd.isna(r.value) else int(r.ts),  # matched right ts <= left ts
            )
            for r in m.itertuples()
        }
        # merge_asof only returns the value; reconstruct matched ts from the
        # right frame for non-null matches
        for r in m.itertuples():
            if not pd.isna(r.value):
                cand = rpdf[(rpdf.key == r.key) & (rpdf.ts <= r.ts)]
                expected[int(r.lid)] = (int(r.value), int(cand.ts.max()))
        assert {k: v for k, v in got.items()} == expected
    else:
        assert all(v == (None, None) for v in got.values()) or not got


def test_asof_null_right_value_stays_null(spark):
    """The matched right row's NULL value must come back as NULL — not an
    older row's non-null value (regression: independent last(ignorenulls)
    fills mixed rows)."""
    from pyspark.sql import functions as F

    from move_forecast_ind_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 1, 25)], "lid long, key long, ts long")
    right = spark.createDataFrame(
        [(1, 10, 5.0), (1, 20, None)], "key long, ts long, value double"
    )
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts",
        right_values=["value"],
    ).collect()
    assert len(out) == 1
    assert out[0].ts_asof == 20
    assert out[0].value_asof is None


@given(left_rows=rows_strategy, right_rows=rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_asof_forward_matches_merge_asof(spark, left_rows, right_rows):
    """direction='forward' (nearest right_ts >= left_ts) against pandas
    merge_asof(direction='forward') — same contract, descending walk."""
    from move_forecast_ind_spark.operators.joins import asof_join

    right_map = {(k, t): v for k, t, v in right_rows}
    right_rows = [(k, t, v) for (k, t), v in right_map.items()]
    left_rows = [(i, k, t) for i, (k, t, _) in enumerate(left_rows)]

    left = spark.createDataFrame(
        left_rows or [(0, 0, 0)], "lid long, key long, ts long"
    )
    right = spark.createDataFrame(
        right_rows or [(99, -1, 0)], "key long, ts long, value long"
    )
    if not left_rows:
        left = left.filter("lid < 0")
    if not right_rows:
        right = right.filter("ts > 1000000")

    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="ts",
        right_values=["value"], direction="forward",
    )
    got = {r.lid: (r.value_asof, r.ts_asof) for r in out.collect()}

    lpdf = pd.DataFrame(left_rows, columns=["lid", "key", "ts"]).sort_values("ts")
    rpdf = pd.DataFrame(right_rows, columns=["key", "ts", "value"]).sort_values("ts")
    if len(lpdf) and len(rpdf):
        m = pd.merge_asof(
            lpdf, rpdf, on="ts", by="key", direction="forward",
            suffixes=("", "_r"),
        )
        expected = {}
        for r in m.itertuples():
            if pd.isna(r.value):
                expected[int(r.lid)] = (None, None)
            else:
                cand = rpdf[(rpdf.key == r.key) & (rpdf.ts >= r.ts)]
                expected[int(r.lid)] = (int(r.value), int(cand.ts.min()))
        assert got == expected
    else:
        assert all(v == (None, None) for v in got.values()) or not got


def test_asof_bad_direction_rejected(spark):
    from move_forecast_ind_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 1, 1)], "lid long, key long, ts long")
    right = spark.createDataFrame([(1, 1, 1)], "key long, ts long, value long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(
            left, right, on=["key"], left_ts="ts", right_ts="ts",
            right_values=["value"], direction="nearest",
        )
