"""asof_join vs pandas.merge_asof — the semantics reference implementation —
across direction × strict × tolerance, on data with equal-timestamp ties
between left and right."""

from __future__ import annotations

import pandas as pd
import pytest

from airflow_postgres_csv_spark.operators.temporal import asof_join

LEFT = [
    # (id, key, ts_us)
    (1, "a", 1_000_000),
    (2, "a", 2_000_000),
    (3, "a", 2_500_000),
    (4, "b", 1_500_000),
    (5, "b", 9_000_000),
    (6, "c", 4_000_000),  # key with no right rows
]
RIGHT = [
    # (rid, key, ts_us)
    (101, "a", 500_000),
    (102, "a", 2_000_000),  # exact tie with left id=2
    (103, "a", 3_000_000),
    (104, "b", 1_500_000),  # exact tie with left id=4
    (105, "b", 8_000_000),
]


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("strict", [False, True])
@pytest.mark.parametrize("tolerance_us", [None, 1_000_000])
def test_asof_matches_pandas(spark, direction, strict, tolerance_us):
    ldf = spark.createDataFrame(
        [(i, k, ts) for i, k, ts in LEFT], "id long, key string, ts long"
    ).selectExpr("id", "key", "timestamp_micros(ts) AS ts")
    rdf = spark.createDataFrame(
        [(r, k, ts) for r, k, ts in RIGHT], "rid long, key string, ts long"
    ).selectExpr("rid", "key", "timestamp_micros(ts) AS ts")

    got = {
        r.id: r.asof_rid
        for r in asof_join(
            ldf,
            rdf,
            on="key",
            left_ts="ts",
            right_ts="ts",
            right_cols=["rid"],
            strict=strict,
            tolerance_us=tolerance_us,
            direction=direction,
        ).collect()
    }

    lp = pd.DataFrame(LEFT, columns=["id", "key", "ts"]).sort_values("ts")
    rp = pd.DataFrame(RIGHT, columns=["rid", "key", "ts"]).sort_values("ts")
    exp_df = pd.merge_asof(
        lp,
        rp,
        on="ts",
        by="key",
        direction=direction,
        allow_exact_matches=not strict,
        tolerance=tolerance_us,
    )
    exp = {
        int(r.id): (None if pd.isna(r.rid) else int(r.rid))
        for r in exp_df.itertuples()
    }
    assert got == exp, f"direction={direction} strict={strict} tol={tolerance_us}"


def test_asof_rejects_unknown_direction(spark):
    df = spark.createDataFrame([(1, "a", 1)], "id long, key string, ts long")
    with pytest.raises(ValueError, match="direction"):
        asof_join(df, df, on="key", left_ts="ts", right_ts="ts",
                  right_cols=["id"], direction="sideways")
