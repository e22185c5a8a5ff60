"""Bucketed co-located join: correctness + the shuffle-free plan property."""

from __future__ import annotations

import pandas as pd
import pytest

from dsm2dtm_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    left = pd.DataFrame({"image_id": [f"img_{i:03d}" for i in range(200)], "w": range(200)})
    right = pd.DataFrame({"image_id": [f"img_{i:03d}" for i in range(0, 200, 2)], "slope": [0.1] * 100})
    write_bucketed(spark.createDataFrame(left), "t_left", "image_id", 8)
    write_bucketed(spark.createDataFrame(right), "t_right", "image_id", 8)
    yield "t_left", "t_right"
    spark.sql("DROP TABLE IF EXISTS t_left")
    spark.sql("DROP TABLE IF EXISTS t_right")


def test_bucketed_join_correct(spark, bucketed_tables):
    l, r = bucketed_tables
    out = bucketed_join(spark, l, r, "image_id")
    assert out.count() == 100
    assert out.filter("w % 2 = 1").count() == 0


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    l, r = bucketed_tables
    # disable broadcast so the planner must choose SMJ, then prove the
    # bucket layout removed both Exchanges
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = bucketed_join(spark, l, r, "image_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
