from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from spartan2_spark.operators import gapfill as G


@pytest.fixture()
def tier_df(spark):
    # url A: buckets at :00, :03, :05 (gaps at :01,:02,:04); url B solid
    rows = [
        ("A", "2024-01-01 00:00:00", 2, 10.0),
        ("A", "2024-01-01 00:03:00", 1, 40.0),
        ("A", "2024-01-01 00:05:00", 3, 20.0),
        ("B", "2024-01-01 00:00:00", 1, 5.0),
        ("B", "2024-01-01 00:01:00", 1, 7.0),
    ]
    pdf = pd.DataFrame(rows, columns=["url", "bucket_ts", "cnt", "vmean"])
    pdf["bucket_ts"] = pd.to_datetime(pdf["bucket_ts"])
    return None, pdf


def _dense(spark, pdf):
    df = spark.createDataFrame(pdf)
    return G.densify(df, "1m")


def test_densify_introduces_gap_rows(spark, tier_df):
    _, pdf = tier_df
    out = _dense(spark, pdf).toPandas().sort_values(["url", "bucket_ts"])
    assert len(out) == 6 + 2  # A: 00..05 dense, B: 00..01
    gaps = out[out["is_gap"]]
    assert set(zip(gaps["url"], gaps["bucket_ts"].dt.strftime("%M"))) == {
        ("A", "01"),
        ("A", "02"),
        ("A", "04"),
    }


def test_ffill(spark, tier_df):
    _, pdf = tier_df
    out = G.gap_fill(_dense(spark, pdf), ("vmean",), method="ffill").toPandas()
    a = out[out["url"] == "A"].sort_values("bucket_ts")["vmean"].tolist()
    assert a == [10.0, 10.0, 10.0, 40.0, 40.0, 20.0]


def test_interp(spark, tier_df):
    _, pdf = tier_df
    out = G.gap_fill(_dense(spark, pdf), ("vmean",), method="interp").toPandas()
    a = out[out["url"] == "A"].sort_values("bucket_ts")["vmean"].tolist()
    assert a == [10.0, 20.0, 30.0, 40.0, 30.0, 20.0]
    b = out[out["url"] == "B"].sort_values("bucket_ts")["vmean"].tolist()
    assert b == [5.0, 7.0]


def test_interp_leading_trailing(spark):
    # first bucket present-null never happens for tier input, but value col
    # may still be null at the edges after joins; verify backfill/ffill.
    pdf = pd.DataFrame(
        {
            "url": ["A"] * 3,
            "bucket_ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00"]
            ),
            "cnt": [1, 1, 1],
            "vmean": [None, 8.0, None],
        }
    )
    df = spark.createDataFrame(pdf).withColumn("is_gap", F.lit(False))
    out = (
        G.gap_fill(df, ("vmean",), method="interp")
        .toPandas()
        .sort_values("bucket_ts")["vmean"]
        .tolist()
    )
    assert out == [8.0, 8.0, 8.0]
