"""Forecast operators (operators/forecast.py) — the reference's
Forecast task is an empty stub (task/forecast.py:38-41); these prove
the engine's real implementations."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from spartan2_spark.operators.forecast import holt_winters, ses_forecast


def test_holt_winters_recovers_planted_trend_seasonality(spark):
    """y_t = 10 + 0.5t + seasonal(m=12) + tiny noise: horizon-6
    forecasts must extrapolate the plant to <2% relative error."""
    m, n = 12, 120
    rng = np.random.default_rng(4)
    seas = 5.0 * np.sin(2 * np.pi * np.arange(m) / m)
    t = np.arange(n)
    y = 10.0 + 0.5 * t + seas[t % m] + 0.01 * rng.standard_normal(n)
    rows = [("s1", int(i), float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "key string, ts long, v double")
    got = {
        r["h"]: r["forecast"]
        for r in holt_winters(df, season=m, horizon=6).collect()
    }
    for h in range(1, 7):
        truth = 10.0 + 0.5 * (n - 1 + h) + seas[(n - 1 + h) % m]
        assert abs(got[h] - truth) / abs(truth) < 0.02, (h, got[h], truth)


def test_holt_winters_short_series_yields_no_rows(spark):
    df = spark.createDataFrame(
        [("s", i, float(i)) for i in range(10)], "key string, ts long, v double"
    )
    assert holt_winters(df, season=12).count() == 0


def test_ses_forecast_flat_and_exact(spark):
    """SES h-step forecast is flat; the truncated dyadic level equals
    the hand-computed shift sum; constant series forecast the constant
    (up to the 2^-depth truncation tail)."""
    vals = [100, 200, 400, 800]
    df = spark.createDataFrame(
        [("k", i, v) for i, v in enumerate(vals)], "key string, ts long, v long"
    )
    got = ses_forecast(df, depth=4, horizon=3).collect()
    want = sum(v >> (j + 1) for j, v in enumerate(reversed(vals)))
    assert {r["h"] for r in got} == {1, 2, 3}
    assert all(r["forecast"] == want for r in got)

    const = spark.createDataFrame(
        [("c", i, 1024) for i in range(40)], "key string, ts long, v long"
    )
    f = ses_forecast(const, depth=10, horizon=1).collect()[0]["forecast"]
    assert f == sum(1024 >> (j + 1) for j in range(10))  # = 1023


def test_ses_forecast_guards(spark):
    df = spark.createDataFrame([("k", 0, 1)], "key string, ts long, v long")
    with pytest.raises(ValueError, match="alpha_log2"):
        ses_forecast(df, alpha_log2=0)
    with pytest.raises(ValueError, match="overflow"):
        ses_forecast(df, alpha_log2=4, depth=16)
