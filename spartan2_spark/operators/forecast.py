"""Forecasting operators — filling the reference's declared-but-empty
Forecast task (/root/reference/spartan/task/forecast.py:38-41 is a
`pass` stub; the task registry reserves the slot, no model implements
it). The engine ships two real forecasters:

* :func:`ses_forecast` — simple exponential smoothing with a DYADIC
  smoothing constant (alpha = 2^-a). The level recursion truncates to
  ``depth`` lag terms with integer right-shifts (the ewma_dyadic
  discipline), so every forecast is exact integer arithmetic and the
  DuckDB twin replays it value-exactly. SES's h-step forecast is flat
  (the final level), emitted for h = 1..horizon.
* :func:`holt_winters` — additive Holt-Winters (level + trend +
  seasonal) per series, the standard recursions in a per-series
  grouped kernel. Float-sequential (rows-only oracle class, like the
  FFT/DTW kernels); correctness is pytest-proven by recovering a
  planted trend+seasonality to near-zero horizon error.

Scale shape: both are one shuffle on the series key. SES is pure
window expressions (JVM, whole-stage codegen); Holt-Winters uses the
amortized grouped apply (operators/grouped.py) — the parallel unit is
the series, same as every per-series kernel here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ses_forecast", "holt_winters"]


def ses_forecast(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    val_col: str = "v",
    alpha_log2: int = 1,
    depth: int = 16,
    horizon: int = 3,
    order_cols: tuple = (),
) -> DataFrame:
    """Simple-exponential-smoothing forecast, value-exact.

    level_T = sum_j alpha*(1-alpha)^j * y_{T-j} truncated at ``depth``
    terms, with alpha = 2^-alpha_log2 so each term is an integer
    right-shift of the (integer) value column — bit-identical on any
    SQL engine. Emits (key, h, forecast) for h = 1..horizon; SES's
    forecast is constant in h by definition (Hyndman & Athanasopoulos,
    FPP ch. 8.1).
    """
    if alpha_log2 < 1:
        raise ValueError("alpha_log2 >= 1 (alpha = 2^-a must be < 1)")
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    # alpha*(1-alpha)^j for alpha=2^-a: numerator (2^a - 1)^j over
    # 2^(a*(j+1)); for a=1 this is the plain >> (j+1)... keep a=general
    # via iterated shifts only when a == 1, else explicit multiply+shift
    a = alpha_log2
    num = (1 << a) - 1
    # ANSI mode throws on long overflow: bound num^(depth-1) * y
    if num ** max(depth - 1, 0) > 1 << 40:
        raise ValueError(
            f"alpha_log2={alpha_log2} with depth={depth} overflows the "
            "term numerator (num^j * y must stay under 2^63); lower "
            "depth — terms beyond it are < 2^-40 of the signal anyway"
        )

    def term(j: int):
        lagged = F.coalesce(F.lag(val_col, j).over(w), F.lit(0)).cast("long")
        if a == 1:
            return F.shiftright(lagged, j + 1)
        # (num^j * y) >> (a*(j+1)) — num^j fits a long for depth*log2(num) < 63
        return F.shiftright(lagged * F.lit(num**j), a * (j + 1))

    level = sum(term(j) for j in range(depth))
    rn_desc = F.row_number().over(
        Window.partitionBy(key_col).orderBy(
            F.desc(ts_col), *[F.desc(c) for c in order_cols]
        )
    )
    last = (
        df.withColumn("__level", level)
        .withColumn("__rn", rn_desc)
        .filter(F.col("__rn") == 1)
        .select(key_col, F.col("__level").alias("level"))
    )
    return last.select(
        key_col,
        F.explode(F.sequence(F.lit(1), F.lit(horizon))).alias("h"),
        F.col("level").alias("forecast"),
    )


def holt_winters(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    val_col: str = "v",
    season: int = 12,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    horizon: int = 6,
) -> DataFrame:
    """Additive Holt-Winters per series: the classic recursions

        l_t = alpha*(y_t - s_{t-m}) + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
        s_t = gamma*(y_t - l_t) + (1-gamma)*s_{t-m}

    initialized the textbook way (first-season mean level, first-vs-
    second-season average trend, first-season DETRENDED deviations as
    seasonals — without detrending, the within-season trend leaks into
    the seasonal indices and decays only at rate (1-gamma) per season).
    Forecast_h = l_T + h*b_T + s_{T-m+((h-1) mod m)+1}. Emits
    (key, h, forecast). Series shorter than 2*season yield no rows.
    """

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        y = pdf[val_col].to_numpy(np.float64)
        m = season
        if len(y) < 2 * m:
            return pd.DataFrame({"key": [], "h": [], "forecast": []})
        level = y[:m].mean()
        trend = (y[m : 2 * m].mean() - y[:m].mean()) / m
        # level is the season's mean, i.e. the trend line's value at
        # time (m-1)/2: subtract the fitted line from each first-season
        # point so the seasonal indices start trend-free
        s = list(y[:m] - (level + (np.arange(m) - (m - 1) / 2.0) * trend))
        for t in range(m, len(y)):
            s_old = s[t - m]
            l_new = alpha * (y[t] - s_old) + (1 - alpha) * (level + trend)
            trend = beta * (l_new - level) + (1 - beta) * trend
            s.append(gamma * (y[t] - l_new) + (1 - gamma) * s_old)
            level = l_new
        n = len(y)
        fc = [
            level + h * trend + s[n - m + ((h - 1) % m)]
            for h in range(1, horizon + 1)
        ]
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])] * horizon,
                "h": np.arange(1, horizon + 1, dtype=np.int64),
                "forecast": np.array(fc),
            }
        )

    from spartan2_spark.operators.grouped import batched_group_apply

    return batched_group_apply(
        df.select(key_col, ts_col, val_col),
        [key_col],
        kernel,
        "key string, h long, forecast double",
        order=(ts_col,),
    )
