"""Task facade + PipeLine — the reference's user-facing API surface,
re-expressed over DataFrames.

Reference contract being mirrored (NOT ported):
- ``Task.create(tensor, policy, model_name, **params)`` builds a task
  from a policy enum and dispatches ``run()`` to the model's task
  method (/root/reference/spartan/task/_task.py:40-73,
  task/anomaly_detection.py:20-28, task/summarization.py:20-28).
- Registered policies: AD = {EigenPulse, HoloScope, FlowScope}
  (anomaly_detection.py:38-45), Summarization = {BeatLex, DPGS, kGrass}
  (summarization.py:38-43); Forecast is an EMPTY pass stub in the
  reference (forecast.py:38-41) — this engine registers real
  forecasters (operators/forecast.py: SES + additive Holt-Winters).
- ``PipeLine(data, [(model, params), ...])`` threads each stage's
  output into the next (model/_model.py:123-144).

Here a "model" is a function ``DataFrame -> DataFrame`` (the logical
plan composes lazily; Catalyst optimizes across stage boundaries —
something the reference's eager numpy stages structurally cannot do).
"""

from __future__ import annotations

import enum
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ADPolicy(enum.Enum):
    """Anomaly-detection policies (reference anomaly_detection.py:38-45)."""

    EigenPulse = "eigenpulse"
    HoloScope = "holoscope"
    MonLAD = "monlad"
    IAT = "iat"


class SummarizePolicy(enum.Enum):
    """Summarization policies (reference summarization.py:38-43)."""

    BeatLex = "beatlex"
    DPGS = "dpgs"


class ForePolicy(enum.Enum):
    """Forecast policies — the reference's ForePolicy enum is empty
    (forecast.py:38-41); the engine fills the slot."""

    SES = "ses"
    HoltWinters = "holt_winters"


def _eigenpulse(df: DataFrame, window: str = "2 days", stride: str = "1 day",
                row_col: str = "user_id", col_col: str = "event_type", **kw) -> DataFrame:
    from spartan2_spark.operators.windows import window_spectral_density

    return window_spectral_density(df, window, stride, row_col=row_col, col_col=col_col, **kw)


def _holoscope(df: DataFrame, sink_col: str = "event_type", ts_col: str = "ts",
               value_col: str = "value", bin_seconds: int = 3600, **kw) -> DataFrame:
    from spartan2_spark.operators.anomaly import (
        burst_involvement,
        kl_divergence_per_sink,
        reciprocal_rank_fusion,
    )

    ev = df.withColumn(
        "__rb",
        F.when(F.col(value_col) < 50, 0)
        .when(F.col(value_col) < 100, 1)
        .otherwise(2)
        .cast("long"),
    )
    kl = kl_divergence_per_sink(ev, sink_col, "__rb", n_buckets=3).select(
        sink_col, F.col("kl").alias("s_kl")
    )
    bi = burst_involvement(ev, sink_col, ts_col, bin_seconds).select(
        sink_col, F.col("involv").alias("s_burst")
    )
    return reciprocal_rank_fusion(kl.join(bi, sink_col), sink_col, ["s_kl", "s_burst"])


def _monlad(df: DataFrame, key_col: str = "key", ts_col: str = "ts",
            amount_col: str = "amount", **kw) -> DataFrame:
    from spartan2_spark.operators.windows import zero_out_replay

    return zero_out_replay(
        df.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"),
                  F.col(amount_col).alias("amount")),
        **kw,
    )


def _iat(df: DataFrame, key_col: str = "key", ts_col: str = "ts", **kw) -> DataFrame:
    from spartan2_spark.operators.anomaly import suspicious_keys

    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    return suspicious_keys(counts, "cnt", method=kw.get("method", "iqr"))


def _beatlex(df: DataFrame, **kw) -> DataFrame:
    from spartan2_spark.models.beatlex import summarize

    return summarize(df, **kw)


def _dpgs(df: DataFrame, src: str = "src", dst: str = "dst", **kw) -> DataFrame:
    from spartan2_spark.operators.spectral import summarize_graph_lsh

    return summarize_graph_lsh(df, src=src, dst=dst, **kw)["mdl_gain_bits"]


def _ses(df: DataFrame, **kw) -> DataFrame:
    from spartan2_spark.operators.forecast import ses_forecast

    return ses_forecast(df, **kw)


def _holt_winters(df: DataFrame, **kw) -> DataFrame:
    from spartan2_spark.operators.forecast import holt_winters

    return holt_winters(df, **kw)


_REGISTRY: dict[enum.Enum, Callable[..., DataFrame]] = {
    ADPolicy.EigenPulse: _eigenpulse,
    ADPolicy.HoloScope: _holoscope,
    ADPolicy.MonLAD: _monlad,
    ADPolicy.IAT: _iat,
    SummarizePolicy.BeatLex: _beatlex,
    SummarizePolicy.DPGS: _dpgs,
    ForePolicy.SES: _ses,
    ForePolicy.HoltWinters: _holt_winters,
}


class Task:
    """``Task.create(df, policy, name, **params).run()`` facade."""

    def __init__(self) -> None:
        self.data: DataFrame | None = None
        self.policy: enum.Enum | None = None
        self.model_name: str | None = None
        self.params: dict = {}

    @classmethod
    def create(cls, data: DataFrame, policy: enum.Enum, model_name: str = "", **params) -> "Task":
        """``model_name`` is the reference API's instance LABEL (the
        third positional arg of spartan's Task.create names the model
        instance; the POLICY selects the algorithm) — it never
        dispatches. Kept for signature parity."""
        if policy not in _REGISTRY:
            raise ValueError(f"{policy} Not Supported!")  # _task.py:64 wording
        obj = cls()
        obj.data, obj.policy, obj.model_name, obj.params = data, policy, model_name, params
        return obj

    def run(self, **overrides) -> DataFrame:
        fn = _REGISTRY[self.policy]
        return fn(self.data, **{**self.params, **overrides})

    @classmethod
    def list_models(cls, kind: type[enum.Enum] = ADPolicy) -> list[str]:
        return [m.name for m in kind]


class AnomalyDetection(Task):
    pass


class Summarization(Task):
    pass


class Forecast(Task):
    pass


class PipeLine:
    """Chain of (callable | (policy, params)) stages; each stage's output
    DataFrame feeds the next (reference _model.py:123-144). The chain
    stays ONE lazy logical plan until an action runs."""

    def __init__(self, data: DataFrame, module_list: list, pipe_name: str = "my_pipeline"):
        self.data = data
        self.module_list = module_list
        self.pipe_name = pipe_name

    def run(self) -> DataFrame:
        data = self.data
        for module in self.module_list:
            if callable(module):
                data = module(data)
            else:
                policy, params = module
                data = Task.create(data, policy, **params).run()
        return data
