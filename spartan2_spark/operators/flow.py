"""Multipartite money-flow anomaly scoring (CubeFlow / FlowScope).

Reference semantics being re-expressed (NOT ported):

- CubeFlow (/root/reference/spartan/model/CubeFlow/CubeFlow.py:37-322)
  scores a block of middle accounts M between sources A and sinks C by
  how *balanced* and *concentrated* the money passing through them is:
  the objective is built from ``min(q_in, q_out) - alpha*|q_in - q_out|``
  per (middle, time-bucket) cell (`CubeFlow.py` `__initGreedy`/
  `__computeScore`), maximized by greedy peeling.
- FlowScope (/root/reference/spartan/model/flowscope/, 722 LoC) uses the
  same in/out balance idea over a chain A->M->C of transfer matrices.

The reference peels one account at a time off an in-memory matrix with
a MinTree. A faithful-but-distributed analogue: the balance score is a
pure per-cell aggregate (one hash aggregation per side), and the
"block" is selected by thresholding / top-k on the score instead of
one-at-a-time peeling — identical fixed point for the dominant block,
embarrassingly parallel, no driver loop.

Scale notes: each side is a single partial+final hash agg on
(mid, bucket); the two sides join on (mid, bucket) — both shuffles are
on the same key so AQE coalesces them; no per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["flow_balance", "flow_suspicious_mids"]


def flow_balance(
    am: DataFrame,
    mc: DataFrame,
    mid: str = "mid",
    val: str = "value",
    bucket: str | None = "bucket",
    alpha: float = 0.8,
) -> DataFrame:
    """Per-(middle[, bucket]) flow balance score.

    ``am`` carries transfers INTO each middle account (A->M rows),
    ``mc`` transfers OUT (M->C rows); both need columns ``mid``,
    ``val`` and optionally ``bucket`` (a time bucket).

    Returns (mid[, bucket], q_in, q_out, balance_score) with
    ``balance_score = min(q_in, q_out) - alpha * |q_in - q_out|``
    (CubeFlow.py's per-cell objective term; `alpha` defaults to the
    reference's 0.8).
    """
    keys = [mid] + ([bucket] if bucket else [])
    qin = am.groupBy(*keys).agg(F.sum(F.col(val)).alias("q_in"))
    qout = mc.groupBy(*keys).agg(F.sum(F.col(val)).alias("q_out"))
    j = qin.join(qout, keys, "outer").fillna(0, subset=["q_in", "q_out"])
    return j.withColumn(
        "balance_score",
        F.least("q_in", "q_out")
        - F.lit(alpha) * F.abs(F.col("q_in") - F.col("q_out")),
    )


def flow_suspicious_mids(
    balance: DataFrame,
    mid: str = "mid",
    k: int = 10,
) -> DataFrame:
    """Top-k middle accounts by total balance score across buckets —
    the distributed stand-in for CubeFlow's greedily-kept block."""
    return (
        balance.groupBy(mid)
        .agg(
            F.sum("balance_score").alias("total_score"),
            F.sum("q_in").alias("total_in"),
            F.sum("q_out").alias("total_out"),
        )
        .orderBy(F.desc("total_score"), F.col(mid))
        .limit(k)
    )
