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

__all__ = ["flow_balance", "flow_suspicious_mids", "flow_greedy_peel"]


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


def flow_greedy_peel(
    scores: DataFrame,
    mid: str = "mid",
    score: str = "iscore",
    k_reg: int = 0,
    max_rounds: int = 12,
) -> dict:
    """CubeFlow's greedy block refinement (CubeFlow.py:37-322
    ``__initGreedy``/``__computeScore``): the reference peels ONE
    account at a time off a MinTree to maximize f(S)/|S|; the
    distributed analogue is a Dinkelbach-style ratio peel — each round
    computes the current objective g = sum(score)/(|M| + k_reg) and
    drops every middle with score*(|M|+k_reg) <= sum(score) (i.e.
    score <= g; pure INTEGER comparison when scores are integers, so
    any SQL engine reproduces the rounds bit-for-bit). For this
    linear-fractional objective the iteration converges to the optimal
    block {m : score(m) > g*}; the best-objective round is returned
    (ties -> earliest).

    ``k_reg`` plays the role of the non-middle mode sizes in the
    reference's |S| = |A|+|M|+|C| denominator — without it a static
    per-middle score peels down to the single best account.

    Per round: one 2-scalar agg + one map-side filter; scales as
    O(rounds) scans of the (mid, score) table.
    """
    cur = scores.select(
        F.col(mid).alias("k"), F.col(score).alias("s")
    ).localCheckpoint()
    best_df, best_obj, best_round = None, float("-inf"), -1
    for r in range(max_rounds):
        row = cur.agg(F.sum("s").alias("ts"), F.count(F.lit(1)).alias("n")).collect()[0]
        tot, n = row["ts"], row["n"]
        if not n:
            break
        obj = tot / (n + k_reg)
        if obj > best_obj:
            best_df, best_obj, best_round = cur, obj, r
        nxt = cur.filter(F.col("s") * F.lit(n + k_reg) > F.lit(tot)).localCheckpoint()
        if nxt.count() == n:  # fixpoint: nothing peeled
            break
        cur = nxt
    if best_df is None:  # empty input: no round ever scored
        best_df = cur.limit(0)
    return {
        "nodes": best_df.select(F.col("k").alias(mid), F.col("s").alias(score)),
        "objective": best_obj,
        "round": best_round,
    }
