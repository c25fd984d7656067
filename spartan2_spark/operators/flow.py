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

from spartan2_spark.operators.barrier import barrier

__all__ = [
    "flow_balance",
    "flow_suspicious_mids",
    "flow_greedy_peel",
    "flowscope_peel",
]


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
    ).transform(barrier)
    best_df, best_obj, best_round = None, float("-inf"), -1
    for r in range(max_rounds):
        row = cur.agg(F.sum("s").alias("ts"), F.count(F.lit(1)).alias("n")).collect()[0]
        tot, n = row["ts"], row["n"]
        if not n:
            break
        obj = tot / (n + k_reg)
        if obj > best_obj:
            best_df, best_obj, best_round = cur, obj, r
        nxt = cur.filter(F.col("s") * F.lit(n + k_reg) > F.lit(tot)).transform(barrier)
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


def flowscope_peel(
    am: DataFrame,
    mc: DataFrame,
    a: str = "a",
    mid: str = "mid",
    c: str = "c",
    val: str = "value",
    alpha: int = 4,
    max_rounds: int = 8,
) -> dict:
    """FlowScope's coupled two-matrix chain peel
    (/root/reference/spartan/model/flowscope/flowscopeFraudDect.py:
    100-148 ``initGreedy`` priorities, 256-283 ``findmin``, 324-384
    ``fastGreedyDecreasing``): the A->M and M->C transfer matrices are
    peeled JOINTLY — per middle m the flow f_m = min(in_m, out_m) and
    residue q_m = max(in_m, out_m) couple both hops, and the objective
    g(S) = [sum_m f_m - alpha * sum_m |in_m - out_m|] / (|A|+|M|+|C|)
    is maximized over the node sets of all three layers.

    Reference priorities, kept verbatim: A node (1+alpha)*rowsum,
    middle (1+alpha)*f_m - alpha*q_m, C node (1+alpha)*colsum. The
    reference deletes ONE min-priority node per step off a MinTree;
    the distributed analogue batch-peels every node whose priority p
    satisfies p * s <= num (num = current numerator, s = |S|) — the
    Dinkelbach-style threshold under which the reference's single
    deletion raises the average too — and returns the best-objective
    round (ties -> earliest). All arithmetic is INTEGER (alpha integer,
    values integer), so the rounds replay bit-for-bit in any SQL
    engine; the objective alone is a final double division.

    Per round: two hash aggs (in/out per mid), three bounded node-set
    joins, one scalar collect; edges are semi-join filtered and
    barrier()-ed so lineage stays flat. No per-row Python.

    Returns {"nodes": DataFrame(side, node, priority), "objective",
    "round"} for the best round.
    """
    eam = am.select(
        F.col(a).alias("na"), F.col(mid).alias("m"), F.col(val).cast("long").alias("v")
    ).transform(barrier)
    emc = mc.select(
        F.col(mid).alias("m"), F.col(c).alias("nc"), F.col(val).cast("long").alias("v")
    ).transform(barrier)
    set_a = eam.select("na").distinct().transform(barrier)
    set_m = (
        eam.select("m").unionByName(emc.select("m")).distinct().transform(barrier)
    )
    set_c = emc.select("nc").distinct().transform(barrier)

    one_p_a = 1 + alpha
    best_nodes, best_obj, best_round = None, float("-inf"), -1
    prev_sizes = None
    for r in range(max_rounds):
        ins = eam.groupBy("m").agg(F.sum("v").alias("w_in"))
        outs = emc.groupBy("m").agg(F.sum("v").alias("w_out"))
        pm = (
            set_m.join(ins, "m", "left")
            .join(outs, "m", "left")
            .fillna(0, subset=["w_in", "w_out"])
            .select(
                "m",
                (
                    F.lit(one_p_a) * F.least("w_in", "w_out")
                    - F.lit(alpha) * F.greatest("w_in", "w_out")
                ).alias("p"),
            )
            .transform(barrier)
        )
        pa = (
            set_a.join(eam.groupBy("na").agg(F.sum("v").alias("w")), "na", "left")
            .fillna(0, subset=["w"])
            .select("na", (F.lit(one_p_a) * F.col("w")).alias("p"))
            .transform(barrier)
        )
        pc = (
            set_c.join(emc.groupBy("nc").agg(F.sum("v").alias("w")), "nc", "left")
            .fillna(0, subset=["w"])
            .select("nc", (F.lit(one_p_a) * F.col("w")).alias("p"))
            .transform(barrier)
        )
        n_a, n_m, n_c = pa.count(), pm.count(), pc.count()
        if not (n_a and n_m and n_c):
            break
        num = pm.agg(F.sum("p")).first()[0]
        s = n_a + n_m + n_c
        obj = num / s
        if obj > best_obj:
            best_nodes = (
                pa.select(F.lit("A").alias("side"), F.col("na").alias("node"), "p")
                .unionByName(
                    pm.select(F.lit("M").alias("side"), F.col("m").alias("node"), "p")
                )
                .unionByName(
                    pc.select(
                        F.lit("C").alias("side"), F.col("nc").alias("node"), "p"
                    )
                )
            )
            best_obj, best_round = obj, r
        if prev_sizes == (n_a, n_m, n_c) and r > 0:
            break  # fixpoint: the threshold peeled nothing
        prev_sizes = (n_a, n_m, n_c)
        thr = F.col("p") * F.lit(s) > F.lit(num)
        set_a = pa.filter(thr).select("na").transform(barrier)
        set_m = pm.filter(thr).select("m").transform(barrier)
        set_c = pc.filter(thr).select("nc").transform(barrier)
        eam = (
            eam.join(set_a, "na", "left_semi")
            .join(set_m, "m", "left_semi")
            .transform(barrier)
        )
        emc = (
            emc.join(set_m, "m", "left_semi")
            .join(set_c, "nc", "left_semi")
            .transform(barrier)
        )
    if best_nodes is None:
        spark = am.sparkSession
        best_nodes = spark.createDataFrame([], "side string, node long, p long")
    return {"nodes": best_nodes, "objective": best_obj, "round": best_round}
