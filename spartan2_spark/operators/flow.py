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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spartan2_spark.operators.barrier import barrier

__all__ = [
    "flow_balance",
    "flow_suspicious_mids",
    "flow_greedy_peel",
    "flowscope_peel",
    "cubeflow_plus",
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

def cubeflow_plus(
    am: DataFrame,
    mc: DataFrame,
    block_mids: DataFrame,
    mid: str = "mid",
    val: str = "value",
    alpha_num: int = 4,
    alpha_den: int = 5,
    max_node_limit: int = 100,
    max_split_rounds: int = 60,
) -> DataFrame:
    """CubeFlow result post-processing, the Plus variant
    (/root/reference/spartan/model/CubeFlowPlus/CubeFlowPlus.py:14-68,
    res_util.py:20-60 ``divide_connected_conponents``, 363-420
    ``handle_big_graph`` type-1, 305-330
    ``cal_score_from_acc_sparse_fs``): the detected block's induced
    A->M->C flow graph is split into weakly connected components,
    oversized components (more than ``max_node_limit`` middle accounts)
    are broken up by deleting their highest-degree middle account and
    re-running CC, and every resulting component is re-scored with the
    fs objective ((1-alpha)*f - alpha*q) / (|A|+|M|+|C|), f =
    sum_m min(in_m, out_m), q = sum_m |in_m - out_m|.

    Engine re-expression:

    * the block is given as its middle-account set (the reference's
      A/C sets are exactly the incident counterparties of those mids
      in the summed-over-time tensors, which is what the induced edge
      set reproduces);
    * node ids are integer-namespaced (a*3, m*3+1, c*3+2) instead of
      string-prefixed;
    * the big-graph loop runs to the fixpoint (no oversized component
      left) and RAISES past ``max_split_rounds`` — the kcore/ktruss
      discipline: a converged Spark result compared against a
      fixed-unroll twin of >= that depth can only mismatch loudly,
      because extra unrolled rounds are the identity; per round, EVERY
      oversized component drops its max-degree middle (degree =
      incident edge rows, ties -> smallest node id; deterministic,
      engine-portable), where the reference's while-loop handles one
      list entry at a time;
    * alpha is the rational alpha_num/alpha_den so the score numerator
      stays in BIGINT arithmetic with integer (centi) values —
      bit-identical on any SQL engine; only the final division is
      floating.

    Returns (component, n_a, n_m, n_c, f, imbalance, score), score
    descending then component ascending.
    """
    # materialize the (tiny) block set once: every downstream relation
    # fans out from it, and an un-checkpointed block (often a top-k over
    # the full tensor) would be recomputed per consumer
    mids = block_mids.select(F.col(mid).alias("m")).distinct().transform(barrier)
    sub_am = (
        am.join(mids, am[mid] == mids["m"], "left_semi")
        .select(
            (F.col("a") * 3).alias("u"),
            (F.col(mid) * 3 + 1).alias("v"),
            F.col(val).alias("w"),
        )
    )
    sub_mc = (
        mc.join(mids, mc[mid] == mids["m"], "left_semi")
        .select(
            (F.col(mid) * 3 + 1).alias("u"),
            (F.col("c") * 3 + 2).alias("v"),
            F.col(val).alias("w"),
        )
    )
    # edge rows keep multiplicity: the reference's MultiDiGraph degree
    # counts parallel edges
    edges0 = sub_am.unionAll(sub_mc).transform(barrier)

    is_m = lambda col: col % 3 == 1  # noqa: E731

    # The split loop runs on the m-PROJECTED graph: every path between
    # two middles alternates m-(a|c)-m (a/c nodes only ever touch
    # middles), so weak connectivity of the middles equals connectivity
    # of "share an a or c counterparty" — a relation of at most
    # |block|^2 rows instead of the full bipartite edge set. Two
    # loop-invariants make this exact AND cheap: removing a middle
    # never changes another middle's degree (degree = its OWN incident
    # edge rows) and never cuts a projected edge between two remaining
    # middles (projected edges go through a/c, never through another
    # m) — so the projection and the degrees are computed ONCE and the
    # loop touches only the tiny m-relation.
    mdeg0 = (
        edges0.select(F.col("u").alias("node"))
        .unionAll(edges0.select(F.col("v").alias("node")))
        .filter(is_m(F.col("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(barrier)
    )

    def _proj(pair_df, key):
        x = pair_df.select(F.col(key).alias("k"), F.col("m").alias("m1")).distinct()
        y = x.withColumnRenamed("m1", "m2")
        return (
            x.join(y, "k")
            .filter(F.col("m1") < F.col("m2"))
            .select("m1", "m2")
        )

    # derive the projection inputs from the MATERIALIZED edge relation
    # (A->M rows have the middle on v, M->C rows on u) — deriving from
    # sub_am/sub_mc would re-run the induced-subgraph lineage per use
    am_pairs = edges0.filter(is_m(F.col("v"))).select(
        F.col("u").alias("k"), F.col("v").alias("m")
    )
    cm_pairs = edges0.filter(is_m(F.col("u"))).select(
        F.col("v").alias("k"), F.col("u").alias("m")
    )
    mproj = (
        _proj(am_pairs, "k")
        .unionAll(_proj(cm_pairs, "k"))
        .distinct()
        .transform(barrier)
    )
    m_all = mdeg0.select("node")

    # The m-projection is bounded by the BLOCK size (k middles ->
    # <= k^2 pairs + k degrees), not the data size — the documented
    # driver-side-small seam (the reference runs this whole loop in
    # driver networkx). Collect it once and run the split rounds as a
    # union-find in plain python; the heavy relations (induced edges,
    # final full CC, scoring aggregations) stay distributed.
    pairs = [(r["m1"], r["m2"]) for r in mproj.collect()]
    degs = {r["node"]: r["deg"] for r in mdeg0.collect()}

    removed_set: set[int] = set()
    converged = False
    for _ in range(max_split_rounds):
        parent = {n: n for n in degs if n not in removed_set}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for m1, m2 in pairs:
            if m1 in removed_set or m2 in removed_set:
                continue
            r1, r2 = find(m1), find(m2)
            if r1 != r2:
                parent[max(r1, r2)] = min(r1, r2)
        comps: dict[int, list[int]] = {}
        for n in parent:
            comps.setdefault(find(n), []).append(n)
        drop = [
            # max degree, ties -> smallest node id (reference argmax)
            min(members, key=lambda n: (-degs[n], n))
            for members in comps.values()
            if len(members) > max_node_limit
        ]
        if not drop:
            converged = True
            break  # identity rounds from here on (twin-safe)
        removed_set.update(drop)

    edges = edges0
    if removed_set:
        rm = F.array(*[F.lit(int(n)) for n in sorted(removed_set)])
        edges = edges.filter(
            ~F.array_contains(rm, F.col("u")) & ~F.array_contains(rm, F.col("v"))
        ).transform(barrier)

    if not converged:
        raise RuntimeError(
            f"cubeflow_plus split did not converge within "
            f"{max_split_rounds} rounds (each round strictly removes "
            "one middle per oversized component; raise max_split_rounds)"
        )

    # Final components WITHOUT a distributed CC: the converged
    # union-find already holds the middle components, and every a/c
    # node belongs to exactly one of them (an a adjacent to middles of
    # two different components is impossible — the shared counterparty
    # IS a projected edge). Broadcast the tiny m->root map, attach a/c
    # through their edge's middle endpoint, re-key every component by
    # its minimum member node (the reference's min-label convention),
    # and keep isolated nodes as their own singleton components.
    parent = {n: n for n in degs if n not in removed_set}

    def _find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for m1, m2 in pairs:
        if m1 in removed_set or m2 in removed_set:
            continue
        r1, r2 = _find(m1), _find(m2)
        if r1 != r2:
            parent[max(r1, r2)] = min(r1, r2)
    mroot = [(int(n), int(_find(n))) for n in parent]
    spark_ = edges.sparkSession
    root_df = F.broadcast(
        spark_.createDataFrame(mroot or [(int(-1), int(-1))], "node long, root long")
    )
    m_memb = root_df.select("node", "root")
    a_memb = (
        edges.filter(is_m(F.col("v")))
        .join(root_df.withColumnRenamed("node", "v"), "v")
        .select(F.col("u").alias("node"), "root")
        .distinct()
    )
    c_memb = (
        edges.filter(is_m(F.col("u")))
        .join(root_df.withColumnRenamed("node", "u"), "u")
        .select(F.col("v").alias("node"), "root")
        .distinct()
    )
    grouped = m_memb.unionAll(a_memb).unionAll(c_memb)
    labels = grouped.groupBy("root").agg(F.min("node").alias("component"))
    all_nodes = (
        edges0.select(F.col("u").alias("node"))
        .unionAll(edges0.select(F.col("v").alias("node")))
        .distinct()
    )
    removed_lit = (
        F.array(*[F.lit(int(n)) for n in sorted(removed_set)])
        if removed_set
        else F.array().cast("array<bigint>")
    )
    membership = (
        all_nodes.filter(~F.array_contains(removed_lit, F.col("node")))
        .join(grouped, "node", "left")
        .join(labels, "root", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
        .transform(barrier)
    )

    m_nodes = membership.filter(is_m(F.col("node")))
    qin = (
        edges.filter(is_m(F.col("v")))
        .groupBy(F.col("v").alias("node"))
        .agg(F.sum("w").alias("q_in"))
    )
    qout = (
        edges.filter(is_m(F.col("u")))
        .groupBy(F.col("u").alias("node"))
        .agg(F.sum("w").alias("q_out"))
    )
    per_m = (
        m_nodes.join(qin, "node", "left")
        .join(qout, "node", "left")
        .fillna(0, subset=["q_in", "q_out"])
    )
    counts = membership.groupBy("component").agg(
        F.sum((F.col("node") % 3 == 0).cast("long")).alias("n_a"),
        F.sum(is_m(F.col("node")).cast("long")).alias("n_m"),
        F.sum((F.col("node") % 3 == 2).cast("long")).alias("n_c"),
    )
    msums = per_m.groupBy("component").agg(
        F.sum(F.least("q_in", "q_out")).alias("f"),
        F.sum(F.abs(F.col("q_in") - F.col("q_out"))).alias("imbalance"),
    )
    num = (alpha_den - alpha_num) * F.col("f") - alpha_num * F.col("imbalance")
    return (
        counts.join(msums, "component", "left")
        .fillna(0, subset=["f", "imbalance"])
        .select(
            "component",
            "n_a",
            "n_m",
            "n_c",
            "f",
            "imbalance",
            (
                num.cast("double")
                / (alpha_den * (F.col("n_a") + F.col("n_m") + F.col("n_c")))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("component"))
    )

