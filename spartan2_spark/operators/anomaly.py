"""Anomaly-score aggregates (the HoloScope/IAT analytic family,
SURVEY.md 2.4/2.6), as plain relational compositions.

- quantile / sigma outlier bounds + suspicious-entity filter
  (/root/reference/spartan/model/iat/iat.py:115-141)
- KL-divergence of per-sink rating histograms vs global, +1 smoothing
  (model/holoscope/edgepropertyAnalysis.py:216-255)
- reciprocal-rank fusion across score columns (k=60)
  (model/holoscope/holoscopeFraudDect.py:228-255)
- burst peak per key: max-count time bin
  (edgepropertyAnalysis.py:304-320 simplified to its aggregation core)
- densest-subgraph greedy peeling, batch analogue: Charikar-style
  iterative removal of below-average-degree nodes (O(log n) rounds of
  filter+agg instead of the reference's sequential MinTree peeling,
  util/MinTree.py:5-43 — the correct distributed re-expression)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from spartan2_spark.operators.barrier import barrier

__all__ = [
    "iqr_bound",
    "sigma_bound",
    "mad_outliers",
    "seasonal_anomaly",
    "psi_drift",
    "fano_burstiness",
    "burst_islands",
    "suspicious_keys",
    "kl_divergence_per_sink",
    "reciprocal_rank_fusion",
    "rank_sum_fusion",
    "burst_peak",
    "burst_involvement",
    "densest_subgraph_peel",
    "holoscope_greedy_shave",
    "holoscope_spectral_seed",
    "holoscope_shave_spectral",
]


def iqr_bound(df: DataFrame, col: str) -> DataFrame:
    """q75 + 1.5*IQR (iat.py:115-120), exact percentiles."""
    q = F.percentile(F.col(col), F.lit([0.25, 0.75]))
    return df.agg(
        (F.element_at(q, 2) + 1.5 * (F.element_at(q, 2) - F.element_at(q, 1))).alias(
            "bound"
        )
    )


def sigma_bound(df: DataFrame, col: str, k: float = 3.0) -> DataFrame:
    """mean + k*std (population std, matching np.std; iat.py:122-125)."""
    return df.agg((F.avg(col) + k * F.stddev_pop(col)).alias("bound"))


def mad_outliers(
    df: DataFrame,
    key_col: str = "key",
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Median/MAD robust outlier counts per key.

    Breakdown-robust member of the bound family above (the reference's
    iat.py:115-141 offers mean/std and IQR bounds; MAD's 50% breakdown
    point survives the heavy-tailed count distributions those bounds
    are applied to). Values are centi-quantized and doubled so every
    intermediate stays integral-or-half on exact doubles: med2 =
    median(2*q) is an integer-valued double (midpoint of two even
    integers), dev2 = |2q - med2| is integral, and mad2 = median(dev2)
    is at worst half-integral — so the k*1.4826*mad2 threshold compares
    identically on any IEEE engine. Two percentile aggregations (exact,
    sort-based per key) + one count aggregation; all shuffles on key.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        (F.round(F.col(value_col) * 100).cast("bigint") * 2).alias("v2"),
    )
    med = base.groupBy("key").agg(F.percentile("v2", F.lit(0.5)).alias("med2"))
    dev = base.join(med, "key").select(
        "key", "med2", F.abs(F.col("v2") - F.col("med2")).alias("dev2")
    )
    mad = dev.groupBy("key").agg(
        F.count("*").alias("n"),
        F.first("med2").alias("med2"),
        F.percentile("dev2", F.lit(0.5)).alias("mad2"),
    )
    return (
        dev.select("key", "dev2")
        .join(mad, "key")
        .groupBy("key")
        .agg(
            F.first("n").alias("n"),
            (F.first("med2") / 200.0).alias("median"),
            (F.first("mad2") / 200.0).alias("mad"),
            F.sum(
                F.when(F.col("dev2") > k * 1.4826 * F.col("mad2"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


def seasonal_anomaly(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    value_col: str = "value",
    k: float = 3.0,
) -> DataFrame:
    """Seasonal-adjusted k-sigma anomaly counts per key: residuals
    against the hour-of-day profile (timeseries.seasonal_profile's
    baseline), then a population-sigma bound on the residuals — the
    composition that makes sigma_bound usable on strongly diurnal
    series, where raw 3-sigma either misses night-time anomalies or
    flags every rush hour.

    Exactness discipline: centi-quantized values, integer profile sums,
    residuals re-quantized with round() (half-away ties match across
    engines), and the variance formed from integer moments
    n*Σr² - (Σr)² — sqrt is the only float op in the threshold.
    Three hash aggregations + two broadcast-sized joins, all keyed.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.hour(F.col(time_col)).cast("long").alias("hod"),
        F.round(F.col(value_col) * 100).cast("long").alias("v"),
    )
    prof = base.groupBy("key", "hod").agg(
        F.count(F.lit(1)).alias("n_h"), F.sum("v").alias("sv")
    )
    res = base.join(prof, ["key", "hod"]).select(
        "key",
        F.round(F.col("v") - F.col("sv") / F.col("n_h"))
        .cast("long")
        .alias("r"),
    )
    stats = res.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("r").cast("long").alias("sr"),
        F.sum(F.col("r") * F.col("r")).cast("long").alias("srr"),
    )
    s2 = F.col("n") * F.col("srr") - F.col("sr") * F.col("sr")
    flagged = res.join(stats.withColumn("s2", s2).select("key", "n", "s2"), "key")
    return (
        flagged.groupBy("key")
        .agg(
            F.first("n").alias("n"),
            F.round(
                F.sqrt(F.first("s2").cast("double")) / F.first("n") / 100.0,
                8,
            ).alias("sigma"),
            F.sum(
                F.when(
                    F.abs(F.col("r")).cast("double") * F.col("n")
                    > k * F.sqrt(F.col("s2").cast("double")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_anomalies"),
        )
    )


def psi_drift(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    value_col: str = "value",
    n_bins: int = 10,
    bin_width: float = 10.0,
) -> DataFrame:
    """Population Stability Index per key between the first and second
    half of the observed time range — the standard drift monitor for a
    long-running ingest pipeline (is this week's value distribution
    still last week's?). PSI < 0.1 stable, > 0.25 drifted.

    Exactness discipline: fixed-width clamped bins (no quantile
    estimation inside the monitor), integer bin counts, +1 Laplace
    smoothing, and each bin's (p-q)*ln(p/q) term — deterministic per
    bin — is quantized to 1e-8 BEFORE the cross-bin sum, so the final
    aggregation is an order-independent integer sum (a raw double sum
    across bins would be reduction-order-dependent). The time midpoint
    is integer epoch-micros arithmetic.

    Two hash aggregations + a broadcast-sized join on key.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.unix_micros(F.col(time_col).cast("timestamp")).alias("us"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0), F.floor(F.col(value_col) / bin_width).cast("long")
            ),
        ).alias("bin"),
    )
    mid = base.groupBy("key").agg(
        F.expr("(min(us) + max(us)) div 2").alias("mid_us")
    )
    halves = base.join(mid, "key").select(
        "key", "bin", (F.col("us") <= F.col("mid_us")).alias("is_first")
    )
    bins = halves.groupBy("key", "bin").agg(
        F.sum(F.when(F.col("is_first"), 1).otherwise(0)).cast("long").alias("cp"),
        F.sum(F.when(F.col("is_first"), 0).otherwise(1)).cast("long").alias("cq"),
    )
    totals = bins.groupBy("key").agg(
        F.sum("cp").cast("long").alias("np"),
        F.sum("cq").cast("long").alias("nq"),
    )
    p = (F.col("cp") + 1) / (F.col("np") + n_bins)
    q = (F.col("cq") + 1) / (F.col("nq") + n_bins)
    term_q = F.round((p - q) * F.log(p / q) * 1e8).cast("long")
    return (
        bins.join(totals, "key")
        .select("key", "np", "nq", term_q.alias("tq"))
        .groupBy("key")
        .agg(
            F.first("np").alias("n_first"),
            F.first("nq").alias("n_second"),
            (F.sum("tq").cast("long") / 1e8).alias("psi"),
        )
    )


def fano_burstiness(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    grain: str = "minute",
) -> DataFrame:
    """Fano factor (variance/mean of per-interval event counts) per
    key — the dispersion index behind the burst-detection family
    (burst_peak/burst_involvement above find WHERE the burst is; the
    Fano factor says HOW bursty the whole series is: 1 = Poisson,
    >>1 = bursty, <1 = regular).

    Computed over the key's non-empty time buckets from integer
    moments n*Σc² - (Σc)², one fixed-order double division chain at
    the end. Two map-side-combinable hash aggregations.
    """
    b = (
        df.select(
            F.col(key_col).alias("key"),
            F.date_trunc(grain, F.col(time_col)).alias("bucket"),
        )
        .groupBy("key", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return b.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("c").cast("long").alias("total"),
        F.round(
            (
                F.count(F.lit(1)) * F.sum(F.col("c") * F.col("c"))
                - F.sum("c") * F.sum("c")
            ).cast("double")
            / F.count(F.lit(1))
            / F.sum("c"),
            8,
        ).alias("fano"),
    )


def suspicious_keys(
    counts: DataFrame, col: str = "cnt", method: str = "iqr"
) -> DataFrame:
    """Keys whose count exceeds the outlier bound (iat.py:127-141)."""
    bound = iqr_bound(counts, col) if method == "iqr" else sigma_bound(counts, col)
    return counts.crossJoin(F.broadcast(bound)).filter(
        F.col(col) > F.col("bound")
    ).drop("bound")


def kl_divergence_per_sink(
    df: DataFrame,
    sink_col: str,
    bucket_col: str,
    n_buckets: int = 3,
) -> DataFrame:
    """KL(sink histogram || global histogram) with +1 smoothing.

    One groupBy for per-sink bucket counts, one for global, a broadcast
    join, and a sum of p*ln(p/q) terms — all column math.

    Rows with bucket values outside [0, n_buckets) are dropped (the
    reference's ``np.bincount(minlength=n)`` addresses exactly that
    axis); BOTH the per-sink and the global +1-smoothed histograms are
    normalized over the full dense [0, n_buckets) axis, so p and q
    each sum to 1 even when some bucket has zero observations.
    """
    df = df.filter(
        (F.col(bucket_col) >= 0) & (F.col(bucket_col) < n_buckets)
    )
    per = df.groupBy(sink_col, bucket_col).agg(F.count(F.lit(1)).alias("c"))
    # densify buckets per sink so +1 smoothing covers empty buckets
    sinks = per.select(sink_col).distinct()
    buckets = per.sparkSession.range(n_buckets).select(
        F.col("id").cast(per.schema[bucket_col].dataType).alias(bucket_col)
    )
    dense = sinks.crossJoin(F.broadcast(buckets)).join(
        per, [sink_col, bucket_col], "left"
    ).fillna({"c": 0})
    glob = buckets.join(
        df.groupBy(bucket_col).agg(F.count(F.lit(1)).alias("g")),
        bucket_col,
        "left",
    ).fillna({"g": 0})
    gtot = glob.agg(F.sum(F.col("g") + 1).alias("gt"))
    j = (
        dense.join(F.broadcast(glob), bucket_col, "left")
        .fillna({"g": 0})
        .crossJoin(F.broadcast(gtot))
    )
    stot = F.sum(F.col("c") + 1).over(W.partitionBy(sink_col))
    p = (F.col("c") + 1) / stot
    q = (F.col("g") + 1) / F.col("gt")
    return (
        j.withColumn("term", p * F.log(p / q))
        .groupBy(sink_col)
        .agg(F.sum("term").alias("kl"))
    )


def reciprocal_rank_fusion(
    df: DataFrame, key_col: str, score_cols: list[str], k: int = 60
) -> DataFrame:
    """RRF: sum over score columns of 1/(k + rank_desc(score));
    deterministic tie-break by key (the order is total, so rank ==
    row_number and the distributed range-partitioned numbering in
    ``partitioning.global_row_numbers`` computes it without a
    single-partition window — object cardinality is unbounded at the
    100TB scale)."""
    from spartan2_spark.operators.partitioning import global_row_numbers

    out = df
    terms = []
    for c in score_cols:
        out = global_row_numbers(
            out, [F.desc(c), F.asc(key_col)], id_col=f"__r_{c}"
        )
        terms.append(1.0 / (F.lit(k) + F.col(f"__r_{c}")))
    fused = terms[0]
    for t in terms[1:]:
        fused = fused + t
    return out.withColumn("rrf", fused).select(key_col, *score_cols, "rrf")


def rank_sum_fusion(
    df: DataFrame, key_col: str, score_cols: list[str]
) -> DataFrame:
    """HoloScope's other fusion mode (holoscopeFraudDect.py:228-255
    sums scipy ``rankdata`` ranks across property scores before the
    reciprocal-rank variant was added): fused = sum of descending
    ranks, smaller = more suspicious. Same distributed range-
    partitioned numbering as RRF — no single-partition window."""
    from spartan2_spark.operators.partitioning import global_row_numbers

    out = df
    for c in score_cols:
        out = global_row_numbers(
            out, [F.desc(c), F.asc(key_col)], id_col=f"__r_{c}"
        )
    fused = F.col(f"__r_{score_cols[0]}")
    for c in score_cols[1:]:
        fused = fused + F.col(f"__r_{c}")
    return out.withColumn("rank_sum", fused).select(
        key_col, *score_cols, "rank_sum"
    )


def burst_peak(
    df: DataFrame, key_col: str, time_col: str, bin_seconds: int = 3600
) -> DataFrame:
    """Per key: the time bin with the most events (burst apex), with a
    deterministic tie-break on the earlier bin."""
    binned = df.groupBy(
        key_col,
        (F.floor(F.unix_timestamp(time_col) / bin_seconds) * bin_seconds).alias("tbin"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = W.partitionBy(key_col).orderBy(F.desc("cnt"), F.asc("tbin"))
    return (
        binned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(key_col, F.col("tbin").alias("burst_bin"), F.col("cnt").alias("burst_cnt"))
    )


def burst_involvement(
    df: DataFrame, sink_col: str, time_col: str, bin_seconds: int = 3600
) -> DataFrame:
    """Per-sink burst-involvement ratio (reference HoloScope
    edgepropertyAnalysis.py:258-301): find the global peak time bin
    (deterministic tie-break on earlier bin), treat that bin as the
    burst interval, and score each sink by the fraction of its events
    falling inside it. One global agg (broadcast, 1 row) + one
    grouped agg — no shuffle beyond the groupBys.
    """
    tbin = (F.floor(F.unix_timestamp(time_col) / bin_seconds) * bin_seconds).alias(
        "tbin"
    )
    peak = (
        df.groupBy(tbin)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tbin"))
        .limit(1)
        .select(F.col("tbin").alias("burst_start"))
    )
    inside = F.col("__tbin") == F.col("burst_start")
    return (
        df.withColumn("__tbin", tbin)
        .crossJoin(F.broadcast(peak))
        .groupBy(F.col(sink_col))
        .agg(
            F.sum(F.when(inside, 1).otherwise(0)).alias("n_burst"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .withColumn("involv", F.round(F.col("n_burst") / F.col("n_total"), 8))
    )


def holoscope_greedy_shave(
    credits: DataFrame,
    key: str = "user_id",
    credit: str = "credit",
    n_total: int | None = None,
    max_rounds: int = 12,
) -> dict:
    """HoloScope's greedy shaving loop
    (/root/reference/spartan/model/holoscope/holoscopeFraudDect.py:314-394),
    re-expressed as a distributed BATCHED shave: the reference removes
    ONE min-credit user per step via a MinTree and tracks the best
    objective along the way; the batch analogue removes every user at
    or below the current mean credit per round (O(log n) rounds of one
    2-scalar agg + one filter) and tracks the objective per round.

    - ``credits``: per-user suspicious credit (user's edge weights
      dotted with the per-sink suspiciousness scores — the same
      ``graphr[cands] @ bsusps`` the reference seeds its MinTree with,
      holoscopeFraudDect.py:340-345). Integer credits keep every
      comparison engine-portable.
    - Removal rule: drop u iff credit(u) * |A| <= sum_credit(A)
      (i.e. credit <= mean) — pure integer comparison, no float
      thresholds to diverge across engines.
    - Objective per round (maxobjfunc, holoscopeFraudDect.py:214-226
      shape): sum_credit(A) / (n_total + |A|) — one exact IEEE division
      of two integers, identical bits in any engine.

    Returns {'nodes': best round's credit table, 'objective': float,
    'round': int}. Per round only 2 scalars hit the driver; the filter
    is a map-side predicate (no shuffle), so the loop scales as
    O(rounds) scans of a (user, credit) table.
    """
    cur = credits.select(
        F.col(key).alias("k"), F.col(credit).alias("c")
    ).transform(barrier)
    if n_total is None:
        n_total = cur.count()
    best_df, best_obj, best_round = None, float("-inf"), -1
    for r in range(max_rounds):
        row = cur.agg(F.sum("c").alias("sc"), F.count(F.lit(1)).alias("n")).collect()[0]
        sc, n = row["sc"], row["n"]
        if not n:
            break
        obj = sc / (n_total + n)
        if obj > best_obj:
            best_df, best_obj, best_round = cur, obj, r
        cur = cur.filter(F.col("c") * F.lit(n) > F.lit(sc)).transform(barrier)
    if best_df is None:  # empty input: no round ever scored
        best_df = cur.limit(0)
    return {
        "nodes": best_df.select(F.col("k").alias(key), F.col("c").alias(credit)),
        "objective": best_obj,
        "round": best_round,
    }


def densest_subgraph_peel(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 30
) -> dict:
    """Charikar 2-approx densest subgraph by parallel peeling.

    Each round removes every node with degree <= 2*density (instead of
    one min-degree node at a time) — the standard distributed analogue
    of greedy peeling; O(log n) rounds, each one agg + two semi-joins.
    Returns {'density': best, 'rounds': r, 'nodes': node DataFrame}.

    Iterative-plan discipline: every round ends with an EAGER
    ``barrier()`` — without it the logical plan references the
    previous round's plan twice (via the degree table) and grows
    exponentially, and the driver ends up spending minutes in
    ``TreeNode.generateTreeString`` (observed via jstack). Lineage
    truncation per round is the canonical fix for iterative DataFrame
    algorithms.
    """
    cur = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).transform(barrier)
    best_density, best_nodes = -1.0, None
    rounds = 0
    for _ in range(max_rounds):
        n_edges = cur.count()
        if n_edges == 0:
            break
        nodes = (
            cur.select(F.col("s").alias("n"))
            .unionAll(cur.select(F.col("d").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("deg"))
            .transform(barrier)
        )
        n_nodes = nodes.count()
        density = n_edges / n_nodes
        if density > best_density:
            best_density = density
            best_nodes = nodes.select("n")
        keep = nodes.filter(F.col("deg") > 2 * density).select("n")
        nxt = (
            cur.join(keep.withColumnRenamed("n", "s"), "s", "left_semi")
            .join(keep.withColumnRenamed("n", "d"), "d", "left_semi")
            .transform(barrier)
        )
        rounds += 1
        if nxt.count() == n_edges:  # fixpoint (clique-like core)
            cur = nxt
            break
        cur = nxt
    return {"density": best_density, "rounds": rounds, "nodes": best_nodes}


def holoscope_spectral_seed(
    edges: DataFrame,
    src: str = "user_id",
    dst: str = "event_type",
    weight: str | None = None,
    n_iter: int = 8,
) -> DataFrame:
    """HoloScope's SVD fast init (holoscopeFraudDect.py:395-626
    ``initfastgreedy``/``initfastgreedy2D``): the reference scans the
    top singular vectors of the (user x sink) graph, sign-fixes each so
    the dominant direction is positive, and cuts at the 'avg' bound
    1/sqrt(nU) — the resulting level-set is the initial suspect
    candidate set its greedy shaving starts from.

    Engine: the leading vector only (the dominant block) via
    distributed power iteration (spectral.power_iteration — scipy svds
    has no distributed analogue), same sign fix, same 1/sqrt(nU) cut.
    Returns a one-column DataFrame of seed ``src`` nodes.
    """
    import math

    from spartan2_spark.operators.spectral import power_iteration

    res = power_iteration(edges, src=src, dst=dst, weight=weight, n_iter=n_iter)
    u = res["u"]
    n_u = u.count()
    if n_u == 0:
        return u.select(F.col("node").alias(src))
    mm = u.agg(F.max("score").alias("mx"), F.min("score").alias("mn")).first()
    if abs(mm["mx"] or 0.0) < abs(mm["mn"] or 0.0):
        u = u.withColumn("score", -F.col("score"))
    bound = 1.0 / math.sqrt(float(n_u))
    return u.filter(F.col("score") > F.lit(bound)).select(F.col("node").alias(src))


def holoscope_shave_spectral(
    edges: DataFrame,
    credits: DataFrame,
    src: str = "user_id",
    dst: str = "event_type",
    weight: str | None = None,
    key: str = "user_id",
    credit: str = "credit",
    max_rounds: int = 12,
) -> dict:
    """Greedy shaving seeded from the spectral level-set: restrict the
    credit table to :func:`holoscope_spectral_seed`'s candidates (the
    reference starts fastgreedy from the singular-vector cut, NOT from
    all users) and shave. Empty seed falls back to the full credit
    table (the count/IQR-style seed the engine used before the
    spectral init existed).
    """
    seed = holoscope_spectral_seed(edges, src=src, dst=dst, weight=weight)
    seed = seed.withColumnRenamed(src, key).transform(barrier)
    seeded = credits.join(seed, key, "left_semi")
    if seeded.limit(1).count() == 0:
        seeded = credits
    return holoscope_greedy_shave(
        seeded, key=key, credit=credit, max_rounds=max_rounds
    )


def burst_islands(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    grain_seconds: int = 60,
    threshold: int = 2,
) -> DataFrame:
    """Maximal burst runs per key — the gaps-and-islands form of the
    burst family: bucket events on the time grain, keep buckets with
    count >= threshold, and group CONSECUTIVE hot buckets into islands
    (island id = bucket index minus dense rank — constant within a
    run). burst_peak finds the single hottest bin; this finds every
    sustained episode and its length, the shape MonLAD/HoloScope
    credit windows care about.

    Integer bucket indices (epoch seconds div grain) keep the island
    arithmetic exact. One aggregation + one keyed sort window + one
    final aggregation.
    """
    b = (
        df.select(
            F.col(key_col).alias("key"),
            # integer div, not float-divide-then-cast: a double quotient
            # one ulp above the true value would truncate to the wrong
            # bucket
            F.expr(
                f"unix_micros(CAST({time_col} AS TIMESTAMP)) div 1000000"
            ).alias("es"),
        )
        .withColumn("bidx", F.expr(f"es div {grain_seconds}"))
        .groupBy("key", "bidx")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .filter(F.col("c") >= threshold)
    )
    w = W.partitionBy("key").orderBy("bidx")
    isl = b.withColumn(
        "island", F.col("bidx") - F.row_number().over(w)
    )
    runs = isl.groupBy("key", "island").agg(
        F.count(F.lit(1)).cast("long").alias("len_buckets"),
        F.sum("c").cast("long").alias("n_events"),
        F.min("bidx").cast("long").alias("start_bidx"),
    )
    return runs.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_bursts"),
        F.max("len_buckets").cast("long").alias("longest_burst"),
        F.max("n_events").cast("long").alias("max_burst_events"),
        F.min("start_bidx").cast("long").alias("first_burst_bidx"),
    )


def heavy_change_topk(
    df: DataFrame,
    k: int = 20,
    key_col: str = "key",
    time_col: str = "ts",
) -> DataFrame:
    """Heavy-CHANGE detection (the deltoid complement of heavy-hitter
    queries): split the observation span at its midpoint, count each
    key's events in the before/after halves, and return the k keys
    whose absolute count change is largest — "which urls' crawl volume
    moved most", the drift TRIAGE query that psi_drift's distribution
    score doesn't localize to keys.

    Exactness: the midpoint is integer epoch-microsecond arithmetic
    ((min+max) DIV 2 on exact BIGINTs); counts and deltas are BIGINT;
    the top-k order is total (abs delta DESC, delta DESC, key ASC) so
    the cut is deterministic on any engine.

    Plan shape: one 1-row bounds aggregate broadcast onto the scan,
    one hash aggregate on the key, then a global TakeOrderedAndProject
    (k rows per partition shuffle to one reducer — never a full sort).
    """
    bounds = df.agg(
        F.min(F.unix_micros(F.col(time_col).cast("timestamp"))).alias(
            "__lo"
        ),
        F.max(F.unix_micros(F.col(time_col).cast("timestamp"))).alias(
            "__hi"
        ),
    )
    mid = F.expr("(__lo + __hi) div 2")
    counted = (
        df.select(
            F.col(key_col).alias("key"),
            F.unix_micros(F.col(time_col).cast("timestamp")).alias("t_us"),
        )
        .crossJoin(F.broadcast(bounds))
        .groupBy("key")
        .agg(
            F.sum(F.when(F.col("t_us") < mid, 1).otherwise(0))
            .cast("long")
            .alias("cnt_before"),
            F.sum(F.when(F.col("t_us") >= mid, 1).otherwise(0))
            .cast("long")
            .alias("cnt_after"),
        )
        .withColumn("delta", F.col("cnt_after") - F.col("cnt_before"))
    )
    return (
        counted.orderBy(
            F.abs(F.col("delta")).desc(), F.col("delta").desc(),
            F.col("key").asc(),
        )
        .limit(k)
        .select("key", "cnt_before", "cnt_after", "delta")
    )
