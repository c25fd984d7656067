"""Behavioral sequence analytics: ordered funnels, cohort retention,
per-group top-k, session paths.

The reference keeps per-user event sequences as in-memory tensors and
walks them imperatively (spartan/tensor/STTensor indexing plus the
IAT model's per-(user, ts) walk, model/iat/iat.py:23-79); a web-scale
engine needs the same "did A happen, then B, then C" questions as
declarative plans.  Everything here is window/aggregation expressions:

- ``funnel_counts``: ordered k-stage funnel in ONE Sort+Exchange — all
  window frames share (partition key, order ts), so Catalyst plans a
  single shuffle + sort and chains the running-min frames inside it.
  Stage membership is the strict-precedence rule: an event counts for
  stage i iff a *qualified* stage-(i-1) event exists strictly earlier
  (``ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING``).
- ``cohort_retention``: first-touch cohorting (min event date per key)
  joined back, then distinct-key counts per (cohort, day offset).  The
  join is key-equi on the fact table's own key — at 10^12 rows it
  co-partitions with the first-touch aggregate, no extra shuffle
  beyond the groupBy.
- ``topk_per_group``: row_number over a *partitioned* window with a
  total-order tie-break — the scalable form of "top n per entity"
  (never a global ORDER BY ... LIMIT, which single-partitions).
- ``session_paths``: event-type journeys per session as '>'-joined
  strings via sort_array(collect_list(struct(...))) — per-session
  arrays are session-bounded, so the collect is safe at scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = [
    "funnel_counts",
    "cohort_retention",
    "topk_per_group",
    "session_paths",
]


def funnel_counts(
    df: DataFrame,
    stages: Sequence[str],
    key: str = "key",
    ts: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: how many distinct keys reached each stage.

    A key reaches stage 0 by emitting a ``stages[0]`` event; it reaches
    stage i>0 by emitting a ``stages[i]`` event STRICTLY AFTER some
    event that qualified for stage i-1.  Ties on ``ts`` are broken by
    requiring strict row precedence (1 PRECEDING frame), matching the
    "conversion cannot be simultaneous with its cause" convention.

    Returns one row per stage: (stage, stage_name, n_keys, conv_pct)
    where conv_pct = n_keys/n_keys(stage 0) as a single exact division.

    Plan shape: every window shares (partitionBy key, orderBy ts,
    tie-break cols) -> ONE Exchange + ONE Sort for all k stages, then a
    hash aggregate.  No self-joins, no per-stage passes over the fact.
    """
    order = [F.col(ts).asc()] + [
        F.col(c).asc() for c in df.columns if c not in (key, ts, type_col)
    ]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cur = df
    qual_col = None
    for i, stage in enumerate(stages):
        is_stage = F.col(type_col) == F.lit(stage)
        if i == 0:
            qualified = is_stage
        else:
            # a strictly-earlier qualified stage-(i-1) event exists
            qualified = is_stage & F.max(F.col(qual_col)).over(w)
        qual_col = f"_q{i}"
        cur = cur.withColumn(qual_col, F.coalesce(qualified, F.lit(False)))
    per_key = cur.groupBy(key).agg(
        *[
            F.max(F.col(f"_q{i}").cast("int")).alias(f"r{i}")
            for i in range(len(stages))
        ]
    )
    counts = per_key.agg(
        *[
            F.sum(F.col(f"r{i}")).cast("long").alias(f"n{i}")
            for i in range(len(stages))
        ]
    )
    rows = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("stage"),
                        F.lit(stages[i]).alias("stage_name"),
                        F.col(f"n{i}").alias("n_keys"),
                    )
                    for i in range(len(stages))
                ]
            )
        ).alias("s")
    ).select("s.*")
    base = rows.filter(F.col("stage") == 0).select(
        F.col("n_keys").alias("_n0")
    )
    return (
        rows.crossJoin(F.broadcast(base))
        .select(
            "stage",
            "stage_name",
            "n_keys",
            # one exact division of two BIGINTs -> deterministic IEEE
            (F.col("n_keys") / F.col("_n0")).alias("conv_rate"),
        )
        .orderBy("stage")
    )


def cohort_retention(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    max_offset_days: int = 28,
) -> DataFrame:
    """First-touch cohort retention: keys grouped by their first event
    date, counted per (cohort_date, day offset) they were active on.

    Returns (cohort_date, offset_days, n_active, retention) with
    retention = n_active / cohort size (offset 0 row) — exact counts,
    single division.
    """
    events = df.select(
        F.col(key).alias("key"), F.to_date(F.col(ts)).alias("d")
    ).distinct()
    first = events.groupBy("key").agg(F.min("d").alias("cohort_date"))
    act = (
        events.join(first, "key")
        .withColumn("offset_days", F.datediff("d", "cohort_date"))
        .filter(F.col("offset_days") <= max_offset_days)
        .groupBy("cohort_date", "offset_days")
        .agg(F.count_distinct("key").alias("n_active"))
    )
    size = act.filter(F.col("offset_days") == 0).select(
        "cohort_date", F.col("n_active").alias("_size")
    )
    return (
        act.join(F.broadcast(size), "cohort_date")
        .select(
            "cohort_date",
            "offset_days",
            "n_active",
            (F.col("n_active") / F.col("_size")).alias("retention"),
        )
        .orderBy("cohort_date", "offset_days")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
) -> DataFrame:
    """Deterministic top-k rows per group via a PARTITIONED window.

    ``order_cols`` must be a total order within each group (pass a
    unique id last) or ranks are nondeterministic.  The window is
    partitioned on ``group_cols`` so the sort parallelizes across the
    shuffle — the 100 TB-safe form of per-entity top-n.
    """
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def session_paths(
    df: DataFrame,
    key: str = "key",
    ts: str = "ts",
    type_col: str = "event_type",
    session_col: str = "session_id",
    top_n: int = 50,
) -> DataFrame:
    """Top event-type journeys: per (key, session) the '>'-joined
    sequence of event types in time order, then path frequencies.

    The per-session collect_list is bounded by session length (gap
    sessionization caps it), so the array aggregate is scale-safe;
    ordering inside the array uses sort_array over (ts, tie, type)
    structs — no window, one aggregation.
    """
    tie = [c for c in df.columns if c not in (key, ts, type_col, session_col)]
    order_struct = F.struct(
        F.col(ts), *[F.col(c) for c in tie], F.col(type_col)
    )
    paths = (
        df.groupBy(key, session_col)
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(order_struct)),
                    lambda s: s[type_col],
                ),
                ">",
            ).alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(top_n)
    )
    return paths


def cooccurrence_lift(
    events: DataFrame,
    user_col: str = "user_id",
    item_col: str = "event_type",
) -> DataFrame:
    """Market-basket lift between behaviors: for each ordered item
    pair (a < b), how much more often do users who do A also do B
    than independence predicts —

        lift = (n_ab * n_users) / (n_a * n_b)

    over DISTINCT (user, item) incidence (repeat events don't inflate
    the association). lift > 1: the behaviors attract; < 1: they
    repel. The segmentation signal funnel/cohort analysis starts from.

    Exactness: all four counts are exact BIGINT distinct aggregates;
    numerator and denominator are exact BIGINT products (bounded by
    users^2 * items — size checked against 2^63 well past 10^8 users);
    lift is ONE IEEE divide.

    Plan shape: one (user, item) dedup aggregate (incidence-sized), a
    self-join ON THE USER for pair counts (items-per-user bounded by
    the item universe, so the expansion is users * items^2 worst
    case, never users^2), one pair aggregate, broadcast joins to the
    per-item counts and the 1-row user total.
    """
    from spartan2_spark.operators.barrier import barrier

    # barrier: the incidence relation feeds the user total, the
    # per-item counts and BOTH self-join sides — checkpoint once
    # (incidence-sized), not four raw re-scans
    inc = events.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("it")
    ).distinct().transform(barrier)
    n_users = inc.select("u").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    per_item = inc.groupBy(F.col("it").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    a, b = inc.alias("a"), inc.alias("b")
    pairs = (
        a.join(b, on="u")
        .where(F.col("a.it") < F.col("b.it"))
        .groupBy(F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    out = (
        pairs.join(
            F.broadcast(
                per_item.withColumnsRenamed({"item": "item_a", "n": "n_a"})
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                per_item.withColumnsRenamed({"item": "item_b", "n": "n_b"})
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n_users))
    )
    return out.select(
        "item_a",
        "item_b",
        "n_a",
        "n_b",
        "n_ab",
        "n_users",
        (
            (F.col("n_ab") * F.col("n_users")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double")
        ).alias("lift"),
    )
