"""Planted-fixture tests for behavioral sequence ops
(operators/funnel.py): ordered funnels, cohort retention, per-group
top-k, session paths."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from spartan2_spark.operators.funnel import (
    cohort_retention,
    funnel_counts,
    session_paths,
    topk_per_group,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def test_funnel_strict_order(spark):
    # u1 completes A>B>C in order; u2 has C BEFORE B (must not convert
    # to stage 2); u3 only reaches A; u4 never signs up (B,C present).
    rows = [
        (1, _ts(1), 1, "A"), (1, _ts(2), 2, "B"), (1, _ts(3), 3, "C"),
        (2, _ts(1), 4, "A"), (2, _ts(2), 5, "C"), (2, _ts(3), 6, "B"),
        (3, _ts(1), 7, "A"),
        (4, _ts(1), 8, "B"), (4, _ts(2), 9, "C"),
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, event_id long, event_type string")
    out = {
        r["stage_name"]: r
        for r in funnel_counts(df, ["A", "B", "C"]).collect()
    }
    assert out["A"]["n_keys"] == 3
    assert out["B"]["n_keys"] == 2  # u1 and u2 (u2's B is after A)
    assert out["C"]["n_keys"] == 1  # only u1: u2's C precedes its B
    assert out["C"]["conv_rate"] == 1 / 3


def test_funnel_simultaneous_not_counted(spark):
    # B at the exact same (ts, tie) ordering position AFTER A in the
    # total order still converts; B strictly before A does not.
    rows = [
        (1, _ts(1), 1, "A"), (1, _ts(1), 2, "B"),  # B after A by tie
        (2, _ts(1), 2, "B"), (2, _ts(1), 3, "A"),  # B before A by tie
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp, event_id long, event_type string")
    out = {r["stage_name"]: r["n_keys"] for r in funnel_counts(df, ["A", "B"]).collect()}
    assert out == {"A": 2, "B": 1}


def test_cohort_retention_exact(spark):
    d0, d1, d7 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 8)
    rows = [
        (1, d0), (1, d1), (1, d7),   # cohort Jan-1, active offsets 0,1,7
        (2, d0), (2, d7),            # cohort Jan-1, offsets 0,7
        (3, d1),                     # cohort Jan-2, offset 0
    ]
    df = spark.createDataFrame(rows, "key long, ts timestamp")
    out = {
        (str(r["cohort_date"]), r["offset_days"]): (r["n_active"], r["retention"])
        for r in cohort_retention(df).collect()
    }
    assert out[("2024-01-01", 0)] == (2, 1.0)
    assert out[("2024-01-01", 1)] == (1, 0.5)
    assert out[("2024-01-01", 7)] == (2, 1.0)
    assert out[("2024-01-02", 0)] == (1, 1.0)
    assert len(out) == 4


def test_topk_per_group_deterministic_ties(spark):
    rows = [(1, 10, 5.0), (1, 11, 5.0), (1, 12, 7.0), (2, 20, 1.0)]
    df = spark.createDataFrame(rows, "g long, id long, v double")
    out = topk_per_group(df, ["g"], [F.desc("v"), F.asc("id")], 2).collect()
    got = sorted((r["g"], r["rank"], r["id"]) for r in out)
    # tie at v=5.0 broken by id asc: id=10 ranks ahead of id=11
    assert got == [(1, 1, 12), (1, 2, 10), (2, 1, 20)]


def test_session_paths_order_and_count(spark):
    rows = [
        (1, _ts(1, 0), 1, "view", 1), (1, _ts(1, 1), 2, "click", 1),
        (1, _ts(5, 0), 3, "view", 2), (1, _ts(5, 1), 4, "click", 2),
        (2, _ts(2, 0), 5, "click", 1), (2, _ts(2, 1), 6, "view", 1),
    ]
    df = spark.createDataFrame(
        rows, "key long, ts timestamp, event_id long, event_type string, session_id long"
    )
    out = [(r["path"], r["n_sessions"]) for r in session_paths(df).collect()]
    assert out == [("view>click", 2), ("click>view", 1)]


def test_session_stats_planted(spark, sf_dir):
    import __spark_entry__ as E

    # contract-level check on real tables: session count matches the
    # sessionize query and durations are non-negative
    s1 = {r.user_id: r for r in E.queries()["session_stats"](spark, sf_dir).collect()}
    s2 = {r.user_id: r.n_sessions for r in E.queries()["sessionize"](spark, sf_dir).collect()}
    assert set(s1) == set(s2)
    for uid, r in s1.items():
        assert r.n_sessions == s2[uid]
        assert r.max_dur_us >= 0 and r.mean_events >= 1.0


def test_cooccurrence_lift_exact(spark):
    """3 users: A&B always co-occur (lift > 1), A&C never (pair
    absent); repeat events don't inflate incidence."""
    import pandas as pd

    from spartan2_spark.operators.funnel import cooccurrence_lift

    rows = [(1, "A"), (1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "C")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type"])
    )
    out = {(r.item_a, r.item_b): r for r in cooccurrence_lift(df).collect()}
    r = out[("A", "B")]
    # n_a=2, n_b=2, n_ab=2, users=3 -> lift = 2*3/(2*2) = 1.5
    assert (r.n_a, r.n_b, r.n_ab, r.n_users) == (2, 2, 2, 3)
    assert abs(r.lift - 1.5) < 1e-15
    assert ("A", "C") not in out  # never co-occur
