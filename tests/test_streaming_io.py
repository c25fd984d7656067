from __future__ import annotations

import os

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from spartan2_spark import io as IO
from spartan2_spark.streaming.rollup_stream import (
    run_stream_to_memory,
    stream_rollup,
    stream_running_extremes,
)


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    pdf = pd.DataFrame(
        {
            "url": ["a", "a", "b", "a", "b"],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00:10",
                    "2024-01-01 00:00:40",
                    "2024-01-01 00:00:50",
                    "2024-01-01 00:01:10",
                    "2024-01-01 00:02:05",
                ]
            ),
            "value": [1.0, 3.0, 5.0, 7.0, 9.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)
    return d


def test_stream_rollup(spark, stream_dir):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, stream_dir, schema, fmt="parquet")
    agg = stream_rollup(stream, window="1 minute", watermark="5 minutes")
    # append mode only emits windows older than the advanced watermark;
    # a single availableNow pass never closes them -> use complete mode
    # to observe the aggregation state in the memory sink
    run_stream_to_memory(agg, "rollup_out", "complete")
    out = spark.sql("select * from rollup_out").toPandas()
    got = out.set_index(["url", out.bucket_ts.dt.strftime("%H:%M")])
    assert got.loc[("a", "00:00"), "cnt"] == 2
    assert got.loc[("a", "00:00"), "vsum"] == 4.0
    assert got.loc[("a", "00:01"), "vmax"] == 7.0
    assert got.loc[("b", "00:02"), "vmin"] == 9.0


def test_stream_running_extremes(spark, stream_dir):
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, stream_dir, schema, fmt="parquet").select(
        F.col("url").alias("key"), "value"
    )
    out_stream = stream_running_extremes(stream, "key")
    run_stream_to_memory(out_stream, "extremes_out", "update")
    out = spark.sql(
        """select key, n_events, run_max, run_min, run_sum from (
             select *, row_number() over (partition by key order by n_events desc) rn
             from extremes_out) where rn = 1"""
    ).toPandas().set_index("key")
    assert out.loc["a", "n_events"] == 3
    assert out.loc["a", "run_max"] == 7.0
    assert out.loc["b", "run_sum"] == 14.0


def test_stream_zero_out_matches_batch_replay(spark, tmp_path):
    from spartan2_spark.operators.windows import zero_out_replay
    from spartan2_spark.streaming.rollup_stream import stream_zero_out

    # pump 3x50 (crosses delta_up=100), then drain back to the trough
    amounts = [50.0, 50.0, 50.0, -149.5, 30.0, -29.8, 200.0, -200.0]
    pdf = pd.DataFrame(
        {
            "key": ["acc1"] * 8,
            "ts": pd.to_datetime(
                [f"2024-01-01 00:00:{i:02d}" for i in range(8)]
            ),
            "amount": amounts,
        }
    )
    d = str(tmp_path / "zo_in")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)

    batch = zero_out_replay(
        spark.read.parquet(d), "key", "ts", "amount", delta_up=100.0, epsilon=1.0
    ).toPandas().set_index("key")

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, d, schema, fmt="parquet")
    run_stream_to_memory(stream_zero_out(stream, "key"), "zo_out", "update")
    got = spark.sql(
        """select * from (
             select *, row_number() over (partition by key order by n_events desc) rn
             from zo_out) where rn = 1"""
    ).toPandas().set_index("key")

    assert got.loc["acc1", "n_zero_outs"] == batch.loc["acc1", "n_zero_outs"] == 2
    assert got.loc["acc1", "n_events"] == 8
    assert abs(got.loc["acc1", "balance"] - 0.7) < 1e-9


def test_load_tensor_csv_and_positional_schema(spark, tmp_path):
    p = os.path.join(str(tmp_path), "example.tensor")
    with open(p, "w") as f:
        f.write("# comment line\n1,10,0.5\n2,20,1.5\n3,30,2.5\n")
    df = IO.load_tensor(spark, p, col_idx=[0, 2], col_types=[int, float])
    out = df.toPandas()
    assert list(out.columns) == ["c0", "c1"]
    assert out["c0"].tolist() == [1, 2, 3]
    assert out["c1"].tolist() == [0.5, 1.5, 2.5]
    assert df.schema["c0"].dataType.typeName() == "long"


def test_load_tensor_gz_multifile(spark, tmp_path):
    import gzip

    d = str(tmp_path)
    with gzip.open(os.path.join(d, "part1.tensor.gz"), "wt") as f:
        f.write("1,1\n2,2\n")
    with gzip.open(os.path.join(d, "part2.tensor.gz"), "wt") as f:
        f.write("3,3\n")
    df = IO.load_tensor(spark, d + "/*.tensor.gz", col_idx=[0, 1], col_types=[int, int])
    assert df.count() == 3


def test_dict_list_roundtrip(spark, tmp_path):
    p = os.path.join(str(tmp_path), "dictlist")
    pdf = pd.DataFrame({"k": ["x", "y"], "vals": [[1, 2, 3], [4, 5]]})
    IO.save_dict_list(spark.createDataFrame(pdf), "k", "vals", p)
    back = IO.load_dict_list(spark, p).toPandas().set_index("key")
    assert back.loc["x", "values"].tolist() == ["1", "2", "3"]
    assert back.loc["y", "values"].tolist() == ["4", "5"]


def test_load_file_to_dict_roundtrip(spark, tmp_path):
    from spartan2_spark.io import load_file_to_dict, save_dict_list
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", [1, 2, 3]), ("b", [4])], ["k", "vs"]
    ).select("k", F.transform("vs", lambda x: x.cast("long")).alias("vs"))
    p = str(tmp_path / "dictlist")
    save_dict_list(df, "k", "vs", p)
    d = load_file_to_dict(spark, p)
    assert d == {"a": ["1", "2", "3"], "b": ["4"]}


def test_load_tensor_npy_npz(spark, tmp_path):
    import numpy as np

    a = np.arange(12, dtype=np.float64).reshape(4, 3)
    np.save(str(tmp_path / "m.npy"), a)
    np.savez(str(tmp_path / "m.npz"), a)

    d1 = IO.load_tensor(spark, str(tmp_path / "m.npy")).toPandas()
    assert list(d1.columns) == ["c0", "c1", "c2"] and len(d1) == 4
    assert d1.iloc[3, 2] == 11.0

    d2 = IO.load_tensor(
        spark, str(tmp_path / "m.npz"), col_idx=[1], col_types=[float]
    ).toPandas()
    assert list(d2.columns) == ["c0"]
    assert list(d2["c0"]) == [1.0, 4.0, 7.0, 10.0]


def test_load_histogram(spark, tmp_path):
    from spartan2_spark.io import load_histogram

    p = tmp_path / "hist.txt"
    p.write_text("2,3\n0.0,1.0\n0.0,0.5,1.0\n0,1,7\n1,2,9\n")
    h = load_histogram(spark, str(p))
    assert h["shape"] == [2, 3]
    assert h["ticks"] == [[0.0, 1.0], [0.0, 0.5, 1.0]]
    cells = {tuple(r.coords): r.cnt for r in h["cells"].collect()}
    assert cells == {(0, 1): 7, (1, 2): 9}


def test_stream_rollup_matches_batch_tier(spark, tmp_path):
    """Streaming tier state == batch tier state on the same raw points.

    The stream is forced through multiple micro-batches
    (maxFilesPerTrigger=1 over 6 files), so the windowed aggregation
    must merge partial state across batches; values are integer-valued
    doubles (length(text)), so sums are order-exact and the comparison
    is bit-for-bit."""
    from spartan2_spark.datagen import synth_pages
    from spartan2_spark.operators import rollup as R

    pages = synth_pages(spark, 3000, n_urls=30, days=1)
    pts = R.raw_points(pages)
    d = str(tmp_path / "pts")
    pts.repartition(6).write.parquet(d)

    stored = spark.read.parquet(d)
    stream = IO.load_tensor_stream(
        spark, d, stored.schema, fmt="parquet",
        options={"maxFilesPerTrigger": 1},
    )
    agg = stream_rollup(stream, window="1 minute", watermark="0 seconds")
    run_stream_to_memory(agg, "stream_tier_parity", "complete")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "select url, bucket_ts, cnt, vsum, vmin, vmax from stream_tier_parity"
        ).collect()
    )

    want = sorted(
        tuple(r)
        for r in stored.groupBy(
            "url", F.date_trunc("minute", F.col("ts")).alias("bucket_ts")
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("vsum"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    )
    assert got == want and len(got) > 100


def test_stream_rollup_to_tier_appends_finalized_and_resumes(spark, tmp_path):
    """Continuous aggregates to storage: finalized windows append to the
    dt-partitioned tier table in the batch ladder's LONG-FORMAT
    per-(url, bucket, bin) state schema; a second run over the same
    checkpoint emits only NEW buckets (no double-emission); every
    emitted state row equals the batch rollup of the full input; and
    the batch readers (tier_view) work unchanged on the
    stream-maintained tier."""
    from spartan2_spark.operators import rollup as R
    from spartan2_spark.streaming.rollup_stream import stream_rollup_to_tier

    src = str(tmp_path / "in")
    tier = str(tmp_path / "tier")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            {
                "url": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows]),
                "value": [float(r[2]) for r in rows],
            }
        )
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(src, name)
        )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
        ]
    )

    def run():
        stream = IO.load_tensor_stream(
            spark, src + "/*", schema, fmt="parquet",
            options={"maxFilesPerTrigger": 1},
        )
        stream_rollup_to_tier(
            stream, tier, ckpt, window="1 minute", watermark="1 minute"
        )
        return (
            spark.read.parquet(tier)
            .select("url", "bucket_ts", "bin", "cnt", "vsum", "vmin", "vmax")
            .collect()
        )

    # phase 1: two files; the second advances the watermark past the
    # first file's windows, finalizing them (values 2 and 4 in the same
    # minute exercise the per-bin split: two state rows, one bucket)
    write_batch("f0", [("a", "2024-01-01 00:00:10", 2), ("a", "2024-01-01 00:00:30", 4)])
    write_batch("f1", [("a", "2024-01-01 00:05:00", 6), ("b", "2024-01-01 00:05:30", 8)])
    got1 = sorted(map(tuple, run()))
    b0 = pd.Timestamp("2024-01-01 00:00:00").to_pydatetime()
    assert ("a", b0, 2, 1, 2.0, 2.0, 2.0) in got1
    assert ("a", b0, 4, 1, 4.0, 4.0, 4.0) in got1

    # phase 2: later file arrives; resume from checkpoint finalizes the
    # 00:05 windows without re-emitting 00:00
    write_batch("f2", [("b", "2024-01-01 00:10:00", 1)])
    got2 = sorted(map(tuple, run()))
    assert len(got2) > len(got1)
    keys = [(u, b, bn) for (u, b, bn, *_rest) in got2]
    assert len(keys) == len(set(keys))

    # every emitted state row equals the batch long-format rollup
    pts = spark.read.parquet(src + "/*")
    batch = {
        (r["url"], r["bucket_ts"], r["bin"]): (
            r["cnt"], r["vsum"], r["vmin"], r["vmax"]
        )
        for r in R.rollup_from_points(pts, "1m").collect()
    }
    for u, b, bn, cnt, vsum, vmin, vmax in got2:
        assert batch[(u, b, bn)] == (cnt, vsum, vmin, vmax)

    # batch readers work unchanged on the stream-maintained tier
    view = R.tier_view(spark.read.parquet(tier)).collect()
    per = {(r["url"], r["bucket_ts"]): r for r in view}
    assert per[("a", b0)]["cnt"] == 2 and per[("a", b0)]["vmean"] == 3.0
    assert per[("a", b0)]["p95"] == 4.0


def test_stream_dedup_first_arrival_only(spark, tmp_path):
    import datetime as dt

    from spartan2_spark.streaming.rollup_stream import (
        run_stream_to_memory,
        stream_dedup,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        ("d1", t0, 1),
        ("d2", t0 + dt.timedelta(minutes=1), 2),
        ("d1", t0 + dt.timedelta(minutes=2), 3),   # dup within watermark
        ("d3", t0 + dt.timedelta(minutes=3), 4),
        ("d2", t0 + dt.timedelta(minutes=4), 5),   # dup within watermark
    ]
    src = tmp_path / "in"
    spark.createDataFrame(
        rows, "digest string, ts timestamp, seq long"
    ).coalesce(1).write.parquet(str(src))
    schema = T.StructType(
        [
            T.StructField("digest", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(str(src))
    run_stream_to_memory(stream_dedup(stream), "dedup_out", "append")
    out = spark.sql("select * from dedup_out").toPandas()
    # one row per digest; within one micro-batch Spark keeps an
    # arbitrary-but-single representative per key
    assert sorted(out["digest"]) == ["d1", "d2", "d3"]
    assert len(out) == 3


def test_stream_sessionize_gap_merge(spark, tmp_path):
    import datetime as dt

    from spartan2_spark.streaming.rollup_stream import (
        run_stream_to_memory,
        stream_sessionize,
    )

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=10)),          # session A (2)
        (1, t0 + dt.timedelta(hours=2)),                      # session B (1)
        (2, t0 + dt.timedelta(minutes=5)),                    # session C (1)
    ]
    src = tmp_path / "sess_in"
    spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1)\
        .write.parquet(str(src))
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    stream = spark.readStream.schema(schema).parquet(str(src))
    run_stream_to_memory(
        stream_sessionize(stream, gap="30 minutes"), "sess_out", "complete"
    )
    out = spark.sql("select * from sess_out").toPandas()
    got = {(r.user_id, r.n_events) for r in out.itertuples()}
    assert got == {(1, 2), (1, 1), (2, 1)}
    # session A spans first event -> last event + gap
    a = out[(out.user_id == 1) & (out.n_events == 2)].iloc[0]
    assert (a.session_end - a.session_start).total_seconds() == 40 * 60


def test_stream_zero_out_cfd_matches_batch_replay(spark, tmp_path):
    """CFD variant (ZeroOutCoreCFD semantics): credits pump, debits
    drain, ignored types contribute nothing, and n_credits_in flushes
    the per-cycle pump-credit count at each zero-out. Hand-computed
    fixture + stream/batch parity across multiple keys."""
    from spartan2_spark.operators.windows import zero_out_replay_cfd
    from spartan2_spark.streaming.rollup_stream import stream_zero_out_cfd

    rows = []
    # acc1: credit 120 (P, temp=1), credit 120 (P, temp=2), debit 239
    #   (bal=1 <= eps -> zero-out #1, credits_in=2), ignored 500,
    #   credit 150 (P, temp=1), debit 150 (bal=1, zero-out #2,
    #   credits_in=3), credit 200 (P after last zero-out: NOT counted)
    seq1 = [
        ("purchase", 120.0),
        ("purchase", 120.0),
        ("error", 239.0),
        ("view", 500.0),
        ("purchase", 150.0),
        ("error", 150.0),
        ("purchase", 200.0),
    ]
    # acc2: pump via credits but drain below via one huge CREDIT then a
    #   small debit; only the debit can close the cycle
    seq2 = [("purchase", 150.0), ("error", 100.0), ("error", 49.5)]
    for key, seq in (("acc1", seq1), ("acc2", seq2)):
        for i, (ty, w) in enumerate(seq):
            rows.append((key, pd.Timestamp(f"2024-01-01 00:00:{i:02d}"), ty, w))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "tx_type", "weight"])
    d = str(tmp_path / "zocfd_in")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)

    batch = (
        zero_out_replay_cfd(
            spark.read.parquet(d),
            "key", "ts", "tx_type", "weight",
            source_type="error", des_type="purchase",
            delta_up=100.0, epsilon=1.0,
        )
        .toPandas()
        .set_index("key")
    )
    assert batch.loc["acc1", "n_events"] == 6  # 'view' ignored
    assert batch.loc["acc1", "n_zero_outs"] == 2
    assert batch.loc["acc1", "n_credits_in"] == 3
    assert abs(batch.loc["acc1", "final_balance"] - 201.0) < 1e-9
    assert batch.loc["acc2", "n_zero_outs"] == 1
    assert abs(batch.loc["acc2", "final_balance"] - 0.5) < 1e-9

    # streaming parity: pre-map types to (amount, is_credit) as the
    # operator documents, then compare final state per key
    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("tx_type", T.StringType()),
            T.StructField("weight", T.DoubleType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, d, schema, fmt="parquet")
    mapped = stream.where(F.col("tx_type").isin("error", "purchase")).select(
        "key",
        "ts",
        F.when(F.col("tx_type") == "purchase", F.col("weight"))
        .otherwise(-F.col("weight"))
        .alias("amount"),
        (F.col("tx_type") == "purchase").alias("is_credit"),
    )
    run_stream_to_memory(
        stream_zero_out_cfd(mapped, "key", delta_up=100.0, epsilon=1.0),
        "zocfd_out",
        "update",
    )
    got = spark.sql(
        """select * from (
             select *, row_number() over (partition by key order by n_events desc) rn
             from zocfd_out) where rn = 1"""
    ).toPandas().set_index("key")
    for key in ("acc1", "acc2"):
        for c in ("n_events", "n_zero_outs", "n_credits_in"):
            assert got.loc[key, c] == batch.loc[key, c], (key, c)
        assert abs(got.loc[key, "balance"] - batch.loc[key, "final_balance"]) < 1e-9


def test_stream_counter_rate_matches_batch(spark, tmp_path):
    """The streaming counter state machine must land on exactly the
    batch counter_rate totals — including a reset mid-stream."""
    from spartan2_spark.operators.timeseries import counter_rate
    from spartan2_spark.streaming.rollup_stream import stream_counter_rate

    vals = {"c1": [10, 25, 40, 5, 30], "c2": [7, 7, 100]}
    rows = []
    for k, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((k, pd.Timestamp(f"2024-01-01 00:00:{i:02d}"), v))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    d = str(tmp_path / "cr_in")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)

    batch = (
        counter_rate(spark.read.parquet(d))
        .toPandas()
        .set_index("key")
        .sort_index()
    )

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.LongType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, d, schema, fmt="parquet")
    run_stream_to_memory(stream_counter_rate(stream, "key"), "cr_out", "update")
    got = spark.sql(
        """select * from (
             select *, row_number() over (partition by key order by n_samples desc) rn
             from cr_out) where rn = 1"""
    ).toPandas().set_index("key").sort_index()

    for k in vals:
        for col in ("increase", "n_resets", "n_samples"):
            assert got.loc[k, col] == batch.loc[k, col], (k, col)
    assert batch.loc["c1", "increase"] == 60 and batch.loc["c1", "n_resets"] == 1


def test_stream_gauge_delta_matches_batch(spark, tmp_path):
    """The streaming gauge state machine must land on exactly the batch
    gauge_delta outputs — delta, idelta, changes (incl. a flap that
    returns to its old value) and the span."""
    from spartan2_spark.operators.timeseries import gauge_delta
    from spartan2_spark.streaming.rollup_stream import stream_gauge_delta

    vals = {"g1": [10, 25, 25, 40, 30], "g2": [7, 9, 7]}
    rows = []
    for k, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((k, pd.Timestamp(f"2024-01-01 00:00:{i:02d}"), v))
    pdf = pd.DataFrame(rows, columns=["key", "ts", "value"])
    d = str(tmp_path / "gd_in")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)

    batch = (
        gauge_delta(spark.read.parquet(d))
        .toPandas()
        .set_index("key")
        .sort_index()
    )

    schema = T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.LongType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, d, schema, fmt="parquet")
    run_stream_to_memory(stream_gauge_delta(stream, "key"), "gd_out", "update")
    got = spark.sql(
        """select * from (
             select *, row_number() over (partition by key order by n_samples desc) rn
             from gd_out) where rn = 1"""
    ).toPandas().set_index("key").sort_index()

    for k in vals:
        for col in ("n_samples", "delta", "idelta", "n_changes", "span_us"):
            assert got.loc[k, col] == batch.loc[k, col], (k, col)
    assert batch.loc["g1", "delta"] == 20
    assert batch.loc["g1", "idelta"] == -10
    assert batch.loc["g1", "n_changes"] == 3
    assert batch.loc["g2", "n_changes"] == 2


def test_stream_version_intervals_matches_batch(spark, tmp_path):
    """The streaming SCD2 state machine must emit exactly the batch
    operator's CLOSED intervals — incl. an A->B->A recurrence; the
    live run stays in state (the batch NULL-valid_to row)."""
    from spartan2_spark.operators.rollup import url_version_intervals
    from spartan2_spark.streaming.rollup_stream import (
        stream_version_intervals,
    )

    vals = {"u1": ["A", "A", "B", "A"], "u2": ["X", "Y"], "u3": ["Z"]}
    rows = []
    for k, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append((k, pd.Timestamp(f"2024-01-01 00:00:{i:02d}"), v))
    pdf = pd.DataFrame(rows, columns=["url", "ts", "text"])
    d = str(tmp_path / "vi_in")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(d)

    batch = (
        url_version_intervals(
            spark.read.parquet(d), ts_col="ts", text_col="text"
        )
        .filter("valid_to_us IS NOT NULL")
        .toPandas()
        .sort_values(["url", "valid_from_us"], ignore_index=True)
    )

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = IO.load_tensor_stream(spark, d, schema, fmt="parquet").select(
        "url", "ts", F.md5("text").alias("ver")
    )
    run_stream_to_memory(
        stream_version_intervals(stream, "url"), "vi_out", "append"
    )
    got = (
        spark.sql("select * from vi_out")
        .toPandas()
        .sort_values(["url", "valid_from_us"], ignore_index=True)
    )
    assert len(got) == len(batch) == 3  # u1: A->B, B->A; u2: X->Y
    for col in ("url", "version_md5", "valid_from_us", "valid_to_us",
                "n_snapshots"):
        assert list(got[col]) == list(batch[col]), col


def test_stream_ohlc_matches_batch(spark, tmp_path):
    """Streaming OHLC across forced micro-batches == batch ohlc_bars on
    the same rows: the lexicographic endpoint-struct merge is
    associative, so cross-batch state merge is exact (bit-for-bit)."""
    import pandas as pd

    from spartan2_spark.operators.rollup import ohlc_bars
    from spartan2_spark.streaming.rollup_stream import stream_ohlc

    t0 = 1_699_920_000
    rows = [
        ("k%d" % (i % 3), t0 + i * 137, (i * 7919) % 1000, i % 5 + 1)
        for i in range(600)
    ]
    pdf = pd.DataFrame(rows, columns=["key", "t", "value", "qty"])
    df = spark.createDataFrame(pdf).select(
        "key", F.to_timestamp("t").alias("ts"), "value", "qty"
    )
    d = str(tmp_path / "ohlc_pts")
    df.repartition(5).write.parquet(d)

    stored = spark.read.parquet(d)
    stream = IO.load_tensor_stream(
        spark, d, stored.schema, fmt="parquet",
        options={"maxFilesPerTrigger": 1},
    )
    agg = stream_ohlc(stream, window="1 hour", watermark="0 seconds",
                      qty_col="qty")
    from spartan2_spark.streaming.rollup_stream import run_stream_to_memory

    run_stream_to_memory(agg, "stream_ohlc_parity", "complete")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "select key, bucket_ts, cnt, open_ts_us, open, close_ts_us,"
            " close, low, high, volume, pvsum from stream_ohlc_parity"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in ohlc_bars(stored, "1h", qty_col="qty")
        .select("key", "bucket_ts", "cnt", "open_ts_us", "open",
                "close_ts_us", "close", "low", "high", "volume", "pvsum")
        .collect()
    )
    assert got == want and len(got) >= 6


def test_stream_hll_tier_matches_batch(spark, tmp_path):
    """Streaming HLL register state across forced micro-batches ==
    batch hll_tier on the same rows (register-wise max merge is
    associative -> bit-identical), and the estimate read off the
    streamed state equals the batch estimate."""
    import pandas as pd

    from spartan2_spark.functions.sketches import hll_tier, hll_tier_estimate
    from spartan2_spark.streaming.rollup_stream import (
        run_stream_to_memory,
        stream_hll_tier,
    )

    t0 = 1_699_920_000
    rows = [
        ("k%d" % (i % 2), t0 + i * 211, "item%d" % ((i * 13) % 97))
        for i in range(500)
    ]
    pdf = pd.DataFrame(rows, columns=["key", "t", "item"])
    df = spark.createDataFrame(pdf).select(
        "key", F.to_timestamp("t").alias("ts"), "item"
    )
    d = str(tmp_path / "hll_pts")
    df.repartition(5).write.parquet(d)

    stored = spark.read.parquet(d)
    stream = IO.load_tensor_stream(
        spark, d, stored.schema, fmt="parquet",
        options={"maxFilesPerTrigger": 1},
    )
    agg = stream_hll_tier(stream, window="1 hour", watermark="0 seconds")
    run_stream_to_memory(agg, "stream_hll_parity", "complete")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "select key, bucket_ts, reg, max_rho from stream_hll_parity"
        ).collect()
    )
    batch_state = hll_tier(stored, key_col="key", time_col="ts",
                           item_col="item", tier="1h")
    want = sorted(
        tuple(r)
        for r in batch_state.select("key", "bucket_ts", "reg", "max_rho").collect()
    )
    assert got == want and len(got) > 50
    est_stream = {
        (r.key, r.bucket_ts): r.hll_estimate
        for r in hll_tier_estimate(
            spark.sql("select key, bucket_ts, reg, max_rho from stream_hll_parity")
        ).collect()
    }
    est_batch = {
        (r.key, r.bucket_ts): r.hll_estimate
        for r in hll_tier_estimate(batch_state).collect()
    }
    assert est_stream == est_batch


def test_stream_pow2_hist_matches_batch(spark, tmp_path):
    """Streaming pow2 histogram across forced micro-batches == the
    batch per-hour bucket counts on the same rows (count addition is
    the merge -> bit-identical)."""
    import pandas as pd

    from spartan2_spark.streaming.rollup_stream import (
        run_stream_to_memory,
        stream_pow2_hist,
    )

    t0 = 1_699_920_000
    rows = [("k%d" % (i % 2), t0 + i * 211, (i * 37) % 300)
            for i in range(400)]
    pdf = pd.DataFrame(rows, columns=["key", "t", "v"])
    df = spark.createDataFrame(pdf).select(
        "key", F.to_timestamp("t").alias("ts"), "v"
    )
    d = str(tmp_path / "p2h_pts")
    df.repartition(4).write.parquet(d)

    stored = spark.read.parquet(d)
    stream = IO.load_tensor_stream(
        spark, d, stored.schema, fmt="parquet",
        options={"maxFilesPerTrigger": 1},
    )
    agg = stream_pow2_hist(stream, window="1 hour", watermark="0 seconds")
    run_stream_to_memory(agg, "stream_p2h_parity", "complete")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "select key, bucket_ts, bucket, cnt from stream_p2h_parity"
        ).collect()
    )
    vb = F.col("v").cast("long")
    b = F.when(vb == 0, F.lit(0)).otherwise(F.length(F.bin(vb)))
    want = sorted(
        tuple(r)
        for r in stored.filter(vb >= 0)
        .groupBy(
            "key",
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
            b.cast("int").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select("key", "bucket_ts", "bucket", "cnt")
        .collect()
    )
    assert got == want and len(got) > 20


def test_load_tensor_orc_roundtrip(spark, tmp_path):
    """ORC joins the extension dispatch: write a frame as ORC, load it
    through load_tensor with a positional projection, values match."""
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [0.5, 1.5, 2.5]})
    )
    d = str(tmp_path / "t.orc")
    df.write.orc(d)
    got = IO.load_tensor(spark, d, col_idx=[0, 2], col_types=[int, float])
    rows = sorted(tuple(r) for r in got.collect())
    assert rows == [(1, 0.5), (2, 1.5), (3, 2.5)]
