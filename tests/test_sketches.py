from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from spartan2_spark.functions.sketches import TDigest, tdigest_quantiles


def test_tdigest_accuracy():
    rng = np.random.default_rng(1)
    for dist in (rng.standard_normal(20000), rng.exponential(2.0, 20000)):
        d = TDigest.from_values(dist, delta=100)
        assert len(d.means) < 250
        for q in (0.05, 0.5, 0.95, 0.99):
            exact = np.quantile(dist, q)
            got = d.quantile(q)
            spread = np.quantile(dist, min(q + 0.02, 1.0)) - np.quantile(
                dist, max(q - 0.02, 0.0)
            )
            assert abs(got - exact) <= max(spread, 1e-3), (q, got, exact)


def test_tdigest_merge_equals_whole():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(10000)
    whole = TDigest.from_values(x)
    parts = TDigest(delta=100)
    for chunk in np.array_split(np.sort(x), 7):
        parts = parts.merge(TDigest.from_values(chunk))
    for q in (0.1, 0.5, 0.95):
        assert abs(whole.quantile(q) - parts.quantile(q)) < 0.05


def test_spark_tdigest_parallelism_invariant(spark):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "k": np.repeat(["a", "b"], 5000),
            "v": np.concatenate([rng.standard_normal(5000), rng.exponential(1, 5000)]),
        }
    )
    outs = []
    for nparts in (2, 17):
        df = spark.createDataFrame(pdf).repartition(nparts)
        out = (
            tdigest_quantiles(df, ["k"], "v", qs=(0.5, 0.95))
            .toPandas()
            .sort_values("k", ignore_index=True)
        )
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bit-identical
    # and accurate vs exact
    for k, g in pdf.groupby("k"):
        exact = np.quantile(g["v"], 0.95)
        got = outs[0].set_index("k").loc[k, "q95"]
        assert abs(got - exact) < 0.1


def test_countmin_overestimates_and_merges(spark):
    from pyspark.sql import functions as F

    from spartan2_spark.functions.sketches import countmin_build, countmin_estimate

    rows = [(f"u{i % 50}",) for i in range(2000)] + [("heavy",)] * 500
    df = spark.createDataFrame(rows, "key string")
    sk = countmin_build(df, depth=4, width=64)
    keys = df.select("key").distinct()
    est = {r.key: r.cms_estimate for r in countmin_estimate(sk, keys, depth=4, width=64).collect()}
    exact = {r.key: r.cnt for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # CMS never underestimates; heavy hitter stands out
    assert all(est[k] >= exact[k] for k in exact)
    assert est["heavy"] >= 500
    assert max(est, key=est.get) == "heavy"
    # mergeability: sketch of two halves re-aggregates to the full sketch
    d1 = spark.createDataFrame(rows[:1250], "key string")
    d2 = spark.createDataFrame(rows[1250:], "key string")
    h1 = countmin_build(d1, depth=4, width=64)
    h2 = countmin_build(d2, depth=4, width=64)
    merged = h1.unionAll(h2).groupBy("j", "cell").agg(F.sum("cnt").alias("cnt"))
    a = {(r.j, r.cell): r.cnt for r in sk.collect()}
    b = {(r.j, r.cell): r.cnt for r in merged.collect()}
    assert a == b


def test_bloom_no_false_negatives_and_fp_observable(spark):
    from spartan2_spark.functions.sketches import bloom_build, bloom_probe

    build = spark.createDataFrame([(i,) for i in range(0, 200, 2)], "key long")
    probe = spark.createDataFrame([(i,) for i in range(200)], "key long")
    # tiny m forces false positives; k=3
    bits = bloom_build(build, k=3, m=64)
    out = {r["key"]: r["maybe_present"] for r in bloom_probe(bits, probe, k=3, m=64).collect()}
    # every build key must probe present (no false negatives)
    assert all(out[i] for i in range(0, 200, 2))
    # at m=64 with 100 keys the bitset saturates -> some odd key flags too
    assert any(out[i] for i in range(1, 200, 2))
    # larger m separates: far fewer false positives
    bits2 = bloom_build(build, k=3, m=8192)
    out2 = {r["key"]: r["maybe_present"] for r in bloom_probe(bits2, probe, k=3, m=8192).collect()}
    assert all(out2[i] for i in range(0, 200, 2))
    fp = sum(1 for i in range(1, 200, 2) if out2[i])
    assert fp < 10


def test_hll_estimate_and_merge(spark):
    from pyspark.sql import functions as F

    from spartan2_spark.functions.sketches import hll_estimate, hll_registers

    n = 5000
    df = spark.createDataFrame([(str(i),) for i in range(n)], "key string")
    regs = hll_registers(df, m=256)
    est = hll_estimate(regs, m=256).collect()[0]
    # m=256 -> ~6.5% standard error; allow 4 sigma
    assert abs(est["hll_estimate"] - n) / n < 0.26
    # mergeability: shard the input, union register relations, re-max
    a = hll_registers(df.filter(F.col("key").cast("long") % 2 == 0), m=256)
    b = hll_registers(df.filter(F.col("key").cast("long") % 2 == 1), m=256)
    merged = (
        a.unionAll(b).groupBy("reg").agg(F.max("max_rho").alias("max_rho"))
    )
    whole = {(r.reg, r.max_rho) for r in regs.collect()}
    assert {(r.reg, r.max_rho) for r in merged.collect()} == whole


def test_hll_tier_up_parity_and_accuracy(spark):
    """Register max-merge is associative: day state tiered up from
    hour state == day state computed directly from raw; the estimate
    lands within the ~6.5% m=256 error band on a known cardinality."""
    import pandas as pd

    from pyspark.sql import functions as F

    from spartan2_spark.functions.sketches import (
        hll_tier,
        hll_tier_estimate,
        hll_tier_up,
    )

    t0 = 1_699_920_000  # midnight UTC — hours 0..47 span EXACTLY 2 days
    # 500 distinct items spread over two days, many repeats
    rows = [
        ("k", t0 + (i % 48) * 3600, f"item{i % 500}") for i in range(3000)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["key", "t", "item"])
    ).select("key", F.to_timestamp("t").alias("ts"), "item")

    st_h = hll_tier(df, tier="1h")
    via_tier = (
        hll_tier_up(st_h, "1d").orderBy("key", "bucket_ts", "reg").collect()
    )
    direct = hll_tier(df, tier="1d").orderBy("key", "bucket_ts", "reg").collect()
    assert [tuple(r) for r in via_tier] == [tuple(r) for r in direct]

    # accuracy: compare each day's RAW estimate against that day's true
    # distinct count (computed exactly here) with a generous band — the
    # raw estimator carries no small-range correction, so the bound is
    # loose; the bit-exact property under test is the PARITY above
    from pyspark.sql import functions as FF

    exact = {
        (r.key, r.d): r.n
        for r in df.groupBy(
            "key", FF.date_trunc("day", "ts").alias("d")
        )
        .agg(FF.count_distinct("item").alias("n"))
        .collect()
    }
    est = hll_tier_estimate(hll_tier_up(st_h, "1d")).collect()
    assert len(est) == 2  # exactly two day buckets
    for r in est:
        true_n = exact[(r.key, r.bucket_ts)]
        assert 0.5 * true_n <= r.hll_estimate <= 1.6 * true_n, (r, true_n)
