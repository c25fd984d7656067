"""Inject-then-detect: the reference validates its detectors on
planted dense blocks (holoscope/gendenseblock.py); same loop here —
plant a block with the Spark-native generators, recover it with the
engine's densest-subgraph peel."""

from __future__ import annotations

from pyspark.sql import functions as F

from spartan2_spark.datagen_blocks import (
    gen_di_hyper_rect_blocks,
    gen_even_dense_block,
    gen_hyperbola_dense_block,
    inject_clique_camo,
)
from spartan2_spark.operators.anomaly import densest_subgraph_peel


def test_even_block_density_and_determinism(spark):
    a = gen_even_dense_block(spark, 50, 40, 0.5, seed=3)
    b = gen_even_dense_block(spark, 50, 40, 0.5, seed=3)
    na, nb = a.count(), b.count()
    assert na == nb  # counter-based randomness: identical every run
    assert 0.4 * 2000 < na < 0.6 * 2000  # ~Bernoulli(0.5) of 50*40


def test_hyperbola_block_shape(spark):
    m = gen_hyperbola_dense_block(spark, 20, 20, alpha=-0.5, tau=0.2).toPandas()
    # (i+1)^-.5 (j+1)^-.5 > .2  <=>  (i+1)(j+1) < 25: corner-heavy
    assert ((m["src"] + 1) * (m["dst"] + 1) < 25).all()
    # corner-heavy: row 0 keeps every col of the 20-wide grid
    # ((1)(j+1) < 25 for all j <= 19), row 19 only col 0 ((20)(1) < 25)
    assert m[m["src"] == 0]["dst"].max() == 19
    assert set(m[m["src"] == 19]["dst"]) == {0}


def test_di_hyper_rect_blocks_offsets(spark):
    m = gen_di_hyper_rect_blocks(spark, 10, 10, 15, 15, p=1.0).toPandas()
    b1 = m[(m.src < 10)]
    b2 = m[(m.src >= 10)]
    assert len(b1) == 100  # p=1 full block
    assert (b2.dst >= 10).all()  # block-diagonal: no cross edges


def test_inject_and_recover_clique(spark):
    # sparse honest background over 200x200, plant a 12x12 p=1 clique
    noise = gen_even_dense_block(spark, 200, 200, 0.01, seed=5)
    g = inject_clique_camo(noise, 12, 12, p=1.0, test_idx=1, seed=9)
    res = densest_subgraph_peel(g, max_rounds=15)
    found = {r.n for r in res["nodes"].collect()}
    assert set(range(12)) <= found  # every clique node recovered
    assert res["density"] > 3.0  # clique density ~ 2*144/24 = 12 >> noise


def test_inject_fraud_props_and_holoscope_detects(spark):
    """The reference's demo loop: inject a rating/timestamp fraud block
    (injectFraud2PropGraph) and confirm the HoloScope-style property
    scores rank the fraud sinks above honest ones."""
    import datetime as dt

    from spartan2_spark.datagen_blocks import inject_fraud_props
    from spartan2_spark.operators.anomaly import (
        burst_involvement,
        kl_divergence_per_sink,
    )

    t0 = int(dt.datetime(2024, 1, 1).timestamp())
    # honest traffic: uniform ratings 1-3 spread over 30 days
    honest = (
        gen_even_dense_block(spark, 400, 30, 0.2, seed=21)
        .withColumn(
            "ts",
            (t0 + F.pmod(F.xxhash64("src", "dst", F.lit(31)), F.lit(30 * 86400))).cast("long"),
        )
        .withColumn(
            "rating",
            (1.0 + F.pmod(F.xxhash64("src", "dst", F.lit(32)), F.lit(3)).cast("double")),
        )
    )
    fraud = gen_even_dense_block(spark, 30, 5, 0.9, seed=22)
    g = inject_fraud_props(honest, fraud, t0=t0, burst_s=3600)

    ev = g.select(
        F.col("dst").alias("sink"),
        F.to_timestamp(F.from_unixtime("ts")).alias("ts"),
        F.when(F.col("rating") >= 4, 2).when(F.col("rating") >= 2, 1).otherwise(0)
        .cast("long").alias("rb"),
    )
    kl = kl_divergence_per_sink(ev, "sink", "rb", n_buckets=3).toPandas()
    bi = burst_involvement(ev, "sink", "ts", 3600).toPandas()
    fraud_sinks = set(range(5))
    top_kl = set(kl.nlargest(5, "kl")["sink"])
    top_bi = set(bi.nlargest(5, "involv")["sink"])
    assert len(top_kl & fraud_sinks) >= 4  # rating-divergence flags them
    assert len(top_bi & fraud_sinks) >= 4  # burst-involvement flags them


def test_camo_modes_add_edges(spark):
    noise = gen_even_dense_block(spark, 100, 100, 0.02, seed=5)
    base = inject_clique_camo(noise, 10, 10, p=0.8, test_idx=0, seed=9).count()
    camo1 = inject_clique_camo(noise, 10, 10, p=0.8, test_idx=1, seed=9).count()
    camo3 = inject_clique_camo(noise, 10, 10, p=0.8, test_idx=3, seed=9).count()
    assert camo1 > base and camo3 > base


def test_inject_and_recover_flow_block(spark):
    """CubeFlow inject-then-recover: plant 6 perfectly-balanced,
    high-volume middle accounts in imbalanced background traffic;
    flow_greedy_peel must converge on exactly the planted block."""
    from spartan2_spark.operators.flow import flow_balance, flow_greedy_peel

    rows_in, rows_out = [], []
    # background: 60 mids with IMBALANCED flow (in 100, out 20 centi)
    for m in range(60):
        for b in (0, 1):
            rows_in.append((f"bg{m}", b, 100))
            rows_out.append((f"bg{m}", b, 20))
    # planted block: 6 mids pumping 5000 in == 5000 out per bucket
    for m in range(6):
        for b in (0, 1):
            rows_in.append((f"fraud{m}", b, 5000))
            rows_out.append((f"fraud{m}", b, 5000))
    am = spark.createDataFrame(rows_in, ["mid", "bucket", "value"])
    mc = spark.createDataFrame(rows_out, ["mid", "bucket", "value"])
    cells = flow_balance(am, mc, alpha=0.75)
    iscore = cells.groupBy("mid").agg(
        F.sum((F.col("balance_score") * 4).cast("long")).alias("iscore4")
    )
    res = flow_greedy_peel(iscore, mid="mid", score="iscore4", k_reg=2, max_rounds=12)
    found = {r.mid for r in res["nodes"].collect()}
    assert found == {f"fraud{m}" for m in range(6)}
    # objective4 of the block: per mid 2 buckets * 4*5000 = 40000;
    # 6 mids -> 240000 over (6 + 2)
    assert abs(res["objective"] - 240000 / 8) < 1e-9
