"""Dense-block / fraud-injection generators (Spark-native).

Reference semantics being re-expressed (NOT ported — the reference
builds numpy/scipy matrices in RAM; we declare the block as a filtered
cross-range DataFrame so a 10^6 x 10^6 block never materializes a
matrix):

- genEvenDenseBlock (/root/reference/spartan/model/holoscope/
  gendenseblock.py:10-15): Bernoulli(p) dense A x B block.
- genHyperbolaDenseBlock (gendenseblock.py:17-26): cells where
  (i+1)^alpha * (j+1)^alpha > tau.
- genDiHyperRectBlocks (gendenseblock.py:28-33): block-diagonal union
  of the two.
- injectCliqueCamo (gendenseblock.py:45-76; fraudar/greedy.py:66-95):
  plant an m0 x n0 Bernoulli(p) clique into an existing graph, with
  optional "camouflage" edges from the fraud rows into the honest
  columns (testIdx 1: threshold p*n0/(n-n0); testIdx 2: double that;
  testIdx 3: degree-biased — replaced here by an
  expectation-equivalent per-column probability n0*p*deg_j/sum(deg),
  since weighted sampling without replacement is inherently
  sequential).

Determinism: the reference uses np.random/random.random; at cluster
scale a global RNG stream doesn't exist, so randomness here is
counter-based — a cell (i, j) is present iff
pmod(xxhash64(i, j, seed), 2^20) < p * 2^20. Same seed -> same block
at any parallelism, no RNG state to synchronize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "gen_even_dense_block",
    "gen_hyperbola_dense_block",
    "gen_di_hyper_rect_blocks",
    "inject_clique_camo",
    "inject_fraud_props",
]

_SCALE = 1 << 20


def _bern(p: float, seed: int, *cols) -> F.Column:
    """Deterministic counter-based Bernoulli(p) per key tuple."""
    return F.pmod(F.xxhash64(*cols, F.lit(seed)), F.lit(_SCALE)) < int(p * _SCALE)


def _grid(spark: SparkSession, a: int, b: int) -> DataFrame:
    return (
        spark.range(a).select(F.col("id").alias("src"))
        .crossJoin(spark.range(b).select(F.col("id").alias("dst")))
    )


def gen_even_dense_block(
    spark: SparkSession, a: int, b: int, p: float, seed: int = 7
) -> DataFrame:
    """Bernoulli(p) A x B block -> (src, dst) edge DataFrame."""
    return _grid(spark, a, b).filter(_bern(p, seed, F.col("src"), F.col("dst")))


def gen_hyperbola_dense_block(
    spark: SparkSession, a: int, b: int, alpha: float, tau: float
) -> DataFrame:
    """Cells with (i+1)^alpha * (j+1)^alpha > tau (hyperbolic
    community shape) — a pure predicate, no randomness."""
    cond = (
        F.pow(F.col("src") + F.lit(1.0), F.lit(alpha))
        * F.pow(F.col("dst") + F.lit(1.0), F.lit(alpha))
    ) > F.lit(tau)
    return _grid(spark, a, b).filter(cond)


def gen_di_hyper_rect_blocks(
    spark: SparkSession,
    a1: int, b1: int, a2: int, b2: int,
    alpha: float = -0.5,
    tau: float | None = None,
    p: float = 1.0,
    seed: int = 7,
) -> DataFrame:
    """Block-diagonal union: even block + offset hyperbola block."""
    if tau is None:
        tau = (a1 ** alpha) * (b1 ** alpha)
    m1 = gen_even_dense_block(spark, a1, b1, p, seed)
    m2 = gen_hyperbola_dense_block(spark, a2, b2, alpha, tau).select(
        (F.col("src") + a1).alias("src"), (F.col("dst") + b1).alias("dst")
    )
    return m1.unionByName(m2)


def inject_clique_camo(
    edges: DataFrame,
    m0: int,
    n0: int,
    p: float,
    test_idx: int = 1,
    seed: int = 11,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Plant an m0 x n0 Bernoulli(p) clique over node ids [0, m0) x
    [0, n0) into ``edges``, plus camouflage per ``test_idx`` (0 = none,
    1 = threshold camo, 2 = double camo, 3 = degree-biased camo).
    Returns the augmented edge list, deduplicated (the reference sets
    matrix cells to 1 — idempotent)."""
    spark = edges.sparkSession
    bounds = edges.agg(F.max(dst).alias("mx")).collect()[0]
    n = int(bounds.mx) + 1

    clique = gen_even_dense_block(spark, m0, n0, p, seed).select(
        F.col("src").alias(src), F.col("dst").alias(dst)
    )
    out = edges.select(src, dst).unionByName(clique)

    if test_idx in (1, 2) and n > n0:
        thres = (2 if test_idx == 2 else 1) * p * n0 / (n - n0)
        camo = (
            spark.range(m0).select(F.col("id").alias(src))
            .crossJoin(
                spark.range(n0, n).select(F.col("id").alias(dst))
            )
            .filter(_bern(min(thres, 1.0), seed + 1, F.col(src), F.col(dst)))
        )
        out = out.unionByName(camo)
    elif test_idx == 3 and n > n0:
        deg = (
            edges.filter(F.col(dst) >= n0)
            .groupBy(dst)
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        tot = deg.agg(F.sum("deg")).collect()[0][0] or 1
        camo = (
            spark.range(m0).select(F.col("id").alias(src))
            .crossJoin(F.broadcast(deg))
            .filter(
                F.pmod(F.xxhash64(F.col(src), F.col(dst), F.lit(seed + 2)), F.lit(_SCALE))
                < F.least(
                    F.lit(float(_SCALE)),
                    F.lit(n0 * p * _SCALE / tot) * F.col("deg"),
                ).cast("long")
            )
            .select(src, dst)
        )
        out = out.unionByName(camo)

    return out.dropDuplicates([src, dst])


def inject_fraud_props(
    edges: DataFrame,
    fraud_edges: DataFrame,
    t0: int,
    burst_s: int = 3600,
    ratings=(4.0, 4.5),
    seed: int = 13,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Property-graph fraud injection (injectFraud2PropGraph +
    generateProps, gendenseblock.py:78-97): honest edges keep their
    ``ts``/``rating`` columns; injected ``fraud_edges`` get a high
    rating drawn from ``ratings`` (the reference's {4, 4.5} choice) and
    a timestamp inside the burst window [t0, t0+burst_s) — counter-
    based, so identical at any parallelism. Output:
    (src, dst, ts:long epoch s, rating:double)."""
    h1 = F.pmod(F.xxhash64(src, dst, F.lit(seed)), F.lit(_SCALE))
    rating = F.when(
        h1 < _SCALE // len(ratings), F.lit(float(ratings[0]))
    )
    for i in range(1, len(ratings)):
        cond = h1 < (_SCALE * (i + 1)) // len(ratings)
        rating = rating.when(cond, F.lit(float(ratings[i])))
    ts = F.lit(t0) + F.pmod(
        F.xxhash64(src, dst, F.lit(seed + 1)), F.lit(burst_s)
    )
    injected = fraud_edges.select(
        src, dst, ts.cast("long").alias("ts"), rating.alias("rating")
    )
    return edges.select(src, dst, "ts", "rating").unionByName(injected)
