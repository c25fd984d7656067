"""Histogram operators (SURVEY.md 2.4).

Reference semantics:
- 1-D equal-width histogram with last-bin clamp
  (/root/reference/spartan/tensor/tensor.py:106-109 binning rule;
  model/holoscope/edgepropertyAnalysis.py:304-320 burst histograms)
- 2-D log-binned histogram + peak-bin search + points-in-bin retrieval
  (/root/reference/spartan/util/rect_histogram.py:38-198)
- heuristic log bucketizers
  (model/eaglemine/tools/histogram_heuristic_generator.py:50-107)
- EagleMine histogram clustering (model/eaglemine/, 5260 LoC): the
  reference fits a tree of "islands" of connected non-empty histogram
  cells (its WaterLoo/tree stages grow clusters from dense cells
  outward through adjacent non-empty cells). The distributed analogue
  here is connected-component labeling of the non-empty cells under
  4-adjacency — min-label propagation, a loop of self-joins over the
  (tiny, post-aggregation) cell relation, converging in
  O(component diameter) rounds.

All single-pass groupBy aggregations; the peak search is an
orderBy/limit over the (tiny) histogram relation, with deterministic
tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hist1d",
    "hist2d_log",
    "find_peak",
    "points_in_peak_bin",
    "log_bucketize",
    "cluster_histogram_cells",
]


def hist1d(
    df: DataFrame, col: str, nbins: int, weight: str | None = None
) -> DataFrame:
    """Equal-width histogram with the reference's last-bin clamp."""
    bounds = df.agg(F.min(col).alias("__mn"), F.max(col).alias("__mx"))
    b = df.crossJoin(F.broadcast(bounds))
    # constant column: min == max -> zero width; np.histogram widens the
    # range to (v-0.5, v+0.5), so the constant value lands in the MIDDLE
    # bin (floor(0.5*nbins)) of nbins bins each 1/nbins wide — reproduce
    # that by shifting the range start and shrinking the width.
    const = F.col("__mx") <= F.col("__mn")
    lo = F.when(const, F.col("__mn") - 0.5).otherwise(F.col("__mn"))
    width = F.when(const, F.lit(1.0) / F.lit(nbins)).otherwise(
        (F.col("__mx") - F.col("__mn")) / F.lit(nbins)
    )
    idx = F.least(
        F.floor((F.col(col) - lo) / width).cast("long"),
        F.lit(nbins - 1),
    )
    agg = F.sum(weight) if weight else F.count(F.lit(1))
    return (
        b.withColumn("bin_idx", idx)
        .withColumn("__lo", lo)
        .withColumn("__w", width)
        .groupBy("bin_idx")
        .agg(
            agg.alias("cnt"),
            F.first(F.col("__lo") + F.col("bin_idx") * F.col("__w")).alias(
                "bin_start"
            ),
        )
    )


def hist2d_log(
    df: DataFrame, x: str, y: str, bins_per_decade: int = 4
) -> DataFrame:
    """2-D log10-binned histogram; non-positive points dropped first
    (the reference's positivity guard, rect_histogram.py:45-56)."""
    k = bins_per_decade
    pos = df.filter((F.col(x) > 0) & (F.col(y) > 0))
    bx = F.floor(F.log10(x) * k).cast("long")
    by = F.floor(F.log10(y) * k).cast("long")
    return pos.groupBy(bx.alias("bin_x"), by.alias("bin_y")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def find_peak(hist: DataFrame) -> DataFrame:
    """Max-count bin with deterministic tie-break (count desc, bins asc)
    — rect_histogram.py:111-179 peak search collapsed to a top-1."""
    order = [F.desc("cnt")] + [F.asc(c) for c in hist.columns if c != "cnt"]
    return hist.orderBy(*order).limit(1)


def points_in_peak_bin(
    df: DataFrame, x: str, y: str, bins_per_decade: int = 4
) -> DataFrame:
    """Rows that fall in the 2-D histogram's peak bin
    (rect_histogram.py:183-198 find_peak_rect)."""
    k = bins_per_decade
    hist = hist2d_log(df, x, y, k)
    peak = find_peak(hist).select("bin_x", "bin_y")
    pos = df.filter((F.col(x) > 0) & (F.col(y) > 0))
    keyed = pos.withColumn("bin_x", F.floor(F.log10(x) * k).cast("long")).withColumn(
        "bin_y", F.floor(F.log10(y) * k).cast("long")
    )
    return keyed.join(F.broadcast(peak), ["bin_x", "bin_y"], "left_semi")


def cluster_histogram_cells(
    hist: DataFrame, max_rounds: int = 64
) -> DataFrame:
    """EagleMine-style clustering: connected components of non-empty
    cells under 4-adjacency (|dx|+|dy| = 1), labeled by the minimum
    cell id in the component.

    ``hist`` is (bin_x, bin_y, cnt) as produced by :func:`hist2d_log`.
    Returns (bin_x, bin_y, cnt, cluster). Deterministic: the label is
    ``min(bin_x*100000 + bin_y)`` over the component, independent of
    partitioning and join order.

    The cell relation is post-aggregation (thousands of rows at most,
    regardless of input scale), so the propagation loop's self-joins
    are broadcast-sized; each round ends in localCheckpoint to truncate
    the iterative lineage.
    """
    cid = (F.col("bin_x") * 100000 + F.col("bin_y")).alias("cid")
    cells = hist.select(cid, "bin_x", "bin_y", "cnt").localCheckpoint()
    edges = (
        cells.alias("a")
        .join(
            cells.alias("b"),
            (
                F.abs(F.col("a.bin_x") - F.col("b.bin_x"))
                + F.abs(F.col("a.bin_y") - F.col("b.bin_y"))
            )
            == 1,
        )
        .select(F.col("a.cid").alias("u"), F.col("b.cid").alias("v"))
        .localCheckpoint()
    )
    labels = cells.select("cid", F.col("cid").alias("cluster"))
    converged = False
    for _ in range(max_rounds):
        prop = (
            edges.join(labels.withColumnRenamed("cid", "v"), "v")
            .groupBy(F.col("u").alias("cid"))
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(prop, "cid", "left")
            .select(
                "cid",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_cluster", "cluster")
                ).alias("cluster"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("cluster", "new_cluster")
            .join(labels, "cid")
            .filter(F.col("new_cluster") != F.col("cluster"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"cluster_histogram_cells did not converge in {max_rounds} "
            "rounds (component diameter exceeds max_rounds); raise it"
        )
    return cells.join(labels, "cid").select("bin_x", "bin_y", "cnt", "cluster")


def log_bucketize(col, n_buckets: int = 10, base: float = 10.0):
    """Heuristic log bucketizer: floor(log_base(x) * n) for x>0, else 0
    (histogram_heuristic_generator.py:50-107 family)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > 0, F.floor(F.log(float(base), c) * n_buckets).cast("long")).otherwise(
        F.lit(0).cast("long")
    )
