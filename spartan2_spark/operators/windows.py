"""Sliding-window stream operators (batch replay of SURVEY.md 2.9).

- ``assign_windows``: time-based window/stride multi-assignment — the
  Spark ``F.window(ts, window, slide)`` equivalent of the reference's
  pull-based overlap-retaining fetch loop
  (/root/reference/spartan/tensor/tensor.py:170-231).
- ``window_spectral_density``: EigenPulse semantics
  (model/eigenpulse/EigenPulse.py:26-54, SinglePassPCA.py): per window,
  a single-pass randomized QB sketch of the (row x col) count matrix,
  SVD on the small sketch only, then the density of the submatrix
  selected by the leading singular vectors (|u_i| >= 1/sqrt(m)).
  Anomalous windows: density > mean + 3*std, ddof=1
  (eigenpulse/util.py:25-34).
- ``zero_out_replay``: MonLAD-family per-account state replay
  (model/MonLAD/ZeroOutCore.py semantics): running balance per key;
  count "pump -> drain to ~zero" cycles where balance rises above the
  last trough by >= delta_up and then returns within epsilon of it.
  Implemented vectorized on cumulative sums (no per-event Python
  branching beyond numpy masks).

The per-window/per-key kernels run in Arrow-batched grouped pandas
UDFs; sketch sizes are O(rank), never O(window).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "assign_windows",
    "window_spectral_density",
    "zero_out_replay",
    "zero_out_replay_cfd",
]


def assign_windows(
    df: DataFrame, window: str, stride: str, time_col: str = "ts"
) -> DataFrame:
    """Sliding-window assignment; a row lands in window/stride windows
    (exactly the reference's overlap retention)."""
    return df.withColumn("win", F.window(F.col(time_col), window, stride)).select(
        F.col("win.start").alias("win_start"), F.col("win.end").alias("win_end"), "*"
    ).drop("win")


_DENSITY_SCHEMA = T.StructType(
    [
        T.StructField("win_start", T.TimestampType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_cols", T.LongType()),
        T.StructField("density", T.DoubleType()),
    ]
)


class _COO:
    """Minimal sparse COO matrix (scipy is not in this container) with
    exactly the products the QB sketch needs, each O(nnz * rank) time
    and O((m + n) * rank) memory via per-column bincount segment sums."""

    def __init__(self, ri: np.ndarray, ci: np.ndarray, v: np.ndarray, shape):
        self.ri, self.ci, self.v, self.shape = ri, ci, v, shape

    def __matmul__(self, D: np.ndarray) -> np.ndarray:  # M @ D -> (m, k)
        m = self.shape[0]
        w = self.v[:, None] * D[self.ci]
        return np.column_stack(
            [np.bincount(self.ri, weights=w[:, c], minlength=m) for c in range(w.shape[1])]
        )

    def tmatmul(self, Q: np.ndarray) -> np.ndarray:  # Q.T @ M -> (k, n)
        n = self.shape[1]
        w = self.v[:, None] * Q[self.ri]
        return np.column_stack(
            [np.bincount(self.ci, weights=w[:, c], minlength=n) for c in range(w.shape[1])]
        ).T

    def subsum(self, sel_r: np.ndarray, sel_c: np.ndarray) -> float:
        return float(self.v[sel_r[self.ri] & sel_c[self.ci]].sum())


def _qb_sketch_svd(M, rank: int, seed: int):
    """Single-pass randomized QB sketch -> left singular vectors.

    Q, B with M ~ Q @ B, Q orthonormal (Halko et al. randomized SVD,
    the same construction EigenPulse's SinglePassPCA uses); SVD runs on
    the small B only. Deterministic via seeded Gaussian test matrix.

    ``M`` may be dense OR a ``_COO`` — only ``M @ omega`` (m×k) and
    ``Q.T @ M`` (k×n) are ever materialized, so kernel memory is
    O((m+n)·rank), never O(m·n)."""
    rng = np.random.default_rng(seed)
    k = min(rank, min(M.shape))
    omega = rng.standard_normal((M.shape[1], k))
    Q, _ = np.linalg.qr(M @ omega)
    B = M.tmatmul(Q) if hasattr(M, "tmatmul") else Q.T @ M
    u_b, s, vt = np.linalg.svd(B, full_matrices=False)
    return Q @ u_b, s, vt


def window_spectral_density(
    df: DataFrame,
    window: str,
    stride: str,
    row_col: str = "user",
    col_col: str = "item",
    time_col: str = "ts",
    rank: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Per sliding window: sketch-SVD density + 3-sigma anomaly flag."""
    win = assign_windows(df, window, stride, time_col)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        rows, row_idx = np.unique(pdf[row_col].to_numpy(), return_inverse=True)
        cols, col_idx = np.unique(pdf[col_col].to_numpy(), return_inverse=True)
        m, n = len(rows), len(cols)
        # COO triplets, never a dense (m, n) buffer: a hot window of
        # 1e5 x 1e5 keys would need an 80 GB dense matrix; the COO form
        # is O(nnz) and the sketch products are O((m+n)*rank).
        flat = row_idx.astype(np.int64) * n + col_idx
        uniq, counts = np.unique(flat, return_counts=True)
        M = _COO(
            (uniq // n).astype(np.int64),
            (uniq % n).astype(np.int64),
            counts.astype(np.float64),
            (m, n),
        )
        U, s, Vt = _qb_sketch_svd(M, rank, seed)
        sel_r = np.abs(U[:, 0]) >= 1.0 / np.sqrt(m)
        sel_c = np.abs(Vt[0]) >= 1.0 / np.sqrt(n)
        sub_sum = M.subsum(sel_r, sel_c)
        denom = max(int(sel_r.sum()) + int(sel_c.sum()), 1)
        return pd.DataFrame(
            {
                "win_start": [pdf["win_start"].iloc[0]],
                "n_rows": [m],
                "n_cols": [n],
                "density": [sub_sum / denom],
            }
        )

    dens = win.groupBy("win_start").applyInPandas(kernel, _DENSITY_SCHEMA)
    stats = dens.agg(
        F.avg("density").alias("__mu"), F.stddev_samp("density").alias("__sd")
    )
    return dens.crossJoin(F.broadcast(stats)).select(
        "win_start",
        "n_rows",
        "n_cols",
        "density",
        (F.col("density") > F.col("__mu") + 3 * F.col("__sd")).alias("is_anomaly"),
    )


_ZEROOUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_zero_outs", T.LongType()),
        T.StructField("max_balance", T.DoubleType()),
        T.StructField("final_balance", T.DoubleType()),
    ]
)


def zero_out_replay(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    amount_col: str = "amount",
    delta_up: float = 100.0,
    epsilon: float = 1.0,
) -> DataFrame:
    """Per-key pump-and-drain cycle counting on the running balance."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        bal = pdf[amount_col].to_numpy(np.float64).cumsum()
        run_min = np.minimum.accumulate(np.concatenate(([0.0], bal)))[:-1]
        pumped = bal - run_min >= delta_up
        # a zero-out = first return within epsilon of the running trough
        # after a pumped state; count state flips pumped->drained
        drained = (bal - run_min) <= epsilon
        # pumped opens a cycle, the next drained event closes it; scan
        # only the (sparse) event indices where either holds
        open_ = False
        n_cycles = 0
        for i in np.flatnonzero(pumped | drained):
            if pumped[i] and not open_:
                open_ = True
            elif drained[i] and open_:
                open_ = False
                n_cycles += 1
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_events": [len(bal)],
                "n_zero_outs": [n_cycles],
                "max_balance": [float(bal.max()) if len(bal) else 0.0],
                "final_balance": [float(bal[-1]) if len(bal) else 0.0],
            }
        )

    # one short series per account key at 100TB-scale cardinality:
    # partition-batched grouped apply (operators/grouped.py) amortizes
    # the per-group Arrow/apply cost
    from spartan2_spark.operators.grouped import batched_group_apply

    return batched_group_apply(
        df, [key_col], kernel, _ZEROOUT_SCHEMA, order=(time_col,)
    )

_ZEROOUT_CFD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_zero_outs", T.LongType()),
        T.StructField("n_credits_in", T.LongType()),
        T.StructField("max_balance", T.DoubleType()),
        T.StructField("final_balance", T.DoubleType()),
    ]
)


def zero_out_replay_cfd(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    type_col: str = "tx_type",
    weight_col: str = "weight",
    source_type: str = "VYDAJ",
    des_type: str = "PRIJEM",
    delta_up: float = 100.0,
    epsilon: float = 1.0,
) -> DataFrame:
    """MonLAD CFD-variant replay: single-account events typed by a
    transaction-type column (reference
    /root/reference/spartan/model/MonLAD/ZeroOutCoreCFD.py:3-53).

    Differences from :func:`zero_out_replay` (the source/destination
    pair form), mirroring the reference split:

    * each event carries ONE account + a type; ``des_type`` events are
      credits (+weight), ``source_type`` events debits (-weight), any
      other type is ignored entirely (no balance change, no state —
      the reference's early-return for unknown types);
    * the pump (up) transition can only fire on a CREDIT event and the
      drain (zero-out) only on a DEBIT event;
    * ``n_credits_in`` accumulates, at each zero-out, the number of
      pump-qualifying credits since the previous zero-out (the
      reference's countTempInDict -> countInDict flush) — credits
      after the last zero-out never count.

    Same simplified running-trough state machine as
    ``zero_out_replay`` (pumped: bal - run_min >= delta_up; drained:
    bal - run_min <= epsilon, run_min excluding the current event);
    SQL-expressible as a marker sequence, see the oracle twin.
    """
    typed = df.filter(F.col(type_col).isin(source_type, des_type)).select(
        F.col(key_col).alias(key_col),
        F.col(time_col).alias(time_col),
        F.when(
            F.col(type_col) == des_type, F.col(weight_col)
        )
        .otherwise(-F.col(weight_col))
        .alias("__amt"),
        (F.col(type_col) == des_type).alias("__is_credit"),
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        bal = pdf["__amt"].to_numpy(np.float64).cumsum()
        credit = pdf["__is_credit"].to_numpy(bool)
        run_min = np.minimum.accumulate(np.concatenate(([0.0], bal)))[:-1]
        pumped = credit & (bal - run_min >= delta_up)
        drained = ~credit & (bal - run_min <= epsilon)
        open_ = False
        n_cycles = 0
        temp_in = 0
        credits_in = 0
        for i in np.flatnonzero(pumped | drained):
            if pumped[i]:
                open_ = True
                temp_in += 1
            elif open_:
                open_ = False
                n_cycles += 1
                credits_in += temp_in
                temp_in = 0
        return pd.DataFrame(
            {
                "key": [str(pdf[key_col].iloc[0])],
                "n_events": [len(bal)],
                "n_zero_outs": [n_cycles],
                "n_credits_in": [credits_in],
                "max_balance": [float(bal.max()) if len(bal) else 0.0],
                "final_balance": [float(bal[-1]) if len(bal) else 0.0],
            }
        )

    from spartan2_spark.operators.grouped import batched_group_apply

    return batched_group_apply(
        typed, [key_col], kernel, _ZEROOUT_CFD_SCHEMA, order=(time_col,)
    )
