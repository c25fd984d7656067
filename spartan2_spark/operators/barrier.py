"""Lineage barrier for iterative plans: reliable checkpoint when available.

Iterative operators (power iteration, k-core/k-truss peeling, label
propagation, DPGS/kGrass merge rounds, flow peels, MinHash signature
assembly) re-derive a DataFrame from itself each round; without a
barrier the lineage graph grows linearly with rounds and Catalyst
re-analyzes an ever-deeper plan.

``localCheckpoint()`` truncates lineage by pinning blocks to the
executors that computed them — perfect on ``local[*]``, but on a real
cluster a single lost executor kills the whole chain because there is
no lineage left to recompute the pinned blocks from. ``checkpoint()``
writes to the (HDFS/object-store) checkpoint directory and survives
executor loss, at the cost of a write.

``barrier(df)`` picks automatically:

* a checkpoint dir is configured (``sc.setCheckpointDir`` was called,
  or ``spark.spartan2.checkpoint.dir`` conf /
  ``SPARK_GRAFT_CHECKPOINT_DIR`` env is set) -> reliable
  ``checkpoint()``;
* otherwise -> ``localCheckpoint()`` (the local-mode fast path).

Designed for ``df.transform(barrier)`` chaining so call sites read the
same as the method they replace.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["barrier"]

_CONF_KEY = "spark.spartan2.checkpoint.dir"
_ENV_KEY = "SPARK_GRAFT_CHECKPOINT_DIR"


def _ensure_checkpoint_dir(df: DataFrame) -> bool:
    """Return True when a reliable checkpoint dir is (now) configured."""
    sc = df.sparkSession.sparkContext
    try:
        current = sc.getCheckpointDir()
    except Exception:  # pragma: no cover - very old py4j surface
        current = None
    if current:
        return True
    configured = df.sparkSession.conf.get(_CONF_KEY, None) or os.environ.get(
        _ENV_KEY
    )
    if configured:
        sc.setCheckpointDir(configured)
        return True
    return False


def barrier(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage (see module doc)."""
    if _ensure_checkpoint_dir(df):
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
