"""Sources & sinks (SURVEY.md 2.1) — the loadTensor surface re-expressed.

Reference semantics reproduced:
- extension-dispatch reader with multi-file glob union
  (/root/reference/spartan/util/ioutil.py:159-200, 267-322): csv /
  .tensor (csv with configurable sep + '#' comments) / gz-bz2-xz
  (transparent codecs in Spark) / parquet / json
- positional column projection + per-column type declaration
  (``col_idx`` + ``col_types``, ioutil.py:304-315; absent types
  default to string :305-308) — pushed into the scan as column pruning
- ``key:v1 v2 ...`` dict-list text sink/source (ioutil.py:459-506)
- streaming handle (ioutil.py:325-358) -> ``readStream`` file source

Everything returns lazy DataFrames; reads carry explicit schemas (no
inference in production paths).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "load_tensor",
    "load_tensor_stream",
    "save_dict_list",
    "load_dict_list",
    "load_file_to_dict",
    "load_histogram",
]

_TYPE_MAP = {
    int: T.LongType(),
    float: T.DoubleType(),
    str: T.StringType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "str": T.StringType(),
    "timestamp": T.TimestampType(),
}


def _strip_codec(name: str) -> str:
    for ext in (".gz", ".bz2", ".xz", ".zip"):
        if name.endswith(ext):
            return name[: -len(ext)]
    return name


def load_tensor(
    spark: SparkSession,
    path: str,
    col_idx: list[int] | None = None,
    col_types: list | None = None,
    sep: str = ",",
    comment: str = "#",
    header: bool = False,
) -> DataFrame:
    """Glob-capable, extension-dispatched scan with positional schema.

    col_idx/col_types mirror loadTensor: select columns by position and
    declare their types; missing types default to string. For parquet
    the positional projection applies to the file's own column order.
    """
    base = _strip_codec(os.path.basename(path.rstrip("*")))
    ext = base.rsplit(".", 1)[-1].lower() if "." in base else "csv"

    if ext == "parquet":
        df = spark.read.parquet(path)
    elif ext == "orc":
        # columnar alternative the JVM ships natively (no extra jars);
        # same positional-projection contract as parquet
        df = spark.read.orc(path)
    elif ext == "json":
        df = spark.read.json(path)
    elif ext in ("npy", "npz"):
        df = _read_np(spark, path, ext)
    else:  # csv / tensor / arbitrary text tables; codecs transparent
        reader = spark.read.option("comment", comment).option("header", header)
        df = reader.csv(path, sep=sep)

    if col_idx is not None:
        col_types = col_types or []
        cols = []
        for j, i in enumerate(col_idx):
            c = F.col(df.columns[i])
            t = _TYPE_MAP.get(col_types[j] if j < len(col_types) else str, T.StringType())
            cols.append(c.cast(t).alias(f"c{j}"))
        df = df.select(*cols)
    return df


def _read_np(spark: SparkSession, path: str, ext: str) -> DataFrame:
    """.npy/.npz reader (the reference's NPFile dispatch,
    ioutil.py:132-156). These are single-machine binary formats with no
    splittable layout, so — exactly like the reference — the array is
    materialized once (driver-side) and parallelized; 1-D arrays become
    one column c0, 2-D arrays one column per matrix column. Production
    data belongs in parquet; this exists for loadTensor parity with the
    reference's fixture formats.
    """
    import glob as _glob

    import numpy as np
    import pandas as pd

    frames = []
    for f in sorted(_glob.glob(path)):
        arr = np.load(f)
        if ext == "npz":
            arr = arr[list(arr.keys())[0]]
        if arr.ndim == 1:
            arr = arr.reshape(-1, 1)
        frames.append(pd.DataFrame(arr, columns=[f"c{i}" for i in range(arr.shape[1])]))
    return spark.createDataFrame(pd.concat(frames, ignore_index=True))


def load_tensor_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "csv",
    sep: str = ",",
    header: bool = False,
    options: dict | None = None,
) -> DataFrame:
    """Streaming file source (the loadTensorStream analogue); schemas
    are mandatory for streams. ``options`` passes source options
    through (e.g. maxFilesPerTrigger to bound micro-batch size)."""
    r = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        r = r.option(k, v)
    if fmt == "parquet":
        return r.parquet(path)
    return r.option("header", header).option("sep", sep).csv(path)


def save_dict_list(df: DataFrame, key_col: str, list_col: str, path: str) -> None:
    """``key:v1 v2 ...`` text sink (ioutil.py:459-480 semantics)."""
    (
        df.select(
            F.concat_ws(
                ":",
                F.col(key_col).cast("string"),
                F.concat_ws(" ", F.transform(list_col, lambda x: x.cast("string"))),
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )


def load_dict_list(spark: SparkSession, path: str) -> DataFrame:
    """``key:v1 v2 ...`` text source -> (key string, values array<string>)."""
    raw = spark.read.text(path)
    key = F.substring_index(F.col("value"), ":", 1)
    rest = F.expr("substring(value, length(substring_index(value, ':', 1)) + 2)")
    return raw.select(
        key.alias("key"), F.split(F.trim(rest), " +").alias("values")
    )


def load_file_to_dict(spark: SparkSession, path: str) -> dict:
    """Key/value file -> driver-side dict (ioutil.py:361-411
    ``loadFile2Dict`` semantics, used by EagleMine). Only for small
    dimension tables — the dict is meant to be ``spark.sparkContext
    .broadcast()``-ed, the distributed analogue of the reference's
    in-process lookup."""
    return dict(
        load_dict_list(spark, path)
        .select("key", F.col("values"))
        .rdd.map(lambda r: (r[0], list(r[1])))
        .collect()
    )


def load_histogram(spark: SparkSession, path: str) -> dict:
    """Histogram file -> {'shape': [...], 'ticks': [[...]], 'cells':
    DataFrame(coords array<long>, cnt long)} (ioutil.py:414-456
    ``loadHistogram``: first line = shape, next ndim lines = per-dim
    ticks, remaining lines = nnz cells ``i,j,...,count``).

    Header lines are tiny driver-side metadata; the nnz cell body —
    the part that grows with data — stays a distributed DataFrame.
    """
    head = spark.read.text(path).limit(64).collect()
    lines = [r.value for r in head]
    shape = [int(x) for x in lines[0].split(",")]
    ndim = len(shape)
    ticks = [[float(x) for x in ln.split(",")] for ln in lines[1 : 1 + ndim]]
    body = (
        spark.read.text(path)
        .withColumn("__i", F.monotonically_increasing_id())
        .filter(F.col("__i") >= 1 + ndim)
        .select(F.split("value", ",").alias("p"))
    )
    cells = body.select(
        F.slice(F.transform("p", lambda x: x.cast("long")), 1, ndim).alias("coords"),
        F.element_at(F.col("p"), ndim + 1).cast("long").alias("cnt"),
    )
    return {"shape": shape, "ticks": ticks, "cells": cells}
