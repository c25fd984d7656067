"""Declared StructType schemas (the engine's schema system).

The reference declares schemas positionally at load time
(``/root/reference/spartan/util/ioutil.py:304-315`` — col_idx zipped
with col_types, default str). We replace that with explicit Spark
StructTypes declared once here; nullability is explicit; no inference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# North-rule input table (BASELINE.json input_hint):
# Common-Crawl-style web pages.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Tier state: re-aggregable continuous-aggregate state, LONG format —
# one row per (url, bucket, value-bin). mean is NEVER stored (sum/count
# only — re-averaging averages is wrong, cf. SURVEY.md section 2.4
# notes); the per-bin rows ARE the sparse value-histogram quantile
# sketch (exact for integer metrics, log-binned for floats); arrays are
# assembled only at the read edge (rollup.tier_view).
TIER_STATE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("bucket_ts", T.TimestampType(), False),
        T.StructField("bin", T.LongType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("vsum", T.DoubleType(), False),
        T.StructField("vmin", T.DoubleType(), False),
        T.StructField("vmax", T.DoubleType(), False),
    ]
)

# Reader-facing tier view (finalized aggregates derived from TIER_STATE).
TIER_VIEW = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("bucket_ts", T.TimestampType(), False),
        T.StructField("cnt", T.LongType(), False),
        T.StructField("vmin", T.DoubleType(), False),
        T.StructField("vmax", T.DoubleType(), False),
        T.StructField("vmean", T.DoubleType(), False),
        T.StructField("p95", T.DoubleType(), False),
    ]
)

# Gorilla block table: one row per (url, block of consecutive points).
GORILLA_BLOCKS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("tier", T.StringType(), False),
        T.StructField("start_ts", T.LongType(), False),
        T.StructField("end_ts", T.LongType(), False),
        T.StructField("n_points", T.LongType(), False),
        T.StructField("ts_block", T.BinaryType(), False),
        T.StructField("val_block", T.BinaryType(), False),
        T.StructField("crc32", T.LongType(), False),
    ]
)

# Events table from the driver testdata (FIXTURES.md F6 analogue).
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_testdata(spark, sf_dir: str, name: str):
    """Load one driver-provided parquet table (TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
