"""Deterministic synthetic Common-Crawl-style ``pages`` table (FIXTURES.md F1).

The north-rule input (BASELINE.json input_hint) is
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.
No external data: everything derives from ``spark.range`` + ``xxhash64``
so generation is fully deterministic, distributed, and JVM-side (zero
Python per row; scales to any row count).

Skew is built in on purpose (it exercises the engine's salting):
- domain frequency ~ Zipf (log-uniform inverse-CDF draw),
- per-url crawl frequency head-skewed (power draw),
- whole (url, hour) gaps injected so gap-fill has real work.

Text is deterministic per (url, revision): most crawls of a url carry
identical bytes; a deterministic minority are "revisions". The engine's
canonicalization (latest warc_ts wins, tie-break on digest) must then
yield a byte-stable text per url — FIXTURES.md F1 note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["synth_pages", "pages_path", "ensure_pages"]

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua ut enim ad minim "
    "veniam quis nostrud exercitation ullamco laboris nisi ut aliquip ex ea "
    "commodo consequat duis aute irure dolor in reprehenderit in voluptate "
    "velit esse cillum dolore eu fugiat nulla pariatur excepteur sint "
    "occaecat cupidatat non proident sunt in culpa qui officia deserunt "
    "mollit anim id est laborum "
) * 12  # ~5.3 KB of stable filler to slice page text out of

_LANGS = ["en", "de", "zh", "fr", "es", "ru", "ja", "pt"]

_MASK = (1 << 31) - 1


def _u(col, seed: int):
    """Deterministic uniform double in [0, 1) from a column + seed."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(_MASK + 1)) / F.lit(float(_MASK + 1)))


def synth_pages(
    spark: SparkSession,
    n_rows: int,
    n_urls: int | None = None,
    n_domains: int | None = None,
    start: str = "2024-01-01 00:00:00",
    days: int = 30,
    num_partitions: int | None = None,
    gap_mod: int = 7,
) -> DataFrame:
    """Build the deterministic pages DataFrame (lazy; no action run).

    ``gap_mod``: one in ``gap_mod`` (url, hour) cells is dropped entirely,
    producing the missing-bucket gaps the gap-fill stage must repair.
    """
    n_urls = n_urls or max(n_rows // 8, 16)
    n_domains = n_domains or max(n_urls // 64, 8)
    num_partitions = num_partitions or max(
        spark.sparkContext.defaultParallelism, n_rows // 2_000_000 + 1
    )

    df = spark.range(0, n_rows, 1, num_partitions)

    # head-skewed url popularity: pow(u, 2.2) concentrates mass near url 0
    url_id = F.floor(F.lit(n_urls) * F.pow(_u(F.col("id"), 11), F.lit(2.2))).cast("long")
    df = df.withColumn("url_id", url_id)

    # Zipf-ish domain per url: log-uniform inverse CDF => P(domain k) ~ 1/k
    dom_id = (
        F.floor(F.pow(F.lit(float(n_domains)), _u(F.col("url_id"), 23))).cast("long")
        % F.lit(n_domains)
    )
    df = df.withColumn("domain_id", dom_id)

    span = days * 86400
    offset = F.floor(_u(F.col("id"), 37) * F.lit(float(span))).cast("long")
    df = df.withColumn("offset_s", offset)
    # structured gaps: drop whole (url, hour) cells deterministically
    hour_idx = (F.col("offset_s") / F.lit(3600)).cast("long")
    df = df.filter(
        F.pmod(F.xxhash64(F.col("url_id"), hour_idx, F.lit(53)), F.lit(gap_mod)) != 0
    )

    df = (
        df.withColumn(
            "url",
            F.concat(
                F.lit("https://d"),
                F.col("domain_id"),
                F.lit(".example.com/p/"),
                F.col("url_id"),
            ),
        )
        .withColumn(
            "warc_ts",
            (F.unix_timestamp(F.lit(start)) + F.col("offset_s")).cast("timestamp"),
        )
        # deterministic text per url, with a 1-in-5 revision variant
        .withColumn("text_len", (F.lit(80) + F.pmod(F.xxhash64(F.col("url_id"), F.lit(71)), F.lit(2000))).cast("int"))
        .withColumn("rev", F.when(F.pmod(F.xxhash64(F.col("id"), F.lit(83)), F.lit(5)) == 0, F.lit(1)).otherwise(F.lit(0)))
        .withColumn(
            "text",
            F.concat(
                F.lit("url "),
                F.col("url"),
                F.lit(" :: "),
                F.expr(f"substring('{_LOREM}', 1, text_len)"),
                F.when(F.col("rev") == 1, F.lit(" [rev2]")).otherwise(F.lit("")),
            ),
        )
        .withColumn(
            "lang",
            F.element_at(
                F.array(*[F.lit(x) for x in _LANGS]),
                (F.pmod(F.xxhash64(F.col("url_id"), F.lit(97)), F.lit(len(_LANGS))) + 1).cast("int"),
            ),
        )
        .withColumn(
            "html",
            F.encode(F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")), "UTF-8"),
        )
    )
    return df.select("url", "warc_ts", "html", "text", "lang")


def pages_path(cache_dir: str, n_rows: int) -> str:
    return f"{cache_dir}/pages_{n_rows}"


def ensure_pages(
    spark: SparkSession, cache_dir: str, n_rows: int, **kwargs
) -> DataFrame:
    """Materialize the synthetic pages table once (parquet, partitioned by
    crawl date = the Iceberg ``days(warc_ts)`` partition-spec analogue;
    the catalog jar is absent in this sandbox, so a partitioned parquet
    directory stands in — same engine code path, SURVEY.md section 7 M0).
    """
    import os

    path = pages_path(cache_dir, n_rows)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            synth_pages(spark, n_rows, **kwargs)
            .withColumn("dt", F.to_date("warc_ts"))
            .write.mode("overwrite")
            .partitionBy("dt")
            .parquet(path)
        )
    return spark.read.parquet(path).select("url", "warc_ts", "html", "text", "lang")
