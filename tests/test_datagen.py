from __future__ import annotations

from pyspark.sql import functions as F

from spartan2_spark.datagen import synth_pages


def test_schema_and_determinism(spark):
    a = synth_pages(spark, 3000, n_urls=50, days=2)
    b = synth_pages(spark, 3000, n_urls=50, days=2)
    assert [f.name for f in a.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    def rowhash(df):
        h = F.pmod(F.xxhash64(*df.columns), F.lit(1_000_000_007))
        return df.select(F.sum(h).alias("h")).collect()[0]["h"]

    ha, hb = rowhash(a), rowhash(b)
    assert ha == hb


def test_skew_and_gaps(spark):
    p = synth_pages(spark, 20000, n_urls=500, days=2)
    counts = (
        p.groupBy("url").count().orderBy(F.desc("count")).limit(5).toPandas()["count"]
    )
    per_url = 20000 / 500
    assert counts.iloc[0] > 5 * per_url  # head-url skew present
    # gap filter dropped some rows
    assert p.count() < 20000
    # multiple langs, deterministic per url
    lang_per_url = p.groupBy("url").agg(F.countDistinct("lang").alias("n"))
    assert lang_per_url.agg(F.max("n")).collect()[0][0] == 1
