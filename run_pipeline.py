"""spark-submit entry point for the north-rule rollup pipeline.

Cluster:  spark-submit --py-files spartan2_spark.zip run_pipeline.py \
              --pages <parquet path or 'synth:<n_rows>'> --out <dir>
Local:    python run_pipeline.py --pages synth:100000 --out /tmp/tiers

Resumable: re-running with the same --out continues mid-tier from the
checkpoint manifests.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet path or synth:<n_rows>")
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--week-tier", action="store_true",
                    help="append the 1w long-retention hop (t1d -> t1w)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--target-rows-per-salt", type=int, default=1_000_000)
    ap.add_argument(
        "--retain",
        action="append",
        default=[],
        metavar="STAGE=KEEP_DAYS",
        help="retention policy, repeatable (e.g. --retain t1m=30 --retain "
        "t1h=365); applied after the ladder, coverage-gated partition "
        "drops with tombstoned manifests + audit log",
    )
    ap.add_argument(
        "--retain-dry-run",
        action="store_true",
        help="plan retention without deleting anything",
    )
    ap.add_argument(
        "--compact",
        action="append",
        default=[],
        metavar="STAGE=TARGET_ROWS_PER_FILE",
        help="compact a tier stage's dt partitions after the ladder, "
        "repeatable (e.g. --compact t1m=1000000); content-preserving "
        "(per-dt lineage crcs verified identical) so resume and "
        "downstream lineage are untouched",
    )
    ap.add_argument(
        "--assume-frozen-input",
        action="store_true",
        help="skip the per-dt raw-input crc scan that detects late-"
        "arriving rows in already-completed dates; resume then trusts "
        "the manifest alone (use when the input table is append-free, "
        "or when an Iceberg snapshot diff supplies the changed dates)",
    )
    args = ap.parse_args()

    from spartan2_spark.session import get_spark
    from spartan2_spark.plans.pipeline import run_pipeline

    spark = get_spark("rollup-pipeline", master=args.master)

    if args.pages.startswith("synth:"):
        from spartan2_spark.datagen import synth_pages

        pages = synth_pages(spark, int(args.pages.split(":", 1)[1]))
    else:
        pages = spark.read.parquet(args.pages).select(
            "url", "warc_ts", "html", "text", "lang"
        )

    t0 = time.time()
    reports = run_pipeline(
        spark,
        pages,
        args.out,
        resume=not args.no_resume,
        target_rows_per_salt=args.target_rows_per_salt,
        detect_late_data=not args.assume_frozen_input,
        week_tier=args.week_tier,
    )
    out = {"elapsed_sec": round(time.time() - t0, 2), "stages": reports}

    if args.compact:
        from spartan2_spark.operators.compaction import compact_tier

        out["compaction"] = [
            compact_tier(spark, args.out, stage, int(target))
            for stage, target in (s.split("=", 1) for s in args.compact)
        ]

    if args.retain:
        import datetime as dt

        from spartan2_spark.operators.retention import apply_retention

        policies = dict(
            (k, int(v)) for k, v in (s.split("=", 1) for s in args.retain)
        )
        out["retention"] = apply_retention(
            args.out, policies, dt.date.today(), dry_run=args.retain_dry_run
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
