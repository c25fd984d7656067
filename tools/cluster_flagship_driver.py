"""spark-submit application for the multi-executor scaling evidence.

Runs the PRODUCTION ladder (plans.pipeline.run_pipeline: canonical text
-> t1m -> t1h -> t1d -> dense gap-fill -> Gorilla blocks, manifests
included) against a standalone cluster, exactly as a real deployment
would: ``spark-submit --master spark://... --py-files spartan2_spark.zip
tools/cluster_flagship_driver.py``.

One warm-up pass first (executor JVMs pay whole-stage-codegen JIT once
per lifetime, like any long-running cluster job), then ``--passes``
measured passes into fresh output roots. Prints ONE line starting with
``CLUSTER_FLAGSHIP_RESULT `` followed by a JSON object; the orchestrator
(tools/cluster_scaling.py) parses it.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", required=True, help="spark:// master URL")
    ap.add_argument("--pages", required=True, help="measured pages parquet")
    ap.add_argument("--warmup-pages", required=True, help="small pages parquet")
    ap.add_argument("--out", required=True, help="output root (per-pass subdirs)")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--shuffle-partitions", type=int, required=True)
    args = ap.parse_args()

    from spartan2_spark.plans.pipeline import run_pipeline
    from spartan2_spark.session import get_spark

    spark = get_spark(
        "cluster-flagship",
        master=args.master,
        shuffle_partitions=args.shuffle_partitions,
    )

    def load(path):
        return spark.read.parquet(path).select(
            "url", "warc_ts", "html", "text", "lang"
        )

    run_pipeline(
        spark, load(args.warmup_pages), os.path.join(args.out, "warmup"),
        resume=False,
    )

    pages = load(args.pages)
    n_rows = pages.count()  # metadata-only; outside every timed window

    passes = []
    for i in range(args.passes):
        out = os.path.join(args.out, f"pass{i}")
        t0 = time.time()
        reports = run_pipeline(spark, pages, out, resume=False)
        elapsed = time.time() - t0
        passes.append(
            {
                "elapsed_sec": round(elapsed, 2),
                "points_per_sec": round(n_rows / elapsed, 1),
                "stage_secs": {r["stage"]: r["wall_sec"] for r in reports},
            }
        )

    best = max(passes, key=lambda p: p["points_per_sec"])
    print(
        "CLUSTER_FLAGSHIP_RESULT "
        + json.dumps({"raw_points": n_rows, "passes": passes, "best": best})
    )
    spark.stop()


if __name__ == "__main__":
    main()
