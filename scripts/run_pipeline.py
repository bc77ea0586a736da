"""spark-submit entry point for the KG-construction pipeline.

Cluster (north_rule: two cluster sizes, N and 4N executors):

    zip -r nerpii_spark.zip nerpii_spark
    spark-submit --py-files nerpii_spark.zip \\
        --num-executors $N --executor-cores 4 \\
        scripts/run_pipeline.py --pages s3://bucket/pages --out s3://bucket/kg

Sandbox stand-in (local mode; parallelism levels emulate cluster sizes —
see tools/bench_scaling.py):

    python scripts/run_pipeline.py --sf-dir /root/testdata/sf0.01 \\
        --out /tmp/kg_run --cores 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", help="path of an existing pages table (parquet)")
    ap.add_argument("--sf-dir", help="derive the planted pages corpus from"
                                     " this testdata dir's documents table")
    ap.add_argument("--out", required=True)
    ap.add_argument("--cores", type=int, default=0)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--run-id", default=f"run-{int(time.time())}")
    ap.add_argument("--stop-after", default=None,
                    help="stage name; simulate a mid-run failure")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from nerpii_spark.pipeline import Pipeline, PipelineConfig
    from nerpii_spark.sources import pages as P

    if SparkSession.getActiveSession():
        spark = SparkSession.getActiveSession()  # under spark-submit
    else:
        from nerpii_spark.session import get_spark

        spark = get_spark(cores=args.cores or None)

    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.sf_dir:
        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        docs.createOrReplaceTempView("run_documents")
        pages = (
            spark.sql(P.pages_sql("spark", doc_rel="run_documents", with_html=True))
            .drop("text")
            .withColumn("text", F.lit(None).cast("string"))
        )
    else:
        ap.error("one of --pages / --sf-dir is required")

    cfg = PipelineConfig(
        root=args.out, n_buckets=args.n_buckets, run_id=args.run_id
    )
    pipe = Pipeline(spark, cfg)
    t0 = time.perf_counter()
    out = pipe.run(pages, stop_after=args.stop_after)
    stats = {
        "run_id": args.run_id,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "executed": cfg.executed,
        "skipped_resume": cfg.skipped,
        "tables": {k: v.count() for k, v in out.items()},
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
