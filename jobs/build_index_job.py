"""spark-submit entrypoint for the index build (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage:
    spark-submit --py-files geocoderpl_spark.zip jobs/build_index_job.py \
        --corpus /path/to/corpus_parquet --out /path/to/index \
        [--id-col doc_id] [--content-col content] [--buckets 64] [--partitions N]

On a cluster the session comes from spark-submit's conf (master, executors);
locally it falls back to local[SPARK_GRAFT_CPUS]. The job is resumable: re-run
with the same --out to continue from the last completed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# running as `python jobs/build_index_job.py` puts jobs/ (not the repo root)
# on sys.path; under spark-submit the package ships via --py-files instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default=None)
    ap.add_argument("--content-col", default="content")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args(argv)

    from pyspark import SparkConf
    from pyspark.sql import SparkSession

    if SparkConf().contains("spark.master"):
        # launched via spark-submit: respect the submitted master/executors
        spark = SparkSession.builder.getOrCreate()
    else:
        from geocoderpl_spark.session import get_spark

        spark = get_spark(app_name="build_index_job")

    from geocoderpl_spark.plans.build import build_index

    t0 = time.time()
    corpus = spark.read.parquet(args.corpus)
    idx = build_index(
        spark,
        corpus,
        args.out,
        n_buckets=args.buckets,
        partitions=args.partitions,
        id_col=args.id_col,
        content_col=args.content_col,
    )
    print(
        json.dumps(
            {
                "out": args.out,
                "n_docs": idx.n_docs,
                "avgdl": round(idx.avgdl, 3),
                "n_buckets": idx.n_buckets,
                "wall_sec": round(time.time() - t0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
