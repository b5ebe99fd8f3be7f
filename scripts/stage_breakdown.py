"""Per-stage wall breakdown of one index build at a given parallelism.

Usage: python scripts/stage_breakdown.py <cpus> <corpus_path> [n_buckets] [partitions]
Prints the build's metrics.jsonl stage walls plus total.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    corpus_path = sys.argv[2]
    n_buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    partitions = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    from geocoderpl_spark.plans.build import build_index
    from geocoderpl_spark.session import get_spark
    from geocoderpl_spark.sources.corpus import synth_corpus

    spark = get_spark(app_name=f"stages{cpus}", cpus=cpus, shuffle_partitions=cpus)
    spark.range(0, cpus * 10, 1, cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    warm = tempfile.mkdtemp(prefix="stagewarm_")
    build_index(spark, synth_corpus(spark, 5000, partitions=cpus), warm,
                n_buckets=n_buckets, partitions=cpus)
    shutil.rmtree(warm, ignore_errors=True)

    out = tempfile.mkdtemp(prefix=f"stageidx{cpus}_")
    corpus = spark.read.parquet(corpus_path)
    t0 = time.time()
    build_index(spark, corpus, out, n_buckets=n_buckets, partitions=partitions)
    total = time.time() - t0
    stages = [json.loads(l) for l in open(os.path.join(out, "metrics", "metrics.jsonl"))]
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus, "total_s": round(total, 2),
        "stages": {s["stage"]: round(s["wall_ms"] / 1000, 2) for s in stages},
    }))


if __name__ == "__main__":
    main()
