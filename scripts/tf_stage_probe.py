"""Attribute the tf-stage wall: ranking (eager) vs id join-back vs kernel.

Usage: GRAFT_MASTER=... taskset -c ... python scripts/tf_stage_probe.py <cpus> <corpus>
"""

from __future__ import annotations

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

    from pyspark.sql import functions as F

    from geocoderpl_spark.operators.docids import assign_doc_ids
    from geocoderpl_spark.operators.postings import tf_docstats_direct
    from geocoderpl_spark.session import get_spark

    spark = get_spark(app_name=f"tfprobe{cpus}", cpus=cpus, shuffle_partitions=cpus)
    spark.range(0, cpus * 10, 1, cpus).mapInPandas(lambda it: it, schema="id long").count()
    corpus = spark.read.parquet(corpus_path)
    key_cols = ["repo", "path", "commit"]

    t0 = time.time()
    ids = assign_doc_ids(corpus.select(*key_cols), key_cols, 32)
    t_rank = time.time() - t0  # eager: sampler + window persist + counts collect

    total = getattr(ids, "_rank_total", None)
    t0 = time.time()
    joined = corpus.select(*key_cols, "content").join(F.broadcast(ids), key_cols)
    joined.write.format("noop").mode("overwrite").save()
    t_join = time.time() - t0  # broadcast build + scan + probe (no kernel)

    t0 = time.time()
    out = tempfile.mkdtemp(prefix=f"tfprobe{cpus}_")
    docs = joined
    stats = tf_docstats_direct(docs, [], out, "content")
    stats.write.format("noop").mode("overwrite").save()
    t_kernel = time.time() - t0  # broadcast join + kernel + tf write (no docstats sink)
    shutil.rmtree(out, ignore_errors=True)

    print(
        {
            "cpus": cpus,
            "n": total,
            "rank_s": round(t_rank, 2),
            "join_noop_s": round(t_join, 2),
            "kernel_s": round(t_kernel, 2),
        }
    )


if __name__ == "__main__":
    main()
