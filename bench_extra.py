"""Per-operator isolation bench (guide §1.4) — NOT the driver metric.

Times each declared query through a noop sink (computes every column of
every row, no sink cost), labelled via setJobDescription, best-of-reps.
``bench.py`` stays the frozen driver contract; numbers from here are cited
as isolation evidence in OPTIMIZATION_r06.md.

Usage: python bench_extra.py [sf_dir] [query ...]   (default: all queries)
Prints one JSON line: {"sf": ..., "noop_sec": {name: best_wall, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def main() -> None:
    import __spark_entry__ as entrymod
    from geocoderpl_spark.session import get_spark

    spark = get_spark(app_name="bench_extra")
    spark.range(0, 320, 1, 32).mapInPandas(lambda it: it, schema="id long").count()

    only = set(sys.argv[2:])
    out: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        sc = spark.sparkContext
        try:
            walls = []
            for rep in range(REPS):
                sc.setJobDescription(f"noop:{name}:rep{rep}")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            out[name] = round(min(walls), 3)
        except Exception as e:  # noqa: BLE001 — report, keep benching
            out[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
        finally:
            sc.setJobDescription(None)
    print(json.dumps({"sf": SF_DIR, "reps": REPS, "noop_sec": out}))


if __name__ == "__main__":
    main()
