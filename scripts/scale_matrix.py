"""Final scaling matrix for the north-rule evidence: the same 1M-doc build
at 2 vs 8 EXECUTORS (local-cluster, one JVM per executor — the rule's
multi-executor shape) and 2 vs 8 THREADS (local[N], single JVM), all four
configs interleaved per rep so host drift hits them comparably; best-of
per config. Prints one JSON line.

Usage: python scripts/scale_matrix.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    ("exec2", "local-cluster[{cpus},1,6144]", 2),
    ("exec8", "local-cluster[{cpus},1,6144]", 8),
    ("thread2", "local[{cpus}]", 2),
    ("thread8", "local[{cpus}]", 8),
]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus_path = os.path.join(tempfile.gettempdir(), f"bench_corpus_{n_docs}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from geocoderpl_spark.session import get_spark
        from geocoderpl_spark.sources.corpus import synth_corpus

        spark = get_spark(app_name="matgen", cpus=32, shuffle_partitions=32)
        synth_corpus(spark, n_docs, partitions=64).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    walls: dict[str, list[float]] = {name: [] for name, _, _ in CONFIGS}
    ctrls: dict[str, list[float]] = {name: [] for name, _, _ in CONFIGS}
    for _ in range(reps):
        for name, master, cpus in CONFIGS:
            env = dict(os.environ, GRAFT_MASTER=master)
            # taskset pins the WHOLE process tree (JVMs, python workers,
            # Arrow's internal thread pool) to exactly `cpus` host CPUs —
            # without it the "2-core" level silently borrows idle host
            # cores through Arrow's default pool, deflating the ratio
            r = subprocess.run(
                ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
                 os.path.join(REPO, "bench.py"), "--build",
                 str(cpus), corpus_path],
                capture_output=True, text=True, cwd=REPO, env=env,
            )
            bl = [l for l in r.stdout.splitlines() if l.startswith("BUILD_SECONDS=")]
            cl = [l for l in r.stdout.splitlines() if l.startswith("CONTROL_SECONDS=")]
            if not bl:
                print(f"# {name} FAILED: {r.stderr[-800:]}", file=sys.stderr)
                continue
            walls[name].append(round(float(bl[0].split("=")[1]), 3))
            if cl:
                ctrls[name].append(round(float(cl[0].split("=")[1]), 3))
            print(f"# {name}: {walls[name][-1]}s", file=sys.stderr, flush=True)

    out: dict = {"n_docs": n_docs, "walls": walls, "ctrl": ctrls}
    for a, b, key in (("exec2", "exec8", "executors"), ("thread2", "thread8", "threads")):
        if walls[a] and walls[b]:
            ta, tb = n_docs / min(walls[a]), n_docs / min(walls[b])
            out[f"{key}_tput_2"] = round(ta, 1)
            out[f"{key}_tput_8"] = round(tb, 1)
            out[f"{key}_eff_2_to_8"] = round((tb / ta) / 4.0, 3)
        if ctrls[a] and ctrls[b]:
            out[f"{key}_ctrl_eff_2_to_8"] = round(
                (min(ctrls[a]) / min(ctrls[b])) / 4.0, 3
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
