"""Large-build scaling pair (north_rule evidence, VERDICT r03 #1).

Runs the SAME index build at two (or three) parallelism levels on the SAME
parquet input with an IDENTICAL physical plan (fixed partition count), each
level in a fresh process (bench.py --build), reps interleaved across levels
so host drift hits all levels comparably. Prints one JSON line:

    {"n_docs": N, "walls": {"2": [..], "8": [..]}, "ctrl": {...},
     "tput": {...}, "eff_2_to_8": raw, "host_ceiling_eff_2_to_8": c,
     "normalized_eff_2_to_8": raw/c}

Why a larger build than bench's default 200k: the Amdahl decomposition in
BASELINE.md measured ~20.5 s of per-build fixed job overhead (scheduling,
stage setup) — at a 33 s build that caps 2->8 efficiency at ~0.35 no matter
how well the kernel scales. At ~1M docs the scalable work is ~5x and the
fixed part is <10% of wall, so the measured ratio reflects the kernel.

Usage: python scripts/scale_pair.py [n_docs] [levels csv] [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_scale_pair(
    n_docs: int,
    levels: tuple[int, ...] = (2, 8),
    reps: int = 2,
    corpus_path: str | None = None,
) -> dict:
    corpus_path = corpus_path or os.path.join(
        tempfile.gettempdir(), f"bench_corpus_{n_docs}"
    )
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        from geocoderpl_spark.session import get_spark
        from geocoderpl_spark.sources.corpus import synth_corpus

        spark = get_spark(app_name="scalegen", cpus=32, shuffle_partitions=32)
        synth_corpus(spark, n_docs, partitions=64).write.mode("overwrite").parquet(
            corpus_path
        )
        spark.stop()

    walls: dict[int, list[float]] = {c: [] for c in levels}
    ctrl: dict[int, list[float]] = {c: [] for c in levels}
    bench = os.path.join(REPO, "bench.py")
    for _rep in range(reps):
        for cpus in levels:  # interleaved: drift hits every level each round
            r = subprocess.run(
                [sys.executable, bench, "--build", str(cpus), corpus_path],
                capture_output=True, text=True, cwd=REPO,
            )
            bl = [l for l in r.stdout.splitlines() if l.startswith("BUILD_SECONDS=")]
            cl = [l for l in r.stdout.splitlines() if l.startswith("CONTROL_SECONDS=")]
            if not bl:
                raise RuntimeError(
                    f"build subprocess failed @ local[{cpus}]: {r.stderr[-2000:]}"
                )
            walls[cpus].append(round(float(bl[0].split("=")[1]), 3))
            if cl:
                ctrl[cpus].append(round(float(cl[0].split("=")[1]), 3))

    tput = {c: round(n_docs / min(walls[c]), 1) for c in levels}
    out: dict = {
        "n_docs": n_docs,
        "walls": {str(c): walls[c] for c in levels},
        "ctrl": {str(c): ctrl[c] for c in levels},
        "tput": {str(c): tput[c] for c in levels},
    }
    for lo, hi in zip(levels, levels[1:]):
        raw = round((tput[hi] / tput[lo]) / (hi / lo), 3)
        out[f"eff_{lo}_to_{hi}"] = raw
        if ctrl[lo] and ctrl[hi]:
            ceil = round((min(ctrl[lo]) / min(ctrl[hi])) / (hi / lo), 3)
            out[f"host_ceiling_eff_{lo}_to_{hi}"] = ceil
            out[f"normalized_eff_{lo}_to_{hi}"] = round(raw / ceil, 3)
    return out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    lv = (
        tuple(int(x) for x in sys.argv[2].split(","))
        if len(sys.argv) > 2
        else (2, 8)
    )
    rp = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    print(json.dumps(run_scale_pair(n, lv, rp)))
