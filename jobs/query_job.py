"""spark-submit entrypoint for the query stage (north_rule: "run via
spark-submit --py-files"): load a built index, answer BM25 top-k.

Usage:
    spark-submit --py-files geocoderpl_spark.zip jobs/query_job.py \
        --index /path/to/index --query "parseHttpResponse term_0042" [--k 10] \
        [--mode pruned|exact] [--fetch lang,source]

    # batch mode: one query per line in a text file
    spark-submit ... jobs/query_job.py --index IDX --queries-file q.txt --k 10

    # boolean: every --query token required, --exclude tokens forbidden
    spark-submit ... jobs/query_job.py --index IDX --query "spark join" \
        --exclude "window" --boolean

    # faceted: restrict ranking to docs matching a docstats predicate
    spark-submit ... jobs/query_job.py --index IDX --query "..." \
        --filter "lang = 'py'"

Serving mode (`--serve`) pins postings in executor memory and the term
dictionary driver-side (when it fits) before answering — the low-latency
path; without it each query plans a cold pruned scan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-file", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", choices=("pruned", "exact"), default="pruned")
    ap.add_argument("--fetch", default=None, help="comma-separated docstats columns to join")
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--boolean", action="store_true",
                    help="conjunctive: all --query tokens required")
    ap.add_argument("--exclude", default="",
                    help="tokens that must NOT appear (implies --boolean)")
    ap.add_argument("--filter", default=None,
                    help="SQL predicate over docstats columns (faceted search)")
    ap.add_argument("--autocomplete", action="store_true",
                    help="prefix mode: a trailing partial word expands to the "
                         "highest-df dictionary terms (with --serve the "
                         "expansion is a driver-side bisect, no dictionary job)")
    args = ap.parse_args(argv)
    if not args.query and not args.queries_file:
        ap.error("one of --query / --queries-file is required")

    from geocoderpl_spark.plans.build import InvertedIndex
    from geocoderpl_spark.session import get_spark

    spark = get_spark(app_name="query_job")
    idx = InvertedIndex.load(spark, args.index)
    if args.serve:
        idx.serve()

    if args.query:
        texts = [args.query]
    else:
        with open(args.queries_file) as f:
            texts = [line.strip() for line in f if line.strip()]
    t0 = time.time()
    allowed = idx.docstats.filter(args.filter) if args.filter else None
    if args.boolean or args.exclude:
        bq = spark.createDataFrame(
            [(i, t, args.exclude, args.k) for i, t in enumerate(texts)],
            "query_id long, must string, must_not string, k int",
        )
        hits = idx.topk_boolean(bq, allowed_docs=allowed)
    else:
        q = spark.createDataFrame(
            [(i, t, args.k) for i, t in enumerate(texts)],
            "query_id long, query_text string, k int",
        )
        if args.autocomplete and allowed is not None:
            ap.error("--autocomplete does not compose with --filter yet")
        if args.autocomplete:
            hits = idx.autocomplete(q)
        elif allowed is not None:
            hits = idx.topk_filtered(q, allowed)
        else:
            hits = idx.topk(q, mode=args.mode)
    if args.fetch:
        hits = idx.fetch(hits, cols=[c.strip() for c in args.fetch.split(",")])
    rows = hits.orderBy("query_id", "rank").collect()
    wall = time.time() - t0
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    print(
        f"# {len(texts)} queries, {len(rows)} rows, {wall:.3f}s "
        f"({wall / max(len(texts), 1) * 1000:.1f} ms/query, mode={args.mode})",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
