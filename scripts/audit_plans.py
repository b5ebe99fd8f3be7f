"""Regenerate PLANS.md: physical-plan evidence for the engine's key
pipelines (predicate pushdown on posting scans, broadcast joins, codegen
spans, shuffle structure). Run after operator changes:

    python scripts/audit_plans.py
"""

from __future__ import annotations

import io
import shutil
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from geocoderpl_spark.session import get_spark

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(cpus=8)
    idx = entrymod._index_for(spark, SF)
    sections: list[tuple[str, str, str]] = []

    # 1. cold pruned posting scan: partition-dir + row-group pruning evidence
    q = spark.createDataFrame([(0, "the fast scan", 10)], "query_id long, query_text string, k int")
    sections.append((
        "Query stage — cold pruned posting scan (partition pruning evidence)",
        "The dictionary gate resolves term_ids driver-side; the file-level "
        "stats manifest (plans/manifest.py) then enumerates exactly the "
        "posting files whose (bucket, term_id-range) can match — no "
        "directory listing — and the scan still carries literal filters: "
        "`PartitionFilters: [bucket IN (...)]` plus "
        "`PushedFilters: [In(term_id, ...)]` for Parquet row-group min/max "
        "skipping WITHIN each opened file (blocks are term_id-contiguous "
        "per file). The reference's 9-of-40,000-sector fetch, J4/O4.",
        plan_of(idx.topk(q, "pruned")),
    ))

    # 1b. manifest file enumeration evidence (inputFiles, not just explain)
    from geocoderpl_spark.operators.topk import _pruned_scan
    from geocoderpl_spark.plans.manifest import load_postings_manifest, manifest_scan

    ents = load_postings_manifest(idx.root) or []
    tid = [r["term_id"] for r in idx.terms.filter(F.col("term") == "the").collect()]
    mdf = manifest_scan(spark, idx.root, ents, tid, idx.n_buckets)
    ddf = _pruned_scan(idx.postings, tid, idx.n_buckets)
    note = (
        f"Manifest records {len(ents)} posting files with per-file "
        f"(bucket, term_id min/max). A 1-term query opens "
        f"{len(mdf.inputFiles())} file(s) via the manifest vs "
        f"{len(ddf.inputFiles())} enumerated by directory listing + "
        "partition pruning — same rows, no listing at 10^5+ files/bucket."
    )
    sections.append((
        "Query stage — manifest file enumeration (Iceberg-style)",
        note,
        plan_of(mdf),
    ))

    idx.serve()
    sections.append((
        "Query stage — served (driver tier active)",
        "With serve() the pruned mode answers from the driver-side tier "
        "(plans/serving.py): the 'plan' is a LocalTableScan of the already-"
        "computed result — zero Spark execution per query (r4; gate "
        "fts_bm25_topk_served certifies it against the BM25 oracle). The "
        "Spark MaxScore pipeline remains the path for hot/over-cap and "
        "batch queries — its plan is the exact section below plus the "
        "applyInPandas kernel exchange.",
        plan_of(idx.topk(q, "pruned")),
    ))

    # 2. exact distributed scoring
    sections.append((
        "Query stage — exact distributed BM25 (batch path)",
        "Pruned scan -> Arrow decode -> broadcast-joined query terms -> "
        "partial-aggregated score sum -> window top-k. All joins on the "
        "query side are broadcasts; the only wide exchange is the "
        "score groupBy, keyed by (query_id, doc_id) — skew-free.",
        plan_of(idx.topk(q, "exact")),
    ))

    # 3. tf + postings build plan (logical shape)
    from geocoderpl_spark.operators.postings import build_postings, build_terms, term_frequencies_arrow

    docs = entrymod._docs(spark, SF).withColumnRenamed("text", "content")
    tf = term_frequencies_arrow(docs)
    terms = build_terms(tf)
    sections.append((
        "Build stage — tf kernel (mapInArrow, shuffle-free)",
        "One scan, one ArrowEvalPython/MapInArrow node, zero exchanges: "
        "tokenize + per-doc tf counting are per-row maps; the kernel is "
        "pure Arrow C++ (RE2 + hash group-by), no Python string objects "
        "(SCALE.md kernel study).",
        plan_of(tf),
    ))
    sections.append((
        "Build stage — posting construction",
        "tf is shuffle-free (per-doc Arrow kernel). Postings: broadcast "
        "term-dictionary join, hash repartition on (bucket, doc-slice) "
        "(deterministic; hot terms split across slices), sort within "
        "partitions, Arrow encode kernel. No sampled range boundaries.",
        plan_of(build_postings(tf, terms, 100.0, 16, 8, n_docs=500)),
    ))

    # 4. a relational demo: broadcast dim join
    sections.append((
        "Relational — customer->nation->region rollup",
        "Both dims broadcast (BroadcastHashJoin); scan prunes columns "
        "(ReadSchema shows only the 3 needed customer columns).",
        plan_of(entrymod.q_rel_broadcast_join(spark, SF)),
    ))

    # 4b. autocomplete: dictionary expansion + shared scoring tail
    sections.append((
        "Query stage — autocomplete (prefix expansion)",
        "The prefix expansion is a PUSHED RANGE predicate on the "
        "term-sorted dictionary (`term >= p AND term < p||'{'` in "
        "PushedFilters — Parquet row-group min/max skipping, no "
        "BroadcastNestedLoopJoin, no full-dictionary scan), query ids "
        "attach via per-prefix-length broadcast equi-joins, and the merged "
        "term set flows through the same literal-pruned scan + "
        "broadcast-join scoring tail as exact queries.",
        plan_of(entrymod.q_fts_autocomplete(spark, SF)),
    ))

    # 4b2. boolean + filtered search
    sections.append((
        "Query stage — boolean search (must / must_not)",
        "One literal-pruned posting scan over must ∪ must_not ids; the AND "
        "is a counting HashAggregate keyed (query_id, doc_id) (partial agg "
        "before the exchange), the NOT a left_anti BroadcastHashJoin / SMJ "
        "on the same key. No cartesian, no per-term driver loop.",
        plan_of(entrymod.q_fts_boolean(spark, SF)),
    ))
    sections.append((
        "Query stage — faceted (metadata-filtered) BM25",
        "The lang predicate becomes a doc_id semi-join applied AFTER the "
        "term prune and BEFORE scoring (AQE sizes it); corpus stats stay "
        "global so scores are comparable across filters.",
        plan_of(entrymod.q_fts_filtered_topk(spark, SF)),
    ))
    sections.append((
        "Query stage — snippets (hit highlighting)",
        "The hit set's doc_ids are a LITERAL pushed filter on the corpus "
        "scan (J9 point-fetch shape — PushedFilters: [In(doc_id, ...)]), "
        "hits+query-terms broadcast onto the fetched docs, and the "
        "position/window math is pure JVM array expressions (no UDF).",
        plan_of(entrymod.q_fts_snippets(spark, SF)),
    ))

    # 4c. indexed phrase search over positional postings
    sections.append((
        "Query stage — indexed phrase search (positional postings)",
        "Literal bucket/term_id pruning on the positional blocks, Arrow "
        "decode of positions, ordinal-shift explode, and two uniform "
        "(doc_id, adj)-keyed aggregations — no cartesian anywhere; the "
        "scan touches only the phrase terms' buckets.",
        plan_of(entrymod.q_fts_phrase_indexed(spark, SF)),
    ))

    # 4d. persisted IVF: partition-dir pruned candidate scan
    from geocoderpl_spark.plans.ann_index import build_ivf_index

    ivf_root = tempfile.mkdtemp(prefix="plans_ivf_")
    ivf = build_ivf_index(
        spark, spark.read.parquet(f"{SF}/embeddings.parquet"), ivf_root, dim=64
    )
    sections.append((
        "ANN — persisted IVF index (partition-dir pruned scan)",
        "nprobe selection runs driver-side against the pinned centroid "
        "table (no Spark job); the candidate scan carries "
        "`PartitionFilters: [list_id IN (...)]` — only the probes' nprobe "
        "list directories are read (executed-file test in "
        "test_pipeline_ops.py).",
        plan_of(ivf.topk([0, 1, 2], k=5)),
    ))
    sections.append((
        "ANN — persisted IVF probe-vector fetch (id-sorted sidecar)",
        "The serve-time probe fetch (r4, VERDICT r03 #1) reads the "
        "id-SORTED (id, list_id, vec) sidecar with a pushed `vec_id IN "
        "(...)` — Parquet row-group min/max skipping on the sort column, "
        "never a scan of the list_id partition dirs (executed-file test "
        "in test_serving.py). Callers holding the query vectors can skip "
        "the fetch entirely via the probe_vecs argument.",
        plan_of(ivf.ids.filter(F.col("vec_id").isin([0, 1, 2]))),
    ))
    shutil.rmtree(ivf_root, ignore_errors=True)

    # 4e. segmented (LSM) boolean + filtered — the r4 feature-parity paths
    sections.append((
        "Segmented (LSM) — boolean search over positional segments",
        "Per-segment manifest-pruned scans, term_ids remapped to global "
        "query ordinals, ONE role-tagged (query_id, doc_id) aggregate "
        "carrying the BM25 sum + AND count + NOT veto (shared "
        "_boolean_tail with the single-index path — same oracle).",
        plan_of(entrymod.q_stream_boolean(spark, SF)),
    ))
    sections.append((
        "Segmented (LSM) — faceted BM25 over positional segments",
        "Same filter-query semantics as the single index: global N/avgdl/"
        "df (driver-side dictionary probes), doc_id semi-join before the "
        "shared scoring tail; positions column-pruned out of every "
        "segment scan.",
        plan_of(entrymod.q_stream_filtered_topk(spark, SF)),
    ))
    sections.append((
        "Serving tier — driver-side topk (no Spark plan by design)",
        "`InvertedIndex.serve()` pins the vocabulary + file manifest and "
        "answers pruned top-k with DIRECT parquet block reads feeding the "
        "same MaxScore kernel in-process (plans/serving.py) — zero Spark "
        "jobs per query (job-count test in test_serving.py), results "
        "bit-identical to the Spark kernel path (gate "
        "fts_bm25_topk_served hash-matches the BM25 oracle). Hot/over-cap "
        "queries route to the distributed plan above. There is no "
        "physical plan to print: the absence of one IS the design.",
        "(driver-side execution — see plans/serving.py)",
    ))

    # 5. coords route: sector-pruned NN lookup
    sections.append((
        "Coords route — sector-pruned NN + fetch (georoute.py)",
        "The sector directory (distinct cells) and the per-query nearest-9 "
        "sector set are broadcast; the big point table is scanned once and "
        "filtered by the broadcast hash join on (cell_x, cell_y) — the "
        "partition-pruning shape (on a cell-partitioned table the same "
        "literal cell list reaches PartitionFilters, like the bucket prune). "
        "The final fetch broadcasts the k winning rows.",
        plan_of(entrymod.q_route_coords_lookup(spark, SF)),
    ))

    with open("PLANS.md", "w") as f:
        f.write(
            "# PLANS — physical-plan audit (regenerate: `python scripts/audit_plans.py`)\n\n"
            "Evidence that the declared plans compile to the physical strategies\n"
            "the 100TB design depends on: parquet predicate pushdown + row-group\n"
            "skipping on posting scans, broadcast joins for dictionaries/dims,\n"
            "single-shuffle query paths, whole-stage codegen on relational ops.\n"
        )
        for title, note, plan in sections:
            f.write(f"\n## {title}\n\n{note}\n\n```\n{plan}```\n")
    print("PLANS.md written")


if __name__ == "__main__":
    main()
