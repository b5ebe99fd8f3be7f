"""Index-build plan: corpus -> docstats + tf + terms + postings + meta,
with per-stage checkpointing, per-partition lineage, and a metrics table.

Reference parity:
- build-once / resume guard: ``__main__.py:17`` (``has_table`` check) ->
  per-stage ``_SUCCESS`` markers; completed stages are *read back*, not
  recomputed (SURVEY.md §4 O15).
- timing log: ``geo_utilities.py:57-86`` (``time_decorator``) -> ``metrics``
  parquet table, one row per stage.
- lineage: per-bucket posting/row counts -> ``lineage`` parquet table
  (north_rule: "resumable from checkpoint with per-partition lineage +
  metrics tables").

Layout under ``out_dir``::

    docstats/   doc_id, repo, path, commit, lang, doclen, sha256
    tf/         term, doc_id, doclen, tf, sha256  (staging checkpoint; sha256
                non-NULL on one row per doc, term-NULL sentinel rows carry
                zero-token docs — docstats derives from here, one tokenize)
    terms/      term, term_id, df, cf
    postings/   bucket=*/...  (compressed blocks, POSTINGS_SCHEMA)
    meta/       n_docs, avgdl, n_buckets, partitions
    lineage/    bucket, n_blocks, n_postings, n_terms
    metrics/    stage, rows_out, wall_ms, status
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.docids import assign_doc_ids
from ..operators.postings import (
    N_BUCKETS,
    build_postings,
    build_terms,
    docstats_arrow,
    docstats_pandas,
    term_frequencies_arrow,
    term_frequencies_pandas,
)


def _kernels():
    """Hot-stage kernel selector: 'arrow' (mapInArrow, zero Python string
    objects — default: measurably faster AND the only variant that scales
    past 8 threads, see SCALE.md scaling study) or 'pandas' (python-re
    loop, GRAFT_TF_KERNEL=pandas). Both token-identical (4-way parity test)."""
    if os.environ.get("GRAFT_TF_KERNEL", "arrow") == "pandas":
        return term_frequencies_pandas, docstats_pandas
    return term_frequencies_arrow, docstats_arrow


def _tf_kernel_positional():
    from ..operators.postings import term_positions_arrow

    return term_positions_arrow

STAGES = ("docstats", "tf", "terms", "postings", "meta")


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _unpersist(df: DataFrame) -> None:
    for attr in ("_dense_ids_cache", "_stats_cache"):
        cache = getattr(df, attr, None)
        if cache is not None:
            cache.unpersist()


@dataclass
class InvertedIndex:
    """Handle over a built index directory."""

    root: str
    spark: SparkSession
    n_docs: int
    avgdl: float
    n_buckets: int
    positional: bool = False

    @property
    def postings(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "postings"))

    @property
    def terms(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "terms"))

    @property
    def docstats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.root, "docstats"))

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "InvertedIndex":
        import json

        with open(os.path.join(root, "meta", "meta.json")) as f:
            meta = json.load(f)
        return cls(
            root=root,
            spark=spark,
            n_docs=int(meta["n_docs"]),
            avgdl=float(meta["avgdl"]),
            n_buckets=int(meta["n_buckets"]),
            positional=bool(meta.get("positional", False)),
        )

    _terms_cached: DataFrame | None = None
    _postings_cached: DataFrame | None = None
    _term_lookup: dict | None = None
    _sorted_terms: list | None = None
    _local_reader: object | None = None
    _local_pos_reader: object | None = None
    _docs_source: str | None = None
    _docs_id_col: str = "doc_id"
    _docs_text_col: str = "text"

    # Driver-side vocabulary cutover: above this many terms the dictionary
    # stays distributed (broadcast-join gate, topk.py) instead of being
    # collected — at 1e9 terms a driver-resident dict would be ~30 GB.
    MAX_DRIVER_TERMS = 20_000_000
    # Query batches beyond this are not serving-shaped: the driver-side
    # loop would serialize a batch workload — route to the distributed
    # pruned plan instead (same guard as SegmentedIndex, ADVICE r04).
    MAX_DRIVER_QUERIES = 10_000

    def serve(
        self,
        max_driver_terms: int | None = None,
        docs_source: str | None = None,
        docs_id_col: str = "doc_id",
        docs_text_col: str = "text",
    ) -> "InvertedIndex":
        """Pin posting blocks in executor memory and — when the vocabulary is
        small enough — the term dictionary in the driver for low-latency
        serving (reference analog: the GUI keeps the vocabulary string and
        sector index resident, ``geo_gui.py:36-43``). Beyond
        ``max_driver_terms`` the collect is skipped automatically and queries
        gate through the distributed broadcast join. Idempotent.

        ``docs_source`` (a parquet path of the corpus) additionally enables
        the serve-mode snippets path (:meth:`snippets`): hit docs are
        point-fetched with a direct pyarrow read instead of a Spark job."""
        if docs_source is not None:
            self._docs_source = docs_source
            self._docs_id_col = docs_id_col
            self._docs_text_col = docs_text_col
        if max_driver_terms is None:
            max_driver_terms = self.MAX_DRIVER_TERMS
        if self._postings_cached is None:
            self._postings_cached = self.postings.persist()
            self._postings_cached.count()
            self._terms_cached = self.terms.persist()
            if self._terms_cached.count() <= max_driver_terms:
                self._term_lookup = {
                    r["term"]: (r["term_id"], r["df"])
                    for r in self._terms_cached.collect()
                }
                # sorted vocabulary: serve-mode autocomplete expands prefixes
                # with a driver-side bisect — zero Spark jobs before the
                # posting scan (VERDICT r03 #7)
                self._sorted_terms = sorted(self._term_lookup)
        if self._term_lookup is not None and self._local_reader is None:
            # driver-side serving tier (plans/serving.py): manifest + direct
            # parquet block reads + the same MaxScore kernel — zero Spark
            # jobs per query (VERDICT r03 #6)
            from .manifest import load_postings_manifest

            entries = load_postings_manifest(self.root)
            if entries:
                from .serving import LocalBlockReader

                self._local_reader = LocalBlockReader(
                    self.root, self.n_buckets, entries
                )
                if self.positional:
                    # separate reader (own cache) carrying the positions
                    # stream — the BM25 paths must never fetch it
                    self._local_pos_reader = LocalBlockReader(
                        self.root, self.n_buckets, entries,
                        with_positions=True,
                    )
        return self

    def _serving_source(self):
        """The pinned single-source list for the driver-side tails, or None
        when not serving (then every mode uses its distributed plan)."""
        if self._local_reader is None or self._term_lookup is None:
            return None
        from .serving import ServingSource

        return [ServingSource(
            self._local_reader, self._term_lookup,
            pos_reader=self._local_pos_reader,
        )]

    def _collect_capped(self, df: DataFrame, cap: int) -> list | None:
        """Collect up to ``cap`` rows; None when the frame exceeds it (the
        caller stays distributed)."""
        rows = df.limit(cap + 1).collect()
        return None if len(rows) > cap else rows

    # Metadata-filter sets beyond this many doc_ids are not pinned driver-
    # side; the filtered query falls back to the distributed semi-join plan.
    MAX_DRIVER_FILTER_DOCS = 2_000_000

    def fetch(self, topk: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Row-fetch phase (reference J9/J10: rowid point-lookup after the
        index scan, ``geo_gui.py:190-202``): join top-k hits to docstats for
        display metadata. k rows vs the docstats table — broadcast the hits."""
        stats = self.docstats
        cols = cols or [c for c in stats.columns if c not in ("doc_id",)]
        return F.broadcast(topk).join(stats, "doc_id").select(
            "query_id", "rank", "doc_id", "score", *cols
        )

    _query_cache: dict | None = None
    QUERY_CACHE_SIZE = 1024

    def query(self, text: str, k: int = 10) -> list:
        """Single-query serving entrypoint with an LRU result cache —
        the reference keeps a query->result dict in the GUI process
        (``res_coords``, ``geo_gui.py:71,202,248``); repeated queries never
        touch Spark. Returns [(rank, doc_id, score), ...]."""
        if self._query_cache is None:
            self._query_cache = {}
        key = (text, int(k))
        hit = self._query_cache.get(key)
        if hit is not None:
            self._query_cache.pop(key)
            self._query_cache[key] = hit  # LRU refresh
            return hit
        rows = None
        if self._local_reader is not None and self._term_lookup is not None:
            # full driver-side path (r4): no DataFrame, no Spark roundtrip —
            # a cold single query answers in single-digit ms (the measured
            # Spark floor is ~250 ms just to collect a 7-row local relation)
            from ..operators.topk import MAX_BLOCKS_PER_TERM, _hot_df_threshold
            from .serving import topk_local

            res, spark_qids = topk_local(
                self._local_reader,
                [{"query_id": 0, "query_text": text, "k": int(k)}],
                self._term_lookup, self.n_docs, self.avgdl,
                _hot_df_threshold(MAX_BLOCKS_PER_TERM),
            )
            if not spark_qids:  # hot queries still go through Spark below
                res = res.sort_values("rank")
                rows = [
                    (int(r), int(d), float(s))
                    for r, d, s in zip(res["rank"], res["doc_id"], res["score"])
                ]
        if rows is None:
            q = self.spark.createDataFrame(
                [(0, text, int(k))], "query_id long, query_text string, k int"
            )
            rows = [
                (r["rank"], r["doc_id"], r["score"])
                for r in self.topk(q, mode="pruned").orderBy("rank").collect()
            ]
        self._query_cache[key] = rows
        while len(self._query_cache) > self.QUERY_CACHE_SIZE:
            self._query_cache.pop(next(iter(self._query_cache)))
        return rows

    _manifest_entries: list | None = None
    _manifest_sig: tuple | None = None

    def _manifest_scan(self):
        """term_ids -> DataFrame via the file-level stats manifest
        (plans/manifest.py): files are enumerated from recorded per-file
        term_id ranges, not directory listings. None when serving from the
        pinned in-memory postings (no file scan at all then) or when the
        index predates the manifest."""
        if self._postings_cached is not None:
            return None
        from .manifest import _manifest_path, load_postings_manifest

        # cache keyed on the manifest file's stat signature: a postings
        # rebuild under the same root rewrites the manifest (atomic rename),
        # which must invalidate entries pointing at the old file UUIDs
        try:
            st = os.stat(_manifest_path(self.root))
            sig = (st.st_mtime_ns, st.st_size)
        except OSError:
            sig = None
        if sig != self._manifest_sig:
            self._manifest_entries = (
                load_postings_manifest(self.root) or [] if sig else []
            )
            self._manifest_sig = sig
        if not self._manifest_entries:
            return None
        from .manifest import manifest_scan

        entries = list(self._manifest_entries)
        return lambda tids: manifest_scan(
            self.spark, self.root, entries, tids, self.n_buckets
        )

    def topk(self, queries: DataFrame, mode: str = "exact") -> DataFrame:
        from ..operators.topk import query_topk_exact, query_topk_pruned

        postings = self._postings_cached if self._postings_cached is not None else self.postings
        terms = self._terms_cached if self._terms_cached is not None else self.terms
        scan = self._manifest_scan()
        if mode == "exact":
            return query_topk_exact(
                postings, terms, queries, self.n_docs, self.avgdl,
                n_buckets=self.n_buckets, scan=scan,
            )
        if self._local_reader is not None and self._term_lookup is not None:
            # serving tier: answer the batch driver-side (same kernel, same
            # results); only hot / over-cap queries touch Spark. Batch-scale
            # callers (ADVICE r04): past MAX_DRIVER_QUERIES the collect is
            # abandoned and the WHOLE batch keeps the distributed pruned
            # plan — a served index must not silently serialize a batch
            # workload through a single-threaded driver loop.
            from ..operators.topk import (
                MAX_BLOCKS_PER_TERM,
                TOPK_SCHEMA,
                _hot_df_threshold,
            )
            from .serving import topk_local

            qrows = queries.limit(self.MAX_DRIVER_QUERIES + 1).collect()
            if len(qrows) > self.MAX_DRIVER_QUERIES:
                return query_topk_pruned(
                    postings, terms, queries, self.n_docs, self.avgdl,
                    term_lookup=self._term_lookup, n_buckets=self.n_buckets,
                    scan=scan,
                )
            res, spark_qids = topk_local(
                self._local_reader, qrows, self._term_lookup,
                self.n_docs, self.avgdl, _hot_df_threshold(MAX_BLOCKS_PER_TERM),
            )
            out = (
                self.spark.createDataFrame(res, schema=TOPK_SCHEMA)
                if len(res)
                else self.spark.createDataFrame([], TOPK_SCHEMA)
            )
            if spark_qids:
                rest = query_topk_pruned(
                    postings, terms,
                    queries.filter(F.col("query_id").isin(spark_qids)),
                    self.n_docs, self.avgdl, term_lookup=self._term_lookup,
                    n_buckets=self.n_buckets, scan=scan,
                )
                out = out.unionByName(rest)
            return out
        return query_topk_pruned(
            postings, terms, queries, self.n_docs, self.avgdl,
            term_lookup=self._term_lookup, n_buckets=self.n_buckets, scan=scan,
        )

    def topk_filtered(self, queries: DataFrame, allowed_docs: DataFrame) -> DataFrame:
        """Faceted search: BM25 top-k restricted to ``allowed_docs`` (doc_id
        frame, e.g. ``idx.docstats.filter(...)``); global scoring stats.

        Serve mode (VERDICT r04 #5): with a pinned reader and a filter set
        within ``MAX_DRIVER_FILTER_DOCS``, the whole query answers driver-
        side (decoded candidate rows ∩ allowed set, exact scoring) — hot /
        over-cap queries and batch-scale inputs keep the distributed plan."""
        from ..operators.topk import query_topk_filtered

        postings = self._postings_cached if self._postings_cached is not None else self.postings
        terms = self._terms_cached if self._terms_cached is not None else self.terms
        sources = self._serving_source()
        if sources is not None:
            qrows = self._collect_capped(queries, self.MAX_DRIVER_QUERIES)
            arows = (
                self._collect_capped(
                    allowed_docs.select("doc_id"), self.MAX_DRIVER_FILTER_DOCS
                )
                if qrows is not None
                else None
            )
            if qrows is not None and arows is not None:
                import numpy as np

                from ..operators.topk import (
                    MAX_BLOCKS_PER_TERM,
                    TOPK_SCHEMA,
                    _hot_df_threshold,
                )
                from .serving import filtered_topk_local

                res, spark_qids = filtered_topk_local(
                    sources, qrows, self.n_docs, self.avgdl,
                    _hot_df_threshold(MAX_BLOCKS_PER_TERM),
                    np.array([r["doc_id"] for r in arows], dtype=np.int64),
                )
                out = (
                    self.spark.createDataFrame(res, schema=TOPK_SCHEMA)
                    if len(res)
                    else self.spark.createDataFrame([], TOPK_SCHEMA)
                )
                if spark_qids:
                    rest = query_topk_filtered(
                        postings, terms,
                        queries.filter(F.col("query_id").isin(spark_qids)),
                        self.n_docs, self.avgdl, allowed_docs,
                        n_buckets=self.n_buckets, scan=self._manifest_scan(),
                    )
                    out = out.unionByName(rest)
                return out
        return query_topk_filtered(
            postings, terms, queries, self.n_docs, self.avgdl, allowed_docs,
            n_buckets=self.n_buckets, scan=self._manifest_scan(),
        )

    def autocomplete(self, queries: DataFrame, max_expansions: int = 50) -> DataFrame:
        """Prefix (per-keystroke) search. In serve mode the tokenization,
        prefix expansion (bisect over the pinned sorted vocabulary) and
        dictionary gate all run driver-side — zero Spark jobs before the
        pruned posting scan (VERDICT r03 #7); otherwise the distributed
        pushed-range-predicate plan runs."""
        from ..operators.topk import query_topk_autocomplete

        postings = self._postings_cached if self._postings_cached is not None else self.postings
        terms = self._terms_cached if self._terms_cached is not None else self.terms
        return query_topk_autocomplete(
            postings, terms, queries, self.n_docs, self.avgdl,
            n_buckets=self.n_buckets, max_expansions=max_expansions,
            sorted_terms=self._sorted_terms, term_lookup=self._term_lookup,
            scan=self._manifest_scan(),
        )

    def topk_boolean(
        self, queries: DataFrame, allowed_docs: DataFrame | None = None
    ) -> DataFrame:
        """Boolean (must / must_not) search, BM25-ranked — see
        ``operators.topk.query_topk_boolean``. ``allowed_docs`` composes a
        metadata facet with the boolean predicate.

        Serve mode (VERDICT r04 #5): the must-count / NOT-veto tail is
        pandas-sized after the block fetch, so a served index answers
        boolean queries driver-side (``serving.boolean_local`` — same math,
        rounding, tie-breaks); hot / over-cap queries keep the distributed
        single-pass plan."""
        from ..operators.topk import query_topk_boolean

        postings = self._postings_cached if self._postings_cached is not None else self.postings
        terms = self._terms_cached if self._terms_cached is not None else self.terms
        sources = self._serving_source()
        if sources is not None and allowed_docs is None:
            qrows = self._collect_capped(queries, self.MAX_DRIVER_QUERIES)
            if qrows is not None:
                from ..operators.topk import (
                    MAX_BLOCKS_PER_TERM,
                    TOPK_SCHEMA,
                    _hot_df_threshold,
                )
                from .serving import boolean_local

                res, spark_qids = boolean_local(
                    sources, qrows, self.n_docs, self.avgdl,
                    _hot_df_threshold(MAX_BLOCKS_PER_TERM),
                )
                out = (
                    self.spark.createDataFrame(res, schema=TOPK_SCHEMA)
                    if len(res)
                    else self.spark.createDataFrame([], TOPK_SCHEMA)
                )
                if spark_qids:
                    rest = query_topk_boolean(
                        postings, terms,
                        queries.filter(F.col("query_id").isin(spark_qids)),
                        self.n_docs, self.avgdl, n_buckets=self.n_buckets,
                        scan=self._manifest_scan(),
                    )
                    out = out.unionByName(rest)
                return out
        return query_topk_boolean(
            postings, terms, queries, self.n_docs, self.avgdl,
            n_buckets=self.n_buckets, scan=self._manifest_scan(),
            allowed_docs=allowed_docs,
        )

    def phrase(self, phrases: DataFrame, k: int = 10) -> DataFrame:
        """Exact phrase search over a POSITIONAL index. Serve mode decodes
        the phrase terms' position streams driver-side and intersects them
        in numpy (``serving.phrase_local``) — zero Spark jobs; otherwise
        (or for hot phrase tokens) the distributed ordinal-shift plan runs
        (``operators.topk.query_phrase_indexed``)."""
        from ..operators.topk import query_phrase_indexed

        if not self.positional:
            raise ValueError(
                "phrase search needs a positional index "
                "(build_index(positional=True))"
            )
        sources = self._serving_source()
        if sources is not None and self._local_pos_reader is not None:
            qrows = self._collect_capped(phrases, self.MAX_DRIVER_QUERIES)
            if qrows is not None:
                from ..operators.topk import MAX_BLOCKS_PER_TERM, _hot_df_threshold
                from .serving import phrase_local

                res, spark_qids = phrase_local(
                    sources, qrows, k=k,
                    hot_df=_hot_df_threshold(MAX_BLOCKS_PER_TERM),
                )
                schema = "query_id long, rank int, doc_id long, n_matches int"
                out = (
                    self.spark.createDataFrame(res, schema=schema)
                    if len(res)
                    else self.spark.createDataFrame([], schema)
                )
                if spark_qids:
                    rest = query_phrase_indexed(
                        self.postings, self.terms,
                        phrases.filter(F.col("query_id").isin(spark_qids)),
                        n_buckets=self.n_buckets, k=k,
                        scan=self._manifest_scan(),
                    )
                    out = out.unionByName(rest)
                return out
        return query_phrase_indexed(
            self.postings, self.terms, phrases, n_buckets=self.n_buckets,
            k=k, scan=self._manifest_scan(),
        )

    def snippets(
        self, queries: DataFrame, width: int = 5, docs: DataFrame | None = None
    ) -> DataFrame:
        """Hit highlighting for the BM25 top-k of ``queries``. Serve mode
        (``serve(docs_source=...)``) runs end-to-end driver-side: local
        top-k -> direct parquet point-fetch of the hit docs -> window
        extraction (``serving.snippets_local``); any hot/over-cap query
        falls the whole call back to the distributed pipeline
        (``operators.textstats.snippets``)."""
        from ..operators.textstats import snippets as snippets_op

        sources = self._serving_source()
        if sources is not None and self._docs_source is not None:
            qrows = self._collect_capped(queries, self.MAX_DRIVER_QUERIES)
            if qrows is not None:
                from ..operators.topk import MAX_BLOCKS_PER_TERM, _hot_df_threshold
                from .serving import snippets_local, topk_local_multi

                hits, spark_qids = topk_local_multi(
                    sources, qrows, self.n_docs, self.avgdl,
                    _hot_df_threshold(MAX_BLOCKS_PER_TERM),
                )
                if not spark_qids:
                    res = snippets_local(
                        self._docs_source, qrows,
                        hits.to_dict("records"), width=width,
                        id_col=self._docs_id_col, text_col=self._docs_text_col,
                    )
                    schema = (
                        "query_id long, doc_id long, rank int, "
                        "first_pos long, snippet string"
                    )
                    return (
                        self.spark.createDataFrame(res, schema=schema)
                        if len(res)
                        else self.spark.createDataFrame([], schema)
                    )
        if docs is None:
            if self._docs_source is None:
                raise ValueError(
                    "snippets needs the corpus: pass docs= or serve(docs_source=...)"
                )
            docs = self.spark.read.parquet(self._docs_source)
            if self._docs_id_col != "doc_id":
                docs = docs.withColumnRenamed(self._docs_id_col, "doc_id")
            if self._docs_text_col != "text":
                docs = docs.withColumnRenamed(self._docs_text_col, "text")
        return snippets_op(docs, queries, self.topk(queries, mode="pruned"),
                           width=width)


def _build_postings_grouped(
    spark: SparkSession,
    tf: DataFrame,
    terms: DataFrame,
    avgdl: float,
    n_buckets: int,
    partitions: int,
    n_docs: int,
    out: str,
    groups: int,
    doc_id_range: tuple[int, int] | None = None,
    n_terms: int | None = None,
) -> None:
    """Postings stage in ``groups`` bucket-group jobs with per-group resume.

    Every bucket dir belongs to exactly one group (bucket % groups), so a
    group's output is a disjoint set of ``bucket=*`` dirs: incomplete groups
    are wiped and rebuilt, complete ones (marker present) are untouched —
    their files stay byte-identical across resumes. Spark's own _SUCCESS is
    suppressed during the appends (a mid-stage crash must not leave a marker
    that _done() would trust); the stage marker is written last, by us.
    """
    import shutil

    def marker(g: int) -> str:
        return os.path.join(out, f"_group_{g}_SUCCESS")

    pending = [g for g in range(groups) if not os.path.exists(marker(g))]
    if os.path.isdir(out):  # wipe partial output of unfinished groups
        for d in os.listdir(out):
            if d.startswith("bucket=") and int(d.split("=")[1]) % groups in pending:
                shutil.rmtree(os.path.join(out, d), ignore_errors=True)
        for leftover in ("_SUCCESS",):
            try:
                os.remove(os.path.join(out, leftover))
            except FileNotFoundError:
                pass
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    key = "mapreduce.fileoutputcommitter.marksuccessfuljobs"
    old = hconf.get(key)
    hconf.set(key, "false")
    try:
        for g in pending:
            blocks = build_postings(
                tf, terms, avgdl, n_buckets, partitions, n_docs=n_docs,
                bucket_mod=(g, groups),
                doc_id_range=doc_id_range, n_terms=n_terms,
            )
            blocks.write.mode("append").partitionBy("bucket").parquet(out)
            open(marker(g), "w").close()
    finally:
        if old is None:
            hconf.unset(key)
        else:
            hconf.set(key, old)
    open(os.path.join(out, "_SUCCESS"), "w").close()


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS,
    partitions: int | None = None,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
    id_col: str | None = None,
    content_col: str = "content",
    corpus_fp: str | None = None,
    postings_groups: int = 1,
    positional: bool = False,
) -> InvertedIndex:
    """Build (or resume building) the index for ``corpus`` at ``out_dir``.

    ``corpus_fp`` is an optional caller-supplied corpus fingerprint (e.g.
    source file names+sizes+mtimes): when it differs from the one recorded in
    ``meta.json``, all stage checkpoints are invalidated and the index is
    rebuilt — a resume must never serve an index built from different data.

    ``postings_groups`` > 1 turns on sub-stage resume for the (largest)
    postings stage: buckets are written in that many groups (group g =
    buckets with ``bucket % G == g``), each its own job + ``_group_g_SUCCESS``
    marker, so a killed build resumes from the first unfinished *group*
    instead of redoing the whole stage — per-partition lineage-diff resume
    (SCALE.md). Costs one tf-checkpoint scan per group; leave at 1 for small
    builds.

    The *logical* index (doc_ids, term_ids, decoded postings, scores) is
    deterministic given the corpus — independent of partition count
    (SURVEY.md §7.4 #5). Physical block boundaries are deterministic given
    (corpus, partitions): postings are hash-partitioned on (bucket,
    doc-range slice), no sampled range boundaries anywhere, so a resumed or
    repeated build reproduces identical segments.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    p = {s: os.path.join(out_dir, s) for s in (*STAGES, "lineage", "metrics")}
    metrics: list[tuple[str, int, int, str]] = []

    # corpus-fingerprint guard: stale checkpoints from a different corpus are
    # poison — wipe every stage, don't resume
    import json as _json
    import shutil

    meta_file = os.path.join(p["meta"], "meta.json")
    if os.path.exists(meta_file):
        with open(meta_file) as f:
            old_fp = _json.load(f).get("corpus_fp")
        if corpus_fp is None:
            corpus_fp = old_fp  # fp-less resume keeps the stored fingerprint
        elif old_fp != corpus_fp:
            for s in (*STAGES, "lineage", "manifest"):
                shutil.rmtree(os.path.join(out_dir, s) if s == "manifest" else p[s],
                              ignore_errors=True)

    def timed(stage: str, fn):
        t0 = time.time()
        rows = fn()
        metrics.append((stage, int(rows), int((time.time() - t0) * 1000), "built"))

    # metadata columns carried into docstats (everything except payload)
    meta_cols = [
        c for c in corpus.columns
        if c not in (content_col, "sha256", "doc_id", "tokens", "doclen")
    ]

    # stage 1: fused tf+docstats kernel, ONE tokenize pass (VERDICT r02 #7) --
    # The tf kernel runs with_sha=True: per-doc stats (doclen, sha256) ride
    # the tf stream as a sparse column (sha on the first row of each doc;
    # zero-token docs emit a term-NULL sentinel row), so docstats is later
    # DERIVED from this checkpoint with a column-pruned filter — the corpus
    # content is read and tokenized exactly once per build instead of twice.
    # Tokenization runs inside Arrow kernels (north_star: "tokenize ->
    # term-docID pairs inside vectorized pandas/Arrow UDFs"): no JVM token
    # objects, no shuffle (per-doc local counting).
    # ONE id-ranking per build (r5): the tf and docstats stages both need
    # (key_cols -> doc_id); computing it per stage paid the range-sampling
    # pass, the keys exchange, the counts collect, and the key-uniqueness
    # check TWICE — pure fixed overhead that the 1M-doc exec-pair study
    # showed capping build scaling. The ranked keys-only table is persisted
    # once, shared by both stages, and unpersisted at the end of the build.
    # doc_id values are unchanged (same ranking machinery, same input).
    _shared_ids: dict = {}

    def _doc_ids() -> DataFrame:
        if "ids" not in _shared_ids:
            # key-uniqueness guard (ADVICE r04) is built into the ranking
            # itself (adjacency flag in the same window pass + the counts
            # collect — zero extra jobs); a duplicate natural key raises
            # there before any payload join can fan out
            _shared_ids["ids"] = assign_doc_ids(
                corpus.select(*key_cols), list(key_cols), partitions
            )
        return _shared_ids["ids"]

    def _docs_with_ids(cols: list[str]):
        """corpus pruned to ``cols`` + doc_id. The rank table is KEYS-ONLY
        (r4) — payload columns never ride the range sampler/exchange/
        persist — and shared across stages (r5); the id join re-reads the
        corpus scan, and a narrower scan is a narrower parquet read."""
        pruned = corpus.select(
            *dict.fromkeys([*((id_col,) if id_col else key_cols), *cols])
        )
        if id_col:
            return pruned.withColumn("doc_id", F.col(id_col).cast("long"))
        # deterministic: doc_id = global rank of key_cols, independent of
        # partitioning — every stage sees identical ids from the shared rank
        return pruned.join(_doc_ids(), list(key_cols))

    # kernel-direct mode (r6, default): the tf kernel streams its tf batches
    # straight to parquet via pyarrow (C++) and RETURNS the per-doc stats —
    # one corpus scan and one action materialize BOTH the tf and docstats
    # checkpoints, skipping the 150-rows-per-doc Python->JVM return, the
    # UnsafeRow conversion, and the JVM parquet encode (guide §4.2).
    # GRAFT_TF_DIRECT=0 or the pandas kernel selector restores the classic
    # JVM-written path (same checkpoint content either way — tested).
    direct = (
        os.environ.get("GRAFT_TF_DIRECT", "1") != "0"
        and os.environ.get("GRAFT_TF_KERNEL", "arrow") != "pandas"
    )
    s2_err: list[BaseException] = []
    _stage_out: dict = {}
    if not _done(p["tf"]):
        if direct:
            from ..operators.postings import ensure_tf_files, tf_docstats_direct

            def s1():
                import shutil as _sh

                # wipe any partial task files from an interrupted attempt
                _sh.rmtree(p["tf"], ignore_errors=True)
                os.makedirs(p["tf"], exist_ok=True)
                mcols = [c for c in meta_cols if c != id_col]
                docs = _docs_with_ids([content_col, *mcols])
                stats = tf_docstats_direct(
                    docs, mcols, p["tf"], content_col, positional=positional
                )
                stats.write.mode("overwrite").parquet(p["docstats"])
                ensure_tf_files(p["tf"], positional)
                open(os.path.join(p["tf"], "_SUCCESS"), "w").close()
                _unpersist(docs)
                return -1

            timed("tf", s1)
            metrics.append(("docstats", -1, 0, "fused-direct"))
            _stage_out["docstats_direct"] = True
        else:
            def s1():
                docs = _docs_with_ids([content_col])
                tf_kernel = _tf_kernel_positional() if positional else _kernels()[0]
                tf_kernel(docs, content_col, with_sha=True).write.mode(
                    "overwrite"
                ).parquet(p["tf"])
                _unpersist(docs)
                return -1

            timed("tf", s1)
    else:
        metrics.append(("tf", -1, 0, "resumed"))

    tf_full = spark.read.parquet(p["tf"])
    fused = "sha256" in tf_full.columns  # pre-fusion checkpoints lack it
    # downstream consumers see plain tf rows: sentinels out, sidecar pruned
    tf = (
        tf_full.filter(F.col("term").isNotNull()).drop("sha256") if fused else tf_full
    )

    # stages 2 ∥ 3: docstats and terms both depend ONLY on the tf
    # checkpoint, so they run as CONCURRENT Spark jobs (one thread each —
    # Spark schedules jobs from multiple threads of one session). This
    # hides the shorter stage's wall inside the longer one, shaving the
    # fixed per-build overhead the Amdahl analysis (BASELINE.md) shows is
    # what actually caps small-build scaling.
    if not _done(p["docstats"]):
        def s2():
            # content-free id assignment: only keys + metadata get cached
            docs = _docs_with_ids(
                [c for c in meta_cols if c != id_col]
                + ([content_col] if not fused else [])
            )
            meta = docs.select("doc_id", *[c for c in meta_cols if c != id_col])
            if fused:
                # one row per doc by construction; scan reads 3 columns
                per_doc = tf_full.filter(F.col("sha256").isNotNull()).select(
                    "doc_id", "doclen", "sha256"
                )
                out = meta.join(per_doc, "doc_id")
            else:  # resume of a pre-fusion tf checkpoint: old two-pass kernel
                out = _kernels()[1](
                    docs, [c for c in meta_cols if c != id_col], content_col
                )
            out.write.mode("overwrite").parquet(p["docstats"])
            _unpersist(docs)
            return -1

        import threading

        def _s2_thread():
            try:
                timed("docstats", s2)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                s2_err.append(e)

        t2 = threading.Thread(target=_s2_thread, name="build-docstats")
        t2.start()
    else:
        t2 = None
        if not _stage_out.get("docstats_direct"):
            metrics.append(("docstats", -1, 0, "resumed"))

    # stage 4's corpus-stats aggregate depends ONLY on the tf checkpoint
    # (per_doc rows == docstats rows 1:1 — the docstats meta join is keyed
    # on the same unique doc_id), so on fused checkpoints it runs as a
    # third CONCURRENT job instead of a sequential one after the threads
    # join: the per-build fixed overhead the Amdahl analysis (BASELINE.md)
    # charges to sequential job scheduling shrinks by one full job. The
    # doclen sum is an integer far below 2^53, so the double accumulation
    # is exact and order-independent — bit-identical to the docstats agg.
    import threading

    tmeta = None
    if fused:
        def _meta_thread():
            try:
                # freshly (direct-)built docstats is ~1 row/doc — far
                # cheaper to agg than the tf checkpoint's sparse sidecar
                src = (
                    spark.read.parquet(p["docstats"]).select("doc_id", "doclen")
                    if _done(p["docstats"])
                    else tf_full.filter(
                        F.col("sha256").isNotNull() & F.col("doc_id").isNotNull()
                    )
                )
                _stage_out["meta_row"] = (
                    src.agg(
                        F.count(F.lit(1)).alias("n"),
                        F.avg("doclen").alias("avgdl"),
                        F.min("doc_id").alias("dmin"),
                        F.max("doc_id").alias("dmax"),
                    )
                    .collect()[0]
                )
            except BaseException as e:  # noqa: BLE001 — re-raised below
                s2_err.append(e)

        tmeta = threading.Thread(target=_meta_thread, name="build-meta-agg")
        tmeta.start()

    # stage 3: term dictionary (runs while the docstats thread works).
    # try/finally: a terms-stage failure must still JOIN the concurrent
    # docstats thread before propagating — otherwise the build raises with a
    # background Spark job still writing its checkpoint (ADVICE r03).
    try:
        if not _done(p["terms"]):
            def s3():
                # the direct tf kernel's _termstats sidecar (per-batch term
                # partials) spares the dictionary a full tf rescan; absent
                # (classic kernel, resumed pre-r6 checkpoint) -> tf scan
                import glob as _glob

                # match finalized task files only: a speculative/killed
                # attempt's _tmp-* leftover must not flip the mode
                tpart_dir = os.path.join(p["tf"], "_termstats")
                tpart = (
                    spark.read.parquet(tpart_dir)
                    if _glob.glob(os.path.join(tpart_dir, "part-*.parquet"))
                    else None
                )
                t = build_terms(tf, partials=tpart)
                # term-sorted layout (the range partitioning is already by
                # term, so this yields globally sorted files): every parquet
                # file gets a tight term min/max, making prefix-range
                # predicates (autocomplete) row-group-skippable instead of
                # full-dict scans
                t.sortWithinPartitions("term").write.mode("overwrite").parquet(p["terms"])
                # dictionary size fell out of the ranking's counts collect —
                # no terms.count() job needed afterwards
                _stage_out["n_terms"] = getattr(t, "_rank_total", None)
                _unpersist(t)
                return -1

            timed("terms", s3)
        else:
            metrics.append(("terms", -1, 0, "resumed"))
    finally:
        if t2 is not None:
            t2.join()
        if tmeta is not None:
            tmeta.join()
    if s2_err:
        raise s2_err[0]

    docstats = spark.read.parquet(p["docstats"])
    terms = spark.read.parquet(p["terms"])

    # stage 4: meta (needed by postings for block-max) ----------------------
    # min/max doc_id ride the same agg job: they PROVE (or refute) that the
    # id space fits int32, which lets the postings stage narrow doc_id
    # before its exchange (VERDICT r04 #1a — the build's biggest shuffle).
    # On fused checkpoints the agg already ran concurrently with stages 2/3
    # (see the tmeta thread above); the sequential job survives only for
    # pre-fusion resumes.
    row = _stage_out.get("meta_row")
    if row is None:
        row = docstats.agg(
            F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl"),
            F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"),
        ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)
    doc_id_range = (
        (int(row["dmin"]), int(row["dmax"])) if row["dmin"] is not None else None
    )
    # term_id = rank of term, so the dictionary size bounds it exactly; it
    # fell out of the terms stage's own counts collect (zero extra jobs) —
    # a resumed terms stage falls back to the footer-metadata count job
    n_terms = _stage_out.get("n_terms")
    if n_terms is None:
        n_terms = terms.count()

    # stage 5: postings ------------------------------------------------------
    if not _done(p["postings"]):
        # rebuilding postings invalidates any previous file manifest
        shutil.rmtree(os.path.join(out_dir, "manifest"), ignore_errors=True)
        if postings_groups <= 1 or n_docs == 0:
            def s5():
                blocks = build_postings(
                    tf, terms, avgdl, n_buckets, partitions, n_docs=n_docs,
                    doc_id_range=doc_id_range, n_terms=n_terms,
                )
                w = blocks.write.mode("overwrite")
                if n_docs > 0:
                    w = w.partitionBy("bucket")
                # zero-row partitioned writes emit no files at all -> the dir
                # would be unreadable; a flat empty write keeps the schema
                w.parquet(p["postings"])
                return -1

            timed("postings", s5)
        else:
            def s5():
                _build_postings_grouped(
                    spark, tf, terms, avgdl, n_buckets, partitions, n_docs,
                    p["postings"], postings_groups,
                    doc_id_range=doc_id_range, n_terms=n_terms,
                )
                return -1

            timed("postings", s5)
    else:
        metrics.append(("postings", -1, 0, "resumed"))

    # file-level stats manifest (Iceberg-style): per posting file (bucket,
    # term_id min/max) so term-scoped queries enumerate files without
    # listing directories. Skipped when already present (postings resumed).
    from .manifest import _manifest_path, write_postings_manifest

    if n_docs > 0 and not os.path.exists(_manifest_path(out_dir)):
        write_postings_manifest(spark, out_dir)

    # meta + metrics are driver-side JSON: one-row tables don't warrant a
    # Spark job each (every sequential job adds fixed latency to the build)
    import json

    # ALWAYS rewritten from the freshly computed stats: a stale meta.json
    # (e.g. out_dir reused after merge_segments grew the corpus) would skew
    # idf/tfnorm for every subsequent query
    os.makedirs(p["meta"], exist_ok=True)
    with open(os.path.join(p["meta"], "meta.json"), "w") as f:
        json.dump(
            {"n_docs": n_docs, "avgdl": avgdl, "n_buckets": n_buckets,
             "partitions": partitions, "corpus_fp": corpus_fp,
             "positional": positional},
            f,
        )

    # lineage: per-bucket block/posting/term counts --------------------------
    # Derived from the terms dictionary + the manifest footers instead of a
    # full postings scan (r6, guide §2.4 — don't recompute what a smaller
    # relation already knows): every dictionary term has df >= 1 posting,
    # and ALL of a term's blocks land in its hash bucket (the build's
    # partition key is derived from term_id), so per bucket
    #   n_terms    = count of dictionary terms hashing there,
    #   n_postings = sum of those terms' df (block n's partition a term's
    #                df exactly — blocks are disjoint doc-slices),
    #   n_blocks   = sum of the manifest's per-file row counts (the same
    #                parquet footers the manifest write already read).
    # The postings table — orders of magnitude larger than the vocabulary —
    # is never rescanned; equivalence to the old direct aggregation is
    # asserted in tests/test_index.py::test_lineage_counts and the focused
    # derivation test added this round.
    from .manifest import load_postings_manifest

    _nb: dict[int, int] = {}
    for e in load_postings_manifest(out_dir) or []:
        _nb[int(e["bucket"])] = _nb.get(int(e["bucket"]), 0) + int(e["n_blocks"])
    if _nb:
        per_bucket_terms = (
            terms.select(
                F.pmod(F.xxhash64(F.col("term_id").cast("long")), F.lit(n_buckets))
                .cast("int")
                .alias("bucket"),
                "df",
            )
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n_terms"),
                F.sum("df").alias("n_postings"),
            )
        )
        blocks_df = spark.createDataFrame(
            sorted(_nb.items()), "bucket int, n_blocks bigint"
        )
        lineage_df = blocks_df.join(F.broadcast(per_bucket_terms), "bucket").select(
            "bucket", "n_blocks", "n_postings", "n_terms"
        )
    else:  # zero-doc index: keep the empty-but-typed lineage table
        lineage_df = spark.createDataFrame(
            [], "bucket int, n_blocks bigint, n_postings bigint, n_terms bigint"
        )
    lineage_df.write.mode("overwrite").parquet(p["lineage"])
    os.makedirs(p["metrics"], exist_ok=True)
    with open(os.path.join(p["metrics"], "metrics.jsonl"), "a") as f:
        for stage, rows, wall_ms, status in metrics:
            f.write(json.dumps({"stage": stage, "rows_out": rows,
                                "wall_ms": wall_ms, "status": status}) + "\n")

    # release the shared id-rank persist (both consumers have materialized)
    if "ids" in _shared_ids:
        _unpersist(_shared_ids["ids"])

    return InvertedIndex(
        root=out_dir, spark=spark, n_docs=n_docs, avgdl=avgdl,
        n_buckets=n_buckets, positional=positional,
    )
