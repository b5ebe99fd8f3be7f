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
    tf/         term, doc_id, doclen, tf          (staging checkpoint)
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
    term_frequencies,
    tokenized_docs,
)

STAGES = ("docstats", "tf", "terms", "postings", "meta")


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _unpersist(df: DataFrame) -> None:
    cache = getattr(df, "_dense_ids_cache", None)
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
        meta = spark.read.parquet(os.path.join(root, "meta")).collect()[0]
        return cls(
            root=root,
            spark=spark,
            n_docs=int(meta["n_docs"]),
            avgdl=float(meta["avgdl"]),
            n_buckets=int(meta["n_buckets"]),
        )

    def topk(self, queries: DataFrame, mode: str = "exact") -> DataFrame:
        from ..operators.topk import query_topk_exact, query_topk_pruned

        fn = query_topk_exact if mode == "exact" else query_topk_pruned
        return fn(self.postings, self.terms, queries, self.n_docs, self.avgdl)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS,
    partitions: int | None = None,
    key_cols: tuple[str, ...] = ("repo", "path", "commit"),
) -> InvertedIndex:
    """Build (or resume building) the index for ``corpus`` at ``out_dir``.

    The *logical* index (doc_ids, term_ids, decoded postings, scores) is
    deterministic given the corpus — independent of partition count and of
    range-sampling (SURVEY.md §7.4 #5). Physical block boundaries follow the
    run's range partitioning; queries are invariant to them.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    p = {s: os.path.join(out_dir, s) for s in (*STAGES, "lineage", "metrics")}
    metrics: list[tuple[str, int, int, str]] = []

    def timed(stage: str, fn):
        t0 = time.time()
        rows = fn()
        metrics.append((stage, int(rows), int((time.time() - t0) * 1000), "built"))

    # stage 1: docstats (+doc_id) ------------------------------------------
    if not _done(p["docstats"]):
        def s1():
            docs = assign_doc_ids(corpus, list(key_cols), partitions)
            tok = tokenized_docs(docs)
            stats = tok.select(
                "doc_id", *key_cols, "lang", "doclen",
                F.coalesce(F.col("sha256"), F.sha2(F.col("content"), 256)).alias("sha256")
                if "sha256" in corpus.columns
                else F.sha2(F.col("content"), 256).alias("sha256"),
            )
            stats.write.mode("overwrite").parquet(p["docstats"])
            _unpersist(docs)
            return spark.read.parquet(p["docstats"]).count()

        timed("docstats", s1)
    else:
        metrics.append(("docstats", -1, 0, "resumed"))

    docstats = spark.read.parquet(p["docstats"])

    # stage 2: tf checkpoint ----------------------------------------------
    if not _done(p["tf"]):
        def s2():
            # re-derive tokens from corpus joined to the persisted doc_ids so
            # the stage is a pure function of checkpointed state
            docs = corpus.join(docstats.select("doc_id", *key_cols), list(key_cols))
            tf = term_frequencies(tokenized_docs(docs))
            tf.write.mode("overwrite").parquet(p["tf"])
            return spark.read.parquet(p["tf"]).count()

        timed("tf", s2)
    else:
        metrics.append(("tf", -1, 0, "resumed"))

    tf = spark.read.parquet(p["tf"])

    # stage 3: term dictionary ---------------------------------------------
    if not _done(p["terms"]):
        def s3():
            t = build_terms(tf)
            t.write.mode("overwrite").parquet(p["terms"])
            _unpersist(t)
            return spark.read.parquet(p["terms"]).count()

        timed("terms", s3)
    else:
        metrics.append(("terms", -1, 0, "resumed"))

    terms = spark.read.parquet(p["terms"])

    # stage 4: meta (needed by postings for block-max) ----------------------
    row = docstats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"] or 0.0)

    # stage 5: postings ------------------------------------------------------
    if not _done(p["postings"]):
        def s5():
            blocks = build_postings(tf, terms, avgdl, n_buckets, partitions)
            blocks.write.mode("overwrite").partitionBy("bucket").parquet(p["postings"])
            return spark.read.parquet(p["postings"]).count()

        timed("postings", s5)
    else:
        metrics.append(("postings", -1, 0, "resumed"))

    if not _done(p["meta"]):
        spark.createDataFrame(
            [(n_docs, avgdl, n_buckets, partitions)],
            "n_docs long, avgdl double, n_buckets int, partitions int",
        ).write.mode("overwrite").parquet(p["meta"])

    # lineage: per-bucket block/posting/term counts --------------------------
    postings = spark.read.parquet(p["postings"])
    (
        postings.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.countDistinct("term_id").alias("n_terms"),
        )
        .write.mode("overwrite")
        .parquet(p["lineage"])
    )
    spark.createDataFrame(
        metrics, "stage string, rows_out long, wall_ms long, status string"
    ).write.mode("append").parquet(p["metrics"])

    return InvertedIndex(
        root=out_dir, spark=spark, n_docs=n_docs, avgdl=avgdl, n_buckets=n_buckets
    )
