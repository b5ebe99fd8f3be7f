"""Inverted-index build: tokenize -> tf pairs -> term dictionary -> blocked,
compressed posting segments.

Reference analog (SURVEY.md §2.4 A8, §2.1 K2/K3): the reference appends
phrases into a 200x200 in-memory sector-string matrix (``xml_parsers.py:351``,
``geo_utilities.py:626``) and a single global vocabulary string
(``xml_parsers.py:433-435``) — both are unbounded shared mutable state. Here
both become pure dataflow outputs:

- ``terms``    = groupBy(term).agg(df, cf) + dense term_id (the vocabulary)
- ``postings`` = blocked posting lists, delta+varint compressed, with
  per-block max-score metadata (Block-Max WAND, SURVEY.md §4 O5)

Skew story (north_rule): hot terms are NOT gathered onto a single reducer.
``tf`` rows are **range-partitioned on (bucket, term_id, doc_id)**, so a hot
term's postings split across many tasks at doc_id boundaries; each task
emits complete blocks for its slice (block_id = first doc_id in block, which
is globally unique and ordered per term because ranges are disjoint). No
row ever holds a full posting list — a collect_list-per-term design would
OOM at 10^12 docs; this one is bounded by BLOCK_SIZE everywhere.

The groupBy aggregations (tf counts, df/cf) are skew-safe by construction:
map-side partial aggregation compresses hot keys before the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.bm25 import B as BM25_B
from ..functions.bm25 import K1 as BM25_K1
from ..functions.codec import BLOCK_SIZE, encode_doc_gaps, encode_tfs
from ..functions.tokenize import tokenize

# doclens are stored inline per posting (varint, like tfs): scoring then
# never joins the 10^12-row docstats table — tfnorm = f(tf, dl, avgdl) is
# computable from the block alone. Costs ~1 byte/posting, removes the
# biggest query-time shuffle.
POSTINGS_SCHEMA = (
    "bucket int, term_id long, block_id long, n int, "
    "first_doc long, last_doc long, max_tf int, block_max_tfn float, "
    "doc_ids binary, tfs binary, dls binary"
)

N_BUCKETS = 64  # term-hash buckets for query-time partition pruning


def tokenized_docs(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Add ``tokens`` (array<string>) and ``doclen`` (long)."""
    return docs.withColumn("tokens", tokenize(content_col)).withColumn(
        "doclen", F.size("tokens").cast("long")
    )


def term_frequencies(tok_docs: DataFrame) -> DataFrame:
    """(term, doc_id, doclen, tf). doclen rides in the groupBy key (it is
    functionally dependent on doc_id) so no docstats join is needed later."""
    pairs = tok_docs.select("doc_id", "doclen", F.explode("tokens").alias("term"))
    return pairs.groupBy("term", "doc_id", "doclen").agg(F.count(F.lit(1)).alias("tf"))


def build_terms(tf: DataFrame) -> DataFrame:
    """Term dictionary: (term, term_id, df, cf).

    Replaces the reference's single-row vocabulary string (K3,
    ``db_classes.py:181-208``) — the #1 anti-pattern SURVEY.md flags.
    term_id is the dense rank of the term string (deterministic).
    """
    from .docids import assign_dense_ids

    stats = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    # term_id = dense rank of the term string, assigned with the same
    # range-partition + prefix-sum technique as doc_ids (no global window —
    # the vocabulary can reach 1e8+ terms on a code corpus).
    return assign_dense_ids(stats, ["term"], "term_id")


def corpus_stats(tok_docs: DataFrame) -> tuple[int, float]:
    row = tok_docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def _encode_partition(avgdl: float) -> callable:
    """mapInPandas kernel: rows sorted by (bucket, term_id, doc_id) ->
    compressed blocks. Arrow-batched; numpy inside; no per-row Python."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # A term's run may span Arrow batches within the partition; carry a tail.
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if tail is not None:
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_term = pdf["term_id"].iloc[-1]
            cut = (pdf["term_id"] != last_term).to_numpy().nonzero()[0]
            if cut.size:
                split = cut[-1] + 1
                tail = pdf.iloc[split:].copy()
                pdf = pdf.iloc[:split]
            else:
                tail = pdf.copy()
                continue
            yield from _encode_frame(pdf, avgdl, np)
        if tail is not None and len(tail):
            import numpy as np

            yield from _encode_frame(tail, avgdl, np)

    return fn


def _encode_frame(pdf: pd.DataFrame, avgdl: float, np) -> Iterator[pd.DataFrame]:
    from ..functions.bm25 import tfnorm_np

    out: dict[str, list] = {k: [] for k in (
        "bucket", "term_id", "block_id", "n", "first_doc", "last_doc",
        "max_tf", "block_max_tfn", "doc_ids", "tfs", "dls",
    )}
    terms = pdf["term_id"].to_numpy()
    buckets = pdf["bucket"].to_numpy()
    docs = pdf["doc_id"].to_numpy()
    tfs = pdf["tf"].to_numpy()
    dls = pdf["doclen"].to_numpy()
    # boundaries of per-term runs (input sorted by term_id, doc_id)
    starts = np.concatenate([[0], (np.diff(terms) != 0).nonzero()[0] + 1, [len(terms)]])
    for s, e in zip(starts[:-1], starts[1:]):
        for bs in range(s, e, BLOCK_SIZE):
            be = min(bs + BLOCK_SIZE, e)
            d = docs[bs:be]
            t = tfs[bs:be]
            tfn = tfnorm_np(t.astype(np.float64), dls[bs:be].astype(np.float64), avgdl)
            out["bucket"].append(int(buckets[s]))
            out["term_id"].append(int(terms[s]))
            out["block_id"].append(int(d[0]))
            out["n"].append(be - bs)
            out["first_doc"].append(int(d[0]))
            out["last_doc"].append(int(d[-1]))
            out["max_tf"].append(int(t.max()))
            out["block_max_tfn"].append(float(tfn.max()))
            out["doc_ids"].append(encode_doc_gaps(d))
            out["tfs"].append(encode_tfs(t))
            out["dls"].append(encode_tfs(dls[bs:be]))
    if out["n"]:
        yield pd.DataFrame(out)


def build_postings(
    tf: DataFrame,
    terms: DataFrame,
    avgdl: float,
    n_buckets: int = N_BUCKETS,
    partitions: int | None = None,
) -> DataFrame:
    """tf (term, doc_id, doclen, tf) -> compressed posting blocks."""
    spark = tf.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    keyed = (
        tf.join(F.broadcast(terms.select("term", "term_id")), "term")
        .withColumn("bucket", F.pmod(F.xxhash64("term_id"), F.lit(n_buckets)).cast("int"))
        .select("bucket", "term_id", "doc_id", "doclen", "tf")
        .repartitionByRange(partitions, "bucket", "term_id", "doc_id")
        .sortWithinPartitions("bucket", "term_id", "doc_id")
    )
    return keyed.mapInPandas(_encode_partition(avgdl), schema=POSTINGS_SCHEMA)


def decode_postings(blocks: DataFrame) -> DataFrame:
    """Compressed blocks -> (term_id, doc_id, tf, tfn) rows; distributed,
    no grouping. Used by the exact query path and by index-verification."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codec import decode_doc_gaps, decode_tfs

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [decode_doc_gaps(b) for b in pdf["doc_ids"]]
            tfs = [decode_tfs(b) for b in pdf["tfs"]]
            dls = [decode_tfs(b) for b in pdf["dls"]]
            reps = np.array([len(x) for x in ids])
            yield pd.DataFrame(
                {
                    "term_id": np.repeat(pdf["term_id"].to_numpy(), reps),
                    "doc_id": np.concatenate(ids) if ids else np.empty(0, np.int64),
                    "tf": np.concatenate(tfs) if tfs else np.empty(0, np.int64),
                    "doclen": np.concatenate(dls) if dls else np.empty(0, np.int64),
                }
            )

    return blocks.mapInPandas(fn, schema="term_id long, doc_id long, tf long, doclen long")
