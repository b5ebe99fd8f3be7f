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
from ..functions.codec import BLOCK_SIZE
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
# positional variant: + per-block varint stream of token positions
# (per posting: first absolute, then gaps; position count per posting = tf)
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA + ", poss binary"

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


def term_frequencies_pandas(
    docs: DataFrame, content_col: str = "content", with_sha: bool = False
) -> DataFrame:
    """Hot-path tf: (term, doc_id, doclen, tf) via an Arrow-batched pandas
    kernel — tokenize + per-doc counting happen locally in the kernel, so tf
    needs NO shuffle at all (it is a per-doc map), and the Python regex path
    is ~10x faster than Spark's regexp expressions on match-heavy text
    (measured: 28s JVM vs ~2s kernel for 100k docs / 23M tokens @32c).

    This is the north_star's "SPIMI-style per-partition construction inside
    vectorized pandas/Arrow UDFs (tokenize -> term-docID pairs)".

    ``with_sha=True`` fuses the docstats pass into the same tokenize
    (sha256 on the first row of each doc, NULL elsewhere; zero-token docs
    emit one sentinel row with term NULL) — see :func:`term_frequencies_arrow`.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        from ..functions.tokenize import tokenize_py

        from collections import Counter

        for pdf in batches:
            ids, dls, terms, tfs, shas = [], [], [], [], []
            for doc_id, content in zip(pdf["doc_id"].to_numpy(), pdf[content_col]):
                toks = tokenize_py(content)
                c = Counter(toks)
                if with_sha:
                    h = hashlib.sha256((content or "").encode("utf-8")).hexdigest()
                    if not c:  # zero-token doc -> sentinel row carries stats
                        ids.append(np.full(1, doc_id, dtype=np.int64))
                        dls.append(np.zeros(1, dtype=np.int64))
                        terms.append(None)
                        tfs.append(np.zeros(1, dtype=np.int64))
                        shas.append(h)
                        continue
                    shas.extend([h] + [None] * (len(c) - 1))
                elif not c:
                    continue
                ids.append(np.full(len(c), doc_id, dtype=np.int64))
                dls.append(np.full(len(c), len(toks), dtype=np.int64))
                terms.extend(c.keys())
                tfs.append(np.fromiter(c.values(), dtype=np.int64, count=len(c)))
            if not ids:
                continue
            out = {
                "term": terms,
                "doc_id": np.concatenate(ids),
                "doclen": np.concatenate(dls),
                "tf": np.concatenate(tfs),
            }
            if with_sha:
                out["sha256"] = shas
            yield pd.DataFrame(out)

    schema = "term string, doc_id long, doclen long, tf long" + (
        ", sha256 string" if with_sha else ""
    )
    return docs.select("doc_id", content_col).mapInPandas(fn, schema=schema)


def _sha256_hex(content, n: int) -> list[str]:
    """Zero-copy sha256 of each string in an Arrow array: hash utf8 bytes
    straight out of the value buffer (hashlib accepts memoryviews — the
    content is never decoded into a Python str)."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    carr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
    bufs = carr.buffers()
    odt = np.int64 if pa.types.is_large_string(carr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt, count=carr.offset + n + 1)
    data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return [
        hashlib.sha256(data[offs[carr.offset + i] : offs[carr.offset + i + 1]]).hexdigest()
        for i in range(n)
    ]


def _attach_sha(out, content, doc_ids, doclen, np, pa, sha=None):
    """Fuse per-doc stats onto a (term, doc_id, ...) tf table: sha256 lands
    on the FIRST output row of each doc (NULL elsewhere), and zero-token
    docs — absent from the tf aggregation — get one sentinel row with term
    NULL so every doc's (doclen, sha256) survives into the checkpoint.
    ``sha`` may be precomputed (one pa.string() value per doc)."""
    import pyarrow.compute as pc

    n = len(doc_ids)
    if sha is None:
        sha = pa.array(_sha256_hex(content, n), pa.string())
    out_docs = out["doc_id"].to_numpy()
    order = np.argsort(doc_ids, kind="stable")
    _, first_idx = np.unique(out_docs, return_index=True)
    # sha lands via a null-masked take — no per-row Python objects: index
    # array is -1 (null) everywhere except each doc's first output row
    idx = np.full(out_docs.size, -1, dtype=np.int64)
    idx[first_idx] = order[np.searchsorted(doc_ids, out_docs[first_idx], sorter=order)]
    sha_col = pc.take(sha, pa.array(idx, pa.int64(), mask=idx < 0))
    out = out.append_column("sha256", sha_col)
    zidx = np.nonzero(doclen == 0)[0]
    if zidx.size:
        zeros = pa.array(np.zeros(zidx.size, np.int64), pa.int64())
        cols = {
            "term": pa.nulls(zidx.size, out.schema.field("term").type),
            "doc_id": pa.array(doc_ids[zidx].astype(np.int64), pa.int64()),
            "doclen": zeros,
            "tf": zeros,
            "sha256": sha.take(pa.array(zidx, pa.int64())),
        }
        sent = pa.table(
            {f.name: cols.get(f.name, pa.nulls(zidx.size, f.type)) for f in out.schema},
            schema=out.schema,
        )
        out = pa.concat_tables([out, sent])
    return out


def term_frequencies_arrow(
    docs: DataFrame, content_col: str = "content", with_sha: bool = False
) -> DataFrame:
    """tf kernel v2: ``mapInArrow`` + pure Arrow C++ compute — tokenize (RE2
    regex + split), flatten, and hash-aggregate per (term, doc) WITHOUT ever
    materializing a Python string object.

    ``with_sha=True`` fuses the docstats pass into this same single scan
    (VERDICT r02 #7): the corpus is tokenized ONCE instead of once for
    docstats + once for tf. Per-doc stats ride as a sparse extra column —
    sha256 is non-NULL on exactly one tf row per doc, and zero-token docs
    emit one term-NULL sentinel row — so the build derives docstats from
    the tf checkpoint with a column-pruned filter instead of a second
    content pass (consumers of the tf rows filter ``term IS NOT NULL``).

    Why: the v1 pandas kernel (:func:`term_frequencies_pandas`) builds one
    Python ``str`` per token — ~55 bytes of object header + hash per ~7-byte
    token, i.e. ~8x the corpus size in allocation traffic. That is exactly
    the DRAM-bandwidth wall that capped 8->32-thread scaling at ~0.2
    (BASELINE.md r01): 32 python workers each churning GB/s of small objects
    saturate the memory bus. Here tokens live only in Arrow buffers
    (contiguous values + offsets), the camel/lower/split passes are
    vectorized RE2/utf8 kernels, and the tf count is Arrow's C++ hash
    group-by — Python holds only batch-level references.

    Token-for-token identical to v1/:func:`tokenize` (4-way parity test in
    tests/test_tokenize.py)."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.tokenize import CAMEL_BOUNDARY, NON_TOKEN

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            content = pc.fill_null(rb.column(1), "")
            spaced = pc.replace_substring_regex(
                content, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2"
            )
            toks = pc.split_pattern_regex(pc.utf8_lower(spaced), pattern=NON_TOKEN)
            lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
            parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
            flat = pc.list_flatten(toks)
            keep = pc.notequal(flat, "") if hasattr(pc, "notequal") else pc.not_equal(flat, "")
            keep_np = keep.to_numpy(zero_copy_only=False)
            parent = parent[keep_np]
            doclen = np.bincount(parent, minlength=n)  # non-empty tokens per doc
            doc_ids = rb.column(0).to_numpy()
            tbl = pa.table(
                {
                    "term": flat.filter(keep),
                    "doc_id": pa.array(doc_ids[parent], pa.int64()),
                    "doclen": pa.array(doclen[parent], pa.int64()),
                }
            )
            agg = tbl.group_by(["term", "doc_id", "doclen"]).aggregate([([], "count_all")])
            out = pa.table(
                {
                    "term": agg["term"].cast(pa.string()),
                    "doc_id": agg["doc_id"],
                    "doclen": agg["doclen"],
                    "tf": agg["count_all"].cast(pa.int64()),
                }
            )
            if with_sha:
                out = _attach_sha(out, content, doc_ids, doclen, np, pa)
            yield from out.to_batches()

    schema = "term string, doc_id long, doclen long, tf long" + (
        ", sha256 string" if with_sha else ""
    )
    return docs.select("doc_id", content_col).mapInArrow(fn, schema=schema)


def term_positions_arrow(
    docs: DataFrame, content_col: str = "content", with_sha: bool = False
) -> DataFrame:
    """Positional tf kernel: like :func:`term_frequencies_arrow` plus the
    1-based token positions of each (term, doc) occurrence — the input for
    positional (phrase-capable) indexes. Positions index the *filtered*
    token array, identical to what ``tokenize()`` exposes, so the indexed
    phrase counts equal the corpus-scan ``textstats.phrase_match`` exactly.
    All in Arrow buffers; the only additions over the tf kernel are an
    arange-per-doc (vectorized first-index trick) and a list aggregation.
    ``with_sha`` fuses the docstats pass, as in the tf kernel."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.tokenize import CAMEL_BOUNDARY, NON_TOKEN

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            content = pc.fill_null(rb.column(1), "")
            spaced = pc.replace_substring_regex(
                content, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2"
            )
            toks = pc.split_pattern_regex(pc.utf8_lower(spaced), pattern=NON_TOKEN)
            lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
            parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
            flat = pc.list_flatten(toks)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            parent = parent[keep]
            doclen = np.bincount(parent, minlength=n)
            # 1-based position within each doc's FILTERED token stream
            idx = np.arange(parent.size, dtype=np.int64)
            pos = (idx - np.searchsorted(parent, parent, side="left") + 1).astype(np.int32)
            doc_ids = rb.column(0).to_numpy()
            tbl = pa.table(
                {
                    "term": flat.filter(pa.array(keep)),
                    "doc_id": pa.array(doc_ids[parent], pa.int64()),
                    "doclen": pa.array(doclen[parent], pa.int64()),
                    "pos": pa.array(pos, pa.int32()),
                }
            )
            agg = tbl.group_by(["term", "doc_id", "doclen"]).aggregate(
                [("pos", "list"), ([], "count_all")]
            )
            out = pa.table(
                {
                    "term": agg["term"].cast(pa.string()),
                    "doc_id": agg["doc_id"],
                    "doclen": agg["doclen"],
                    "tf": agg["count_all"].cast(pa.int64()),
                    "positions": agg["pos_list"],
                }
            )
            if with_sha:
                out = _attach_sha(out, content, doc_ids, doclen, np, pa)
            yield from out.to_batches()

    schema = "term string, doc_id long, doclen long, tf long, positions array<int>" + (
        ", sha256 string" if with_sha else ""
    )
    return docs.select("doc_id", content_col).mapInArrow(fn, schema=schema)


def tf_docstats_direct(
    docs: DataFrame,
    meta_cols: list[str],
    out_dir: str,
    content_col: str = "content",
    positional: bool = False,
) -> DataFrame:
    """Fused tf+docstats kernel with DIRECT parquet output for the tf
    relation (r6, guide §4.2: do the heavy lifting in native code).

    The classic path returns ~150 tf rows per doc through the Python→JVM
    Arrow boundary, converts each to an UnsafeRow, and re-encodes them in
    the JVM parquet writer — measured at 2M docs/local[8]: the return+write
    tail costs ~19 s on top of a ~27 s compute floor. Here each task
    streams its tf batches straight into ONE parquet file under ``out_dir``
    via pyarrow's C++ writer (0.2 s per 2.8M rows, measured) and returns
    only the per-doc stats row (doc_id, *meta passthrough, doclen, sha256)
    — i.e. the docstats relation, ~1/150th of the rows. One scan, one
    action materializes BOTH checkpoints.

    The tf rows written are IDENTICAL in content to
    :func:`term_frequencies_arrow(with_sha=True)` (sparse sha sidecar +
    term-NULL sentinels for zero-token docs), so every downstream consumer
    — terms, postings, the fused docstats derive on resume — reads the
    checkpoint unchanged (asserted row-identical in tests/test_index.py).

    Commit protocol: tasks write ``_tmp-<pid>-<attempt>`` then atomically
    rename to ``part-<pid>``; a retried task recomputes the same partition
    deterministically and the rename makes it idempotent. The caller owns
    the stage ``_SUCCESS`` marker (written only after the driving action
    returns). On a cluster ``out_dir`` is shared storage — the same
    contract as any committer-less distributed sink.
    """

    def fn(batches):
        import os as _os2

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from ..functions.tokenize import CAMEL_BOUNDARY, NON_TOKEN

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        att = ctx.attemptNumber() if ctx is not None else 0
        tmp = _os2.path.join(out_dir, f"_tmp-{pid:05d}-{att}.parquet")
        final = _os2.path.join(out_dir, f"part-{pid:05d}-graft.snappy.parquet")
        writer = None
        # per-batch term partials (r6): a materialized map-side combine for
        # the terms dictionary — (term, df, cf) per batch, written to the
        # underscore-hidden ``_termstats`` sidecar during the pass the build
        # already makes, so build_terms aggregates vocabulary-sized partials
        # instead of rescanning the full tf checkpoint (guide §2.3
        # "aggregate before you shuffle"). Partial rows may repeat a term
        # (per batch, per task) — the Spark-side SUM makes them exact.
        pdir = _os2.path.join(out_dir, "_termstats")
        ptmp = _os2.path.join(pdir, f"_tmp-{pid:05d}-{att}.parquet")
        pfinal = _os2.path.join(pdir, f"part-{pid:05d}-graft.snappy.parquet")
        pwriter = None
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            names = rb.schema.names
            content = pc.fill_null(rb.column(names.index(content_col)), "")
            spaced = pc.replace_substring_regex(
                content, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2"
            )
            toks = pc.split_pattern_regex(pc.utf8_lower(spaced), pattern=NON_TOKEN)
            lengths = pc.list_value_length(toks).to_numpy().astype(np.int64)
            parent = np.repeat(np.arange(n, dtype=np.int64), lengths)
            flat = pc.list_flatten(toks)
            keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
            parent = parent[keep]
            doclen = np.bincount(parent, minlength=n)
            doc_ids = rb.column(names.index("doc_id")).to_numpy()
            tcols = {
                "term": flat.filter(pa.array(keep)),
                "doc_id": pa.array(doc_ids[parent], pa.int64()),
                "doclen": pa.array(doclen[parent], pa.int64()),
            }
            if positional:
                idx = np.arange(parent.size, dtype=np.int64)
                pos = (
                    idx - np.searchsorted(parent, parent, side="left") + 1
                ).astype(np.int32)
                tcols["pos"] = pa.array(pos, pa.int32())
                agg = pa.table(tcols).group_by(["term", "doc_id", "doclen"]).aggregate(
                    [("pos", "list"), ([], "count_all")]
                )
                out = pa.table(
                    {
                        "term": agg["term"].cast(pa.string()),
                        "doc_id": agg["doc_id"],
                        "doclen": agg["doclen"],
                        "tf": agg["count_all"].cast(pa.int64()),
                        "positions": agg["pos_list"],
                    }
                )
            else:
                agg = pa.table(tcols).group_by(["term", "doc_id", "doclen"]).aggregate(
                    [([], "count_all")]
                )
                out = pa.table(
                    {
                        "term": agg["term"].cast(pa.string()),
                        "doc_id": agg["doc_id"],
                        "doclen": agg["doclen"],
                        "tf": agg["count_all"].cast(pa.int64()),
                    }
                )
            pt = out.group_by("term").aggregate([("tf", "sum"), ([], "count_all")])
            partial = pa.table(
                {
                    "term": pt["term"],
                    "df": pt["count_all"].cast(pa.int64()),
                    "cf": pt["tf_sum"].cast(pa.int64()),
                }
            )
            if pwriter is None:
                _os2.makedirs(pdir, exist_ok=True)
                pwriter = pq.ParquetWriter(ptmp, partial.schema)
            pwriter.write_table(partial)
            sha = pa.array(_sha256_hex(content, n), pa.string())
            out = _attach_sha(out, content, doc_ids, doclen, np, pa, sha=sha)
            if writer is None:
                writer = pq.ParquetWriter(tmp, out.schema)
            writer.write_table(out)
            stats = {"doc_id": rb.column(names.index("doc_id"))}
            for c in fn.meta_cols:
                stats[c] = rb.column(names.index(c))
            stats["doclen"] = pa.array(doclen.astype(np.int64), pa.int64())
            stats["sha256"] = sha
            yield pa.RecordBatch.from_pydict(stats)
        if writer is not None:
            writer.close()
            _os2.replace(tmp, final)
        if pwriter is not None:
            pwriter.close()
            _os2.replace(ptmp, pfinal)

    fn.meta_cols = list(meta_cols)
    dtypes = {f.name: f.dataType.simpleString() for f in docs.schema}
    meta_schema = ", ".join(f"{c} {dtypes[c]}" for c in meta_cols)
    schema = (
        "doc_id long"
        + (", " + meta_schema if meta_schema else "")
        + ", doclen long, sha256 string"
    )
    return docs.select("doc_id", content_col, *meta_cols).mapInArrow(fn, schema=schema)


def ensure_tf_files(out_dir: str, positional: bool = False) -> None:
    """Zero-doc guard for the kernel-direct tf write: an empty corpus
    produces no task files, which would make the checkpoint unreadable —
    land one empty file carrying the schema (the flat-empty-write analog)."""
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    # finalized task files only — a crashed attempt's _tmp-* leftover (hidden
    # from Spark's listing) must not suppress the schema-carrying empty file
    if _glob.glob(os.path.join(out_dir, "part-*.parquet")):
        return
    fields = [
        pa.field("term", pa.string()),
        pa.field("doc_id", pa.int64()),
        pa.field("doclen", pa.int64()),
        pa.field("tf", pa.int64()),
    ]
    if positional:
        fields.append(pa.field("positions", pa.list_(pa.int32())))
    fields.append(pa.field("sha256", pa.string()))
    pq.write_table(
        pa.table({f.name: pa.array([], f.type) for f in fields}),
        os.path.join(out_dir, "part-00000-graft.snappy.parquet"),
    )


def docstats_arrow(
    docs: DataFrame, meta_cols: list[str], content_col: str = "content"
) -> DataFrame:
    """docstats kernel v2 (mapInArrow): doclen via the same Arrow tokenize
    pipeline as :func:`term_frequencies_arrow`, sha256 hashed ZERO-COPY from
    the Arrow string buffer (hashlib accepts memoryviews — the content is
    never decoded into a Python str). Python per row: one hashlib call and
    one 64-char hexdigest, nothing proportional to document size."""

    def fn(batches):
        import hashlib

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..functions.tokenize import CAMEL_BOUNDARY, TOKEN_RUN

        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            content = pc.fill_null(rb[content_col], "")
            spaced = pc.replace_substring_regex(
                content, pattern=CAMEL_BOUNDARY, replacement=r"\1 \2"
            )
            # doclen = number of maximal token runs — identical to counting
            # non-empty split results, without materializing the token lists
            doclen = pc.count_substring_regex(
                pc.utf8_lower(spaced), pattern=TOKEN_RUN
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            # zero-copy sha256: hash utf8 bytes straight out of the buffer
            carr = content.combine_chunks() if isinstance(content, pa.ChunkedArray) else content
            bufs = carr.buffers()
            odt = np.int64 if pa.types.is_large_string(carr.type) else np.int32
            offs = np.frombuffer(bufs[1], dtype=odt, count=carr.offset + n + 1)
            data = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
            sha = [
                hashlib.sha256(data[offs[carr.offset + i] : offs[carr.offset + i + 1]]).hexdigest()
                for i in range(n)
            ]
            cols = {name: rb[name] for name in ("doc_id", *fn.meta_cols)}
            cols["doclen"] = pa.array(doclen, pa.int64())
            cols["sha256"] = pa.array(sha, pa.string())
            yield from pa.table(cols).to_batches()

    fn.meta_cols = list(meta_cols)
    dtypes = {f.name: f.dataType.simpleString() for f in docs.schema}
    meta_schema = ", ".join(f"{c} {dtypes[c]}" for c in meta_cols)
    schema = "doc_id long" + (", " + meta_schema if meta_schema else "") + ", doclen long, sha256 string"
    return docs.select("doc_id", *meta_cols, content_col).mapInArrow(fn, schema=schema)


def docstats_pandas(
    docs: DataFrame, meta_cols: list[str], content_col: str = "content"
) -> DataFrame:
    """Hot-path docstats: doc_id + metadata + doclen + sha256(content), one
    Arrow pass (tokenize for doclen and hashlib sha256 in the same kernel)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from ..functions.tokenize import tokenize_py

        for pdf in batches:
            out = pdf[["doc_id", *meta_cols]].copy()
            out["doclen"] = [len(tokenize_py(c)) for c in pdf[content_col]]
            out["sha256"] = [
                hashlib.sha256(c.encode("utf-8")).hexdigest() for c in pdf[content_col]
            ]
            yield out

    dtypes = {f.name: f.dataType.simpleString() for f in docs.schema}
    meta_schema = ", ".join(f"{c} {dtypes[c]}" for c in meta_cols)
    schema = "doc_id long" + (", " + meta_schema if meta_schema else "") + ", doclen long, sha256 string"
    return docs.select("doc_id", *meta_cols, content_col).mapInPandas(fn, schema=schema)


def build_terms(tf: DataFrame, partials: DataFrame | None = None) -> DataFrame:
    """Term dictionary: (term, term_id, df, cf).

    Replaces the reference's single-row vocabulary string (K3,
    ``db_classes.py:181-208``) — the #1 anti-pattern SURVEY.md flags.
    term_id is the dense rank of the term string (deterministic).
    """
    from .docids import assign_dense_ids

    # term-NULL rows are fused-docstats sentinels (zero-token docs), not terms
    # PERSISTED: the id-ranking machinery below touches this relation three
    # times (range sampler, counts collect, final join-back) — without the
    # persist each touch re-runs the full tf scan + aggregation (r6: two
    # extra passes over the build's largest relation). Vocabulary-sized, so
    # the cache is metadata-scale; released via `_stats_cache` by the caller
    # (plans/build._unpersist) once the dictionary is written.
    # r6: when the direct tf kernel left its ``_termstats`` partial sidecar
    # (per-batch (term, df, cf) rows — a materialized map-side combine),
    # the dictionary aggregates those vocabulary-sized partials instead of
    # rescanning the full tf checkpoint. Values are identical: per-term
    # df = sum of per-batch counts, cf = sum of per-batch tf sums (the
    # coalesce keeps df non-nullable exactly like the count() it replaces;
    # groups are never empty so the value is unchanged).
    if partials is not None:
        stats = partials.groupBy("term").agg(
            F.coalesce(F.sum("df"), F.lit(0)).cast("long").alias("df"),
            F.sum("cf").alias("cf"),
        ).persist()
    else:
        stats = tf.filter(F.col("term").isNotNull()).groupBy("term").agg(
            F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
        ).persist()
    # term_id = dense rank of the term string, assigned with the same
    # range-partition + prefix-sum technique as doc_ids (no global window —
    # the vocabulary can reach 1e8+ terms on a code corpus).
    out = assign_dense_ids(stats, ["term"], "term_id")
    out._stats_cache = stats
    return out


def corpus_stats(tok_docs: DataFrame) -> tuple[int, float]:
    row = tok_docs.agg(
        F.count(F.lit(1)).alias("n"), F.avg("doclen").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def _encode_partition(avgdl: float, n_buckets: int | None = None) -> callable:
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
            yield from _encode_frame(pdf, avgdl, np, n_buckets)
        if tail is not None and len(tail):
            import numpy as np

            yield from _encode_frame(tail, avgdl, np, n_buckets)

    return fn


def _encode_frame(
    pdf: pd.DataFrame, avgdl: float, np, n_buckets: int | None = None
) -> Iterator[pd.DataFrame]:
    """Encode one frame of (bucket, term_id, doc_id, doclen, tf) rows, sorted
    by (term_id, doc_id), into compressed blocks.

    Fully vectorized: block boundaries via diff/reduceat, ONE varint pass per
    column for the whole frame, per-block bytes sliced out of that buffer by
    offset. The only per-block Python is the final buffer slicing (bench:
    the naive per-block loop anti-scaled — 16s@8c -> 35s@32c on 100k docs)."""
    from ..functions.bm25 import tfnorm_np
    from ..functions.codec import varint_encode_with_lengths

    n_rows = len(pdf)
    if n_rows == 0:
        return
    terms = pdf["term_id"].to_numpy()
    buckets = pdf["bucket"].to_numpy() if "bucket" in pdf.columns else None
    docs = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["doclen"].to_numpy(dtype=np.int64)

    # per-term run starts -> per-block starts (every BLOCK_SIZE within a run)
    run_starts = np.concatenate([[0], (np.diff(terms) != 0).nonzero()[0] + 1])
    run_ends = np.concatenate([run_starts[1:], [n_rows]])
    run_lens = run_ends - run_starts
    blocks_per_run = (run_lens + BLOCK_SIZE - 1) // BLOCK_SIZE
    # block start indices: run_start + k*BLOCK_SIZE, k in [0, blocks_per_run)
    rep_starts = np.repeat(run_starts, blocks_per_run)
    k_within = np.arange(int(blocks_per_run.sum())) - np.repeat(
        np.cumsum(blocks_per_run) - blocks_per_run, blocks_per_run
    )
    bstarts = rep_starts + k_within * BLOCK_SIZE
    bends = np.minimum(bstarts + BLOCK_SIZE, np.repeat(run_ends, blocks_per_run))
    bn = bends - bstarts

    # delta-gaps over the whole frame, reset to absolute doc_id at block heads
    gaps = np.empty(n_rows, dtype=np.uint64)
    gaps[1:] = np.diff(docs).astype(np.uint64)
    gaps[bstarts] = docs[bstarts].astype(np.uint64)

    tfn = tfnorm_np(tfs.astype(np.float64), dls.astype(np.float64), avgdl)

    def encode_column(vals):
        buf, lens = varint_encode_with_lengths(vals)
        ends = np.cumsum(lens)
        starts = ends - lens
        lo = starts[bstarts]
        hi = ends[bends - 1]
        return [buf[a:b].tobytes() for a, b in zip(lo, hi)]

    cols = {
        # bucket is recomputed per BLOCK from term_id when it did not ride
        # the shuffle (r6: one fewer column through the build's biggest
        # exchange+sort) — xxhash64_long_np is the Spark-parity hash
        "bucket": (
            buckets[bstarts].astype(np.int32)
            if buckets is not None
            else _buckets_np(terms[bstarts], n_buckets, np)
        ),
        "term_id": terms[bstarts],
        "block_id": docs[bstarts],
        "n": bn.astype(np.int32),
        "first_doc": docs[bstarts],
        "last_doc": docs[bends - 1],
        "max_tf": np.maximum.reduceat(tfs, bstarts).astype(np.int32),
        # rounded UP one float32 ulp: the MaxScore kernel treats this as
        # a true upper bound, and a plain float32 cast can round below
        # the float64 max (~6e-8 rel), which could prune a top-k doc
        "block_max_tfn": np.nextafter(
            np.maximum.reduceat(tfn, bstarts).astype(np.float32),
            np.float32(np.inf),
        ),
        "doc_ids": encode_column(gaps),
        "tfs": encode_column(tfs.astype(np.uint64)),
        "dls": encode_column(dls.astype(np.uint64)),
    }
    if "positions" in pdf.columns:
        # flatten per-posting position lists; sort within each posting;
        # delta-encode with an absolute reset at every posting head
        flat_pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["positions"]])
        flat_row = np.repeat(np.arange(n_rows, dtype=np.int64), tfs)
        order = np.lexsort((flat_pos, flat_row))
        flat_pos = flat_pos[order]
        pcum = np.concatenate([[0], np.cumsum(tfs)])
        pgaps = np.empty(flat_pos.size, dtype=np.uint64)
        pgaps[1:] = (flat_pos[1:] - flat_pos[:-1]).astype(np.uint64)
        heads = pcum[:-1]  # first position index of each posting
        pgaps[heads] = flat_pos[heads].astype(np.uint64)
        from ..functions.codec import varint_encode_with_lengths as _venc

        pbuf, plens = _venc(pgaps)
        pends = np.cumsum(plens)
        pstarts = pends - plens
        lo = pstarts[pcum[bstarts]]
        hi = pends[pcum[bends] - 1]
        cols["poss"] = [pbuf[a:b].tobytes() for a, b in zip(lo, hi)]
    yield pd.DataFrame(cols)


def _buckets_np(term_ids, n_buckets: int, np):
    """Per-block bucket = pmod(xxhash64(term_id), n_buckets), recomputed in
    the kernel (Spark-parity vectorized XXH64) so the bucket column never
    rides the posting exchange/sort/IPC."""
    from ..functions.xxhash import xxhash64_long_np

    return (xxhash64_long_np(np.asarray(term_ids, dtype=np.int64))
            % np.int64(n_buckets)).astype(np.int32)


def _encode_partition_arrow(avgdl: float, n_buckets: int | None = None) -> callable:
    """mapInArrow twin of :func:`_encode_partition` — same math, zero
    per-block Python objects on output: the binary posting columns are
    built as Arrow BinaryArrays directly over the varint buffer
    (``from_buffers`` with block offsets), instead of a Python ``bytes``
    object per block per column. Blocks tile the encode buffer exactly
    (every row's bytes belong to exactly one block, in order), so the
    offsets vector is just the block starts + total length.

    Byte-identical to the pandas encoder (asserted in
    tests/test_codec.py::test_encode_kernels_byte_identical); select with
    ``GRAFT_ENCODE_KERNEL=pandas`` to revert."""

    def fn(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        tail: dict | None = None
        for rb in batches:
            if rb.num_rows == 0:
                continue
            cols = {c: rb.column(i).to_numpy(zero_copy_only=False)
                    for i, c in enumerate(rb.schema.names) if c != "positions"}
            if "positions" in rb.schema.names:
                parr = rb.column(rb.schema.names.index("positions"))
                cols["pos_flat"] = pc.list_flatten(parr).to_numpy(zero_copy_only=False)
                cols["pos_len"] = pc.list_value_length(parr).to_numpy().astype(np.int64)
            if tail is not None:
                cols = {k: np.concatenate([tail[k], cols[k]]) for k in cols}
            n = cols["term_id"].size
            last_term = cols["term_id"][-1]
            cut = (cols["term_id"] != last_term).nonzero()[0]
            if not cut.size:
                tail = cols
                continue
            split = int(cut[-1] + 1)
            tail = _slice_cols(cols, split, n, np)
            for chunk in _frame_chunks(_slice_cols(cols, 0, split, np), np):
                yield _encode_np(chunk, avgdl, np, pa, n_buckets)
        if tail is not None and tail["term_id"].size:
            import numpy as np
            import pyarrow as pa

            for chunk in _frame_chunks(tail, np):
                yield _encode_np(chunk, avgdl, np, pa, n_buckets)

    return fn


# rows per encode frame: bounds every varint buffer (≤ ~30 B/row for the
# doc/tf/dl streams) far below the int32 BinaryArray offset limit
_ENCODE_CHUNK_ROWS = 4_000_000


# positions per chunk: bounds the positional varint buffer (≤ ~5 B/gap)
# under the int32 BinaryArray offset limit with wide margin
_ENCODE_CHUNK_POS = 100_000_000


def _frame_chunks(cols: dict, np, cap_rows: int = _ENCODE_CHUNK_ROWS,
                  cap_pos: int = _ENCODE_CHUNK_POS):
    """Split an encode frame into chunks of ≤cap_rows rows AND (for
    positional frames) ≤~cap_pos flattened positions — the positions stream
    scales with total tf, not rows, so a row cap alone cannot bound its
    varint buffer. Boundaries sit at run_start + k*BLOCK_SIZE of the run
    containing them — exactly the block boundaries the unchunked encode
    would produce, so chunked output is byte-identical (each chunk's first
    row is a true block head: same absolute-doc_id gap resets, same
    per-block byte ranges)."""
    n = cols["term_id"].size
    pcum = None
    if "pos_len" in cols:
        pcum = np.concatenate([[0], np.cumsum(cols["pos_len"])])
    if n <= cap_rows and (pcum is None or pcum[-1] <= cap_pos):
        yield cols
        return
    terms = cols["term_id"]
    run_starts = np.concatenate([[0], (np.diff(terms) != 0).nonzero()[0] + 1])
    start = 0
    while start < n:
        target = min(start + cap_rows, n)
        if pcum is not None:
            # furthest row keeping the chunk's positions within cap_pos
            ptarget = int(np.searchsorted(pcum, pcum[start] + cap_pos, "right") - 1)
            target = min(target, max(ptarget, start + 1))
        if target < n:
            ri = int(np.searchsorted(run_starts, target, side="right") - 1)
            rs = int(run_starts[ri])
            target = rs + ((target - rs) // BLOCK_SIZE) * BLOCK_SIZE
            if target <= start:
                # progress guard (caps smaller than a block, or one row's
                # positions exceeding cap_pos): advance to the next block
                # boundary after start — clamped to the current run's end,
                # which is itself a boundary (every run start heads a block)
                ri2 = int(np.searchsorted(run_starts, start, "right") - 1)
                rs2 = int(run_starts[ri2])
                run_end = int(run_starts[ri2 + 1]) if ri2 + 1 < run_starts.size else n
                target = min(
                    n, run_end,
                    rs2 + ((start - rs2) // BLOCK_SIZE + 1) * BLOCK_SIZE,
                )
        yield _slice_cols(cols, int(start), int(target), np)
        start = int(target)


def _slice_cols(cols: dict, a: int, b: int, np) -> dict:
    out = {}
    if "pos_len" in cols:
        pcum = np.concatenate([[0], np.cumsum(cols["pos_len"])])
        out["pos_flat"] = cols["pos_flat"][pcum[a]:pcum[b]]
    for k, v in cols.items():
        if k != "pos_flat":
            out[k] = v[a:b]
    return out


def _encode_np(cols: dict, avgdl: float, np, pa, n_buckets: int | None = None):
    """One frame of partition-sorted rows -> an Arrow RecordBatch of blocks
    (same math as :func:`_encode_frame`, Arrow-native output)."""
    from ..functions.bm25 import tfnorm_np
    from ..functions.codec import varint_encode_with_lengths

    terms = cols["term_id"]
    n_rows = terms.size
    docs = cols["doc_id"].astype(np.int64)
    tfs = cols["tf"].astype(np.int64)
    dls = cols["doclen"].astype(np.int64)

    run_starts = np.concatenate([[0], (np.diff(terms) != 0).nonzero()[0] + 1])
    run_ends = np.concatenate([run_starts[1:], [n_rows]])
    run_lens = run_ends - run_starts
    blocks_per_run = (run_lens + BLOCK_SIZE - 1) // BLOCK_SIZE
    rep_starts = np.repeat(run_starts, blocks_per_run)
    k_within = np.arange(int(blocks_per_run.sum())) - np.repeat(
        np.cumsum(blocks_per_run) - blocks_per_run, blocks_per_run
    )
    bstarts = rep_starts + k_within * BLOCK_SIZE
    bends = np.minimum(bstarts + BLOCK_SIZE, np.repeat(run_ends, blocks_per_run))
    bn = bends - bstarts
    n_blocks = bstarts.size

    gaps = np.empty(n_rows, dtype=np.uint64)
    gaps[1:] = np.diff(docs).astype(np.uint64)
    gaps[bstarts] = docs[bstarts].astype(np.uint64)
    tfn = tfnorm_np(tfs.astype(np.float64), dls.astype(np.float64), avgdl)

    def bin_col(vals):
        buf, lens = varint_encode_with_lengths(vals)
        ends = np.cumsum(lens)
        starts = ends - lens
        offs = np.empty(n_blocks + 1, dtype=np.int32)
        offs[:-1] = starts[bstarts]
        offs[-1] = ends[-1] if ends.size else 0
        return pa.BinaryArray.from_buffers(
            pa.binary(), n_blocks, [None, pa.py_buffer(offs), pa.py_buffer(buf)]
        )

    arrays = [
        pa.array(
            cols["bucket"][bstarts].astype(np.int32)
            if "bucket" in cols
            else _buckets_np(terms[bstarts], n_buckets, np),
            pa.int32(),
        ),
        pa.array(terms[bstarts].astype(np.int64), pa.int64()),
        pa.array(docs[bstarts], pa.int64()),
        pa.array(bn.astype(np.int32), pa.int32()),
        pa.array(docs[bstarts], pa.int64()),
        pa.array(docs[bends - 1], pa.int64()),
        pa.array(np.maximum.reduceat(tfs, bstarts).astype(np.int32), pa.int32()),
        pa.array(
            np.nextafter(
                np.maximum.reduceat(tfn, bstarts).astype(np.float32),
                np.float32(np.inf),
            ),
            pa.float32(),
        ),
        bin_col(gaps),
        bin_col(tfs.astype(np.uint64)),
        bin_col(dls.astype(np.uint64)),
    ]
    names = ["bucket", "term_id", "block_id", "n", "first_doc", "last_doc",
             "max_tf", "block_max_tfn", "doc_ids", "tfs", "dls"]
    if "pos_len" in cols:
        from ..functions.codec import varint_encode_with_lengths as _venc

        lens = cols["pos_len"]
        flat_pos = cols["pos_flat"].astype(np.int64)
        flat_row = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
        order = np.lexsort((flat_pos, flat_row))
        flat_pos = flat_pos[order]
        pcum = np.concatenate([[0], np.cumsum(lens)])
        pgaps = np.empty(flat_pos.size, dtype=np.uint64)
        pgaps[1:] = (flat_pos[1:] - flat_pos[:-1]).astype(np.uint64)
        heads = pcum[:-1]
        pgaps[heads] = flat_pos[heads].astype(np.uint64)
        pbuf, plens = _venc(pgaps)
        pends = np.cumsum(plens)
        pstarts = pends - plens
        offs = np.empty(n_blocks + 1, dtype=np.int32)
        offs[:-1] = pstarts[pcum[bstarts]]
        offs[-1] = pends[-1] if pends.size else 0
        arrays.append(pa.BinaryArray.from_buffers(
            pa.binary(), n_blocks, [None, pa.py_buffer(offs), pa.py_buffer(pbuf)]
        ))
        names.append("poss")
    return pa.RecordBatch.from_arrays(arrays, names)


def build_postings(
    tf: DataFrame,
    terms: DataFrame,
    avgdl: float,
    n_buckets: int = N_BUCKETS,
    partitions: int | None = None,
    n_docs: int | None = None,
    bucket_mod: tuple[int, int] | None = None,
    doc_id_range: tuple[int, int] | None = None,
    n_terms: int | None = None,
) -> DataFrame:
    """tf (term, doc_id, doclen, tf) -> compressed posting blocks.

    ``bucket_mod=(g, G)`` restricts the build to buckets with
    ``bucket % G == g`` (the per-bucket-group resume path in
    ``plans/build.py``). Because partition assignment is
    ``hash(bucket, slice)`` and encode order is a total sort, the blocks a
    group emits are byte-identical to the same buckets' blocks from a full
    build — group-sliced builds compose losslessly.

    Partitioning: HASH on (bucket, doc-range slice), then sort within
    partitions. Versus repartitionByRange this (a) skips the range-sampler's
    extra full pass over tf, (b) makes partition assignment — and therefore
    block boundaries — fully deterministic (resume => byte-identical
    segments), and (c) still splits hot terms across tasks: a term's
    postings spread over ``ceil(n_docs / slice)`` doc-contiguous slices, so
    block doc-ranges stay disjoint per term (the WAND pruning invariant).
    """
    spark = tf.sparkSession
    partitions = partitions or spark.sparkContext.defaultParallelism
    if n_docs:
        # target ~4 slices per partition's worth of docs; floor keeps slices
        # doc-contiguous so per-term block ranges never overlap
        slice_docs = max(BLOCK_SIZE, n_docs // (partitions * 4) + 1)
    else:
        slice_docs = 1 << 20
    positional = "positions" in tf.columns
    keyed = tf.join(F.broadcast(terms.select("term", "term_id")), "term")
    # bucket stays an EXPRESSION end to end (r6): it is derivable from
    # term_id (pmod(xxhash64, B)), so materializing it as a column only
    # added 8 bytes/row to the build's biggest exchange, the partition
    # sort, and the JVM->Python Arrow IPC — the encode kernel recomputes
    # it per BLOCK with the Spark-parity vectorized XXH64 (_buckets_np).
    # The cast to long before hashing keeps the hashed VALUE identical
    # after the int32 narrowing below, so partition assignment — and with
    # it resume byte-identity — is unchanged.
    def bucket_expr():
        return F.pmod(
            F.xxhash64(F.col("term_id").cast("long")), F.lit(n_buckets)
        ).cast("int")

    if bucket_mod is not None:
        g, n_groups = bucket_mod
        keyed = keyed.filter(F.pmod(bucket_expr(), F.lit(n_groups)) == g)
    pos_cols = ["positions"] if positional else []
    # int32 tf/doclen BEFORE the exchange, and the slice key as an
    # EXPRESSION rather than a materialized column: the posting shuffle is
    # the build's biggest data movement (~40 B/row at 10^8+ rows), and it is
    # DRAM-bandwidth-bound — the r4 1M-doc scaling study measured the
    # postings stage at 0.45 efficiency 2->8 while the compute stages ran
    # 0.68-0.73. Narrowing the shuffled row (no slice column, int32 tf/dl)
    # cuts exchange bytes ~40%, which is the lever that actually moves a
    # bandwidth-bound stage. (The same int32 cast also measured -16% on the
    # JVM->Python Arrow IPC. Safe: doclen < 2^31 tokens by the 2 GB string
    # limit; tf <= doclen; the kernel upcasts to int64 before arithmetic.)
    # Hash-partition assignment is over the same (bucket, slice) VALUES, so
    # block boundaries — and resume byte-identity — are unchanged.
    # r5 (VERDICT r04 #1a): when the caller can PROVE the id spaces fit
    # int32 — doc_id via the docstats min/max (one extra agg column in a
    # job that already runs), term_id via the dictionary size (term_id is
    # the rank of term, so max = n_terms-1) — both ids narrow before the
    # exchange too, cutting another ~8 B/row off the in-memory row and
    # (via the zero-byte-heavy padding) the lz4-compressed shuffle stream.
    # The encoder upcasts to int64, so block BYTES are unchanged (the
    # byte-identity and resume tests still certify equality), and hash
    # partitioning is over the same VALUES, so partition assignment —
    # and resume byte-identity — is unchanged. None = no proof = stay wide.
    doc_expr = F.col("doc_id")
    if doc_id_range is not None and (
        -(1 << 31) <= doc_id_range[0] and doc_id_range[1] < (1 << 31)
    ):
        doc_expr = F.col("doc_id").cast("int")
    term_expr = F.col("term_id")
    if n_terms is not None and n_terms <= (1 << 31):
        term_expr = F.col("term_id").cast("int")
    slice_col = (F.col("doc_id") / F.lit(slice_docs)).cast("long")
    # sort on (slice, term_id, doc_id): slice MUST stay in the key — a
    # term's non-adjacent slices can hash to the same partition, and
    # without the slice major they would merge into one run whose blocks
    # span doc ranges held by OTHER partitions, breaking the per-term
    # disjoint-block-range invariant (J7) that block-max pruning's
    # bookkeeping documents. bucket is dropped: the encoder splits
    # frames on term_id change-points, so a bucket-major order adds a
    # 4th comparison key for nothing.
    sort_keys = [slice_col, F.col("term_id"), F.col("doc_id")]
    # r6: when the caller PROVES the id spaces are non-negative and narrow
    # (same proofs as the int32 narrowing), the 3-key sort collapses into
    # ONE packed non-negative long key with the same lexicographic order —
    # a single LongType ordering is exactly what lets Spark's Tungsten sort
    # take the 8-byte-prefix RADIX path instead of the 3-comparator
    # interpreted path. Order is identical (disjoint bit fields, all
    # non-negative), so block boundaries and bytes are unchanged.
    if (
        doc_id_range is not None
        and doc_id_range[0] >= 0
        and n_terms is not None
        and n_terms >= 1
    ):
        b_d = max(int(doc_id_range[1]).bit_length(), 1)
        b_t = max(int(n_terms - 1).bit_length(), 1)
        b_s = max(int(doc_id_range[1] // slice_docs).bit_length(), 1)
        if b_s + b_t + b_d <= 62:
            sort_keys = [
                slice_col * F.lit(1 << (b_t + b_d))
                + F.col("term_id").cast("long") * F.lit(1 << b_d)
                + F.col("doc_id").cast("long")
            ]
    narrow = (
        keyed.select(
            term_expr.alias("term_id"),
            doc_expr.alias("doc_id"),
            F.col("doclen").cast("int").alias("doclen"),
            F.col("tf").cast("int").alias("tf"),
            *pos_cols,
        )
        .repartition(partitions, bucket_expr(), slice_col)
        .sortWithinPartitions(*sort_keys)
    )
    schema = POSTINGS_POS_SCHEMA if positional else POSTINGS_SCHEMA
    import os as _os

    if _os.environ.get("GRAFT_ENCODE_KERNEL", "arrow") == "pandas":
        blocks = narrow.mapInPandas(_encode_partition(avgdl, n_buckets), schema=schema)
    else:
        # arrow (default): Arrow-native block output, zero per-block Python
        # objects — byte-identical to the pandas encoder (tested)
        blocks = narrow.mapInArrow(
            _encode_partition_arrow(avgdl, n_buckets), schema=schema
        )
    # local (shuffle-free) re-sort of the encoded blocks: term_id-contiguous
    # row groups give tight Parquet min/max stats, so `term_id IN (...)`
    # skips row groups inside each file (the encode order was (slice,
    # term_id), whose per-row-group ranges overlap across slices)
    return blocks.sortWithinPartitions("bucket", "term_id", "first_doc")


def decode_postings_positional(blocks: DataFrame) -> DataFrame:
    """Positional blocks -> (term_id, doc_id, tf, doclen, positions). The
    per-posting position count IS tf, so the positions stream splits with no
    extra metadata."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codec import decode_doc_gaps, decode_tfs

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = [decode_doc_gaps(b) for b in pdf["doc_ids"]]
            tfs = [decode_tfs(b) for b in pdf["tfs"]]
            dls = [decode_tfs(b) for b in pdf["dls"]]
            poss = []
            for braw, btf in zip(pdf["poss"], tfs):
                gaps = decode_tfs(braw)  # raw varints (uint64 stream)
                pcum = np.concatenate([[0], np.cumsum(btf)])
                vals = np.cumsum(gaps)
                # undo the cross-posting cumsum: rebase each posting to its
                # absolute head (head gap was stored absolute)
                heads = pcum[:-1].astype(np.int64)
                base = vals[heads] - gaps[heads]
                vals = vals - np.repeat(base, btf)
                poss.extend(
                    vals[pcum[i]:pcum[i + 1]].astype(np.int32) for i in range(len(btf))
                )
            reps = np.array([len(x) for x in ids])
            yield pd.DataFrame(
                {
                    "term_id": np.repeat(pdf["term_id"].to_numpy(), reps),
                    "doc_id": np.concatenate(ids),
                    "tf": np.concatenate(tfs),
                    "doclen": np.concatenate(dls),
                    "positions": poss,
                }
            )

    return blocks.mapInPandas(
        fn,
        schema="term_id long, doc_id long, tf long, doclen long, positions array<int>",
    )


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
