import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geocoderpl_spark.functions.codec import (
    decode_doc_gaps,
    decode_tfs,
    encode_doc_gaps,
    encode_tfs,
    varint_decode,
    varint_encode,
)


def test_varint_golden():
    # LEB128 golden bytes
    assert varint_encode(np.array([0])) == b"\x00"
    assert varint_encode(np.array([1])) == b"\x01"
    assert varint_encode(np.array([127])) == b"\x7f"
    assert varint_encode(np.array([128])) == b"\x80\x01"
    assert varint_encode(np.array([300])) == b"\xac\x02"
    assert varint_encode(np.array([])) == b""


def test_varint_roundtrip_mixed():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**56 + 5, 7])
    assert (varint_decode(varint_encode(vals)) == vals.astype(np.uint64)).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300))
def test_doc_gap_roundtrip(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert (decode_doc_gaps(encode_doc_gaps(arr)) == arr).all()


def test_doc_gap_boundaries():
    assert decode_doc_gaps(b"").size == 0
    one = np.array([42], dtype=np.int64)
    assert (decode_doc_gaps(encode_doc_gaps(one)) == one).all()
    # doc_id 0 must survive (gap-0 head)
    z = np.array([0, 1, 2], dtype=np.int64)
    assert (decode_doc_gaps(encode_doc_gaps(z)) == z).all()


def test_tf_roundtrip():
    tf = np.array([1, 1, 9, 200, 70000], dtype=np.int64)
    assert (decode_tfs(encode_tfs(tf)) == tf).all()


def test_encode_kernels_byte_identical(spark):
    """The mapInArrow block encoder must emit BYTE-identical blocks to the
    pandas encoder — binary payloads included — for both plain and
    positional postings (resume determinism depends on it)."""
    import os

    from geocoderpl_spark.operators.docids import assign_doc_ids
    from geocoderpl_spark.operators.postings import (
        build_postings,
        build_terms,
        term_frequencies_arrow,
        term_positions_arrow,
    )
    from geocoderpl_spark.sources.corpus import synth_corpus

    docs = assign_doc_ids(synth_corpus(spark, 500), ["repo", "path", "commit"], 4)
    for tf_kernel in (term_frequencies_arrow, term_positions_arrow):
        tf = tf_kernel(docs)
        terms = build_terms(tf)
        os.environ["GRAFT_ENCODE_KERNEL"] = "pandas"
        try:
            a = sorted(map(tuple, build_postings(tf, terms, 100.0, 4, 4, n_docs=500).collect()))
        finally:
            os.environ.pop("GRAFT_ENCODE_KERNEL", None)
        b = sorted(map(tuple, build_postings(tf, terms, 100.0, 4, 4, n_docs=500).collect()))
        assert a == b and len(a) > 50


def test_frame_chunking_byte_identical():
    """_frame_chunks must split at true block boundaries: encoding the
    chunks (tiny cap) and concatenating must equal the one-shot encode,
    byte-for-byte — the int32-offset guard cannot change block content."""
    import numpy as np
    import pyarrow as pa

    from geocoderpl_spark.operators.postings import _encode_np, _frame_chunks

    rng = np.random.RandomState(7)
    # a few runs incl. one hot term spanning many blocks
    terms = np.sort(np.concatenate([
        np.full(900, 5), np.repeat(np.arange(6, 40), 17), np.full(3, 2)
    ]))
    n = terms.size
    docs = np.concatenate([np.sort(rng.choice(10**6, size=(terms == t).sum(), replace=False))
                           for t in np.unique(terms)]).astype(np.int64)
    cols = {
        "bucket": np.zeros(n, np.int32),
        "term_id": terms.astype(np.int64),
        "doc_id": docs,
        "doclen": rng.randint(1, 500, n).astype(np.int64),
        "tf": rng.randint(1, 9, n).astype(np.int64),
    }
    one = _encode_np(dict(cols), 100.0, np, pa)
    parts = [_encode_np(c, 100.0, np, pa) for c in _frame_chunks(dict(cols), np, cap_rows=150)]
    assert len(parts) > 3  # genuinely chunked
    merged = pa.Table.from_batches(parts)
    ref = pa.Table.from_batches([one])
    assert merged.num_rows == ref.num_rows
    assert merged.to_pydict() == ref.to_pydict()


def test_frame_chunking_positional_and_progress():
    """Positions-aware chunking: a positional frame split by cap_pos stays
    byte-identical; degenerate caps (smaller than a block) still terminate
    and produce identical output."""
    import numpy as np
    import pyarrow as pa

    from geocoderpl_spark.operators.postings import _encode_np, _frame_chunks

    rng = np.random.RandomState(3)
    terms = np.sort(np.repeat(np.arange(5), 200))
    n = terms.size
    docs = np.concatenate([np.sort(rng.choice(10**5, 200, replace=False))
                           for _ in range(5)]).astype(np.int64)
    tfs = rng.randint(1, 7, n).astype(np.int64)
    pos = [np.sort(rng.choice(np.arange(1, 1000), t, replace=False)) for t in tfs]
    cols = {
        "bucket": np.zeros(n, np.int32),
        "term_id": terms.astype(np.int64),
        "doc_id": docs,
        "doclen": rng.randint(1, 1000, n).astype(np.int64),
        "tf": tfs,
        "pos_flat": np.concatenate(pos).astype(np.int64),
        "pos_len": tfs.copy(),
    }
    ref = pa.Table.from_batches([_encode_np(dict(cols), 100.0, np, pa)])
    for kw in ({"cap_pos": 120}, {"cap_rows": 50}, {"cap_rows": 7, "cap_pos": 11}):
        parts = list(_frame_chunks(dict(cols), np, **{"cap_rows": 10**9, **kw}))
        assert len(parts) > 1
        merged = pa.Table.from_batches([_encode_np(c, 100.0, np, pa) for c in parts])
        assert merged.to_pydict() == ref.to_pydict(), kw


def test_best_partial_per_range_maxima():
    """r5: _best_partial bounds each block by the max accumulated score
    inside the block's OWN [lo, hi) candidate range (r4 used the global
    max — sound but loose). Soundness: out[i] >= true max of the range;
    tightness: out[i] == that max exactly; empty ranges stay 0."""
    from geocoderpl_spark.operators.topk import _best_partial

    acc = np.array([0.5, 3.0, 1.0, 7.0, 2.0, 0.1], dtype=np.float64)
    lo = np.array([0, 2, 4, 5, 3])
    hi = np.array([2, 4, 4, 6, 6])  # [0,2) [2,4) empty [5,6) [3,6)
    out = _best_partial(acc, lo, hi)
    assert out.tolist() == [3.0, 7.0, 0.0, 0.1, 7.0]
    # empty accumulator: all zeros
    assert _best_partial(np.empty(0), np.array([0]), np.array([0])).tolist() == [0.0]
