"""Delta+varint codec property tests (numpy-vectorized LEB128)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from searchengine_spark.operators.codec import (
    decode_block, decode_doc_ids_batch, encode_block, split_blocks,
    varint_decode, varint_encode)


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_boundaries():
    bounds = []
    for k in range(1, 9):
        bounds += [(1 << (7 * k)) - 1, 1 << (7 * k), (1 << (7 * k)) + 1]
    arr = np.array([0, 1] + bounds, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


@given(st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400))
@settings(max_examples=100, deadline=None)
def test_block_roundtrip(ids):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    tfs = (doc_ids % 97 + 1).astype(np.int64)
    f, n, d, t = encode_block(doc_ids, tfs)
    got_ids, got_tfs = decode_block(f, n, d, t)
    assert np.array_equal(got_ids, doc_ids)
    assert np.array_equal(got_tfs, tfs)


@given(st.lists(st.sets(st.integers(min_value=0, max_value=10**12),
                        min_size=1, max_size=200),
                min_size=0, max_size=20))
@settings(max_examples=100, deadline=None)
def test_decode_doc_ids_batch_matches_per_block(blocks):
    """Batched segmented decode == per-block decode over ANY block mix
    (including single-posting blocks, where the deltas buffer is empty)."""
    firsts, ns, bufs, expected = [], [], [], []
    for ids in blocks:
        doc_ids = np.array(sorted(ids), dtype=np.int64)
        tfs = np.ones(len(doc_ids), dtype=np.int64)
        f, n, d, _ = encode_block(doc_ids, tfs)
        firsts.append(f)
        ns.append(n)
        bufs.append(d)
        expected.append(doc_ids)
    got = decode_doc_ids_batch(
        np.array(firsts, dtype=np.int64), np.array(ns, dtype=np.int64),
        b"".join(bufs))
    want = (np.concatenate(expected) if expected
            else np.zeros(0, dtype=np.int64))
    assert np.array_equal(got, want)


def test_split_blocks_covers_all_and_max():
    rng = np.random.default_rng(7)
    ids = np.unique(rng.integers(0, 10**6, 1000)).astype(np.int64)
    tfs = rng.integers(1, 50, len(ids)).astype(np.int64)
    scores = rng.random(len(ids))
    out_ids, out_tfs = [], []
    for bid, first, n, d, t, mx in split_blocks(ids, tfs, scores, block_size=128):
        di, ti = decode_block(first, n, d, t)
        out_ids.append(di)
        out_tfs.append(ti)
        assert n <= 128 and mx <= scores.max() + 1e-12
    assert np.array_equal(np.concatenate(out_ids), ids)
    assert np.array_equal(np.concatenate(out_tfs), tfs)
