"""Index build vs golden model: docs, tf, df, dl, dense ids, block integrity."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from searchengine_spark.operators.codec import varint_decode


def test_docs_dedup_and_dense_ids(index_general, golden_general):
    docs = index_general["docs"].select("doc_id", "conv_id", "turn_idx").collect()
    assert len(docs) == golden_general.n_docs  # dup tail removed
    got = sorted((r["doc_id"], r["conv_id"], r["turn_idx"]) for r in docs)
    ids = [g[0] for g in got]
    assert ids == list(range(len(got)))  # dense, 0-based
    # doc_id order == stable (conv_id, turn_idx) order — the per-row invariant
    expected = [(i, d["conv_id"], d["turn_idx"]) for i, d in enumerate(golden_general.docs)]
    assert got == expected


def test_dl_matches_golden(index_general, golden_general):
    dl = {r["doc_id"]: r["dl"] for r in index_general["docs"].select("doc_id", "dl").collect()}
    for did in range(golden_general.n_docs):
        assert dl[did] == golden_general.dl[did], did


def test_df_matches_golden(index_general, golden_general):
    df = {r["term"]: r["df"] for r in index_general["terms"].collect()}
    assert df == dict(golden_general.df)


def test_term_ids_dense_by_term(index_general):
    rows = sorted((r["term"], r["term_id"]) for r in index_general["terms"].collect())
    assert [tid for _, tid in rows] == list(range(len(rows)))


def test_postings_flat_matches_golden(index_general, golden_general):
    t2id = {r["term"]: r["term_id"] for r in index_general["terms"].collect()}
    flat = {(r["term_id"], r["doc_id"]): r["tf"]
            for r in index_general["postings_flat"].collect()}
    expected = {}
    for did in range(golden_general.n_docs):
        for t, tf in golden_general.tf[did].items():
            expected[(t2id[t], did)] = tf
    assert flat == expected


def test_blocks_decode_to_flat(index_general):
    """Compressed postings decode exactly to postings_flat; dls stream matches docs.dl."""
    from searchengine_spark.operators.codec import decode_block
    flat = {(r["term_id"], r["doc_id"]): r["tf"]
            for r in index_general["postings_flat"].collect()}
    dl_of = {r["doc_id"]: r["dl"] for r in index_general["docs"].select("doc_id", "dl").collect()}
    seen = {}
    for r in index_general["postings"].collect():
        ids, tfs = decode_block(r["first_doc_id"], r["n"], bytes(r["doc_deltas"]), bytes(r["tfs"]))
        dls = varint_decode(bytes(r["dls"]))
        assert len(ids) == r["n"] == len(tfs) == len(dls)
        assert np.all(np.diff(ids) > 0)  # strictly increasing within block
        for d, tf, dl in zip(ids.tolist(), tfs.tolist(), dls.tolist()):
            seen[(r["term_id"], d)] = tf
            assert dl_of[d] == dl
    assert seen == flat


def test_block_max_score_is_true_max(index_general):
    """block_max_score upper-bounds every BM25 contribution in the block."""
    from searchengine_spark.operators.codec import decode_block
    stats = index_general["stats"]
    df_of = {r["term_id"]: r["df"] for r in index_general["terms"].collect()}
    dl_of = {r["doc_id"]: r["dl"] for r in index_general["docs"].select("doc_id", "dl").collect()}
    n, avgdl = stats["n_docs"], stats["avgdl"]
    for r in index_general["postings"].limit(500).collect():
        ids, tfs = decode_block(r["first_doc_id"], r["n"], bytes(r["doc_deltas"]), bytes(r["tfs"]))
        idf = np.log(1.0 + (n - df_of[r["term_id"]] + 0.5) / (df_of[r["term_id"]] + 0.5))
        dls = np.array([dl_of[d] for d in ids.tolist()], dtype=float)
        s = idf * (tfs * 2.2) / (tfs + 1.2 * (1 - 0.75 + 0.75 * dls / avgdl))
        assert abs(s.max() - r["block_max_score"]) < 1e-9


def test_statistics_matches_golden(index_general, golden_general):
    from searchengine_spark.operators.indexer import statistics
    rows = {r["role"]: (r["n_docs"], r["n_tokens"]) for r in statistics(index_general).collect()}
    gold = golden_general.statistics()
    for role, (nd, nt) in gold.items():
        assert rows[role] == (nd, nt)
    assert rows["__total__"] == (golden_general.n_docs, sum(golden_general.dl))
