"""Sub-100 ms repeat-query tier: score hot BM25 queries entirely
driver-side from cached decoded postings + the driver dictionary — zero
Spark jobs on a warm hit (VERDICT r3 #7).

Why this exists: the warm Spark path bottoms out at ~0.5 s per query —
not algorithm time but fixed job machinery (scheduling, codegen reuse,
exchange setup). The decoded rows it scores are immutable between
upserts and already bounded by Σ df of the query's terms, so a serving
tier can hold them driver-side (the classic searcher node's posting
cache) and re-score any query over cached terms in numpy:

- first touch of a term pays ONE Spark job (bucket-pruned block fetch →
  driver numpy varint decode) and caches (doc_id, tf, dl) arrays under
  an LRU rows budget;
- every later query whose terms are all cached computes idf + the BM25
  tf-part + the per-doc sum + canonical top-k purely in numpy — no job,
  no py4j round-trip beyond (at most) a ≤k metadata fill;
- winner metadata (conv_id, turn_idx, role, tool, ts) has its own LRU,
  so a REPEATED (query, k) answers with zero Spark jobs end-to-end;
- the cache lives inside the index dict: ``upsert_turns`` returns a NEW
  dict, so staleness is structurally impossible (same argument as
  operators/pcache.py).

Scoring parity: identical formulas and float order as the engine's
numpy decode path (search._decode_blocks — idf and tf-part as float64
vector ops), identical canonical ordering (score rounded to 9 dp desc,
doc_id asc); tests/test_hot.py pins row-for-row equality with
``search()``. Term scale safety: a term with df above
``HOT_MAX_DF_FETCH`` is never driver-cached — the query falls back to
the distributed path (that is what a 10^9-posting term needs anyway).

Reference: the reference has no cache tier at all — it re-runs the
N+1 JDBC loop per query (services/SearchingServiceImpl.java:203-235).
"""

from __future__ import annotations

import math
from collections import OrderedDict

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from searchengine_spark.operators.indexer import B, K1

HOT_MAX_ROWS = 5_000_000      # LRU budget: decoded postings on the driver
HOT_MAX_DF_FETCH = 2_000_000  # never driver-cache terms bigger than this
HOT_META_MAX = 100_000        # winner-metadata LRU (rows)
HOT_DENSE_MAX = 8_000_000     # doc-id-space bound for the O(n) bincount
                              # merge (64 MB float64 scratch); larger id
                              # spaces use the O(n log n) unique-merge

_OUT_COLS = ["doc_id", "conv_id", "turn_idx", "role", "tool", "ts",
             "score"]


def _hot_cache(index: dict) -> dict:
    return index.setdefault(
        "_hotcache", {"terms": OrderedDict(), "rows": 0,
                      "meta": OrderedDict()})


def _fetch_term_rows(index: dict, trow: dict) -> dict:
    """ONE Spark job: collect a term's posting blocks (bucket-pruned scan,
    same shape as the query path) and varint-decode them driver-side into
    (doc_id, tf, dl) numpy arrays. Cost bounded by df ≤ HOT_MAX_DF_FETCH."""
    from searchengine_spark.operators.codec import (decode_doc_ids_batch,
                                                    varint_decode)
    postings = index["postings"]
    tb = index["stats"].get("term_buckets")
    if tb and "term_bucket" in postings.columns:
        postings = postings.filter(
            F.col("term_bucket") == trow["term_id"] % tb)
    rows = (postings.filter(F.col("term_id") == trow["term_id"])
            .select("first_doc_id", "n", "doc_deltas", "tfs", "dls")
            .collect())
    if not rows:
        return {"doc_id": np.empty(0, np.int64),
                "tf": np.empty(0, np.int64),
                "dl": np.empty(0, np.float64), "rows": 0}
    firsts = np.array([r["first_doc_id"] for r in rows], dtype=np.int64)
    ns = np.array([r["n"] for r in rows], dtype=np.int64)
    doc_ids = decode_doc_ids_batch(
        firsts, ns, b"".join(bytes(r["doc_deltas"]) for r in rows))
    tfs = varint_decode(b"".join(bytes(r["tfs"]) for r in rows)).astype(
        np.int64)
    dls = varint_decode(b"".join(bytes(r["dls"]) for r in rows)).astype(
        np.float64)
    return {"doc_id": doc_ids.astype(np.int64), "tf": tfs, "dl": dls,
            "rows": int(len(doc_ids))}


def _term_rows_cached(index: dict, trow: dict) -> dict:
    cache = _hot_cache(index)
    tid = trow["term_id"]
    ent = cache["terms"].get(tid)
    if ent is not None:
        cache["terms"].move_to_end(tid)
        return ent
    ent = _fetch_term_rows(index, trow)
    cache["terms"][tid] = ent
    cache["rows"] += ent["rows"]
    while cache["rows"] > HOT_MAX_ROWS and len(cache["terms"]) > 1:
        _, old = cache["terms"].popitem(last=False)
        cache["rows"] -= old["rows"]
    return ent


def _resolve_mode(index: dict, qterms: list[str], mode: str):
    from searchengine_spark.operators.search import (_resolve_terms_driver,
                                                     _resolve_terms_paged)
    trows = _resolve_terms_driver(index, qterms, mode)
    if trows is None:
        trows = _resolve_terms_paged(index, qterms, mode)
    return trows


def _resolve(index: dict, qterms: list[str]) -> "list[dict] | None":
    return _resolve_mode(index, qterms, "bm25")


def _meta_fill(index: dict, doc_ids: "list[int]") -> dict:
    """Winner metadata via the LRU; at most one ≤k-row collect for the
    ids not yet seen (zero jobs on a repeated query)."""
    cache = _hot_cache(index)["meta"]
    missing = [int(d) for d in doc_ids if int(d) not in cache]
    if missing:
        got = (index["docs"]
               .filter(F.col("doc_id").isin(missing))
               .select("doc_id", "conv_id", "turn_idx", "role", "tool",
                       "ts")
               .collect())
        for r in got:
            cache[int(r["doc_id"])] = r.asDict()
        while len(cache) > HOT_META_MAX:
            cache.popitem(last=False)
    out = {}
    for d in doc_ids:
        cache.move_to_end(int(d))
        out[int(d)] = cache[int(d)]
    return out


def hot_search(index: dict, query: str, k: int = 10,
               mode: str = "bm25",
               k1: "float | None" = None, b: "float | None" = None,
               fallback: bool = True) -> pd.DataFrame:
    """Top-k answered driver-side in ``mode`` "bm25" or "ref_compat"
    (the reference's conjunctive tf-sum ranking — Q3 80%-df prune, AND
    over the resolved terms, score = tf_sum / max over the matches);
    returns a PANDAS DataFrame with ``search()``'s columns (doc_id,
    conv_id, turn_idx, role, tool, ts, score) in ``search()``'s exact
    order (score at 9 dp desc == tf_sum desc for ref_compat, doc_id
    asc). Warm hit = zero Spark jobs. Cold terms pay one fetch job each;
    a term over HOT_MAX_DF_FETCH (or a dictionary miss path error) falls
    back to the distributed ``search()`` when ``fallback`` (else
    raises), so the tier never tries to hold a 10^9-posting term on the
    driver."""
    from searchengine_spark.operators.search import _query_terms

    if mode not in ("bm25", "ref_compat"):
        raise ValueError(f"hot_search supports bm25/ref_compat, not {mode!r}")
    k1e = K1 if k1 is None else float(k1)
    be = B if b is None else float(b)
    qterms = _query_terms(query, index["mode"],
                          index.get("dictionary", "fixture"))
    # the resolution helpers apply the Q3 80%-df prune for ref_compat
    trows = _resolve_mode(index, qterms, mode)
    big = [t for t in (trows or []) if t["df"] > HOT_MAX_DF_FETCH]
    if big:
        if not fallback:
            raise ValueError(
                f"terms over HOT_MAX_DF_FETCH: "
                f"{[t['term'] for t in big]} — use search()")
        from searchengine_spark.operators.search import search
        pdf = search(index, query, k=k, mode=mode, k1=k1, b=b).toPandas()
        return pdf[[c for c in _OUT_COLS if c in pdf.columns]]
    if not trows:
        return pd.DataFrame(columns=_OUT_COLS)

    stats = index["stats"]
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])
    ids_parts, w_parts, tf_parts = [], [], []
    for t in sorted(trows, key=lambda r: r["term_id"]):
        ent = _term_rows_cached(index, t)
        if ent["rows"] == 0:
            continue
        # the per-doc BM25 weight vector depends only on (term stats,
        # corpus stats, k1, b) — all immutable between upserts — so a
        # repeated hot term skips the vector math entirely (≤2 (k1,b)
        # pairs per term: the default + one tuned setting)
        wc = ent.setdefault("w_cache", {})
        w = wc.get((k1e, be))
        if w is None:
            idf = math.log(1.0 + (float(n_docs) - t["df"] + 0.5)
                           / (t["df"] + 0.5))
            tff = ent["tf"].astype(np.float64)
            w = idf * (tff * (k1e + 1.0)) / (
                tff + k1e * (1.0 - be + be * ent["dl"] / avgdl))
            if len(wc) < 2:
                wc[(k1e, be)] = w
        ids_parts.append(ent["doc_id"])
        w_parts.append(w)
        tf_parts.append(ent["tf"])
    if not ids_parts:
        return pd.DataFrame(columns=_OUT_COLS)
    # Multi-term merge strategy: doc ids are DENSE (assign_dense_ids), so
    # when the id space fits a driver buffer the per-doc combine is an
    # O(n) bincount scatter — no sort anywhere. Beyond HOT_DENSE_MAX
    # (e.g. a 10^12-doc id space where only df-capped slices are cached)
    # fall back to the O(n log n) unique-merge.
    id_top = max(int(p.max()) for p in ids_parts)
    dense_ok = id_top + 1 <= HOT_DENSE_MAX
    if mode == "ref_compat":
        # Q6 conjunctive AND over the RESOLVED terms + Q7 tf-sum rank,
        # normalized by the matches' max (== the rank-1 row's tf_sum)
        n_q = len(ids_parts)
        if dense_ok:
            m_sz = id_top + 1
            ntd = np.zeros(m_sz, np.int64)
            tfd = np.zeros(m_sz, np.float64)
            for ids, tf in zip(ids_parts, tf_parts):
                ntd += np.bincount(ids, minlength=m_sz).astype(np.int64)
                tfd += np.bincount(ids, weights=tf.astype(np.float64),
                                   minlength=m_sz)
            mids = np.nonzero(ntd == n_q)[0]
            msum = tfd[mids]
        else:
            all_ids = np.concatenate(ids_parts)
            uniq, inv = np.unique(all_ids, return_inverse=True)
            nt = np.bincount(inv)
            tf_sum = np.bincount(inv, weights=np.concatenate(tf_parts)
                                 .astype(np.float64))
            m = nt == n_q
            mids, msum = uniq[m], tf_sum[m]
        if len(mids) == 0:
            return pd.DataFrame(columns=_OUT_COLS)
        order = np.lexsort((mids, -msum))[:k]
        win_ids = mids[order].tolist()
        tfmax = float(msum[order[0]])
        win_scores = [float(v) / tfmax for v in msum[order]]
        meta = _meta_fill(index, win_ids)
        rows = []
        for d, s in zip(win_ids, win_scores):
            mrow = meta[int(d)]
            rows.append((int(d), mrow["conv_id"], mrow["turn_idx"],
                         mrow["role"], mrow["tool"], mrow["ts"],
                         float(s)))
        return pd.DataFrame(rows, columns=_OUT_COLS)
    if len(ids_parts) == 1:
        # single-term fast path: a term's postings carry each doc at
        # most once — no merge needed at all
        uniq, scores = ids_parts[0], w_parts[0]
    elif dense_ok:
        m_sz = id_top + 1
        dense = np.zeros(m_sz, np.float64)
        for ids, w in zip(ids_parts, w_parts):
            dense += np.bincount(ids, weights=w, minlength=m_sz)
        uniq = np.nonzero(dense)[0]  # BM25 weights are strictly positive
        scores = dense[uniq]
    else:
        all_ids = np.concatenate(ids_parts)
        uniq, inv = np.unique(all_ids, return_inverse=True)
        scores = np.bincount(inv, weights=np.concatenate(w_parts))
    s9 = np.round(scores, 9)
    if len(s9) > 4 * k:
        # exact top-k without sorting the full array: O(n) partition to
        # the k-th rounded score, then the canonical (-score, doc_id)
        # lexsort over only the >= boundary candidates (ties included,
        # so ordering is identical to the full sort)
        kth = np.partition(s9, len(s9) - k)[len(s9) - k]
        cand = np.nonzero(s9 >= kth)[0]
        order = cand[np.lexsort((uniq[cand], -s9[cand]))][:k]
    else:
        order = np.lexsort((uniq, -s9))[:k]
    win_ids = uniq[order].tolist()
    win_scores = scores[order].tolist()
    meta = _meta_fill(index, win_ids)
    rows = []
    for d, s in zip(win_ids, win_scores):
        m = meta[int(d)]
        rows.append((int(d), m["conv_id"], m["turn_idx"], m["role"],
                     m["tool"], m["ts"], float(s)))
    return pd.DataFrame(rows, columns=_OUT_COLS)


def hot_search_many(index: dict, queries: "dict[str, str]", k: int = 10,
                    k1: "float | None" = None,
                    b: "float | None" = None) -> pd.DataFrame:
    """Batched hot tier: every query in ``queries`` (query_id → string)
    answered driver-side from the SAME per-term cache — a replayed query
    log over hot terms costs one numpy pass per query and zero Spark
    jobs once the union of terms is cached. Returns one pandas frame
    with a leading ``query_id`` column and per-query rank order
    identical to ``hot_search`` (hence to ``search``)."""
    frames = []
    for qid in sorted(queries):
        pdf = hot_search(index, queries[qid], k=k, k1=k1, b=b)
        pdf.insert(0, "query_id", qid)
        frames.append(pdf)
    if not frames:
        return pd.DataFrame(columns=["query_id"] + _OUT_COLS)
    return pd.concat(frames, ignore_index=True)
