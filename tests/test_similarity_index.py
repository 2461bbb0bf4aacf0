"""Persisted ANN indexes: ingest-time bucket/centroid assignment stored as a
parquet partition column; queries must PRUNE partitions (scan planning), not
re-hash the corpus (r1 VERDICT finding 4 of the perf audit)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.similarity import (
    build_ivf_index, build_lsh_index, cosine_topk, ivf_index_topk,
    kmeans_centroids, load_ann_index, lsh_bucket_topk, lsh_index_topk)

DIM = 16


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(11)
    # 4 well-separated clusters of 30 + some noise vectors
    centers = rng.normal(size=(4, DIM)) * 4
    rows = []
    i = 0
    for c in range(4):
        for _ in range(30):
            v = centers[c] + rng.normal(scale=0.3, size=DIM)
            rows.append((i, [float(x) for x in v]))
            i += 1
    for _ in range(20):
        rows.append((i, [float(x) for x in rng.normal(size=DIM)]))
        i += 1
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>").persist()


def test_lsh_index_matches_inmemory(spark, vecs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_idx"))
    build_lsh_index(vecs, DIM, path, n_planes=8)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    got = [(r["vec_id"], r["cos"]) for r in lsh_index_topk(ann, q, k=5, multiprobe=1).collect()]
    ref = [(r["vec_id"], r["cos"]) for r in lsh_bucket_topk(vecs, q, k=5, n_planes=8, multiprobe=1).collect()]
    assert got == ref  # same planes seed → identical candidates + ranking


def test_lsh_index_partition_pruning(spark, vecs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("lsh_prune"))
    build_lsh_index(vecs, DIM, path, n_planes=8)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        lsh_index_topk(ann, q, k=5).explain(mode="formatted")
    plan = buf.getvalue()
    # bucket is a partition column: the filter must reach PartitionFilters
    assert "PartitionFilters" in plan
    assert "bucket" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]


def test_lsh_multiband_index_recall_and_pruning(spark, vecs, tmp_path_factory):
    """OR-construction: candidates matching ANY band must recover the
    planted cluster-mates a single table misses, and the (band, bucket)
    filter must still prune at scan planning."""
    from searchengine_spark.functions.similarity import lsh_neardup_pairs
    path = str(tmp_path_factory.mktemp("lsh_mb"))
    build_lsh_index(vecs, DIM, path, n_planes=6, n_bands=6)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    exact = [r["vec_id"] for r in cosine_topk(vecs, q, k=5).collect()]
    got = [r["vec_id"] for r in lsh_index_topk(ann, q, k=5, multiprobe=1).collect()]
    # clustered fixture: cluster-mates are high-cos → per-band collision
    # probability is high and 6 bands make a miss vanishingly unlikely
    assert len(set(exact) & set(got)) >= 4
    assert len(got) == len(set(got))  # cross-band duplicates removed
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        lsh_index_topk(ann, q, k=5, multiprobe=1).explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert "band" in pf and "bucket" in pf


def test_lsh_neardup_banded_subset_and_recall(spark, vecs):
    """Banded near-dup pairs: every pair is an exact pair (identical cos) and
    recall on the clustered fixture clears the OR-construction bound."""
    from searchengine_spark.functions.similarity import (
        cosine_neardup_pairs, lsh_neardup_pairs)
    exact = cosine_neardup_pairs(vecs, threshold=0.9).persist()
    lshp = lsh_neardup_pairs(vecs, DIM, threshold=0.9,
                             n_planes=4, n_bands=16).persist()
    n_exact, n_lsh = exact.count(), lshp.count()
    assert lshp.join(exact, ["id_a", "id_b", "cos"], "left_anti").count() == 0
    assert n_exact > 0
    assert n_lsh / n_exact >= 0.9  # cos≥0.9 pairs: 1-(1-p^4)^16 ≈ 1


def test_ivf_index_recall_and_pruning(spark, vecs, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf_idx"))
    build_ivf_index(vecs, DIM, path, n_centroids=4, iters=2)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    exact = [r["vec_id"] for r in cosine_topk(vecs, q, k=5).collect()]
    got = [r["vec_id"] for r in ivf_index_topk(ann, q, k=5, n_probe=1).collect()]
    # clustered data + converged centroids: probing 1/4 partitions finds the
    # same cluster-mates as the exact scan
    assert len(set(exact) & set(got)) >= 4
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        ivf_index_topk(ann, q, k=5, n_probe=1).explain(mode="formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_kmeans_lloyd_improves_assignment(spark, vecs):
    # with clustered data, 2 Lloyd iterations should land one centroid per
    # planted cluster: every cluster's members share an argmax centroid
    cents = kmeans_centroids(vecs, DIM, n_centroids=4, iters=2)
    mat = np.vstack([np.asarray(r["embedding"]) for r in
                     vecs.orderBy("vec_id").collect()])[:120]
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    assign = (mat @ cents.T).argmax(axis=1)
    for c in range(4):
        grp = assign[c * 30:(c + 1) * 30]
        # majority of each planted cluster maps to a single centroid
        assert (grp == np.bincount(grp).argmax()).mean() >= 0.9


def test_ann_upsert_lsh_matches_rebuild(spark, vecs, tmp_path_factory):
    """Appending a delta with the stored planes must give an index
    layout-identical to rebuilding over the union: same rows per (band,
    bucket) partition, identical query results."""
    from searchengine_spark.functions.similarity import upsert_ann_index
    base = vecs.filter("vec_id < 100")
    delta = vecs.filter("vec_id >= 100")
    p_inc = str(tmp_path_factory.mktemp("lsh_inc"))
    p_all = str(tmp_path_factory.mktemp("lsh_all"))
    build_lsh_index(base, DIM, p_inc, n_planes=6, n_bands=6)
    upsert_ann_index(spark, p_inc, delta)
    build_lsh_index(vecs, DIM, p_all, n_planes=6, n_bands=6)
    inc = load_ann_index(spark, p_inc)
    full = load_ann_index(spark, p_all)
    rows_inc = sorted((r["band"], r["bucket"], r["vec_id"])
                      for r in inc["vectors"].collect())
    rows_all = sorted((r["band"], r["bucket"], r["vec_id"])
                      for r in full["vectors"].collect())
    assert rows_inc == rows_all
    q = [float(x) for x in vecs.filter("vec_id = 110").first()["embedding"]]
    got = [(r["vec_id"], r["cos"])
           for r in lsh_index_topk(inc, q, k=5, multiprobe=1).collect()]
    ref = [(r["vec_id"], r["cos"])
           for r in lsh_index_topk(full, q, k=5, multiprobe=1).collect()]
    assert got == ref
    assert got[0][0] == 110  # the upserted vector finds itself


def test_ann_upsert_ivf_assigns_to_stored_centroids(spark, vecs,
                                                    tmp_path_factory):
    """IVF maintenance: delta rows are assigned under the EXISTING
    centroids, so a query probing the delta vector's cell finds it."""
    from searchengine_spark.functions.similarity import upsert_ann_index
    base = vecs.filter("vec_id < 100")
    delta = vecs.filter("vec_id >= 100")
    path = str(tmp_path_factory.mktemp("ivf_inc"))
    meta0 = build_ivf_index(base, DIM, path, n_centroids=4, iters=2)
    upsert_ann_index(spark, path, delta)
    ann = load_ann_index(spark, path)
    assert ann["centroids"] == meta0["centroids"]  # centroids untouched
    assert ann["vectors"].count() == vecs.count()
    # a planted-cluster delta vector is reachable with its cluster's probes
    q = [float(x) for x in vecs.filter("vec_id = 105").first()["embedding"]]
    got = [r["vec_id"] for r in ivf_index_topk(ann, q, k=5, n_probe=1).collect()]
    assert 105 in got


def test_ann_delete_rewrites_touched_partitions_only(spark, vecs,
                                                     tmp_path_factory):
    """delete_ann_ids removes the rows, leaves untouched partition files
    alone (same mtimes), and drops fully-emptied partition dirs."""
    import os
    from searchengine_spark.functions.similarity import delete_ann_ids
    path = str(tmp_path_factory.mktemp("ivf_del"))
    build_ivf_index(vecs, DIM, path, n_centroids=4, iters=2)
    ann = load_ann_index(spark, path)
    doomed = [r["vec_id"] for r in
              ann["vectors"].filter("centroid = 1").limit(5).collect()]
    vdir = os.path.join(path, "vectors")
    before = {d: os.path.getmtime(os.path.join(vdir, d))
              for d in os.listdir(vdir) if d.startswith("centroid=")}
    n = delete_ann_ids(spark, path, doomed)
    assert n == len(doomed)
    ann2 = load_ann_index(spark, path)
    left = {r["vec_id"] for r in ann2["vectors"].collect()}
    assert not (set(doomed) & left)
    assert len(left) == vecs.count() - len(doomed)
    after = {d: os.path.getmtime(os.path.join(vdir, d))
             for d in os.listdir(vdir) if d.startswith("centroid=")}
    untouched = {d for d in before if d != "centroid=1"}
    assert all(before[d] == after[d] for d in untouched)
    # empty a whole partition → its dir disappears
    rest = [r["vec_id"] for r in
            ann2["vectors"].filter("centroid = 1").collect()]
    if rest:
        delete_ann_ids(spark, path, rest)
        assert not os.path.exists(os.path.join(vdir, "centroid=1"))
        ann3 = load_ann_index(spark, path)
        assert ann3["vectors"].filter("centroid = 1").count() == 0


def test_ivfpq_index_recall_pruning_and_rerank(spark, vecs,
                                               tmp_path_factory):
    from searchengine_spark.functions.similarity import (build_ivfpq_index,
                                                         ivfpq_topk)
    path = str(tmp_path_factory.mktemp("ivfpq"))
    build_ivfpq_index(vecs, DIM, path, n_centroids=4, m=4, nbits=4)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    exact = {r["vec_id"] for r in cosine_topk(vecs, q, k=5).collect()}
    got = ivfpq_topk(ann, q, k=5, n_probe=2, rerank=30).collect()
    # clustered corpus: the query's own cluster lives in one cell → the
    # probed partitions contain the true neighbors; re-rank restores the
    # exact ordering, so scores are EXACT cosines and recall is high
    assert got[0]["vec_id"] == 3 and got[0]["cos"] >= 0.999999
    recall = len({r["vec_id"] for r in got} & exact) / len(exact)
    assert recall >= 0.8
    exact_rows = {r["vec_id"]: r["cos"] for r in
                  cosine_topk(vecs, q, k=5).collect()}
    for r in got:  # reported scores are the exact cosine, never the PQ one
        if r["vec_id"] in exact_rows:
            assert r["cos"] == exact_rows[r["vec_id"]]


def test_ivfpq_scan_reads_codes_not_vectors(spark, vecs, tmp_path_factory):
    """The PQ scoring scan must read ONLY (id, codes) — parquet column
    pruning keeps the probed-partition IO at ~m bytes/vector."""
    from searchengine_spark.functions.similarity import ivfpq_topk
    import io
    from contextlib import redirect_stdout
    path = str(tmp_path_factory.mktemp("ivfpq_prune"))
    from searchengine_spark.functions.similarity import build_ivfpq_index
    build_ivfpq_index(vecs, DIM, path, n_centroids=4, m=4, nbits=4)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    buf = io.StringIO()
    with redirect_stdout(buf):
        ivfpq_topk(ann, q, k=5, n_probe=2, rerank=0).explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "centroid" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    schema = plan.split("ReadSchema", 1)[1].split("\n", 1)[0]
    assert "codes" in schema and "embedding" not in schema


def test_ivfpq_upsert_codes_match_rebuild(spark, vecs, tmp_path_factory):
    """Appended rows must carry the codes/centroid a full rebuild would
    assign them (stored centroids + codebooks)."""
    from searchengine_spark.functions.similarity import (build_ivfpq_index,
                                                         upsert_ann_index)
    base = vecs.filter(F.col("vec_id") < 120)
    delta = vecs.filter(F.col("vec_id") >= 120)
    p_inc = str(tmp_path_factory.mktemp("ivfpq_inc"))
    build_ivfpq_index(base, DIM, p_inc, n_centroids=4, m=4, nbits=4)
    upsert_ann_index(spark, p_inc, delta)
    inc = load_ann_index(spark, p_inc)
    rows = {r["vec_id"]: (r["centroid"], tuple(r["codes"])) for r in
            inc["vectors"].filter(F.col("vec_id") >= 120).collect()}
    # re-encode the delta directly under the stored books: must match
    import numpy as np
    from searchengine_spark.functions.similarity import (_assign_udf,
                                                         _pq_encode_udf)
    cents = np.asarray(inc["centroids"])
    books = np.asarray(inc["codebooks"])
    exp = {r["vec_id"]: (r["c"], tuple(r["k"])) for r in
           delta.select("vec_id",
                        _assign_udf(cents)(F.col("embedding")).alias("c"),
                        _pq_encode_udf(books)(F.col("embedding")).alias("k"))
           .collect()}
    assert rows == exp and len(rows) == 20


def test_opq_rotation_properties(spark, vecs, tmp_path_factory):
    """OPQ (build_ivfpq_index(opq=True)): the learned rotation is
    orthogonal, it reconstructs the training sample at least as well as
    plain PQ under the same budgets, and the persisted meta round-trips
    it."""
    from searchengine_spark.functions.similarity import (
        _opq_train, _pq_reconstruct, _pq_train, build_ivfpq_index)
    mat = np.vstack([np.asarray(r["embedding"], dtype=float)
                     for r in vecs.orderBy("vec_id").collect()])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    R, books = _opq_train(mat, m=4, nbits=4, pq_iters=8, opq_iters=4,
                          seed=42)
    assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-9)  # orthogonal
    plain = _pq_train(mat, m=4, nbits=4, iters=8, seed=42)
    err_plain = ((mat - _pq_reconstruct(mat, plain)) ** 2).sum()
    err_opq = ((mat @ R - _pq_reconstruct(mat @ R, books)) ** 2).sum()
    assert err_opq <= err_plain + 1e-9
    path = str(tmp_path_factory.mktemp("opq_meta"))
    build_ivfpq_index(vecs, DIM, path, n_centroids=4, m=4, nbits=4,
                      opq=True)
    from searchengine_spark.functions.similarity import load_ann_index
    ann = load_ann_index(spark, path)
    assert np.asarray(ann["rotation"]).shape == (DIM, DIM)


def test_opq_index_recall_and_exact_scores(spark, vecs, tmp_path_factory):
    """The OPQ-rotated index keeps the IVF-PQ contract: partition layout
    on raw vectors, exact re-ranked scores, recall at least the plain-PQ
    floor."""
    from searchengine_spark.functions.similarity import (build_ivfpq_index,
                                                         ivfpq_topk,
                                                         load_ann_index)
    path = str(tmp_path_factory.mktemp("opq"))
    build_ivfpq_index(vecs, DIM, path, n_centroids=4, m=4, nbits=4,
                      opq=True)
    ann = load_ann_index(spark, path)
    q = [float(x) for x in vecs.filter("vec_id = 3").first()["embedding"]]
    exact_rows = {r["vec_id"]: r["cos"] for r in
                  cosine_topk(vecs, q, k=5).collect()}
    got = ivfpq_topk(ann, q, k=5, n_probe=2, rerank=30).collect()
    assert got[0]["vec_id"] == 3 and got[0]["cos"] >= 0.999999
    recall = len({r["vec_id"] for r in got} & set(exact_rows)) / len(exact_rows)
    assert recall >= 0.8
    for r in got:
        if r["vec_id"] in exact_rows:
            assert r["cos"] == exact_rows[r["vec_id"]]
    # LUT-path consistency under rotation: the distributed PQ score of
    # any returned row equals the driver-side lookup-table sum over that
    # row's stored code (at the entry's 6-dp rounding)
    approx = {r["vec_id"]: r["cos"] for r in
              ivfpq_topk(ann, q, k=5, n_probe=2, rerank=0).collect()}
    books = np.asarray(ann["codebooks"], dtype=float)
    rot = np.asarray(ann["rotation"], dtype=float)
    qn = np.asarray(q) / np.linalg.norm(q)
    qr = qn @ rot
    m, ds = books.shape[0], DIM // books.shape[0]
    lut = np.stack([books[j] @ qr[j * ds:(j + 1) * ds] for j in range(m)])
    codes = {r["vec_id"]: r["codes"] for r in
             ann["vectors"].filter(F.col("vec_id").isin(list(approx)))
             .select("vec_id", "codes").collect()}
    for vid, cos in approx.items():
        want = float(sum(lut[j][codes[vid][j]] for j in range(m)))
        assert abs(cos - round(want, 6)) < 1e-9, vid


def test_opq_upsert_codes_match_rebuild(spark, vecs, tmp_path_factory):
    """Appending under a stored rotation produces the same codes a fresh
    build (same rotation) would give those rows."""
    from searchengine_spark.functions.similarity import (build_ivfpq_index,
                                                         load_ann_index,
                                                         upsert_ann_index)
    base = vecs.filter("vec_id < 100")
    delta = vecs.filter("vec_id >= 100")
    p_inc = str(tmp_path_factory.mktemp("opq_inc"))
    build_ivfpq_index(base, DIM, p_inc, n_centroids=4, m=4, nbits=4,
                      opq=True)
    upsert_ann_index(spark, p_inc, delta)
    inc = load_ann_index(spark, p_inc)
    import numpy as np
    from searchengine_spark.functions.similarity import (_pq_encode_udf,
                                                         _assign_udf)
    books = np.asarray(inc["codebooks"], dtype=float)
    rot = np.asarray(inc["rotation"], dtype=float)
    expected = {r["vec_id"]: (r["c"], r["k"]) for r in delta.select(
        "vec_id",
        _assign_udf(np.asarray(inc["centroids"], dtype=float))(
            F.col("embedding")).alias("c"),
        _pq_encode_udf(books, rot)(F.col("embedding")).alias("k")).collect()}
    got = {r["vec_id"]: (r["centroid"], r["codes"]) for r in
           inc["vectors"].filter("vec_id >= 100")
           .select("vec_id", "centroid", "codes").collect()}
    assert got == expected


def test_mine_hard_negatives_golden(spark, vecs):
    """Per-anchor results equal a brute-force cosine ranking with the
    anchor and its positives removed; one corpus scan serves the batch."""
    import numpy as np
    from searchengine_spark.functions.similarity import mine_hard_negatives
    positives = {3: [4, 5], 40: [41]}
    got = {}
    for r in mine_hard_negatives(vecs, positives, k=5).collect():
        got.setdefault(r["anchor_id"], []).append(
            (r["vec_id"], r["cos"], r["rank"]))
    mat = {r["vec_id"]: np.asarray(r["embedding"], dtype=float)
           for r in vecs.collect()}
    for a, pos in positives.items():
        q = mat[a] / np.linalg.norm(mat[a])
        scored = sorted(
            ((vid, round(float(q @ (v / np.linalg.norm(v))), 6))
             for vid, v in mat.items() if vid not in set(pos) | {a}),
            key=lambda p: (-p[1], p[0]))[:5]
        expected = [(vid, c, i + 1) for i, (vid, c) in enumerate(scored)]
        assert got[a] == expected, a
    # positives and self never leak into the negatives
    for a, rows in got.items():
        ids = {vid for vid, _, _ in rows}
        assert a not in ids and not ids & set(positives[a])


def test_mine_hard_negatives_validation(spark, vecs):
    from searchengine_spark.functions.similarity import mine_hard_negatives
    with pytest.raises(ValueError, match="not in corpus"):
        mine_hard_negatives(vecs, {10**9: [1]}, k=3)
    assert mine_hard_negatives(vecs, {}, k=3).count() == 0
