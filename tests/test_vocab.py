"""Vocabulary build + token-id encoding: ordering, caps, UNK, round-trip."""

import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.vocab import build_vocab, encode_ids


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(0, "the the the quick fox"),
            (1, "the quick quick dog"),
            (2, "a fox and a dog")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocab_frequency_order(spark, corpus):
    v = build_vocab(corpus)
    got = {r["term"]: (r["token_id"], r["c"])
           for r in v["terms"].collect()}
    # counts: the=4, quick=3, a=2, dog=2, fox=2, and=1
    assert got["the"] == (1, 4)       # id 0 is <unk>
    assert got["quick"] == (2, 3)
    # count-2 tie block resolves term-ascending: a < dog < fox
    assert got["a"][0] == 3 and got["dog"][0] == 4 and got["fox"][0] == 5
    assert got["and"][0] == 6
    assert v["specials"] == {"<unk>": 0}


def test_vocab_size_cap_and_min_count(spark, corpus):
    v = build_vocab(corpus, size=4)
    kept = {r["term"] for r in v["terms"].collect()}
    assert kept == {"the", "quick", "a"}  # ids 1..3 under the cap of 4
    v2 = build_vocab(corpus, min_count=2)
    assert {r["term"] for r in v2["terms"].collect()} == \
        {"the", "quick", "a", "dog", "fox"}
    with pytest.raises(ValueError):
        build_vocab(corpus, size=1)


def test_encode_round_trip_and_unk(spark, corpus):
    v = build_vocab(corpus, size=4)   # fox/dog/and fall out of vocab
    enc = encode_ids(corpus, v).collect()
    by_doc = {}
    for r in enc:
        by_doc.setdefault(r["doc_id"], {})[r["pos"]] = r["token_id"]
    # doc 0: the the the quick fox -> [1, 1, 1, 2, 0(unk)]
    assert [by_doc[0][p] for p in range(5)] == [1, 1, 1, 2, 0]
    # doc 2: a fox and a dog -> [3, 0, 0, 3, 0]
    assert [by_doc[2][p] for p in range(5)] == [3, 0, 0, 3, 0]
    # positions are dense per doc
    for d, ps in by_doc.items():
        assert sorted(ps) == list(range(len(ps)))


def test_encode_requires_registered_unk(spark, corpus):
    v = build_vocab(corpus)
    with pytest.raises(ValueError):
        encode_ids(corpus, v, unk="<pad>")


def test_pack_token_ids_layout(spark, corpus):
    """Every token lands exactly once on the global stream; sequences are
    exactly seq_len except the ragged tail; per-doc token order survives."""
    from searchengine_spark.functions.vocab import pack_token_ids
    v = build_vocab(corpus)
    out = pack_token_ids(corpus, v, seq_len=4).collect()
    n_total = 5 + 4 + 5  # tokens per doc
    assert len(out) == n_total
    # (seq_id, pos) pairs are a dense grid: seq 0..n-1 full, tail ragged
    cells = sorted((r["seq_id"], r["pos"]) for r in out)
    want = [(s, p) for s in range(n_total // 4 + 1) for p in range(4)]
    assert cells == want[:n_total]
    # reconstruct the stream and check each doc's ids appear contiguously
    # in doc-token order
    stream = [r["token_id"] for r in
              sorted(out, key=lambda r: (r["seq_id"], r["pos"]))]
    enc = encode_ids(corpus, v).collect()
    by_doc = {}
    for r in sorted(enc, key=lambda r: r["pos"]):
        by_doc.setdefault(r["doc_id"], []).append(r["token_id"])
    for ids in by_doc.values():
        # contiguous subsequence of the stream
        assert any(stream[i:i + len(ids)] == ids
                   for i in range(len(stream) - len(ids) + 1))


def test_vocab_save_load_encodes_identically(spark, corpus, tmp_path):
    from searchengine_spark.functions.vocab import load_vocab, save_vocab
    v = build_vocab(corpus, size=4)
    save_vocab(v, str(tmp_path / "vocab"))
    v2 = load_vocab(spark, str(tmp_path / "vocab"))
    a = sorted(tuple(r) for r in encode_ids(corpus, v).collect())
    b = sorted(tuple(r) for r in encode_ids(corpus, v2).collect())
    assert a == b  # integer ids: exact
    assert v2["specials"] == {"<unk>": 0}


def test_pack_with_eos_separators(spark, corpus):
    """append_eos: one <eos> id lands after every document's tokens; the
    stream length grows by n_docs; layout stays a dense grid."""
    from searchengine_spark.functions.vocab import pack_token_ids
    v = build_vocab(corpus, specials=("<unk>", "<eos>"))
    out = pack_token_ids(corpus, v, seq_len=4, append_eos=True).collect()
    n_total = (5 + 1) + (4 + 1) + (5 + 1)
    assert len(out) == n_total
    stream = [r["token_id"] for r in
              sorted(out, key=lambda r: (r["seq_id"], r["pos"]))]
    assert stream.count(1) == 3  # <eos> id = 1, once per doc
    # every doc's ids appear contiguously, terminated by <eos>
    enc = encode_ids(corpus, v).collect()
    by_doc = {}
    for r in sorted(enc, key=lambda r: r["pos"]):
        by_doc.setdefault(r["doc_id"], []).append(r["token_id"])
    for ids in by_doc.values():
        want = ids + [1]
        assert any(stream[i:i + len(want)] == want
                   for i in range(len(stream) - len(want) + 1))
    with pytest.raises(ValueError):
        pack_token_ids(corpus, build_vocab(corpus), 4, append_eos=True)
