"""Training-pipeline operators: HTML strip (T1 analog), BPE-ish token count,
embedding near-dup pairs (exact + LSH subset property)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.functions.similarity import (
    cosine_neardup_pairs, lsh_neardup_pairs)
from searchengine_spark.functions.text import html_to_text, token_count_bpe


def test_html_to_text(spark):
    rows = [
        ("<html><body><p>Hello <b>world</b></p></body></html>", "Hello world"),
        ("<script>var x = 1;</script>text after", "text after"),
        ("<style>p { color: red }</style>styled", "styled"),
        ("a &amp; b &lt;tag&gt; &nbsp; c", 'a & b <tag> c'),
        ("<!-- comment -->visible", "visible"),
        ("no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
    got = [r["t"] for r in df.select(html_to_text(F.col("html")).alias("t")).collect()]
    assert got == [w for _, w in rows]


def test_token_count_bpe(spark):
    rows = [("Hello, world!", 4),      # Hello , world !
            ("x=1; y=2", 6),           # x = 1 ; y(=2 -> y = 2)... x,=,1,;,y,=,2 = 7
            ("", 0),
            ("слово word 42", 3)]
    df = spark.createDataFrame([(t,) for t, _ in rows], "text string")
    got = [r["n"] for r in df.select(token_count_bpe(F.col("text")).alias("n")).collect()]
    assert got[0] == 4 and got[2] == 0 and got[3] == 3
    assert got[1] == 7  # x = 1 ; y = 2


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.normal(size=(40, 16))
    # plant near-dups: vectors 40..49 are tiny perturbations of 0..9
    dup = base[:10] + rng.normal(scale=0.01, size=(10, 16))
    mat = np.vstack([base, dup])
    rows = [(i, [float(x) for x in mat[i]]) for i in range(len(mat))]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_scrub_pii(spark):
    from searchengine_spark.functions.text import scrub_pii
    rows = [
        (0, "mail me at bob.smith+x@corp.example.org today"),
        (1, "ssn 123-45-6789 card 4111 1111 1111 1111"),
        (2, "call 555-123-4567 from 10.0.0.1"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in scrub_pii(df).collect()}
    assert got[0]["text_clean"] == "mail me at <EMAIL> today"
    assert got[0]["n_email"] == 1 and got[0]["n_pii"] == 1
    assert got[1]["text_clean"] == "ssn <SSN> card <CARD>"
    assert got[1]["n_ssn"] == 1 and got[1]["n_card"] == 1
    # card consumed BEFORE the phone pattern could see its tail
    assert got[1]["n_phone"] == 0
    assert got[2]["text_clean"] == "call <PHONE> from <IP>"
    assert got[2]["n_phone"] == 1 and got[2]["n_ip"] == 1
    assert got[3]["text_clean"] == rows[3][1] and got[3]["n_pii"] == 0


def test_clean_lines(spark):
    from searchengine_spark.functions.text import clean_lines
    rows = [
        (0, "This line is kept.\nshort.\nno terminal punct here\n"
            "This line is kept.\nAnother good line stays!"),
        (1, "lorem ipsum dolor sit amet.\nA fine line it is."),   # doc drop
        (2, "var x = { a: 1 };\nGood line survives here."),       # doc drop
        (3, "enable javascript to continue.\nReal content line here."),
        (4, "no line survives this one"),                         # doc drop
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in clean_lines(df).collect()}
    assert set(got) == {0, 3}
    # dup line deduped (keep first), short/punct-less lines dropped
    assert got[0]["text_clean"] == ("This line is kept.\n"
                                    "Another good line stays!")
    assert got[0]["n_lines"] == 5 and got[0]["n_kept"] == 2
    assert got[3]["text_clean"] == "Real content line here."


def test_repetition_metrics(spark):
    from searchengine_spark.functions.text import repetition_metrics
    rows = [
        (0, "a b\na b\nc d"),          # 3 lines, 2 distinct
        (1, "x y x y x y"),            # bigrams: xy yx xy yx xy → top 'x y'=3/5
        (2, "all distinct words here"),
        (3, ""),                       # degenerate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert got[0]["n_lines"] == 3 and got[0]["dup_line_frac"] == round(1 - 2 / 3, 6)
    assert got[1]["n_bigrams"] == 5 and got[1]["top_bigram_frac"] == 0.6
    assert got[2]["dup_line_frac"] == 0.0 and got[2]["top_bigram_frac"] == round(1 / 3, 6)
    assert got[3]["n_lines"] == 0 and got[3]["n_bigrams"] == 0
    assert got[3]["dup_line_frac"] == 0.0 and got[3]["top_bigram_frac"] == 0.0


def test_connected_components_clusters(spark):
    from searchengine_spark.functions.dedup import connected_components
    # chain 1-2-3-4, triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "id_a int, id_b int")
    got = {r["id"]: r["rep"] for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}
    # the distributed min-label loop (small_max=0 forces it) must produce
    # identical labels to the driver union-find fast path
    dist = {r["id"]: r["rep"]
            for r in connected_components(pairs, small_max=0).collect()}
    assert dist == got


def test_cosine_neardup_exact(vectors):
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in cosine_neardup_pairs(vectors, threshold=0.99).collect()}
    for i in range(10):
        assert (i, 40 + i) in pairs, f"planted near-dup {i} not found"
        assert pairs[(i, 40 + i)] > 0.99
    # random gaussian pairs in 16d essentially never hit 0.99
    assert len(pairs) == 10


def test_lsh_neardup_subset_of_exact(vectors):
    exact = {(r["id_a"], r["id_b"])
             for r in cosine_neardup_pairs(vectors, threshold=0.99).collect()}
    lsh = {(r["id_a"], r["id_b"])
           for r in lsh_neardup_pairs(vectors, dim=16, threshold=0.99,
                                      n_planes=4).collect()}
    assert lsh <= exact          # verification step guarantees precision
    assert len(lsh) >= len(exact) // 2  # near-identical vectors mostly collide


def test_dedup_keep_canonical(spark):
    from searchengine_spark.functions.dedup import (connected_components,
                                                    dedup_keep_canonical)
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (2, 6)], "id_a long, id_b long")
    kept = dedup_keep_canonical(df, connected_components(pairs))
    # components {0,3,5}→keep 0, {2,6}→keep 2; singletons 1,4,7 kept
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 4, 7]
    # full rows survive, not just ids
    assert set(kept.columns) == {"doc_id", "text"}


# ---------------------------------------------------------------------------
# benchmark contamination + cross-corpus dedup
# ---------------------------------------------------------------------------

def _ngrams(text, n=3):
    import re
    toks = [t for t in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if t]
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_contamination_check_golden(spark):
    from searchengine_spark.functions.dedup import contamination_check
    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "completely unrelated text about spark partitions and shuffles"),
        (2, "the quick brown fox appears here too with extra words"),
        (3, "tiny"),                       # < n tokens → no shingles
        (4, "quick brown fox jumps over"),  # fully contained in bench item
    ]
    bench = [(100, "the quick brown fox jumps over a fence"),
             (101, "benchmark question about nothing in the corpus")]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           contamination_check(ddf, bdf, n=3, threshold=0.3).collect()}
    bsh = set().union(*[_ngrams(t) for _, t in bench])
    for i, t in docs:
        sh = _ngrams(t)
        ov = len(sh & bsh)
        assert got[i]["n_shingles"] == len(sh)
        assert got[i]["n_overlap"] == ov
        frac = round(ov / len(sh), 6) if sh else 0.0
        assert abs(got[i]["overlap_frac"] - frac) < 1e-9
        assert got[i]["contaminated"] == int(frac >= 0.3)
    assert got[3]["n_shingles"] == 0 and got[3]["contaminated"] == 0
    assert got[4]["contaminated"] == 1


def test_dedup_against(spark):
    from searchengine_spark.functions.dedup import dedup_against
    new = spark.createDataFrame(
        [(0, "Shared   Text one"), (1, "unique new doc"),
         (2, "shared text TWO"), (3, "another survivor")],
        "doc_id long, text string")
    ref = spark.createDataFrame(
        [(90, "shared text one"), (91, "shared text two"),
         (92, "ref only doc")],
        "doc_id long, text string")
    kept = {r["doc_id"] for r in dedup_against(new, ref).collect()}
    assert kept == {1, 3}  # normalization folds case/whitespace


def test_unigram_ppl_self(spark):
    """Self-scored MLE perplexity: a doc made of the corpus's most common
    token scores lower ppl than one of rare tokens; a uniform corpus has
    ppl == vocab size for every doc."""
    import math
    from searchengine_spark.functions.text import unigram_lm_perplexity
    rows = [(0, "the the the the"), (1, "the the zebra"), (2, "qux zebra")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_lm_perplexity(df).collect()}
    assert got[0]["n_tokens"] == 4
    assert got[0]["ppl"] < got[1]["ppl"] < got[2]["ppl"]
    # exact check: P(the)=6/9, P(zebra)=2/9, P(qux)=1/9
    exp2 = math.exp(-(math.log(1 / 9) + math.log(2 / 9)) / 2)
    assert abs(got[2]["ppl"] - exp2) < 1e-9


def test_unigram_ppl_cross_corpus_oov(spark):
    """Laplace model trained on one corpus scores a foreign doc: OOV
    tokens take the 1/(N+V) mass; a fully-OOV doc has ppl == N+V."""
    from searchengine_spark.functions.text import (train_unigram_lm,
                                                   unigram_lm_perplexity)
    train = spark.createDataFrame(
        [(0, "alpha beta alpha")], "doc_id long, text string")
    lm = train_unigram_lm(train)          # N=3, V=2
    assert lm["n_tokens"] == 3 and lm["vocab"] == 2
    test = spark.createDataFrame(
        [(0, "alpha beta"), (1, "zzz yyy xxx")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           unigram_lm_perplexity(test, lm=lm).collect()}
    # doc 1 is all-OOV: every token logp = ln(1/5) → ppl = 5
    assert abs(got[1]["ppl"] - 5.0) < 1e-9
    # doc 0: P(alpha)=(2+1)/5, P(beta)=(1+1)/5 — better than OOV
    assert got[0]["ppl"] < got[1]["ppl"]


def test_gopher_rules(spark):
    """Published-threshold rule battery: targeted failures per rule."""
    from searchengine_spark.functions.text import gopher_rules
    good = ("the quick brown fox jumps with energy and grace of a creature "
            "that seems to have wings over the lazy dog near the old barn "
            "while the wind blows softly through the tall green trees and "
            "the river runs past the stones with a gentle sound that every "
            "visitor remembers fondly for many long years afterwards") * 1
    rows = [
        (0, good),                                     # passes all
        (1, "# " * 60 + "the of and"),                 # symbol ratio
        (2, "\n".join("- item %d" % i for i in range(20))),   # bullets
        (3, "\n".join("trailing off..." for _ in range(10))), # ellipsis
        (4, " ".join(str(i) for i in range(80))),      # alpha fraction
        (5, "word " * 60),                             # stop words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert got[0]["passes"]
    assert not got[1]["ok_symbols"]
    assert not got[2]["ok_bullets"] and got[2]["bullet_frac"] == 1.0
    assert not got[3]["ok_ellipsis"] and got[3]["ellipsis_frac"] == 1.0
    assert not got[4]["ok_alpha"] and got[4]["alpha_frac"] == 0.0
    assert not got[5]["ok_stops"] and got[5]["n_stop"] == 0
    assert all(not got[i]["passes"] for i in range(1, 6))


def test_semantic_dedup_constructed(spark):
    """Two tight duplicate groups + singletons: the groups collapse to
    their smallest id, singletons survive, pairs stay within clusters."""
    import numpy as np
    from searchengine_spark.functions.similarity import semantic_dedup
    rng = np.random.RandomState(7)
    base_a = rng.randn(16); base_b = rng.randn(16)
    rows = []
    for i in range(3):        # group A: ids 0-2, near-identical
        rows.append((i, (base_a + 0.01 * rng.randn(16)).tolist()))
    for i in range(3, 5):     # group B: ids 3-4
        rows.append((i, (base_b + 0.01 * rng.randn(16)).tolist()))
    for i in range(5, 10):    # singletons: random directions
        rows.append((i, rng.randn(16).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    r = semantic_dedup(df, 16, threshold=0.95, n_clusters=2, iters=2)
    kept = sorted(x["vec_id"] for x in r["kept"].select("vec_id").collect())
    comps = {x["id"]: x["rep"] for x in r["components"].collect()}
    assert set(comps) == {0, 1, 2, 3, 4}
    assert comps[0] == comps[1] == comps[2] == 0
    assert comps[3] == comps[4] == 3
    assert kept == [0, 3, 5, 6, 7, 8, 9]
    # every emitted pair is >= threshold and intra-group
    for p in r["pairs"].collect():
        assert p["cos"] >= 0.95
        assert (p["id_a"] < 3) == (p["id_b"] < 3)


def test_chunk_documents(spark):
    """Window arithmetic: tail coverage, overlap, short docs, empty docs."""
    from searchengine_spark.functions.text import chunk_documents
    words120 = " ".join(f"w{i}" for i in range(120))
    rows = [(0, words120),                  # 120 tokens → 4 chunks @ 40/10
            (1, "short doc"),               # 1 chunk
            (2, ""),                        # no chunks
            (3, " ".join(f"x{i}" for i in range(40)))]  # exactly one window
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_documents(df, chunk_tokens=40, overlap=10)
    by_doc = {}
    for r in got.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 2 not in by_doc
    assert len(by_doc[1]) == 1 and by_doc[1][0]["text"] == "short doc"
    assert len(by_doc[3]) == 1 and by_doc[3][0]["n_tokens"] == 40
    chunks = sorted(by_doc[0], key=lambda r: r["chunk_idx"])
    # ceil((120-10)/30) = 4 windows, strides of 30
    assert [c["chunk_idx"] for c in chunks] == [0, 1, 2, 3]
    assert chunks[0]["text"].startswith("w0 ") and chunks[0]["n_tokens"] == 40
    assert chunks[1]["text"].startswith("w30 ")
    assert chunks[3]["text"].endswith(" w119") and chunks[3]["n_tokens"] == 30
    # overlap: last 10 tokens of chunk 0 == first 10 of chunk 1
    assert chunks[0]["text"].split()[-10:] == chunks[1]["text"].split()[:10]
    # full coverage: union of chunk tokens == the doc, in order per window
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_ngram_counts(spark):
    import math
    from searchengine_spark.functions.text import collocations, ngram_counts
    rows = [(0, "a b c a b"), (1, "a b x"), (2, "zz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["ngram"]: r["n_occurrences"]
           for r in ngram_counts(df, n=2, k=10, min_count=1).collect()}
    # doc0 bigrams: "a b","b c","c a","a b"; doc1: "a b","b x"; doc2: none
    assert got == {"a b": 3, "b c": 1, "c a": 1, "b x": 1}
    # collocations: PMI of the always-together pair beats the promiscuous one
    rows2 = [(0, "new york is big"), (1, "new york was new"),
             (2, "the big apple is big"), (3, "new york")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    cols = {(r["w1"], r["w2"]): r for r in
            collocations(df2, k=5, min_count=2).collect()}
    assert set(cols) == {("new", "york"), ("is", "big")}
    ny = cols[("new", "york")]
    assert ny["n_ab"] == 3
    # hand-check PMI: P(ab)=3/11 bigrams, P(new)=4/15, P(york)=3/15 tokens
    want = math.log((3 / 11) / ((4 / 15) * (3 / 15)))
    assert abs(ny["pmi"] - want) < 1e-9
    # "is big": 2/11 vs (2/15)(3/15) → higher PMI than "new york"
    assert cols[("is", "big")]["pmi"] > ny["pmi"]


def test_drop_hot_lines(spark):
    """Cross-doc boilerplate: a footer in >max_docs docs is dropped
    everywhere, short lines are exempt, unique lines survive, order and
    n_dropped are exact, all-boilerplate docs vanish."""
    from searchengine_spark.functions.text import drop_hot_lines
    footer = "subscribe to the channel now"
    rows = [(i, f"unique line number {i} here\nok go\n{footer}")
            for i in range(5)]
    rows.append((99, footer))                      # all-boilerplate doc
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in drop_hot_lines(df, max_docs=4).collect()}
    assert 99 not in out                           # fully hot → dropped
    for i in range(5):
        assert out[i]["text"] == f"unique line number {i} here\nok go"
        assert out[i]["n_dropped"] == 1
    # below the floor nothing is dropped; "ok go" (2 words) never counts
    out2 = {r["doc_id"]: r for r in drop_hot_lines(df, max_docs=10).collect()}
    assert out2[0]["n_dropped"] == 0 and footer in out2[0]["text"]


def test_semantic_dedup_reuses_ann_centroids(spark, tmp_path_factory):
    """ann= shares the persisted IVF index's centroids: same clusters ==
    same pairs as an explicit k-means with identical parameters."""
    import numpy as np
    import pytest
    from searchengine_spark.functions.similarity import (build_ivf_index,
                                                         load_ann_index,
                                                         semantic_dedup)
    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).tolist()) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path_factory.mktemp("ann_sd"))
    build_ivf_index(df, 16, path, n_centroids=4, iters=2, seed=11)
    ann = load_ann_index(spark, path)
    via_ann = semantic_dedup(df, 16, threshold=0.3, ann=ann)
    explicit = semantic_dedup(df, 16, threshold=0.3, n_clusters=4,
                              iters=2, seed=11)
    pa = {(r["id_a"], r["id_b"]) for r in via_ann["pairs"].collect()}
    pe = {(r["id_a"], r["id_b"]) for r in explicit["pairs"].collect()}
    assert pa == pe
    with pytest.raises(ValueError):
        semantic_dedup(df, 16, ann={"kind": "lsh"})


def test_dedup_repeated_ngrams(spark):
    """ExactSubstr-style span removal: a duplicated window-size span is
    cut from every occurrence except the smallest (doc_id, pos); exact
    duplicate docs come back empty; short docs and unique text pass
    through; removal greedily covers overlapping duplicated windows."""
    from searchengine_spark.functions.text import dedup_repeated_ngrams
    span = "a b c d e f g h i j k l"                 # 12 tokens
    rows = [
        (0, span),                                   # canonical occurrence
        (1, f"x y z {span}"),                        # shared span at tail
        (2, "unique words only here nothing repeats in this one document"),
        (3, span),                                   # exact dup of doc 0
        (4, "short doc"),                            # < window: untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r
           for r in dedup_repeated_ngrams(df, window=8).collect()}
    assert out[0]["text"] == span and out[0]["n_removed"] == 0
    assert out[1]["text"] == "x y z" and out[1]["n_removed"] == 12
    assert out[2]["n_removed"] == 0
    assert out[3]["text"] == "" and out[3]["n_removed"] == 12
    assert out[4]["text"] == "short doc" and out[4]["n_removed"] == 0
    # min_occurrences above the duplication level: nothing is cut
    out3 = {r["doc_id"]: r for r in
            dedup_repeated_ngrams(df, window=8, min_occurrences=4).collect()}
    assert all(out3[i]["n_removed"] == 0 for i in out3)


def test_bigram_ppl_golden_and_order_sensitivity(spark):
    """Stupid-Backoff bigram perplexity: hand-computed golden on a tiny
    corpus, and the order signal — a shuffled doc with IDENTICAL
    unigrams scores strictly worse than the fluent original."""
    import math

    from searchengine_spark.functions.text import (bigram_lm_perplexity,
                                                   train_bigram_lm,
                                                   unigram_lm_perplexity)
    rows = [(0, "the cat sat on the mat"),
            (1, "the cat sat on the hat"),
            (2, "mat the on sat cat the"),
            (3, "zzz qqq unseen words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_bigram_lm(df)
    got = {r["doc_id"]: r for r in bigram_lm_perplexity(df, lm).collect()}
    bg = {(r["v"], r["w"]): r["logs"] for r in lm["bigrams"].collect()}
    un = {r["term"]: r["logp"] for r in lm["unigrams"].collect()}
    la = math.log(lm["alpha"])
    for did, text in rows:
        toks = text.split()
        s = [un.get(toks[0], lm["oov_logp"])]
        for v, w in zip(toks, toks[1:]):
            s.append(bg.get((v, w), la + un.get(w, lm["oov_logp"])))
        want = math.exp(-sum(s) / len(s))
        assert abs(got[did]["ppl"] - want) < 1e-9, did
        assert got[did]["n_tokens"] == len(toks)
    # order sensitivity: unigram ppl can't tell 0 from 2; bigram can
    u = {r["doc_id"]: r["ppl"] for r in unigram_lm_perplexity(df).collect()}
    assert abs(u[0] - u[2]) < 1e-9
    assert got[2]["ppl"] > got[0]["ppl"] * 1.2
    # context counts: c(v) sums pair occurrences, so every seen bigram
    # score is a true relative frequency in (0, 1]
    assert all(s <= 0.0 for s in bg.values())


def test_bigram_ppl_cross_corpus(spark):
    """CCNet shape: train on a clean reference, score a foreign corpus —
    OOV tokens take the shared add-one floor, in-domain text wins."""
    from searchengine_spark.functions.text import (bigram_lm_perplexity,
                                                   train_bigram_lm)
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)],
        "doc_id long, text string")
    lm = train_bigram_lm(ref)
    probe = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "xyzzy plugh foobar qux")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["ppl"]
           for r in bigram_lm_perplexity(probe, lm).collect()}
    assert got[0] * 5 < got[1]  # in-domain ≪ garbage


def test_dedup_keep_longest(spark):
    """keep='longest' keeps each component's most-token member (ties →
    smallest id); singletons always survive; keep='rep' unchanged."""
    from searchengine_spark.functions.dedup import (connected_components,
                                                    dedup_keep_canonical)
    rows = [(0, "a b"), (1, "a b c d e"), (2, "a b c"),
            (3, "x y z"), (4, "x y z"),        # tie on 3 tokens → id 3
            (9, "solo untouched doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "id_a long, id_b long")
    clusters = connected_components(pairs)
    longest = {r["doc_id"] for r in
               dedup_keep_canonical(df, clusters, keep="longest").collect()}
    assert longest == {1, 3, 9}
    rep = {r["doc_id"] for r in
           dedup_keep_canonical(df, clusters).collect()}
    assert rep == {0, 3, 9}
    import pytest as _pt
    with _pt.raises(ValueError, match="keep"):
        dedup_keep_canonical(df, clusters, keep="best")


def test_mmr_rerank_diversifies(vectors):
    """MMR head rerank: pick 1 == cosine rank-1; every later pick is the
    argmax of lam*rel − (1−lam)*max-sim-to-selected over the remaining
    candidates (recomputed independently here); and with the planted
    near-duplicates, MMR demotes at least one redundant neighbor that
    plain cosine order keeps adjacent."""
    import numpy as np

    from searchengine_spark.functions.similarity import (_round_half_away,
                                                         cosine_topk,
                                                         mmr_rerank)
    rows = vectors.collect()
    vec = {int(r["vec_id"]): np.asarray(r["embedding"], dtype=float)
           for r in rows}
    qvec = [float(x) for x in vec[0]]
    lam, k, n = 0.5, 6, 20
    out = mmr_rerank(vectors, qvec, k=k, n=n, lam=lam).collect()
    assert [r["rank"] for r in out] == list(range(1, k + 1))
    base = {int(r["vec_id"]): float(r["cos"]) for r in
            cosine_topk(vectors, qvec, k=n).collect()}
    picks = [int(r["vec_id"]) for r in out]
    assert picks[0] == sorted(base, key=lambda i: (-base[i], i))[0]

    def sim(a, b):
        va, vb = vec[a], vec[b]
        return _round_half_away(
            float(va @ vb) / (float(np.sqrt(va @ va))
                              * float(np.sqrt(vb @ vb))))

    for step in range(1, k):
        sel = picks[:step]
        remaining = [c for c in base if c not in sel]
        scored = sorted(
            ((_round_half_away(lam * base[c]
                               - (1 - lam) * max(sim(c, s) for s in sel)),
              -c) for c in remaining), reverse=True)
        assert -scored[0][1] == picks[step], step
    # vectors fixture plants near-dups (i, 40+i): after picking one of a
    # near-dup pair, MMR must NOT pick its twin next while a less
    # redundant candidate exists — i.e. the MMR order differs from the
    # plain cosine order
    plain = sorted(base, key=lambda i: (-base[i], i))[:k]
    assert picks != plain
