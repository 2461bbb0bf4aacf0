"""significant_terms: over-represented terms in the match set vs corpus
(JLH score), verified against a brute-force golden recompute."""

from __future__ import annotations

from collections import Counter

import pytest

from searchengine_spark.operators.search import search, significant_terms


def _golden_sig(g, qterms, k=20, min_fg=2, require_all=False):
    matched = [did for did in range(g.n_docs)
               if (all if require_all else any)(
                   g.tf[did].get(t, 0) > 0 for t in qterms)]
    n_fg = len(matched)
    fg = Counter(t for did in matched for t in g.tf[did])
    out = []
    for t, f in fg.items():
        if f < min_fg:
            continue
        fgp, bgp = f / n_fg, g.df[t] / g.n_docs
        s = (fgp - bgp) * (fgp / bgp)
        if s > 0:
            out.append((t, f, g.df[t], s))
    out.sort(key=lambda r: (-round(r[3], 9), r[0]))
    return out[:k]


@pytest.mark.parametrize("q,terms", [("ошибка", ["ошибка"]),
                                     ("лес дом", ["дом", "лес"])])
def test_significant_terms_brute_force(index_general, golden_general, q, terms):
    got = [(r["term"], r["fg_df"], r["bg_df"], r["score"])
           for r in significant_terms(index_general, q, k=20).collect()]
    expected = _golden_sig(golden_general, terms, k=20)
    assert [(t, f, b) for t, f, b, _ in got] == \
        [(t, f, b) for t, f, b, _ in expected]
    for (_, _, _, gs), (_, _, _, es) in zip(got, expected):
        assert abs(gs - es) < 1e-9


def test_significant_terms_require_all(index_general, golden_general):
    got = [(r["term"], r["fg_df"]) for r in
           significant_terms(index_general, "лес дом", k=20,
                             require_all=True).collect()]
    expected = [(t, f) for t, f, _, _ in
                _golden_sig(golden_general, ["дом", "лес"], require_all=True)]
    assert got == expected


def test_significant_terms_sampled_subset(index_general):
    # sampled foreground = top-5 docs by relevance: fg_df can't exceed 5
    rows = significant_terms(index_general, "ошибка", k=20, sample=5).collect()
    assert rows and all(r["fg_df"] <= 5 for r in rows)


def test_significant_terms_oov_empty(index_general):
    assert significant_terms(index_general, "феноменальность").count() == 0


def test_facets_still_green_after_refactor(index_general, golden_general):
    # the match-set helper extraction must not change facet counts
    from searchengine_spark.operators.search import search_count
    n = search_count(index_general, "ошибка").collect()[0]["n_matches"]
    expected = sum(1 for d in range(golden_general.n_docs)
                   if golden_general.tf[d].get("ошибка", 0) > 0)
    assert n == expected


def test_significant_bigrams_golden(index_general, golden_general):
    """Bigram JLH == a pure-Python recomputation: fg = distinct adjacent
    lemma bigrams per matched doc, bg = corpus bigram df, same ordering
    and floors as significant_terms."""
    from searchengine_spark.operators.search import significant_bigrams
    from tests.golden_model import golden_analyze
    g = golden_general
    query = "ошибка лес"
    got = [(r["bigram"], r["fg_df"], r["bg_df"], round(r["score"], 9))
           for r in significant_bigrams(index_general, query, k=20).collect()]
    qterms = set(golden_analyze(query, g.mode))
    mset = [d for d in range(g.n_docs)
            if any(g.tf[d].get(t, 0) for t in qterms)]
    def bigrams(did):
        seq = golden_analyze(g.docs[did]["text"], g.mode)
        return {f"{a} {b}" for a, b in zip(seq, seq[1:])}
    fg: dict = {}
    for d in mset:
        for bgm in bigrams(d):
            fg[bgm] = fg.get(bgm, 0) + 1
    bg: dict = {}
    for d in range(g.n_docs):
        for bgm in bigrams(d):
            bg[bgm] = bg.get(bgm, 0) + 1
    n_fg, n = len(mset), g.n_docs
    rows = []
    for bgm, f in fg.items():
        if f < 2:
            continue
        fp, bp = f / n_fg, bg[bgm] / n
        s = (fp - bp) * (fp / bp)
        if s > 0:
            rows.append((bgm, f, bg[bgm], round(s, 9)))
    rows.sort(key=lambda r: (-r[3], r[0]))
    assert got == rows[:20] and got  # non-vacuous
