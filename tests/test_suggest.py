"""Dictionary-assisted query aids (operators/suggest.py): prefix
autocomplete, fuzzy correction, wildcard grammar expansion, and
more-like-this — on the tiny positional corpus shared with
test_querylang (terms: alpha df5, beta df5, gamma df2, delta df2,
epsilon df1)."""

from __future__ import annotations

from searchengine_spark.operators.querylang import query_search
from searchengine_spark.operators.search import search
from searchengine_spark.operators.suggest import (expand_wildcard,
                                                  more_like_this, suggest,
                                                  suggest_corrections)

from tests.test_querylang import qpos_index  # noqa: F401 (pytest fixture)


def test_suggest_prefix_ranking(qpos_index):
    got = [(r["term"], r["df"]) for r in
           suggest(qpos_index, "de", k=10).collect()]
    assert got == [("delta", 2)]
    # shared prefix: df-desc then term-asc; k truncates
    got = [r["term"] for r in suggest(qpos_index, "a", k=10).collect()]
    assert got == ["alpha"]
    all_e = [r["term"] for r in suggest(qpos_index, "e", k=10).collect()]
    assert all_e == ["epsilon"]
    assert suggest(qpos_index, "zz", k=10).count() == 0
    assert suggest(qpos_index, "  ", k=10).count() == 0
    # normalization: case + punctuation stripped like the analyzer
    assert [r["term"] for r in suggest(qpos_index, "DE!", k=5).collect()] \
        == ["delta"]


def test_suggest_spark_path_matches_driver_path(qpos_index, monkeypatch):
    import searchengine_spark.operators.search as S
    exp = [(r["term"], r["df"]) for r in
           suggest(qpos_index, "d", k=10).collect()]
    idx2 = dict(qpos_index)
    idx2.pop("_terms_pdf", None)
    monkeypatch.setattr(S, "TERMS_LOCAL_MAX", 0)  # force the scan path
    got = [(r["term"], r["df"]) for r in
           suggest(idx2, "d", k=10).collect()]
    assert got == exp == [("delta", 2)]


def test_suggest_corrections(qpos_index):
    got = [(r["term"], r["dist"]) for r in
           suggest_corrections(qpos_index, "alpfa", max_dist=2,
                               k=5).collect()]
    assert got[0] == ("alpha", 1)
    # exact hit ranks first at dist 0; beta is 2 edits from "bete"
    got = [(r["term"], r["dist"]) for r in
           suggest_corrections(qpos_index, "beta", max_dist=2, k=5).collect()]
    assert got[0] == ("beta", 0)
    got = [(r["term"], r["dist"]) for r in
           suggest_corrections(qpos_index, "betu", max_dist=1, k=5).collect()]
    assert got == [("beta", 1)]
    assert suggest_corrections(qpos_index, "zzzzzzzz", max_dist=2,
                               k=5).count() == 0


def test_wildcard_query_is_or_group(qpos_index):
    """'gamma del*' == 'gamma (delta)': the expansion constrains candidates
    to docs containing a match and ranks over {gamma, delta}."""
    assert expand_wildcard(qpos_index, "del") == ["delta"]
    got = [(r["conv_id"], round(r["score"], 9)) for r in
           query_search(qpos_index, "gamma del*", k=10).collect()]
    delta_docs = {"x001", "x003"}
    exp = [(r["conv_id"], round(r["score"], 9)) for r in
           search(qpos_index, "gamma delta", k=10).collect()
           if r["conv_id"] in delta_docs]
    assert got == exp and got
    # positive no-match wildcard → empty; negative → bans the expansions
    assert query_search(qpos_index, "alpha zz*", k=10).count() == 0
    got = {r["conv_id"] for r in
           query_search(qpos_index, "alpha -gam*", k=10).collect()}
    assert got == {"x001", "x003", "x004"}
    noop = {r["conv_id"] for r in
            query_search(qpos_index, "alpha -zz*", k=10).collect()}
    assert len(noop) == 5


def test_more_like_this(qpos_index):
    """MLT(x002) selects its top lemmas by (tf desc, df asc, term asc) —
    [alpha(3,df5), beta(3,df5), gamma(1,df2)] → gamma, alpha, beta with
    n_terms=3 — and returns search over them minus the source doc."""
    got = [(r["conv_id"], round(r["score"], 9)) for r in
           more_like_this(qpos_index, 2, k=10, n_terms=3).collect()]
    exp = [(r["conv_id"], round(r["score"], 9)) for r in
           search(qpos_index, "gamma alpha beta", k=11).collect()
           if r["conv_id"] != "x002"]
    assert got == exp and len(got) == 4
    assert more_like_this(qpos_index, 999, k=10).count() == 0


def test_wildcard_batched_parity(qpos_index):
    from tests.test_querylang_many import _assert_parity
    _assert_parity(qpos_index,
                   {"w1": "gamma del*", "w2": "alpha -gam*",
                    "w3": "alpha zz*", "w4": "alpha -zz*",
                    "w5": 'ep* "alpha beta"'},
                   mode="bm25")
    # ref_compat: alpha (df 1.0) takes the global prune; conjunction runs
    # over the surviving wildcard expansions within their member docs
    _assert_parity(qpos_index,
                   {"w1": "del*", "w2": "gam*", "w3": "alpha del*",
                    "w4": "gamma del*"},  # gamma∩delta docs = ∅ → empty
                   mode="ref_compat")


def test_suggest_pattern_globs(qpos_index):
    from searchengine_spark.operators.suggest import suggest_pattern
    one = lambda p: [r["term"] for r in
                     suggest_pattern(qpos_index, p, k=10).collect()]
    assert one("*lta") == ["delta"]          # suffix
    assert one("b*a") == ["beta"]            # infix
    assert one("*mm*") == ["gamma"]          # contains
    assert one("d*lt*") == ["delta"]         # multi-star
    assert one("*a") == []                   # <2 literal chars refused
    assert one("*") == []
    assert one("zz*zz") == []
    # (df desc, term asc) ranking across matches
    got = [(r["term"], r["df"]) for r in
           suggest_pattern(qpos_index, "*ta*", k=10).collect()]
    assert got == [("beta", 5), ("delta", 2)]


def test_suggest_pattern_spark_path(qpos_index, monkeypatch):
    import searchengine_spark.operators.search as S
    from searchengine_spark.operators.suggest import suggest_pattern
    exp = [(r["term"], r["df"]) for r in
           suggest_pattern(qpos_index, "*ta*", k=10).collect()]
    idx2 = dict(qpos_index)
    idx2.pop("_terms_pdf", None)
    monkeypatch.setattr(S, "TERMS_LOCAL_MAX", 0)  # force the rlike scan
    got = [(r["term"], r["df"]) for r in
           suggest_pattern(idx2, "*ta*", k=10).collect()]
    assert got == exp == [("beta", 5), ("delta", 2)]


def test_wildcard_suffix_infix_grammar(qpos_index):
    """'gamma *lta' == 'gamma del*' (both expand to the delta OR-group);
    '-*mm*' bans gamma docs like '-gam*' does."""
    key = lambda df: [(r["conv_id"], round(r["score"], 9))
                      for r in df.collect()]
    a = key(query_search(qpos_index, "gamma *lta", k=10))
    b = key(query_search(qpos_index, "gamma del*", k=10))
    assert a == b and a
    x = {r["conv_id"] for r in
         query_search(qpos_index, "alpha -*mm*", k=10).collect()}
    y = {r["conv_id"] for r in
         query_search(qpos_index, "alpha -gam*", k=10).collect()}
    assert x == y == {"x001", "x003", "x004"}


def test_did_you_mean(qpos_index):
    """Exact tokens self-correct at dist 0; misspellings map to the
    closest (then most frequent) dictionary term; unreachable tokens
    get NULL."""
    from searchengine_spark.operators.suggest import did_you_mean
    out = {r["pos"]: r for r in
           did_you_mean(qpos_index, "alpha alpax qqqqqqqq").collect()}
    assert out[0]["corrected"] == "alpha" and out[0]["dist"] == 0
    assert out[1]["word"] == "alpax"
    assert out[1]["corrected"] == "alpha" and out[1]["dist"] == 2
    assert out[2]["corrected"] is None and out[2]["dist"] is None
