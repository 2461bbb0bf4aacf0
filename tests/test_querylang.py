"""Query-string grammar: parse_query unit coverage + query_search
equivalence against compositions of the independently-golden operators
(search / phrase_search) on the tiny positional corpus from test_phrase."""

from __future__ import annotations

import pandas as pd
import pytest

from searchengine_spark.operators.querylang import parse_query, query_search
from searchengine_spark.operators.search import phrase_search, search

XDOCS = [
    "alpha beta gamma alpha beta",             # phrase 2x, has gamma
    "alpha beta delta",                        # phrase 1x
    "alpha beta alpha beta alpha beta gamma",  # phrase 3x, has gamma
    "alpha delta beta",                        # no "alpha beta" phrase
    "alpha beta epsilon",                      # phrase 1x
]


@pytest.fixture(scope="module")
def qpos_index(spark):
    from searchengine_spark.operators.indexer import build_index
    # varied metadata for the qualifier grammar: roles alternate, bash tool
    # on the even docs x002/x004 (None elsewhere — the null-safe-negation
    # case)
    rows = [(f"x{i:03d}", 0, "assistant" if i % 2 else "user", t,
             "bash" if i in (2, 4) else None, "2026-01-01 00:00:00")
            for i, t in enumerate(XDOCS)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string,"
                    " tool string, ts timestamp")
    return build_index(sdf, mode="general", bucket_range=256, block_size=32,
                       with_positions=True)


# ---------- lexer ----------

def _base(**kw):
    out = {"terms": [], "phrases": [], "not_terms": [], "not_phrases": [],
           "spans": [], "not_spans": [], "ospans": [], "not_ospans": [],
           "groups": [], "qualifiers": [],
           "wildcards": [], "not_wildcards": [], "min_match": None,
           "fuzzies": [], "not_fuzzies": [],
           "regexes": [], "not_regexes": [], "boosts": {}}
    out.update(kw)
    return out


def test_parse_query_wildcards():
    q = parse_query('scan merg* -alp* x* a*b* "be*" *')
    # any glob with ≥2 literal chars qualifies (prefix, suffix, infix,
    # multi-star); quotes never wildcard; 'x*'/'*' too few literals
    assert q == _base(terms=["scan", "x*", "be*", "*"],
                      wildcards=["merg*", "a*b*"], not_wildcards=["alp*"])
    q = parse_query('*fix m*e -*bad*')
    assert q == _base(wildcards=["*fix", "m*e"], not_wildcards=["*bad*"])


def test_parse_query_groups():
    q = parse_query('(cache|buffer) miss -(a|b) (solo) () http://x(y)')
    assert q == _base(groups=[["cache", "buffer"]],
                      terms=["miss", "solo", "http://x(y)"],
                      not_terms=["a", "b"])
    # whitespace-separated members parse too
    assert parse_query('(a b c)') == _base(groups=[["a", "b", "c"]])


def test_parse_query_routing():
    q = parse_query('merge "lock contention" -deadlock -"stale read" scan')
    assert q == _base(terms=["merge", "scan"],
                      phrases=["lock contention"],
                      not_terms=["deadlock"],
                      not_phrases=["stale read"])


def test_parse_query_degenerate_quotes():
    # one-word quotes degrade to term clauses; empty quotes / lone '-' drop
    q = parse_query('"alpha" -"beta" "" - -x')
    assert q == _base(terms=["alpha"], not_terms=["beta", "x"])


def test_parse_query_empty():
    assert parse_query("  ") == _base()


def test_parse_query_spans_and_qualifiers():
    q = parse_query('scan "a b"~4 -"c d"~2 "e"~9 site:x00 -role:assistant '
                    'tool:bash http://x:y')
    assert q == _base(terms=["scan", "e", "http://x:y"],
                      spans=[("a b", 4)], not_spans=[("c d", 2)],
                      qualifiers=[("site", "x00", False),
                                  ("role", "assistant", True),
                                  ("tool", "bash", False)])


def test_parse_query_regex_and_exists():
    # /pat/ routes to regex terms; slashes inside ordinary tokens don't
    # ('/usr/local', 'http://x' are plain terms); exists: is a qualifier
    q = parse_query('scan /s.an/ -/al.*a/ /usr/local http://x '
                    'exists:tool -exists:role')
    assert q == _base(terms=["scan", "/usr/local", "http://x"],
                      regexes=["s.an"], not_regexes=["al.*a"],
                      qualifiers=[("exists", "tool", False),
                                  ("exists", "role", True)])


def test_parse_query_ordered_spans():
    # ~N! = in-order span; one-word ordered spans degrade to terms like
    # any quoted singleton; mixed ordered/unordered routing
    q = parse_query('scan "a b"~4! -"c d"~2! "e"~9! "f g"~3')
    assert q == _base(terms=["scan", "e"],
                      ospans=[("a b", 4)], not_ospans=[("c d", 2)],
                      spans=[("f g", 3)])


# ---------- query_search == operator composition ----------

def _rows(df):
    return [(r["conv_id"], round(r["score"], 9)) for r in df.collect()]


def test_terms_only_is_plain_search(qpos_index):
    got = _rows(query_search(qpos_index, "alpha gamma", k=10))
    exp = _rows(search(qpos_index, "alpha gamma", k=10))
    assert got == exp and got  # non-vacuous


def test_not_term_grammar(qpos_index):
    got = _rows(query_search(qpos_index, "alpha -gamma", k=10))
    exp = _rows(search(qpos_index, "alpha", k=10, exclude="gamma"))
    assert got == exp
    assert {c for c, _ in got} == {"x001", "x003", "x004"}


def test_phrase_filter(qpos_index):
    """'"alpha beta"' ranks by BM25 over {alpha, beta} but keeps only
    phrase-matching docs — search minus the non-adjacent doc x003."""
    got = _rows(query_search(qpos_index, '"alpha beta"', k=10))
    phrase_docs = {r["conv_id"]
                   for r in phrase_search(qpos_index, "alpha beta",
                                          k=10).collect()}
    exp = [(c, s) for c, s in _rows(search(qpos_index, "alpha beta", k=10))
           if c in phrase_docs]
    assert got == exp
    assert {c for c, _ in got} == {"x000", "x001", "x002", "x004"}
    assert "x003" not in {c for c, _ in got}


def test_phrase_plus_terms_scoring(qpos_index):
    """Bare terms and phrase constituents both feed the ranked pass:
    'gamma "alpha beta"' scores over {gamma, alpha, beta} within the
    phrase-matching docs."""
    got = _rows(query_search(qpos_index, 'gamma "alpha beta"', k=10))
    phrase_docs = {r["conv_id"]
                   for r in phrase_search(qpos_index, "alpha beta",
                                          k=10).collect()}
    exp = [(c, s)
           for c, s in _rows(search(qpos_index, "gamma alpha beta", k=10))
           if c in phrase_docs]
    assert got == exp and got


def test_not_phrase(qpos_index):
    """-"beta gamma" bans exactly the docs where beta,gamma are adjacent
    (x000, x002) — NOT the docs merely containing both words."""
    got = _rows(query_search(qpos_index, 'alpha -"beta gamma"', k=10))
    exp = [(c, s) for c, s in _rows(search(qpos_index, "alpha", k=10))
           if c not in {"x000", "x002"}]
    assert got == exp
    assert {c for c, _ in got} == {"x001", "x003", "x004"}


def test_unmatchable_clauses(qpos_index):
    # positive phrase with an absent word → empty; NOT phrase with an
    # absent word → no-op; NOT-only / empty strings → empty
    assert query_search(qpos_index, 'alpha "beta zzznope"', k=10).count() == 0
    noop = _rows(query_search(qpos_index, 'alpha -"beta zzznope"', k=10))
    assert noop == _rows(search(qpos_index, "alpha", k=10))
    assert query_search(qpos_index, '-alpha -"beta gamma"', k=10).count() == 0
    assert query_search(qpos_index, "", k=10).count() == 0


def test_scope_composes(qpos_index):
    """A conv-prefix scope intersects with the phrase filter; pagination
    slices the same global ranking (absolute ranks)."""
    got = _rows(query_search(qpos_index, '"alpha beta" -epsilon', k=10,
                             scope="x00"))
    phrase_docs = {r["conv_id"]
                   for r in phrase_search(qpos_index, "alpha beta",
                                          k=10).collect()}
    exp = [(c, s) for c, s in _rows(search(qpos_index, "alpha beta", k=10,
                                           exclude="epsilon"))
           if c in phrase_docs]
    assert got == exp and got
    full = _rows(query_search(qpos_index, '"alpha beta"', k=10))
    p1 = _rows(query_search(qpos_index, '"alpha beta"', k=2))
    p2 = _rows(query_search(qpos_index, '"alpha beta"', k=2, offset=2))
    assert p1 + p2 == full[:4] and len(p1 + p2) == 4


def test_span_clause(qpos_index):
    """'"alpha gamma"~w' keeps docs whose tightest alpha..gamma window is
    ≤ w: x000 (alpha@3, gamma@2 → span 1) at w=1; adds x002 (alpha@4,
    gamma@6 → span 2) at w=2. Scoring == plain search over the
    constituents restricted to the span-matching docs."""
    got1 = _rows(query_search(qpos_index, 'beta "alpha gamma"~1', k=10))
    base = _rows(search(qpos_index, "beta alpha gamma", k=10))
    assert got1 == [(c, s) for c, s in base if c == "x000"]
    got2 = {c for c, _ in
            _rows(query_search(qpos_index, 'beta "alpha gamma"~2', k=10))}
    assert got2 == {"x000", "x002"}


def test_regex_terms(qpos_index):
    """/pat/ expands against the dictionary (anchored) to an OR-group;
    -/pat/ bans the expansions; no-match positive → unsatisfiable;
    invalid patterns raise eagerly."""
    got = _rows(query_search(qpos_index, '/.*ta/ gamma', k=10))
    exp = _rows(query_search(qpos_index, '(beta|delta) gamma', k=10))
    assert got == exp and got
    got = _rows(query_search(qpos_index, 'alpha -/.*mma/', k=10))
    assert got == _rows(search(qpos_index, "alpha", k=10, exclude="gamma"))
    assert query_search(qpos_index, 'alpha /zz.*q/', k=10).count() == 0
    with pytest.raises(ValueError, match="bad regex"):
        query_search(qpos_index, 'alpha /[unclosed/', k=10)


def test_exists_qualifier(qpos_index):
    """exists:tool keeps the docs with a non-null tool (x002/x004);
    -exists:tool keeps exactly the tool-less ones."""
    got = {c for c, _ in
           _rows(query_search(qpos_index, "alpha exists:tool", k=10))}
    assert got == {"x002", "x004"}
    got = {c for c, _ in
           _rows(query_search(qpos_index, "alpha -exists:tool", k=10))}
    assert got == {"x000", "x001", "x003"}
    with pytest.raises(ValueError, match="column name"):
        query_search(qpos_index, "alpha exists:not-a-col!", k=10)


def test_query_time_synonyms(qpos_index):
    """synonyms={word: [alts]} turns a matching bare term into the
    OR-group [word, *alts] — identical rows to writing the group; keys
    that match nothing leave the query untouched."""
    got = _rows(query_search(qpos_index, "gamma", k=10,
                             synonyms={"gamma": ["delta"]}))
    exp = _rows(query_search(qpos_index, "(gamma|delta)", k=10))
    assert got == exp and got
    got2 = _rows(query_search(qpos_index, "gamma", k=10,
                              synonyms={"zeta": ["eta"]}))
    assert got2 == _rows(search(qpos_index, "gamma", k=10))


def test_ordered_span_clause(qpos_index):
    """'"alpha gamma"~w!' requires alpha BEFORE gamma within w. Ordered
    spans are 2 in both x000 (alpha@0 → gamma@2) and x002 (alpha@4 →
    gamma@6), so ~1! matches nothing even though x000's UNORDERED span is
    1 (gamma@2, alpha@3); ~2! keeps both, scored like plain search over
    the constituents."""
    assert query_search(qpos_index,
                        'beta "alpha gamma"~1!', k=10).count() == 0
    got = _rows(query_search(qpos_index, 'beta "alpha gamma"~2!', k=10))
    base = _rows(search(qpos_index, "beta alpha gamma", k=10))
    assert got == [(c, s) for c, s in base if c in {"x000", "x002"}] and got
    # reversed order matches only x000 (gamma@2 → alpha@3)
    got = {c for c, _ in
           _rows(query_search(qpos_index, 'beta "gamma alpha"~1!', k=10))}
    assert got == {"x000"}


def test_not_ordered_span_clause(qpos_index):
    """-"gamma alpha"~1! bans exactly x000 (gamma@2 → alpha@3); x002's
    gamma is final so it carries no in-order chain and stays."""
    got = _rows(query_search(qpos_index, 'alpha -"gamma alpha"~1!', k=10))
    exp = [(c, s) for c, s in _rows(search(qpos_index, "alpha", k=10))
           if c != "x000"]
    assert got == exp and "x002" in {c for c, _ in got}


def test_not_span_clause(qpos_index):
    """-"alpha gamma"~1 bans exactly the tight-window doc x000; the
    loose-window doc x002 (span 2) stays."""
    got = _rows(query_search(qpos_index, 'alpha -"alpha gamma"~1', k=10))
    exp = [(c, s) for c, s in _rows(search(qpos_index, "alpha", k=10))
           if c != "x000"]
    assert got == exp and "x002" in {c for c, _ in got}


def test_qualifiers(qpos_index):
    """Metadata qualifiers == search with the equivalent Column scope;
    negated tool qualifier keeps the tool-less (null) docs."""
    from pyspark.sql import functions as F
    got = _rows(query_search(qpos_index, "alpha role:assistant", k=10))
    exp = _rows(search(qpos_index, "alpha", k=10,
                       scope=(F.col("role") == "assistant")))
    assert got == exp and {c for c, _ in got} == {"x001", "x003"}
    got = _rows(query_search(qpos_index, "alpha -tool:bash", k=10))
    assert {c for c, _ in got} == {"x000", "x001", "x003"}
    got = _rows(query_search(qpos_index, "alpha site:x00 tool:bash", k=10))
    assert {c for c, _ in got} == {"x002", "x004"}
    # no docs satisfy both → empty, not an error
    assert query_search(qpos_index,
                        "alpha role:user role:assistant", k=10).count() == 0


def test_qualifier_composes_with_phrase_and_scope(qpos_index):
    """site: qualifier + explicit scope= + phrase clause all intersect."""
    got = _rows(query_search(qpos_index, '"alpha beta" role:user', k=10,
                             scope="x00"))
    phrase_docs = {r["conv_id"]
                   for r in phrase_search(qpos_index, "alpha beta",
                                          k=10).collect()}
    exp = [(c, s) for c, s in _rows(search(qpos_index, "alpha beta", k=10))
           if c in phrase_docs and c in {"x000", "x002", "x004"}]
    assert got == exp and got


def test_ref_compat_mode(qpos_index):
    """ref_compat + phrase filter keeps GLOBAL df semantics: alpha/beta
    (df 5/5 = 1.0) are pruned by the reference's 80% rule exactly as in
    plain search — the phrase filter must NOT recompute df within its own
    match set (where constituents have df 1.0 by construction, which would
    empty every phrase query). gamma (df 2/5) survives, so the conjunction
    runs over {gamma} within the phrase-matching docs."""
    assert search(qpos_index, "alpha beta", k=10,
                  mode="ref_compat").count() == 0  # the global-prune anchor
    got = query_search(qpos_index, 'gamma "alpha beta"', k=10,
                       mode="ref_compat").collect()
    # gamma docs = {x000, x002}; both phrase-match; equal tf → both 1.0
    assert {(r["conv_id"], r["score"]) for r in got} == \
           {("x000", 1.0), ("x002", 1.0)}


def test_or_group_filter_and_scoring(qpos_index):
    """'(gamma|delta) alpha' ranks by BM25 over {gamma, delta, alpha}
    restricted to docs containing gamma OR delta — the brute-force
    composition of plain search + a membership filter."""
    got = _rows(query_search(qpos_index, "(gamma|delta) alpha", k=10))
    members = {"x000", "x001", "x002", "x003"}  # docs with gamma or delta
    exp = [(c, s)
           for c, s in _rows(search(qpos_index, "gamma delta alpha", k=10))
           if c in members]
    assert got == exp and got
    assert "x004" not in {c for c, _ in got}  # epsilon doc: neither member


def test_or_group_composes_with_phrase_and_not(qpos_index):
    """Group ∩ phrase ∩ NOT: '(gamma|epsilon) "alpha beta" -delta' keeps
    phrase-matching docs having gamma or epsilon, minus delta docs."""
    got = _rows(query_search(
        qpos_index, '(gamma|epsilon) "alpha beta" -delta', k=10))
    phrase_docs = {r["conv_id"] for r in
                   phrase_search(qpos_index, "alpha beta", k=10).collect()}
    members = {"x000", "x002", "x004"}  # gamma or epsilon docs
    exp = [(c, s) for c, s in
           _rows(search(qpos_index, "gamma epsilon alpha beta", k=10))
           if c in phrase_docs and c in members and c != "x001"]
    assert got == exp and got
    assert {c for c, _ in got} == {"x000", "x002", "x004"}


def test_or_group_unmatchable_and_neg(qpos_index):
    # a group with no member in the dictionary is unsatisfiable
    assert query_search(qpos_index, "(zzz|qqq) alpha", k=10).count() == 0
    # -(a|b) == -a -b
    got = _rows(query_search(qpos_index, "alpha -(gamma|delta)", k=10))
    exp = _rows(query_search(qpos_index, "alpha -gamma -delta", k=10))
    assert got == exp
    assert {c for c, _ in got} == {"x004"}


# ---------- query_facets (grammar facets) ----------

def _facets(df):
    cols = df.columns
    return [tuple(r[c] for c in cols) for r in df.collect()]


def test_query_facets_grammar(qpos_index):
    from searchengine_spark.operators.querylang import query_facets
    # NOT-phrase: match set {x001,x003,x004} → assistant 2, user 1
    assert _facets(query_facets(qpos_index, 'alpha -"beta gamma"',
                                by="role")) == \
        [("assistant", 2), ("user", 1)]
    # group ∩ phrase: {x000,x002,x004} → user 3
    assert _facets(query_facets(qpos_index, '(gamma|epsilon) "alpha beta"',
                                by="role")) == [("user", 3)]
    # wildcard group: any-match of {gamma, delta} ∩ delta docs {x001,x003}
    assert _facets(query_facets(qpos_index, "gamma del*", by="role")) == \
        [("assistant", 2)]


def test_query_facets_multi_and_qualifier(qpos_index):
    from searchengine_spark.operators.querylang import query_facets
    got = _facets(query_facets(qpos_index, "alpha tool:bash",
                               by=["role", "tool"]))
    assert got == [("role", "user", 2), ("tool", "bash", 2)]


def test_query_facets_ref_compat_and_empty(qpos_index):
    from searchengine_spark.operators.querylang import query_facets
    # ref_compat: global prune drops alpha/beta; require-all over {gamma}
    # within the phrase docs → {x000, x002} → user 2
    assert _facets(query_facets(qpos_index, 'gamma "alpha beta"',
                                mode="ref_compat", by="role")) == \
        [("user", 2)]
    assert query_facets(qpos_index, "-alpha", by="role").count() == 0
    assert query_facets(qpos_index, 'alpha "beta zzznope"',
                        by="role").count() == 0


# ---------- query_search_bm25f (grammar over the fielded scorer) ----------

@pytest.fixture(scope="module")
def qpos_fielded(spark):
    from searchengine_spark.operators.fielded import build_fielded_index
    rows = [(f"x{i:03d}", 0, "assistant" if i % 2 else "user", t,
             "bash" if i in (2, 4) else None, "2026-01-01 00:00:00")
            for i, t in enumerate(XDOCS)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text",
                                      "tool", "ts"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sdf = spark.createDataFrame(
        pdf, schema="conv_id string, turn_idx int, role string, text string,"
                    " tool string, ts timestamp")
    return build_fielded_index(sdf, mode="general")


def test_query_search_bm25f_composition(qpos_index, qpos_fielded):
    """Grammar clauses resolve on the main positional index; ranking is
    BM25F — equal to bm25f_search over the positive words restricted to
    the clause candidates."""
    from searchengine_spark.operators.fielded import bm25f_search
    from searchengine_spark.operators.querylang import query_search_bm25f
    got = _rows(query_search_bm25f(qpos_index, qpos_fielded,
                                   'gamma "alpha beta"', k=10))
    phrase_docs = {r["conv_id"] for r in
                   phrase_search(qpos_index, "alpha beta", k=10).collect()}
    exp = [(c, s) for c, s in
           _rows(bm25f_search(qpos_fielded, "gamma alpha beta", k=10))
           if c in phrase_docs]
    assert got == exp and got


def test_query_search_bm25f_not_and_qualifier(qpos_index, qpos_fielded):
    from searchengine_spark.operators.fielded import bm25f_search
    from searchengine_spark.operators.querylang import query_search_bm25f
    # NOT phrase bans the adjacency docs {x000, x002} only
    got = _rows(query_search_bm25f(qpos_index, qpos_fielded,
                                   'alpha -"beta gamma"', k=10))
    exp = [(c, s) for c, s in
           _rows(bm25f_search(qpos_fielded, "alpha", k=10))
           if c not in {"x000", "x002"}]
    assert got == exp and {c for c, _ in got} == {"x001", "x003", "x004"}
    # qualifier → scope predicate over the fielded docs
    got = _rows(query_search_bm25f(qpos_index, qpos_fielded,
                                   "alpha tool:bash", k=10))
    assert {c for c, _ in got} == {"x002", "x004"}
    # wildcard group + empty cases
    got = {c for c, _ in _rows(query_search_bm25f(
        qpos_index, qpos_fielded, "gamma del*", k=10))}
    assert got == {"x001", "x003"}
    assert query_search_bm25f(qpos_index, qpos_fielded,
                              'alpha "beta zzznope"').count() == 0
    assert query_search_bm25f(qpos_index, qpos_fielded, "-alpha").count() == 0


def test_grammar_min_match(qpos_index):
    from searchengine_spark.operators.search import (search, search_count,
                                                     search_facets)
    got = [(r["conv_id"], round(r["score"], 9)) for r in
           query_search(qpos_index, "alpha gamma epsilon min:2",
                        k=10).collect()]
    exp = [(r["conv_id"], round(r["score"], 9)) for r in
           search(qpos_index, "alpha gamma epsilon", k=10,
                  min_match=2).collect()]
    assert got == exp
    # parse: directive, last wins, negation rejected
    q = parse_query("alpha min:2 min:3")
    assert q["min_match"] == 3 and q["terms"] == ["alpha"]
    with pytest.raises(ValueError, match="min"):
        parse_query("alpha -min:2")
    # facets/count see the same thresholded match set
    from searchengine_spark.operators.querylang import query_facets
    from pyspark.sql import functions as SF
    n = (query_facets(qpos_index, "alpha gamma epsilon min:2", by="role")
         .agg(SF.sum("n_docs")).collect()[0][0])
    m = search_count(qpos_index, "alpha gamma epsilon",
                     min_match=2).collect()[0]["n_matches"]
    assert n == m == len(exp)
    # fielded path rejects the directive eagerly
    from searchengine_spark.operators.querylang import query_search_bm25f
    with pytest.raises(ValueError, match="min"):
        query_search_bm25f(qpos_index, qpos_index, "alpha min:2")


def test_grammar_fuzzy_terms(qpos_index):
    from searchengine_spark.operators.suggest import expand_fuzzy
    # parse: base>=2 chars, N in {1,2}; others stay terms
    q = parse_query("gamma delt~1 -bet~1 x~1 word~3")
    assert q == _base(terms=["gamma", "x~1", "word~3"],
                      fuzzies=[("delt", 1)], not_fuzzies=[("bet", 1)])
    # expansion ranking comes from suggest_corrections
    assert expand_fuzzy(qpos_index, "delt", 1) == ["delta"]
    # 'delt~1' == the (delta) OR-group query
    got = [(r["conv_id"], round(r["score"], 9)) for r in
           query_search(qpos_index, "gamma delt~1", k=10).collect()]
    exp = [(r["conv_id"], round(r["score"], 9)) for r in
           query_search(qpos_index, "gamma del*", k=10).collect()]
    assert got == exp and got
    # negative fuzzy bans the expansions; no-match fuzzy: pos empty / neg noop
    b = {r["conv_id"] for r in
         query_search(qpos_index, "alpha -gamm~1", k=10).collect()}
    assert b == {"x001", "x003", "x004"}
    assert query_search(qpos_index, "alpha zz~1", k=10).count() == 0
    assert query_search(qpos_index, "alpha -zz~1", k=10).count() == 5


def test_grammar_fuzzy_batched(qpos_index):
    from tests.test_querylang_many import _assert_parity
    _assert_parity(qpos_index,
                   {"f1": "gamma delt~1", "f2": "alpha -gamm~1",
                    "f3": "alpha zz~1", "f4": "alpha -zz~1"},
                   mode="bm25")


def test_query_count(qpos_index):
    from searchengine_spark.operators.querylang import query_count
    # matches == query_search's full match set size
    n = query_count(qpos_index, "alpha -gamma").collect()[0]["n_matches"]
    m = query_search(qpos_index, "alpha -gamma", k=100).count()
    assert n == m > 0
    # grammar constraints count too: group + min directive
    n2 = query_count(qpos_index, "alpha (gamma|delta) min:2").collect()[0][0]
    m2 = query_search(qpos_index, "alpha (gamma|delta) min:2", k=100).count()
    assert n2 == m2
    # unsatisfiable → one row, zero
    assert query_count(qpos_index, "zz~1").collect()[0]["n_matches"] == 0


def test_query_search_n_fragments(index_general):
    from searchengine_spark.operators.querylang import query_search
    rows = query_search(index_general, "ошибка", k=5, with_snippets=True,
                        n_fragments=2).collect()
    assert rows and all(r["snippet"] for r in rows)
