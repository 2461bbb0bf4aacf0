"""Regenerate the committed Porter-stem mapping table
(expected_porter_map.parquet) — the oracle side of q_bm25_porter_topk.

INDEPENDENT reimplementation of the Porter 1980 algorithm (no imports
from the engine package): where resources/en_porter.py walks characters
with recursive consonant tests, this one builds an explicit CV-pattern
string per word and drives every step from data tables over it. A bug in
either implementation that changes any corpus word's stem breaks the
driver's value hash.

The table covers exactly the vocabulary the entry's shaped corpus can
produce: every token of the sf0.001 + sf0.01 documents tables, the four
shaped family words, and the query surface forms — minus the en stop
list (the analyzer drops those before stemming, so the oracle's INNER
join to this map performs the same stop filtering).

Run from the repo root:  python tests/data/make_expected_porter.py
"""

from __future__ import annotations

import os
import re

import pandas as pd

HERE = os.path.dirname(os.path.abspath(__file__))

SHAPE_WORDS = ["connection", "connected", "connecting", "generalization"]
QUERY_WORDS = ["connection", "generalizations"]


def _cv(word: str) -> str:
    """CV-pattern string: 'c' or 'v' per character, y = vowel iff the
    previous character classified consonant."""
    out = []
    for i, ch in enumerate(word):
        if ch in "aeiou":
            out.append("v")
        elif ch == "y":
            out.append("c" if i == 0 or out[i - 1] == "v" else "v")
        else:
            out.append("c")
    return "".join(out)


def _m(word: str) -> int:
    return len(re.findall("vc", re.sub("c+", "c",
                                       re.sub("v+", "v", _cv(word)))))


def _has_vowel(word: str) -> bool:
    return "v" in _cv(word)


def _double_c(word: str) -> bool:
    return (len(word) >= 2 and word[-1] == word[-2]
            and _cv(word)[-1] == "c")


def _cvc(word: str) -> bool:
    return (len(word) >= 3 and _cv(word)[-3:] == "cvc"
            and word[-1] not in "wxy")


S2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
      ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
      ("entli", "ent"), ("eli", "e"), ("ousli", "ous"),
      ("ization", "ize"), ("ation", "ate"), ("ator", "ate"),
      ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
      ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"),
      ("biliti", "ble")]
S3 = [("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
      ("ical", "ic"), ("ful", ""), ("ness", "")]
S4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive",
      "ize"]


def stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    for suf, rep, keep in (("sses", "ss", 0), ("ies", "i", 0),
                           ("ss", "ss", 1), ("s", "", 0)):
        if w.endswith(suf):
            if not keep:
                w = w[: len(w) - len(suf)] + rep
            break
    if w.endswith("eed"):
        if _m(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = False
        for suf in ("ed", "ing"):
            if w.endswith(suf) and _has_vowel(w[: len(w) - len(suf)]):
                w = w[: len(w) - len(suf)]
                hit = True
                break
        if hit:
            if re.search("(at|bl|iz)$", w):
                w += "e"
            elif _double_c(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _m(w) == 1 and _cvc(w):
                w += "e"
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    for table, cond in ((S2, 0), (S3, 0)):
        for suf, rep in table:
            if w.endswith(suf):
                base = w[: len(w) - len(suf)]
                if _m(base) > 0:
                    w = base + rep
                break
    for suf in S4:
        if w.endswith(suf):
            base = w[: len(w) - len(suf)]
            if _m(base) > 1 and (suf != "ion"
                                 or (base and base[-1] in "st")):
                w = base
            break
    if w.endswith("e"):
        base = w[:-1]
        if _m(base) > 1 or (_m(base) == 1 and not _cvc(base)):
            w = base
    if _m(w) > 1 and _double_c(w) and w.endswith("l"):
        w = w[:-1]
    return w


def main() -> None:
    import duckdb
    import sys
    sys.path.insert(0, os.path.join(HERE, "..", ".."))
    from searchengine_spark.resources.en_morph import EN_STOP_WORDS
    con = duckdb.connect()
    words: set[str] = set(SHAPE_WORDS) | set(QUERY_WORDS)
    for sf in ("sf0.001", "sf0.01"):
        p = f"/root/testdata/{sf}/documents.parquet"
        if os.path.exists(p):
            rows = con.execute(
                "select distinct unnest(list_filter(string_split_regex("
                "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),"
                " ' +'), x -> x <> ''))"
                f" from parquet_scan('{p}')").fetchall()
            words |= {r[0] for r in rows}
    words -= set(EN_STOP_WORDS)
    df = pd.DataFrame(sorted((w, stem(w)) for w in words),
                      columns=["word", "stem"])
    df.to_parquet(os.path.join(HERE, "expected_porter_map.parquet"),
                  index=False)
    print(f"{len(df)} words; connection→{stem('connection')} "
          f"generalizations→{stem('generalizations')}")


if __name__ == "__main__":
    main()
