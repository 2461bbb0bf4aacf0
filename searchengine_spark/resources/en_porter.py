"""The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
stripping", Program 14(3) 1980) — the standard English stemmer every
fulltext engine ships (Lucene's PorterStemFilter). Implemented from the
published specification; pure Python, vectorized via a per-batch memo in
``porter_stem_series`` (the analyzer's pandas-UDF hook).

Dictionary name: ``en_porter`` (functions/analysis.get_dictionary) —
EN_STOP_WORDS + EN_IRREGULAR map first (irregulars like "went" are out of
any suffix stemmer's reach), Porter as the rule fallback for everything
else. Golden tests: the paper's own step examples + the classic public
vocabulary pairs (tests/test_en_porter.py); the q_bm25_porter_topk oracle
gates the whole analyzer against an independent table-driven
reimplementation over the corpus vocabulary.
"""

from __future__ import annotations

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel→consonant transitions."""
    m, i, n = 0, 0, len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while True:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            return m
        m += 1
        while i < n and _is_cons(w, i):
            i += 1


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    n = len(w)
    return (n >= 3 and _is_cons(w, n - 1) and not _is_cons(w, n - 2)
            and _is_cons(w, n - 3) and w[-1] not in "wxy")


_STEP2 = [("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
          ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
          ("alli", "al"), ("entli", "ent"), ("eli", "e"),
          ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
          ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
          ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
          ("iviti", "ive"), ("biliti", "ble")]

_STEP3 = [("icate", "ic"), ("ative", ""), ("alize", "al"),
          ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", "")]

_STEP4 = ["al", "ance", "ence", "er", "ic", "able", "ible", "ant",
          "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
          "ous", "ive", "ize"]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        w = _step1b_fixup(w)
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        w = _step1b_fixup(w)

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 0:
                w = stem + rep
            break

    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                if suf == "ion" and stem and stem[-1] not in "st":
                    break
                w = stem
            break

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # step 5b
    if _measure(w) > 1 and _double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


def _step1b_fixup(w: str) -> str:
    if w.endswith(("at", "bl", "iz")):
        return w + "e"
    if _double_cons(w) and w[-1] not in "lsz":
        return w[:-1]
    if _measure(w) == 1 and _cvc(w):
        return w + "e"
    return w


def porter_stem_series(words):
    """pandas Series → stemmed Series with a per-call memo (corpus
    vocabularies are tiny relative to token counts)."""
    memo: dict[str, str] = {}

    def f(w):
        s = memo.get(w)
        if s is None:
            s = memo[w] = porter_stem(w)
        return s

    return words.map(f)


def porter_surface_forms(lemma: str) -> set[str]:
    """BEST-EFFORT inverse image for snippet highlighting: candidate
    surface forms generated from common suffix patterns, kept when they
    stem back to ``lemma``. Porter's inverse is not finite/closed-form
    (unlike the S-stemmer's), so highlighting under en_porter may miss
    exotic derivations — the match/ranking path is unaffected."""
    out = {lemma}
    bases = {lemma}
    if lemma.endswith("i"):
        bases.add(lemma[:-1] + "y")      # step-1c inverse (happi → happy)
    for base in list(bases):
        for suf in ("", "e", "s", "es", "ed", "ing", "er", "ion", "ions",
                    "ation", "ations", "ational", "ly", "ness", "ful",
                    "al", "ate", "ive", "ment", "ments"):
            cand = base + suf
            if porter_stem(cand) == lemma:
                out.add(cand)
        if base.endswith("e"):
            for suf in ("ed", "ing", "es"):
                cand = base[:-1] + suf   # hope → hoping/hoped
                if porter_stem(cand) == lemma:
                    out.add(cand)
        if base and _double_cons(base + base[-1]):
            for suf in ("ed", "ing"):
                cand = base + base[-1] + suf  # hop → hopping
                if porter_stem(cand) == lemma:
                    out.add(cand)
    return out
