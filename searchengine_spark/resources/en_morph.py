"""English analysis resources: S-stemmer rules + stop list + irregulars.

The ``en_simple`` dictionary pairs a small irregular-form map with
Harman's S-stemmer (Donna Harman, "How effective is suffixing?", JASIS
1991) — the conservative three-rule plural stemmer:

  1. ``-ies`` → ``-y``   unless the word ends ``-eies``/``-aies``
  2. ``-es``  → ``-e``   (drop the s) unless it ends ``-aes``/``-ees``/``-oes``
  3. ``-s``   → drop it  unless the word ends ``-us``/``-ss``

One deviation, documented: rules only fire on words longer than 3
characters (Harman's original has no length guard; without one, 3-letter
tokens like ``gas`` mangle). Unlike the map dictionaries (``fixture``,
``ru_full``) this one is RULE-based, so the analysis chain applies
``s_stem`` to words the irregular map misses, and snippet highlighting
expands query lemmas through the rules' exact finite inverse image
(``surface_forms``) instead of a reverse map scan.
"""

from __future__ import annotations

__all__ = ["EN_STOP_WORDS", "EN_IRREGULAR", "s_stem", "s_stem_series",
           "surface_forms"]

# Closed-class English stop words — articles, conjunctions, prepositions,
# pronouns, auxiliaries' particles. Applied to SURFACE forms before any
# stemming (the same T3-before-T4 order as every other dictionary).
EN_STOP_WORDS = frozenset("""
a an the and or but if then else of to in on at by for with from as that
this these those it its is are was were be been being am do does did not
no so such than too very will would can could may might shall should
""".split())

# Irregular forms the suffix rules cannot reach. Checked BEFORE the rules
# (map hit wins), mirroring the map-dictionary semantics.
EN_IRREGULAR = {
    "has": "have", "had": "have", "having": "have",
    "went": "go", "gone": "go",
    "made": "make", "said": "say", "told": "tell",
    "got": "get", "gotten": "get",
    "took": "take", "taken": "take",
    "came": "come", "saw": "see", "seen": "see",
    "gave": "give", "given": "give",
    "found": "find", "ran": "run", "wrote": "write", "written": "write",
    "men": "man", "women": "woman", "children": "child",
    "feet": "foot", "teeth": "tooth", "mice": "mouse",
    "people": "person", "indices": "index", "matrices": "matrix",
    "better": "good", "best": "good", "worse": "bad", "worst": "bad",
}


def s_stem(w: str) -> str:
    """Pure-Python S-stemmer; normative semantics (mirrored vectorized in
    ``s_stem_series`` and in SQL by the DuckDB oracles)."""
    if len(w) <= 3:
        return w
    # the FIRST rule whose ending matches claims the word: an exception
    # terminates (e.g. "goes" hits rule 2's -oes guard and stays "goes" —
    # it does NOT fall through to rule 3)
    if w.endswith("ies"):
        return w if w.endswith(("eies", "aies")) else w[:-3] + "y"
    if w.endswith("es"):
        return w if w.endswith(("aes", "ees", "oes")) else w[:-1]
    if w.endswith("s"):
        return w if w.endswith(("us", "ss")) else w[:-1]
    return w


def s_stem_series(s):
    """Vectorized pandas mirror of ``s_stem`` (no per-row Python)."""
    out = s.copy()
    long = s.str.len() > 3
    e1, e2, e3 = (s.str.endswith("ies"), s.str.endswith("es"),
                  s.str.endswith("s"))
    # first matching ENDING claims the word; exceptions terminate
    m1 = long & e1 & ~(s.str.endswith("eies") | s.str.endswith("aies"))
    m2 = long & ~e1 & e2 & ~(s.str.endswith("aes") | s.str.endswith("ees")
                             | s.str.endswith("oes"))
    m3 = (long & ~e1 & ~e2 & e3
          & ~(s.str.endswith("us") | s.str.endswith("ss")))
    out[m1] = s[m1].str.slice(0, -3) + "y"
    out[m2] = s[m2].str.slice(0, -1)
    out[m3] = s[m3].str.slice(0, -1)
    return out


def surface_forms(lemma: str) -> set[str]:
    """The EXACT inverse image of ``s_stem`` for one lemma (plus the
    lemma itself): every surface form the rules map to it. Finite by
    construction — this is what lets snippet highlighting work under a
    rule dictionary without enumerating a reverse map."""
    out = {lemma}
    if len(lemma) >= 2 and lemma.endswith("y") \
            and not lemma.endswith(("ey", "ay")):
        cand = lemma[:-1] + "ies"          # rule 1 inverse
        if s_stem(cand) == lemma:
            out.add(cand)
    cand = lemma + "s"                     # rules 2/3 inverse
    if s_stem(cand) == lemma:
        out.add(cand)
    for form, lem in EN_IRREGULAR.items():
        if lem == lemma:
            out.add(form)
    return out
