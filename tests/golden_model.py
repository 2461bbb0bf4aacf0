"""Golden single-node model (SURVEY.md §5.1) — normative reference semantics.

Independent pure-Python re-implementation of the reference pipeline
(tokenize → particle filter → first-normal-form lemmatize → tf/df index →
80%-prune → conjunctive AND → tf-sum/BM25 scoring → canonical tie-break).
Shares ONLY the fixture dictionaries with the engine; all logic here is
written separately (plain loops + Counter) so an engine bug can't hide in a
shared helper.

Reference semantics being modeled, with citations:
- tokenize: lowercase, non-charset→space, split (Lemmatizator.java:97-102)
- drop word if ANY analysis is МЕЖД/ПРЕДЛ/СОЮЗ (Lemmatizator.java:12,84-95)
- first normal form wins; OOV skipped in ref_compat (Lemmatizator.java:42-52)
- df = #docs containing lemma (PageIndexer.java:172-192)
- prune lemma when df/N ≥ 0.8 (SearchingServiceImpl.java:272-298)
- AND across surviving lemmas (SearchingServiceImpl.java:95-108)
- ref score = Σtf normalized by result-set max (SearchingServiceImpl.java:300-329)
- canonical tie-break (reference order is HashMap-unspecified):
  (round(score,9) DESC, doc_id ASC) where doc_id = dense rank over
  (conv_id, turn_idx).
"""

from __future__ import annotations

import math
import re
from collections import Counter

from searchengine_spark.resources.vocab import LEMMA_OF, STOP_WORDS

K1, B = 1.2, 0.75
PRUNE = 0.8


def golden_analyze(text: str, mode: str) -> list[str]:
    pat = r"[^а-я\s]" if mode == "ref_compat" else r"[^a-zа-я0-9\s]"
    words = re.sub(pat, " ", (text or "").lower()).split()
    out = []
    for w in words:
        if w in STOP_WORDS:
            continue
        if w in LEMMA_OF:
            out.append(LEMMA_OF[w])
        elif mode != "ref_compat":
            out.append(w)
    return out


class GoldenIndex:
    def __init__(self, rows: list[dict], mode: str = "general"):
        self.mode = mode
        seen = {}
        for r in rows:
            seen.setdefault((r["conv_id"], r["turn_idx"]), r)  # exact-dup dedup
        self.docs = [seen[k] for k in sorted(seen)]  # doc_id = position
        self.tf: list[Counter] = []
        self.df: Counter = Counter()
        self.dl: list[int] = []
        for d in self.docs:
            lemmas = golden_analyze(d["text"], mode)
            c = Counter(lemmas)
            self.tf.append(c)
            self.dl.append(sum(c.values()))
            for t in c:
                self.df[t] += 1
        self.n_docs = len(self.docs)
        self.avgdl = (sum(self.dl) / self.n_docs) if self.n_docs else 0.0

    def _idf(self, t: str) -> float:
        return math.log(1.0 + (self.n_docs - self.df[t] + 0.5) / (self.df[t] + 0.5))

    def search(self, query: str, k: int = 10, mode: str | None = None) -> list[tuple[int, float]]:
        """Returns [(doc_id, score)] in canonical order, length ≤ k."""
        smode = mode or "bm25"
        # query analysis uses the INDEX's analysis mode (same chain both sides,
        # reference Q1: SearchingServiceImpl.java:38-41); `smode` picks scoring
        qterms = sorted(set(golden_analyze(query, self.mode)))
        found = [t for t in qterms if self.df.get(t, 0) > 0]
        if smode == "ref_compat":
            found = [t for t in found if self.df[t] / self.n_docs < PRUNE]
        if not found:
            return []
        if smode == "ref_compat":
            matches = {}
            for did in range(self.n_docs):
                if all(self.tf[did].get(t, 0) > 0 for t in found):
                    matches[did] = float(sum(self.tf[did][t] for t in found))
            if not matches:
                return []
            mx = max(matches.values())
            scored = [(did, v / mx) for did, v in matches.items()]
        else:
            acc: dict[int, float] = {}
            for t in found:  # fixed sorted-term summation order
                idf = self._idf(t)
                for did in range(self.n_docs):
                    tf = self.tf[did].get(t, 0)
                    if tf:
                        s = idf * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * self.dl[did] / self.avgdl))
                        acc[did] = acc.get(did, 0.0) + s
            scored = list(acc.items())
        scored.sort(key=lambda p: (-round(p[1], 9), p[0]))
        return scored[:k]

    def statistics(self) -> dict:
        per_role: dict[str, list[int]] = {}
        for did, d in enumerate(self.docs):
            agg = per_role.setdefault(d["role"], [0, 0])
            agg[0] += 1
            agg[1] += self.dl[did]
        return per_role
