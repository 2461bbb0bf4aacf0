"""Deterministic synthetic transcript generator (FIXTURES.md §1).

One row = one transcript turn, exactly the input_hint shape
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). Plays the role of the reference's crawled `page` table
(reference: model/PageEntity.java:11-35) but as a table scan, not a crawl.

Deterministic: seed 42 for corpus-level draws, per-row generator seeded by
crc32(conv_id:turn_idx). No wall clock. The same per-conversation function
backs both the pandas path (tests/golden model) and the distributed
mapInPandas path (bench at scale), so both are byte-identical.
"""

from __future__ import annotations

import zlib
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from searchengine_spark.resources.vocab import HOT_LEMMA, LATIN_TOKENS, PARTICLES, ZIPF_FORMS

_EPOCH = datetime(2026, 1, 1, 0, 0, 0)
_TICK = timedelta(seconds=37)
_ROLES = ("user", "assistant", "tool")
_TOOLS = ("bash", "read", "grep", "edit")
_PUNCT = ("42", "-->", "(ок)", "x=1;", "99%", "#7", "...", "[8]")
_HOT_FORMS = ["ошибка", "ошибки", "ошибке", "ошибку", "ошибкой"]
assert all(f in ("ошибка", "ошибки", "ошибке", "ошибку", "ошибкой") for f in _HOT_FORMS) and HOT_LEMMA == "ошибка"

# Zipf s=1.1 cdf over the ranked form pool, computed once.
_ZIPF_S = 1.1
_ranks = np.arange(1, len(ZIPF_FORMS) + 1, dtype=np.float64)
_w = _ranks ** (-_ZIPF_S)
_CDF = np.cumsum(_w / _w.sum())
_FORMS_ARR = np.array(ZIPF_FORMS, dtype=object)
_PARTICLES_ARR = np.array(PARTICLES, dtype=object)
_LATIN_ARR = np.array(LATIN_TOKENS, dtype=object)


def conv_lengths(n_conv: int) -> np.ndarray:
    """Deterministic conversation lengths in [1, 40]."""
    return np.random.RandomState(42).randint(1, 41, size=n_conv)


def _row_text(conv_id: str, turn_idx: int) -> str:
    rng = np.random.default_rng(zlib.crc32(f"{conv_id}:{turn_idx}".encode()))
    n = int(5 + rng.integers(0, 116))
    toks = _FORMS_ARR[np.searchsorted(_CDF, rng.random(n))].tolist()
    # sprinkle particles (~15% extra) so the stop filter has work to do
    n_part = max(1, n // 7)
    toks += _PARTICLES_ARR[rng.integers(0, len(_PARTICLES_ARR), n_part)].tolist()
    if rng.random() < 0.6:  # ultra-hot term, inflected (FIXTURES.md: ~60% of docs)
        toks.append(_HOT_FORMS[int(rng.integers(0, len(_HOT_FORMS)))])
    if rng.random() < 0.3:  # mixed-charset rows: latin + punctuation/digits
        n_lat = int(1 + rng.integers(0, 6))
        toks += _LATIN_ARR[rng.integers(0, len(_LATIN_ARR), n_lat)].tolist()
        toks.append(_PUNCT[int(rng.integers(0, len(_PUNCT)))])
    pos = rng.permutation(len(toks))
    return " ".join(np.array(toks, dtype=object)[pos].tolist())


def conv_rows(conv_i: int, length: int, row_offset: int) -> list[dict]:
    """All turns of conversation i; row_offset = global row number of turn 0."""
    conv_id = f"conv{conv_i:06d}"
    rows = []
    for t in range(length):
        role = _ROLES[(t + conv_i) % 3]
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": _row_text(conv_id, t),
                "tool": _TOOLS[(conv_i + t) % 4] if role == "tool" else None,
                "ts": _EPOCH + _TICK * (row_offset + t),
            }
        )
    return rows


def transcripts_pdf(n_conv: int = 200, dup_fraction: float = 0.01) -> pd.DataFrame:
    """Full fixture corpus as pandas: dup tail + shuffled write order."""
    lengths = conv_lengths(n_conv)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])
    rows: list[dict] = []
    for i in range(n_conv):
        rows.extend(conv_rows(i, int(lengths[i]), int(offsets[i])))
    pdf = pd.DataFrame(rows)
    rng = np.random.RandomState(43)
    n_dup = int(len(pdf) * dup_fraction)
    if n_dup:
        dup = pdf.iloc[rng.randint(0, len(pdf), n_dup)]  # exact copies → dedup-safe
        pdf = pd.concat([pdf, dup], ignore_index=True)
    pdf = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def transcripts_df(spark, n_conv: int = 200, dup_fraction: float = 0.01):
    """Small/test path: pandas → Arrow → DataFrame."""
    return spark.createDataFrame(transcripts_pdf(n_conv, dup_fraction), schema=_SCHEMA)


def transcripts_df_dist(spark, n_conv: int, partitions: int = 64):
    """Scale path: distributed generation via mapInPandas over conv ids.

    Conversation lengths/offsets are a seeded O(n_conv) vector computed on
    the driver and captured in the task closure (n_conv=10M → 80 MB; at true
    10^12-turn scale this becomes a join against a lengths table instead).
    No duplicate tail here — bench measures the engine, dedup is exercised
    in tests.
    """
    lengths = conv_lengths(n_conv)
    offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]])

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"].tolist():
                out.extend(conv_rows(int(i), int(lengths[i]), int(offsets[i])))
            res = pd.DataFrame(out, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
            res["turn_idx"] = res["turn_idx"].astype("int32")
            yield res

    return spark.range(0, n_conv, 1, partitions).mapInPandas(gen, schema=_SCHEMA)
