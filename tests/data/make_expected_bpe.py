"""Regenerate the expected BPE merge table for the `pipeline_bpe_merges`
oracle — an INDEPENDENT minimal reimplementation of classic BPE
(Sennrich 2016) over the documents vocabulary with UNIFORM type weights
(the entry's setting, chosen because both sf dirs share the exact same
31-word vocabulary, making the merge list sf-independent).

Run from the repo root after any change to the entry's parameters or
the tokenization:  python tests/data/make_expected_bpe.py
"""
import re

import duckdb
import pandas as pd

N_MERGES = 40
EOW = "</w>"


def tokens(text: str) -> list:
    return [w for w in re.sub(r"[^a-z0-9 ]", " ", text.lower()).split() if w]


def main() -> None:
    con = duckdb.connect()
    con.execute("create view documents as select * from "
                "parquet_scan('/root/testdata/sf0.001/documents.parquet')")
    vocab_words = set()
    for (t,) in con.execute("select text from documents").fetchall():
        vocab_words.update(tokens(t))
    vocab = {tuple(list(w) + [EOW]): 1 for w in sorted(vocab_words)}

    merges = []
    for _ in range(N_MERGES):
        stats = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                stats[(sym[i], sym[i + 1])] = \
                    stats.get((sym[i], sym[i + 1]), 0) + c
        if not stats:
            break
        bc = max(stats.values())
        if bc < 2:
            break
        pair = min(p for p, c in stats.items() if c == bc)
        merges.append(pair)
        a, b = pair
        nv = {}
        for sym, c in vocab.items():
            i, ns = 0, []
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(sym[i])
                    i += 1
            nv[tuple(ns)] = nv.get(tuple(ns), 0) + c
        vocab = nv

    pdf = pd.DataFrame(
        [(i, p[0], p[1]) for i, p in enumerate(merges)],
        columns=["rank", "left", "right"]).astype({"rank": "int32"})
    pdf.to_parquet("/root/repo/tests/data/expected_bpe_merges.parquet",
                   index=False)
    print(f"wrote {len(pdf)} merges")


if __name__ == "__main__":
    main()
