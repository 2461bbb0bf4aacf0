"""Vocabulary building + integer token-id encoding.

The tokenize-to-ids step of a training-data pipeline: build a
frequency-ordered vocabulary over the corpus (id 0..k-1 reserved for
specials, then terms by count desc / term asc — the ML convention where
small ids = frequent tokens), then encode documents as token-id
sequences with an UNK fallback.

Scale shape: vocab = one (term) hash aggregation + the engine's
three-level distributed prefix sum for dense ids (NO global window —
frequency order is made string-sortable by zero-padding ``max_count −
count`` into the sort key, the same trick the indexer uses for terms).
Encoding = posexplode + one left join against the vocab (AQE broadcasts
it when it fits) — one shuffle at any corpus size, all codegen.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_col
from searchengine_spark.operators.indexer import assign_dense_ids

__all__ = ["build_vocab", "encode_ids", "pack_token_ids",
           "save_vocab", "load_vocab"]


def build_vocab(df: DataFrame, size: "int | None" = None,
                min_count: int = 1, text_col: str = "text",
                specials: tuple = ("<unk>",)) -> dict:
    """Frequency-ordered vocabulary: {"terms": DataFrame[term, token_id,
    c], "specials": {token: id}, "n_specials": int}.

    ``size`` caps the vocabulary at the top-``size`` terms INCLUDING the
    specials (boundary ties resolve term-ascending, deterministically);
    ``min_count`` drops the long tail before id assignment.
    """
    cnt = (df.select(F.explode(tokens_col(F.col(text_col))).alias("term"))
           .groupBy("term").agg(F.count("*").alias("c")))
    if min_count > 1:
        cnt = cnt.filter(F.col("c") >= min_count)
    cnt = cnt.localCheckpoint(eager=False)  # build once, encode many
    row = cnt.agg(F.max("c").alias("m")).collect()[0]
    mx = int(row["m"] or 0)
    # string-sortable (count desc, term asc) key for the prefix-sum path
    key = F.format_string("%019d|%s", F.lit(mx) - F.col("c"), F.col("term"))
    ids = assign_dense_ids(cnt.withColumn("_k", key), "_k", ["term"],
                           id_col="_vid")
    n_sp = len(specials)
    terms = ids.select("term",
                       (F.col("_vid") + F.lit(n_sp)).alias("token_id"),
                       "c")
    if size is not None:
        if size <= n_sp:
            raise ValueError(f"size={size} must exceed n_specials={n_sp}")
        terms = terms.filter(F.col("token_id") < size)
    return {"terms": terms.localCheckpoint(eager=False),
            "specials": {t: i for i, t in enumerate(specials)},
            "n_specials": n_sp}


def encode_ids(df: DataFrame, vocab: dict, text_col: str = "text",
               id_col: str = "doc_id", unk: str = "<unk>") -> DataFrame:
    """Encode documents to (id, pos, token_id) rows — the exploded form
    of the token-id sequence (downstream packing/padding is one
    ``collect_list`` sorted by pos away; exploded rows keep the op
    testable and the shuffle key explicit). Out-of-vocabulary tokens map
    to the ``unk`` special id."""
    if unk not in vocab["specials"]:
        raise ValueError(f"{unk!r} is not a registered special: "
                         f"{sorted(vocab['specials'])}")
    unk_id = vocab["specials"][unk]
    toks = df.select(
        F.col(id_col),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"))
    return (toks.join(vocab["terms"].select("term", "token_id"),
                      "term", "left")
            .select(id_col, "pos",
                    F.coalesce("token_id", F.lit(unk_id)).cast("long")
                    .alias("token_id")))


def pack_token_ids(df: DataFrame, vocab: dict, seq_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   salt: int = 0, n_buckets: int = 1024,
                   append_eos: bool = False,
                   eos: str = "<eos>") -> DataFrame:
    """Tokenize → encode → pack: the full LM-pretraining prep step.
    Documents are encoded to token ids (``encode_ids``), laid out on one
    global stream in the deterministic hash order ``pack_sequences``
    uses, and cut into training sequences of exactly ``seq_len`` tokens
    (GPT-style concat-then-chunk; docs crossing a boundary split).

    Returns (seq_id, pos, token_id) — one row per token, the exploded
    form of the packed batch (grouping to arrays is one sorted
    ``collect_list`` away; the final ragged sequence is kept).

    ``append_eos=True`` inserts the ``eos`` special id after EVERY
    document on the stream (the standard GPT concat separator so the
    model sees document boundaries); ``eos`` must be a registered
    special (``build_vocab(..., specials=("<unk>", "<eos>"))``). An
    empty document contributes a lone EOS, like any concat pipeline.

    Plan: ``pack_sequences`` computes each doc's (seq_id, slice) layout
    from token COUNTS only (bucketed two-phase prefix sum — no global
    window); token ids then join their doc's slices on the doc key and
    land at ``seq_pos + (pos - tok_from)``. The slice join fans each
    token out to its doc's slice count (≈1), never to the corpus.
    """
    from searchengine_spark.functions.sampling import pack_sequences
    from searchengine_spark.functions.text import tokens_col

    n_tokens = F.size(tokens_col(F.col(text_col)))
    if append_eos:
        if eos not in vocab["specials"]:
            raise ValueError(f"{eos!r} is not a registered special: "
                             f"{sorted(vocab['specials'])}")
        n_tokens = n_tokens + F.lit(1)
    counted = df.select(F.col(id_col), n_tokens.alias("_n"),
                        F.col(text_col))
    slices = pack_sequences(counted, seq_len, "_n", id_col,
                            salt=salt, n_buckets=n_buckets)
    enc = encode_ids(df, vocab, text_col=text_col, id_col=id_col)
    if append_eos:
        eos_rows = df.select(
            F.col(id_col),
            F.size(tokens_col(F.col(text_col))).alias("pos"),
            F.lit(vocab["specials"][eos]).cast("long").alias("token_id"))
        enc = enc.unionByName(eos_rows)
    j = enc.join(slices, id_col)
    j = j.filter((F.col("pos") >= F.col("tok_from"))
                 & (F.col("pos") < F.col("tok_from") + F.col("n_toks")))
    return j.select(
        "seq_id",
        (F.col("seq_pos") + F.col("pos") - F.col("tok_from")).alias("pos"),
        "token_id")


def save_vocab(vocab: dict, path: str) -> None:
    """Persist a vocabulary. Token ids are the model's contract — every
    later encode/pack job MUST reuse the frozen assignment (re-deriving
    ids from a slightly different corpus silently re-numbers the
    embedding table) — so the table goes to parquet and the specials map
    to JSON, committed atomically last."""
    import json
    import os

    vocab["terms"].write.mode("overwrite").parquet(f"{path}/terms.parquet")
    tmp = f"{path}/meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump({"specials": vocab["specials"],
                   "n_specials": vocab["n_specials"]}, f)
    os.replace(tmp, f"{path}/meta.json")


def load_vocab(spark, path: str) -> dict:
    """Load a ``save_vocab`` vocabulary; encodes identically to the
    in-session original (integer ids — exact, pytest-asserted)."""
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    return {"terms": spark.read.parquet(f"{path}/terms.parquet"),
            "specials": {k: int(v) for k, v in meta["specials"].items()},
            "n_specials": int(meta["n_specials"])}
