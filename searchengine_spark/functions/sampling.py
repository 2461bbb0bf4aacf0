"""Deterministic sampling / data-mixing operators for training-data
pipelines.

A 100 TB pretraining pipeline needs to (a) downsample each source/quality
stratum at its own rate and (b) cap each stratum at a token budget — and
both must be DETERMINISTIC: re-running the job, changing the partition
layout, or re-implementing the selection in another engine must pick the
SAME rows (Spark's ``sample``/``sampleBy`` are seeded per-partition-split
and reproduce only under an identical physical layout). Selection here is
a pure function of the row key:

    h(key) = (((key mod 1_000_000_007) + salt) * 1103515245 + 12345) mod 2^31

— an LCG step over a 31-bit space, chosen over xxhash64/crc32 because it
is exactly reproducible in ANSI SQL (the DuckDB oracles recompute it
verbatim; Spark's xxhash64 is not available driver/oracle-side). All
arithmetic stays within int64 (max operand ≈ 1e9 · 1.1e9 ≈ 1.2e18).

Scale notes: ``stratified_sample`` is one codegen filter — no shuffle, no
UDF, survives any corpus size. ``token_budget_mix`` needs a per-stratum
prefix sum over the hash order; a naive window would put each stratum on
ONE partition, so it runs the indexer's bucketed two-phase plan instead:
per-(stratum, hash-bucket) token sums (a small agg), a driver-side prefix
over the ≤ n_buckets ordered buckets to locate each stratum's boundary
bucket, then an exact windowed cumsum ONLY inside boundary buckets
(1/n_buckets of each stratum). Wholly-kept buckets pass with a codegen
range check.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

HASH_SPACE = 2 ** 31
_P, _A, _C = 1_000_000_007, 1103515245, 12345


def det_hash_col(key: Column, salt: int = 0) -> Column:
    """31-bit deterministic hash of an integer key (module docstring);
    portable: the same expression evaluates identically in ANSI SQL."""
    m = F.pmod(key.cast("long"), F.lit(_P)) + F.lit(int(salt))
    return F.pmod(m * F.lit(_A) + F.lit(_C), F.lit(HASH_SPACE))


def stratified_sample(df: DataFrame, fractions: dict, strata_col: str,
                      key_col: str, salt: int = 0,
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep each stratum at its own rate, deterministically: row kept iff
    h(key) < fraction[stratum] · 2^31. ``fractions`` maps stratum value →
    [0, 1] rate; strata absent from the map get ``default_fraction``.
    One codegen filter (literal-map lookup, no join, no shuffle); exact
    reproducibility across runs, layouts, and engines."""
    fmap = F.create_map(*[F.lit(x) for v, frac in fractions.items()
                          for x in (v, float(frac))])
    frac = F.coalesce(fmap[F.col(strata_col)], F.lit(float(default_fraction)))
    thresh = (frac * F.lit(float(HASH_SPACE))).cast("long")
    return df.filter(det_hash_col(F.col(key_col), salt) < thresh)


def token_budget_mix(df: DataFrame, budgets: dict, strata_col: str,
                     token_col: str, key_col: str, salt: int = 0,
                     n_buckets: int = 1024) -> DataFrame:
    """Cap each stratum at a token budget, taking rows in deterministic
    hash order (a reproducible shuffle): for each stratum keep the maximal
    prefix of rows ordered by (h(key), key) whose running ``token_col``
    sum stays ≤ budgets[stratum]. Strata absent from ``budgets`` are
    dropped. Returns the kept rows (original columns).

    Exactly equivalent to a per-stratum ordered cumsum filter, but planned
    as: (1) one small agg of token sums per (stratum, h(key)//(2^31/B))
    bucket, (2) a driver-side prefix over each stratum's ≤ B ordered
    buckets → wholly-kept buckets + the boundary bucket's remaining
    budget, (3) a codegen filter for whole buckets plus an exact windowed
    cumsum restricted to boundary buckets (each 1/B of its stratum). No
    stratum ever lands on a single partition.
    """
    bw = HASH_SPACE // int(n_buckets)
    h = det_hash_col(F.col(key_col), salt)
    t = df.withColumn("_h", h).withColumn("_b", F.floor(F.col("_h") / bw))
    sums = (t.groupBy(strata_col, "_b")
            .agg(F.sum(F.col(token_col).cast("long")).alias("_toks"))
            .collect())
    per: dict = {}
    for r in sums:
        per.setdefault(r[strata_col], []).append((r["_b"], r["_toks"]))
    keep_whole = []   # (stratum, max whole bucket)
    boundary = []     # (stratum, boundary bucket, remaining budget)
    for s, rows in per.items():
        if s not in budgets:
            continue
        left = int(budgets[s])
        for b, toks in sorted(rows):
            if toks <= left:
                left -= toks
                keep_whole.append((s, b))
            else:
                if left > 0:
                    boundary.append((s, b, left))
                break
    if not keep_whole and not boundary:
        return df.filter(F.lit(False))
    # whole buckets: per-stratum contiguous prefixes would allow a range
    # check, but budget exhaustion can split them — a literal (stratum,
    # bucket) set is still tiny (≤ |strata|·B) and stays a broadcast join
    spark = df.sparkSession
    out_parts = []
    if keep_whole:
        wdf = F.broadcast(spark.createDataFrame(
            keep_whole, f"{strata_col} string, _b long"))
        out_parts.append(t.join(wdf, [strata_col, "_b"], "left_semi"))
    if boundary:
        bdf = F.broadcast(spark.createDataFrame(
            boundary, f"{strata_col} string, _b long, _left long"))
        w = (Window.partitionBy(strata_col, "_b")
             .orderBy(F.col("_h").asc(), F.col(key_col).asc()))
        bounded = (t.join(bdf, [strata_col, "_b"])
                   .withColumn("_cum", F.sum(F.col(token_col).cast("long"))
                               .over(w))
                   .filter(F.col("_cum") <= F.col("_left"))
                   .drop("_cum", "_left"))
        out_parts.append(bounded)
    out = out_parts[0] if len(out_parts) == 1 else \
        out_parts[0].unionByName(out_parts[1])
    return out.select(*df.columns)


def split_corpus(df: DataFrame, fractions: "dict[str, float]",
                 key_col: str, salt: int = 0) -> DataFrame:
    """Deterministic train/val/test split: assign each row to a named
    split by its hash's position in the [0, 2^31) space, partitioned
    proportionally to ``fractions`` (values must sum to ≤ 1; any
    remainder is unassigned and dropped — use an explicit fraction for
    every split you want). The assignment is a pure function of the row
    key (the module's portable LCG), so it is reproducible across runs,
    layouts, and engines, and DISJOINT by construction — the split
    boundaries are cumulative thresholds over one hash draw, never N
    independent samples. Returns ``df`` plus a ``split`` column.

    Splits are named in INSERTION order of ``fractions`` (dicts
    preserve it): {"train": .8, "val": .1, "test": .1} lays train on
    [0, .8), val on [.8, .9), test on [.9, 1.0)."""
    total = sum(float(v) for v in fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    if any(float(v) < 0 for v in fractions.values()):
        raise ValueError("fractions must be >= 0")
    h = det_hash_col(F.col(key_col), salt)
    expr, lo = None, 0.0
    for name, frac in fractions.items():
        hi = lo + float(frac)
        cond = (h >= F.lit(int(lo * HASH_SPACE))) & \
               (h < F.lit(int(hi * HASH_SPACE)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo = hi
    return (df.withColumn("split", expr)
            .filter(F.col("split").isNotNull()))


def temperature_budgets(sizes: dict, alpha: float, budget: int) -> dict:
    """Water-filled temperature targets: stratum s gets a share of
    ``budget`` proportional to size_s^alpha (the multilingual-LM
    exponentiated-smoothing rule — alpha=1 is natural proportions,
    alpha=0 uniform, alpha≈0.3-0.7 the usual upsample-the-tail range),
    clamped at its actual size with the excess re-distributed over the
    unclamped strata (iterative water-filling, deterministic driver-side
    loop over ≤ |strata| rounds). Returns {stratum: integer target}."""
    if not 0.0 <= float(alpha) <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    if budget < 0:
        raise ValueError("budget must be >= 0")
    open_s = {s: int(n) for s, n in sizes.items() if n > 0}
    out = {s: 0 for s in sizes}
    left = int(budget)
    while open_s and left > 0:
        wsum = sum(n ** alpha for n in open_s.values())
        tgt = {s: int(left * (n ** alpha) / wsum)
               for s, n in open_s.items()}
        clamped = {s for s, t in tgt.items() if t >= open_s[s]}
        if not clamped:
            # give floors; the ≤|strata| rounding leftover goes to the
            # largest-weight strata in sorted order (deterministic)
            rem = left - sum(tgt.values())
            order = sorted(open_s, key=lambda s: (-open_s[s], s))
            for s in order[:rem]:
                tgt[s] += 1
            for s, t in tgt.items():
                out[s] += min(t, open_s[s])
            break
        for s in clamped:
            out[s] += open_s[s]
            left -= open_s.pop(s)
    return out


def temperature_mix(df: DataFrame, strata_col: str, key_col: str,
                    alpha: float = 0.5, budget: int = 0,
                    token_col: "str | None" = None,
                    salt: int = 0, n_buckets: int = 1024) -> DataFrame:
    """Temperature-based corpus mixing: allocate a global ``budget``
    (documents, or tokens when ``token_col`` is given) across strata
    proportionally to size^alpha (``temperature_budgets``), then take
    each stratum's allocation in the deterministic hash order
    (``token_budget_mix`` — exact budgets, reproducible across runs,
    layouts, and engines). One small per-stratum size aggregation plus
    the budget-mix plan; no stratum ever lands on one partition."""
    unit = (F.col(token_col).cast("long") if token_col is not None
            else F.lit(1).cast("long"))
    sizes = {r[strata_col]: int(r["_n"]) for r in
             df.groupBy(strata_col).agg(F.sum(unit).alias("_n")).collect()}
    budgets = temperature_budgets(sizes, alpha, budget)
    if token_col is not None:
        return token_budget_mix(df, budgets, strata_col, token_col,
                                key_col, salt, n_buckets)
    out = token_budget_mix(df.withColumn("_one", F.lit(1)),
                           budgets, strata_col, "_one", key_col,
                           salt, n_buckets)
    return out.drop("_one")


def pack_sequences(df: DataFrame, seq_len: int, token_col: str,
                   key_col: str, salt: int = 0,
                   n_buckets: int = 1024) -> DataFrame:
    """Concat-then-chunk sequence packing: lay every document's tokens out
    on ONE global stream in deterministic hash order (the reproducible
    shuffle ``token_budget_mix`` uses), then cut the stream into training
    sequences of exactly ``seq_len`` tokens — the GPT-style packing step
    that turns a filtered corpus into fixed-length samples. Documents
    crossing a boundary are split; output is one row per (doc, sequence)
    slice:

        (key, seq_id, seq_pos, tok_from, n_toks)

    — slice covers doc tokens [tok_from, tok_from + n_toks) and lands at
    position ``seq_pos`` of sequence ``seq_id``. Zero-token docs drop.

    The global offset of each doc is a corpus-wide prefix sum — the same
    bucketed two-phase plan as ``token_budget_mix``, but EVERY bucket
    needs its exact within-bucket cumsum (each window partition is 1/B of
    the corpus; no global single-partition window ever runs): one small
    agg for per-bucket token sums, a driver-side prefix over ≤ B ordered
    buckets, then a windowed cumsum per bucket plus the bucket's base.
    The boundary explode is ``sequence(first_seq, last_seq)`` in codegen —
    a doc spanning s sequences emits s rows, no Python anywhere."""
    L = int(seq_len)
    if L <= 0:
        raise ValueError("seq_len must be positive")
    bw = HASH_SPACE // int(n_buckets)
    # narrow to (key, tokens) and checkpoint: token_col is usually derived
    # from the text (a full tokenizer pass) and this table is read twice
    # (bucket sums, then the cumsum) — checkpointing the ~32-byte/row
    # projection means ONE corpus scan, not two
    t = (df.filter(F.col(token_col) > 0)
         .select(F.col(key_col), F.col(token_col))
         .withColumn("_h", det_hash_col(F.col(key_col), salt))
         .withColumn("_b", F.floor(F.col("_h") / bw))
         .localCheckpoint(eager=False))
    sums = (t.groupBy("_b")
            .agg(F.sum(F.col(token_col).cast("long")).alias("_toks"))
            .collect())
    base, prefix = 0, {}
    for b, toks in sorted((r["_b"], r["_toks"]) for r in sums):
        prefix[b] = base
        base += toks
    if not prefix:
        return df.sparkSession.createDataFrame(
            [], f"{key_col} long, seq_id long, seq_pos long, "
                f"tok_from long, n_toks long")
    base_map = F.create_map(
        *[x for b, p in prefix.items() for x in (F.lit(int(b)), F.lit(int(p)))])
    w = Window.partitionBy("_b").orderBy(F.col("_h").asc(), F.col(key_col).asc())
    toks = F.col(token_col).cast("long")
    placed = (t.withColumn("_cum", F.sum(toks).over(w))
              .withColumn("_start", base_map[F.col("_b")] + F.col("_cum") - toks)
              .withColumn("_end", base_map[F.col("_b")] + F.col("_cum")))
    seq = F.explode(F.sequence(
        F.floor(F.col("_start") / L), F.floor((F.col("_end") - 1) / L)))
    sliced = placed.select(F.col(key_col), F.col("_start"), F.col("_end"),
                           seq.alias("seq_id"))
    s0 = F.greatest(F.col("_start"), F.col("seq_id") * L)
    s1 = F.least(F.col("_end"), (F.col("seq_id") + 1) * L)
    return (sliced
            .withColumn("seq_pos", s0 - F.col("seq_id") * L)
            .withColumn("tok_from", s0 - F.col("_start"))
            .withColumn("n_toks", s1 - s0)
            .select(key_col, "seq_id", "seq_pos", "tok_from", "n_toks"))
