"""Distributed multinomial Naive-Bayes text classification.

The fasttext-style linear classifier is the workhorse quality/domain
filter in large-scale training-data pipelines (CCNet and its descendants
score crawl text with a classifier trained wiki-vs-crawl and keep the
"looks like the reference corpus" tail; the same architecture drives
language-ID and topic routing). Multinomial NB over unigrams is the
scale-honest Spark formulation of that filter: training is ONE
(label, term) hash aggregation over the corpus — the model IS a small
DataFrame — and scoring is one token explode + one broadcastable join +
one per-doc aggregation, all codegen, no Python in the hot path.

The reference engine has no classifier (its admission predicate is a
static site list — services/IndexingServiceImpl.java); this module is
part of the training-data-pipeline surface built alongside the index.

Scale shape: train = explode + two hash aggs (term×label counts, label
totals); the model size is vocab×labels, independent of corpus size.
Score = explode + fan-out over L labels (constant, small) + left join
against the model (AQE broadcasts it when it fits) + one per-doc agg —
two shuffles at any corpus size.
"""

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searchengine_spark.functions.text import tokens_col

__all__ = ["train_nb", "nb_score", "nb_classify", "save_nb", "load_nb",
           "features_col"]


def _feat_from_tokens(tcol, ngram: int):
    """Feature array from a MATERIALIZED token-array column: unigrams, plus
    '_'-joined adjacent bigrams when ``ngram=2`` (the fasttext
    ``wordNgrams`` surface). ``tcol`` must be a plain column reference —
    passing the tokenizer expression would re-evaluate it once per use
    (the higher-order-function capture trap, docs/PLANS.md)."""
    if ngram == 1:
        return tcol
    if ngram != 2:
        raise ValueError("ngram must be 1 (unigrams) or 2 (+bigrams)")
    sz1 = F.greatest(F.size(tcol) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(F.slice(tcol, F.lit(1), sz1),
                         F.slice(tcol, F.lit(2), sz1),
                         lambda a, b: F.concat(a, F.lit("_"), b))
    return F.concat(tcol, bigrams)


def features_col(c, ngram: int = 1):
    """Tokenize + featurize in one expression (inspection/test helper —
    correct for any ngram, but at ngram=2 the tokenizer sub-expression
    evaluates more than once per row; the train/score paths materialize
    the token array first and should be preferred in pipelines)."""
    return _feat_from_tokens(tokens_col(c), ngram)


def _explode_features(df: DataFrame, text_col: str, ngram: int,
                      keep: "dict[str, str]") -> DataFrame:
    """(keep values..., term) — one row per feature occurrence; ``keep``
    maps source column → output name. The token array materializes in a
    projection first so the bigram zip_with reads a column, not a
    re-evaluated tokenizer expression."""
    t = df.select(*[F.col(s).alias(o) for s, o in keep.items()],
                  tokens_col(F.col(text_col)).alias("_toks"))
    return t.select(*[F.col(o) for o in keep.values()],
                    F.explode(_feat_from_tokens(F.col("_toks"), ngram))
                    .alias("term"))


def train_nb(df: DataFrame, label_col: str = "label",
             text_col: str = "text", alpha: float = 1.0,
             ngram: int = 1, complement: bool = False) -> dict:
    """Train multinomial Naive Bayes: P(term|label) with add-``alpha``
    smoothing over the GLOBAL vocabulary plus one shared OOV slot, and
    log priors from document counts.

    log P(t|y) = log((c(t,y) + alpha) / (N_y + alpha * (V + 1))); an
    unseen (t,y) pair — including genuinely OOV terms at scoring time —
    takes the same denominator with c=0, so every label scores every
    token and the comparison across labels stays calibrated.

    ``ngram=2`` adds '_'-joined adjacent-token bigrams to the feature set
    (fasttext ``wordNgrams=2``) — same aggregation, larger vocabulary;
    the model records the setting so scoring featurizes identically.

    ``complement=True`` trains COMPLEMENT NB (Rennie et al. 2003, the
    standard fix for class-imbalanced corpora): each label's feature
    weight comes from the counts of every OTHER label —
    w(t,y) = −log((Σ_{y'≠y} c(t,y') + alpha) / (N_¬y + alpha(V+1))) —
    so the rare class's parameters are estimated from the abundant
    complement data. Prediction is argmax(prior + Σ w) as usual. The
    conditional table is the dense vocab×labels grid (complement weights
    for c(t,y)=0 cells still depend on t through the term's total, so
    there is no shared OOV shortcut for in-vocab terms); labels are few
    by contract, so this is V×L rows — still a model-sized DataFrame.

    Returns {"cond": DataFrame[label, term, logp], "labels": [...],
    "priors": {label: logprior}, "oov": {label: logp}, "vocab": V,
    "ngram": ngram, "complement": complement}.
    The per-label reductions collect only L rows to the driver (the
    label set is small by contract — it's a classifier, not a join key).
    """
    toks = _explode_features(df, text_col, ngram, {label_col: "label"})
    cnt = (toks.groupBy("label", "term").agg(F.count("*").alias("c"))
           .localCheckpoint(eager=False))  # train once, score many
    v = cnt.select("term").distinct().count()
    totals = {r["label"]: int(r["n"])
              for r in cnt.groupBy("label").agg(F.sum("c").alias("n")).collect()}
    n_docs = df.count()
    doc_cnt = {r["label"]: int(r["c"]) for r in
               df.groupBy(F.col(label_col).alias("label"))
               .agg(F.count("*").alias("c")).collect()}
    labels = sorted(doc_cnt)
    priors = {y: math.log(doc_cnt[y] / n_docs) for y in labels}
    if complement:
        grand = sum(totals.values())
        den = {y: float((grand - totals.get(y, 0)) + alpha * (v + 1))
               for y in labels}
        den_map = F.create_map(*[x for y in labels
                                 for x in (F.lit(y), F.lit(den[y]))])
        lab = F.explode(F.array(*[F.lit(y) for y in labels])).alias("label")
        term_tot = cnt.groupBy("term").agg(F.sum("c").alias("tc"))
        grid = (term_tot.select("term", "tc", lab)
                .join(cnt, ["label", "term"], "left")
                .withColumn("cc", F.col("tc") - F.coalesce("c", F.lit(0))))
        cond = grid.select(
            "label", "term",
            (-F.log((F.col("cc") + F.lit(float(alpha)))
                    / den_map[F.col("label")])).alias("logp")) \
            .localCheckpoint(eager=False)
        oov = {y: -math.log(alpha / den[y]) for y in labels}
    else:
        den = {y: float(totals.get(y, 0) + alpha * (v + 1)) for y in labels}
        den_map = F.create_map(*[x for y in labels
                                 for x in (F.lit(y), F.lit(den[y]))])
        cond = cnt.select(
            "label", "term",
            F.log((F.col("c") + F.lit(float(alpha)))
                  / den_map[F.col("label")]).alias("logp"))
        oov = {y: math.log(alpha / den[y]) for y in labels}
    return {
        "cond": cond,
        "labels": labels,
        "priors": priors,
        "oov": oov,
        "vocab": v,
        "ngram": int(ngram),
        "complement": bool(complement),
    }


def nb_score(df: DataFrame, model: dict, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Full per-(doc, label) score matrix.

    Returns (id, label, n_tokens, score) where score is the LENGTH-
    NORMALIZED log-joint (log prior + Σ log P(t|y)) / (n_tokens + 1) —
    the same argmax as the raw sum (per-doc positive scaling) but with a
    bounded magnitude, so cross-engine float comparison stays stable at
    fixed rounding. Docs with zero tokens still score (prior only).

    Featurization follows the model (``ngram``): a bigram-trained model
    scores over unigrams+bigrams, and ``n_tokens`` counts FEATURES —
    matching the training denominators. Complement-NB models score with
    their stored (already-negated) weights through the identical plan;
    argmax semantics are unchanged.
    """
    labels = model["labels"]
    lab = F.explode(F.array(*[F.lit(y) for y in labels])).alias("label")
    oov_map = F.create_map(*[x for y in labels
                             for x in (F.lit(y), F.lit(model["oov"][y]))])
    prior_map = F.create_map(*[x for y in labels
                               for x in (F.lit(y), F.lit(model["priors"][y]))])
    toks = _explode_features(df, text_col, int(model.get("ngram", 1)),
                             {id_col: "_id"})
    per = (toks.select("_id", "term", lab)
           .join(model["cond"], ["label", "term"], "left")
           .withColumn("logp", F.coalesce(F.col("logp"),
                                          oov_map[F.col("label")]))
           .groupBy("_id", "label")
           .agg(F.count("*").alias("n_tokens"), F.sum("logp").alias("s")))
    # prior-only rows for token-less docs: left join from the full id set
    base = df.select(F.col(id_col).alias("_id")).select("_id", lab)
    out = (base.join(per, ["_id", "label"], "left")
           .select(F.col("_id").alias(id_col), "label",
                   F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
                   ((prior_map[F.col("label")] + F.coalesce("s", F.lit(0.0)))
                    / (F.coalesce("n_tokens", F.lit(0)) + F.lit(1.0)))
                   .alias("score")))
    return out


def nb_classify(df: DataFrame, model: dict, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Argmax prediction per document: (id, pred, n_tokens, score).

    Deterministic tie-break: highest score at 9-dp quantization, then
    lexicographically smallest label — reproducible across engines and
    partitionings (the engine-canonical rounding contract).
    """
    m = nb_score(df, model, text_col=text_col, id_col=id_col)
    best = F.min(F.struct((-F.round(F.col("score"), 9)).alias("ns"),
                          F.col("label").alias("y"),
                          F.col("score").alias("s"),
                          F.col("n_tokens").alias("nt")))
    g = m.groupBy(id_col).agg(best.alias("_b"))
    return g.select(id_col, F.col("_b.y").alias("pred"),
                    F.col("_b.nt").alias("n_tokens"),
                    F.col("_b.s").alias("score"))


def save_nb(model: dict, path: str) -> None:
    """Persist a trained model: the conditional table as parquet (the
    only corpus-sized piece) + the driver-side scalars as JSON — train
    once on the clean reference corpus, score any number of crawls from
    any later job (the CCNet deployment shape)."""
    import json
    import os

    model["cond"].write.mode("overwrite").parquet(f"{path}/cond.parquet")
    meta = {"labels": model["labels"], "priors": model["priors"],
            "oov": model["oov"], "vocab": model["vocab"],
            "ngram": int(model.get("ngram", 1)),
            "complement": bool(model.get("complement", False))}
    tmp = f"{path}/meta.json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{path}/meta.json")


def load_nb(spark, path: str) -> dict:
    """Load a ``save_nb`` model; scores match the in-session original at
    the engine's 9-dp quantization (the stored doubles are identical;
    per-doc summation order may differ across partitionings — pytest
    asserts round-9 score equality and identical argmax)."""
    import json

    with open(f"{path}/meta.json") as f:
        meta = json.load(f)
    return {"cond": spark.read.parquet(f"{path}/cond.parquet"),
            "labels": list(meta["labels"]),
            "priors": {k: float(v) for k, v in meta["priors"].items()},
            "oov": {k: float(v) for k, v in meta["oov"].items()},
            "vocab": int(meta["vocab"]),
            "ngram": int(meta.get("ngram", 1)),
            "complement": bool(meta.get("complement", False))}
