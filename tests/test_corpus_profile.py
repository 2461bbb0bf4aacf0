"""corpus_profile: exact per-stratum token distribution stats."""

from searchengine_spark.functions.text import corpus_profile


def test_profile_exact_percentiles(spark):
    rows = [("en", "a " * n) for n in (1, 2, 3, 4, 10)] + \
           [("de", "x " * n) for n in (5, 5)]
    df = spark.createDataFrame(rows, "lang string, text string")
    got = {r["lang"]: r for r in corpus_profile(df, by="lang").collect()}
    en, de = got["en"], got["de"]
    assert en["n_docs"] == 5 and en["total_tokens"] == 20
    # p50 of [1,2,3,4,10] = 3; p90 interpolates between 4 and 10 at 0.6
    assert en["p50_tokens"] == 3.0
    assert abs(en["p90_tokens"] - (4 + 0.6 * 6)) < 1e-9
    assert de["n_docs"] == 2 and de["p50_tokens"] == 5.0
    assert abs(en["mean_tokens"] - 4.0) < 1e-12


def test_profile_multi_key(spark):
    df = spark.createDataFrame(
        [("en", "s1", "one two"), ("en", "s2", "one"), ("en", "s1", "x y z")],
        "lang string, source string, text string")
    out = corpus_profile(df, by=["lang", "source"]).collect()
    got = {(r["lang"], r["source"]): r["total_tokens"] for r in out}
    assert got == {("en", "s1"): 5, ("en", "s2"): 1}
