"""Per-facet top hits (search_top_hits — the ES top_hits aggregation).
"""

from __future__ import annotations


def test_search_top_hits(index_general):
    """Per-facet top hits == per-facet slices of the full ranked match
    set; ranks are 1..m per facet and respect the canonical ordering."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.search import (search_select,
                                                     search_top_hits)
    by = F.substring(F.col("conv_id"), 2, 1)
    out = search_top_hits(index_general, "лес дом", by=by, m=2)
    rows = out.collect()
    sel = search_select(index_general, "лес дом").withColumn(
        "facet", by.cast("string")).collect()
    import collections
    exp = collections.defaultdict(list)
    for r in sorted(sel, key=lambda r: (-round(r["score"], 9),
                                        r["doc_id"])):
        exp[r["facet"]].append(r["doc_id"])
    for r in rows:
        assert exp[r["facet"]][r["rank"] - 1] == r["doc_id"]
    per = collections.Counter(r["facet"] for r in rows)
    for f, docs in exp.items():
        assert per[f] == min(2, len(docs))
