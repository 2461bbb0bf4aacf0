from __future__ import annotations

import pytest

from searchengine_spark.plans.session import get_spark
from searchengine_spark.sources.fixtures import transcripts_df, transcripts_pdf
from tests.golden_model import GoldenIndex

N_CONV = 60  # ~1.2k turns: big enough for real df/tie structure, fast enough for CI


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    return transcripts_pdf(N_CONV)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return transcripts_df(spark, N_CONV)


@pytest.fixture(scope="session")
def golden_general(corpus_pdf):
    return GoldenIndex(corpus_pdf.to_dict("records"), mode="general")


@pytest.fixture(scope="session")
def golden_ref(corpus_pdf):
    return GoldenIndex(corpus_pdf.to_dict("records"), mode="ref_compat")


def _built(corpus_df, mode):
    from searchengine_spark.operators.indexer import build_index
    # small bucket_range/block_size so salting + multi-block paths are exercised
    idx = build_index(corpus_df, mode=mode, bucket_range=256, block_size=32)
    idx["postings"].count()  # materialize the persisted index once per session
    idx["terms"].count()
    idx["postings_flat"] = idx["postings_flat"].persist()
    idx["postings_flat"].count()
    return idx


@pytest.fixture(scope="session")
def index_general(corpus_df):
    return _built(corpus_df, "general")


@pytest.fixture(scope="session")
def index_ref(corpus_df):
    return _built(corpus_df, "ref_compat")


def load_queries() -> list[str]:
    import pathlib
    p = pathlib.Path(__file__).parent / "queries.txt"
    return [ln for ln in p.read_text().splitlines() if ln and not ln.startswith("#")]
