from __future__ import annotations

import os
import shutil

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


@pytest.fixture(scope="session")
def spark():
    from irkit_spark.config import get_spark
    sp = get_spark("irkit-tests", "*", 8)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp
    sp.stop()


@pytest.fixture(scope="session")
def pages_small(spark):
    """1000 synthesized pages (FIXTURES.md F1 pages_small, trimmed for
    suite speed; rank-identity statistics are already meaningful)."""
    from irkit_spark.sources.pages import pages_df
    return pages_df(spark, 1000)


@pytest.fixture(scope="session")
def index_small(spark, pages_small, tmp_path_factory):
    from irkit_spark.operators.build import build_index
    out = str(tmp_path_factory.mktemp("idx") / "small")
    shutil.rmtree(out, ignore_errors=True)
    metrics = build_index(spark, pages_small, out, docs_per_shard=300,
                          text_from_html=True)
    from irkit_spark.operators.query import Index
    return Index(spark, out), metrics
