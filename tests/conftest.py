from __future__ import annotations

import pytest

from dgraph_dbpedia_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    spark = build_session(
        app_name="dgraph_dbpedia_spark-tests",
        shuffle_partitions=8,
        # UI on so the observability module's REST metrics are testable
        extra_conf={"spark.ui.enabled": "true"},
    )
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
