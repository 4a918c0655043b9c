import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linktransformer_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("LT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    import tempfile

    # LT_TEST_MASTER / LT_TEST_SHUFFLE: the round-end robustness
    # layouts (local[3]/shuffle=3 adversarial, local[16]/shuffle=64)
    # without editing this file — each layout has caught real bugs
    s = get_spark(
        "lt-tests",
        master=os.environ.get("LT_TEST_MASTER", "local[8]"),
        shuffle_partitions=int(os.environ.get("LT_TEST_SHUFFLE", "8")),
        extra_conf={
            # keep catalog artifacts (saveAsTable warehouse) out of the repo
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="lt_wh_"),
            # the suite runs thousands of tiny jobs; the UI server adds
            # startup cost and per-job/stage bookkeeping nobody reads in
            # CI — production sessions (session.get_spark defaults) keep
            # it on
            "spark.ui.enabled": os.environ.get("LT_TEST_UI", "false"),
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()
