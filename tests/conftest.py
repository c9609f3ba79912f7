from __future__ import annotations

import pytest

from hgcn_name_disambiguation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
        # one long-lived JVM serves the whole suite; broadcast vars +
        # cached fixtures accumulate, and the default 1g heap runs out
        # of broadcast-build memory late in the run.
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s


@pytest.fixture(scope="session")
def fixture_repo_files(spark):
    from hgcn_name_disambiguation_spark.fixtures import repo_files_dataframe

    df = repo_files_dataframe(
        spark, seed=42, blocks=4, pubs_per_block=25, skew_factor=4
    ).cache()
    df.count()
    return df
