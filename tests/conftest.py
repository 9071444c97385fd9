from __future__ import annotations

import pytest

from neighborly_spark.session import get_spark

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="neighborly-spark-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_vectors(spark):
    """Hand-written fixture mirroring FIXTURES.md §4 / Tests/VectorDatabaseTests.cs."""
    rows = [
        ("v1", [1.0, 2.0, 3.0], [1], "apple pie"),
        ("v2", [4.0, 5.0, 6.0], [1, 2], "banana split"),
        ("v3", [2.0, 3.0, 4.0], [2], "cherry tart"),
        ("v4", [0.0, 0.0, 0.0], [], "plain"),
        # ties: v5/v6 equidistant from origin -> id tiebreak
        ("v5", [1.0, 0.0, 0.0], [3], "x unit"),
        ("v6", [0.0, 1.0, 0.0], [3], "y unit"),
        ("v7", [10.0, 10.0, 10.0], [4], "far away"),
        ("v8", [-1.0, -2.0, -3.0], [5], "negative"),
    ]
    df = spark.createDataFrame(rows, "id string, embedding array<float>, tags array<smallint>, original_text string")
    return df.cache()
