from __future__ import annotations

import os

import pytest

from fluent_bit_filter_math_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # Small parallelism for unit tests — data is tiny, JVM startup dominates.
    s = get_spark("fbm-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


def reader_rows(reader, partition):
    """Materialize a datasource reader's output as plain tuples — the
    table-format readers yield pyarrow RecordBatches since r16 (Arrow
    batches instead of pickled rows, guide §4)."""
    rows = []
    for batch in reader.read(partition):
        rows.extend(zip(*(c.to_pylist() for c in batch.columns)))
    return rows
