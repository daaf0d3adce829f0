"""Every registry query vs its DuckDB oracle — the driver's t2 gate."""

from __future__ import annotations

import pytest

from flink_gmall_spark.registry import registry
from tests.oracle import compare, duck_connection

QUERIES = registry()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name, spark, sf_dir, duck):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    compare(df, duck, q.oracle, name=name)
