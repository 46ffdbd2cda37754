"""Every registry query with an oracle must match it exactly at sf0.001.

This is a stricter local version of the driver's t2 gate (which runs at
sf0.01): exact value equality instead of rounded hashes.
"""

import pytest

from amazonmsk_emr_tem_data_spark.queries import REGISTRY

from .oracle_utils import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


ORACLE_QUERIES = [name for name, (_, sql) in REGISTRY.items() if sql is not None]
ROWS_ONLY_QUERIES = [name for name, (_, sql) in REGISTRY.items() if sql is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, sf_dir, con, name):
    fn, sql = REGISTRY[name]
    compare(fn(spark, sf_dir), con, sql)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
