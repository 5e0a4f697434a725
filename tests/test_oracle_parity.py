"""Mirror of the driver's t2 gate: every queries() entry with an oracle
must hash-match DuckDB on the same tables (run locally at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from kinesis_stream_spark.queries import all_oracle_sql, all_queries
from kinesis_stream_spark.testing import compare, run_oracle

QUERIES = all_queries()
ORACLE = all_oracle_sql()


def test_every_oracle_key_has_query():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    odf = run_oracle(ORACLE[name], sf_dir)
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only(spark, sf_dir, name):
    from kinesis_stream_spark.testing import _driver_unsafe_columns

    df = QUERIES[name](spark, sf_dir)
    pdf = df.toPandas()
    assert len(pdf) >= 0
    # rows-only queries still pass through the driver's canonicalizer
    assert not _driver_unsafe_columns(pdf)
