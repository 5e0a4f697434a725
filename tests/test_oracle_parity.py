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


def test_no_rows_only_registrations():
    """Since round 10 EVERY registered query carries an oracle (the
    approx sketch twins were de-registered to operator parameters);
    this pins that invariant — a new oracle-less registration would
    reintroduce `err: no_oracle` rows in the driver ledger. If a
    rows-only surface ever becomes legitimate again, restore the
    per-name canonicalizer check this assertion replaced (git log)."""
    assert sorted(set(QUERIES) - set(ORACLE)) == []
