"""Driver-contract regression guards: the correctness harness samples a
prefix of ``all_queries()``, so silent registration bugs — a misspelled
``_PRIORITY`` pin, two modules declaring the same query name, an entry
missing its oracle — would quietly shrink or corrupt the verified window
without failing any value-based test. These pin the contract itself."""

from __future__ import annotations

import kinesis_stream_spark.queries as qpkg
from kinesis_stream_spark.queries import all_oracle_sql, all_queries


def test_every_priority_pin_names_a_declared_query():
    declared = set(all_queries())
    missing = [n for n in qpkg._PRIORITY if n not in declared]
    assert not missing, f"_PRIORITY pins unknown queries: {missing}"


def test_sampled_window_is_fully_oracle_checkable():
    """Every window name carries a hash oracle, except the explicitly
    declared ROWS_ONLY set (sketch-backed approx twins whose values
    are Spark-specific by design — their exact twins carry the hash)."""
    names = list(all_queries())
    oracles = all_oracle_sql()
    window = names[:50]
    assert len(names) >= 50
    assert [
        n for n in window if n not in oracles and n not in qpkg.ROWS_ONLY
    ] == []
    # rows-only is a narrow, intentional exception — never a leak
    assert [n for n in qpkg.ROWS_ONLY if n in oracles] == []
    assert all(n.endswith("_approx") for n in qpkg.ROWS_ONLY)


def test_query_names_are_unique_across_modules():
    seen: dict[str, str] = {}
    clashes = []
    for module in qpkg._modules():
        for name in module.QUERIES:
            if name in seen:
                clashes.append((name, seen[name], module.__name__))
            seen[name] = module.__name__
    assert not clashes, f"duplicate query names overwrite silently: {clashes}"


def test_oracle_keys_never_exceed_queries():
    for module in qpkg._modules():
        extra = set(module.ORACLE) - set(module.QUERIES)
        assert not extra, f"{module.__name__}: oracles without queries {extra}"


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
