"""Local mirror of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables
and compares row count, column-name set, and order-insensitive values —
the same three checks the driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math
from decimal import Decimal

import duckdb
import pandas as pd

from kinesis_stream_spark.sources.batch import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetch_df()
    finally:
        con.close()


def _canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    if hasattr(v, "tolist"):  # numpy scalar or array
        return _canon_cell(v.tolist())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def _driver_unsafe_columns(pdf: pd.DataFrame) -> list[str]:
    """Columns whose cells a pandas-based canonicalizer cannot hash/sort.

    The round-1 driver crashed (``TypeError: unhashable type 'list'``) on
    array-typed result columns; our local canon tolerated them, so the
    break was invisible until the external gate ran. Flag nested types
    here so every query keeps a flat, tabular result schema.
    """
    bad = []
    for col in pdf.columns:
        for v in pdf[col]:
            if v is None:
                continue
            if isinstance(v, (list, tuple, dict, set)) or (
                hasattr(v, "tolist") and getattr(v, "ndim", 0) >= 1
            ):
                bad.append(col)
            break  # first non-null cell decides
    return bad


def _dtype_kind_mismatches(spdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Columns whose pandas dtype *kind* differs between the two engines.

    Round 1's q12 failed the driver's hash gate with identical values:
    DuckDB SUM(INTEGER) yields HUGEINT, which ``fetch_df`` widens to
    float64, while Spark's BIGINT sum stays int64 — a driver-visible
    type mismatch our value-level canon coerced away. Compare dtype
    kinds (int vs float vs object ...) so those surface locally.
    """
    bad = []
    for col in spdf.columns:
        if col not in oracle_pdf.columns:
            continue
        a, b = spdf[col].dtype.kind, oracle_pdf[col].dtype.kind
        # treat signed/unsigned int as one kind; object-vs-anything is
        # ambiguous when a column is all-null on one side
        norm = {"u": "i"}
        a, b = norm.get(a, a), norm.get(b, b)
        if a != b and not (spdf[col].isna().all() or oracle_pdf[col].isna().all()):
            bad.append(f"{col}: spark={spdf[col].dtype} oracle={oracle_pdf[col].dtype}")
    return bad


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    spdf = spark_df.toPandas()
    for side, pdf in (("spark", spdf), ("oracle", oracle_pdf)):
        unsafe = _driver_unsafe_columns(pdf)
        if unsafe:
            problems.append(f"driver-unsafe nested columns on {side} side: {unsafe}")
    for m in _dtype_kind_mismatches(spdf, oracle_pdf):
        problems.append(f"dtype kind mismatch: {m}")
    if sorted(spdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"schema: spark={sorted(spdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
    a, b = canonical_rows(spdf), canonical_rows(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        sample = diffs[:3] if diffs else [(a[:2], b[:2])]
        problems.append(f"values differ ({len(diffs)} zipped diffs); sample: {sample}")
    return problems
