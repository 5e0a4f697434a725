"""Vectorized Python UDF surface: scalar ``pandas_udf``, grouped-agg
``pandas_udf``, ``applyInPandas``, ``mapInPandas``.

Reference scope note: the reference delegates all record processing to
user-side Akka stages (`examples/src/main/scala/Main.scala:22` maps over
payloads); the Spark equivalent of "user code in the stream" is this
surface. Row-at-a-time Python UDFs are deliberately absent — every entry
point here is Arrow-batched (10-100× the per-row path).

Determinism contract (what makes these oracle-checkable): inputs that are
integral-valued stay exact in float64 up to 2^53, so sums are
order-independent; every non-exact step is a single IEEE op on exact
inputs. Group UDFs sort by key inside the function — partition order is
never load-bearing.

Scale notes: scalar pandas_udfs pipeline per-batch (no shuffle);
``applyInPandas`` shuffles once on the group key and each group must fit
in one worker's memory — groups here are O(rows/key); skewed keys would
need salting or pre-aggregation first. ``mapInPandas`` is pure map-side.
"""

from __future__ import annotations

import sys
from collections.abc import Iterator

import pandas as pd

from pyspark import cloudpickle
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@F.pandas_udf(StringType())
def price_band(price: pd.Series) -> pd.Series:
    """Scalar pandas_udf: classify a price into a band. Arrow-batched;
    the whole Series is vectorized pandas (no per-row Python)."""
    return pd.cut(
        price,
        bins=[float("-inf"), 950.0, 1050.0, float("inf")],
        labels=["low", "mid", "high"],
    ).astype(str)


@F.pandas_udf(DoubleType())
def weighted_revenue(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Scalar pandas_udf over two columns: price * (1 - discount).
    Per-row IEEE arithmetic — deterministic in any engine."""
    return price * (1.0 - discount)


@F.pandas_udf(DoubleType())
def mean_quantity_agg(qty: pd.Series) -> float:
    """Grouped-agg pandas_udf: exact mean (integral quantities sum
    exactly in float64; one final divide)."""
    return float(qty.sum()) / len(qty)


ZSCORE_SCHEMA = StructType(
    [
        StructField("l_suppkey", LongType()),
        StructField("l_orderkey", LongType()),
        StructField("l_linenumber", LongType()),
        StructField("l_quantity", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)


def zscore_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas body: population z-score of quantity within the
    group. Sorts by (orderkey, linenumber) first so nothing depends on
    arrival order; sums of integral quantities are float64-exact."""
    import math

    pdf = pdf.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)
    q = pdf["l_quantity"]
    n = len(q)
    mean = float(q.sum()) / n
    var = float((q * q).sum()) / n - mean * mean
    # math.sqrt, NOT var**0.5: ** goes through libm pow, which is not
    # correctly rounded — one ulp off sqrt in ~1/500 groups (caught by
    # the sf0.1 parity sweep); IEEE sqrt is exact-rounded everywhere
    std = math.sqrt(var) if var > 0 else 0.0
    pdf["zscore"] = (q - mean) / std if std > 0 else q * 0.0
    return pdf[["l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "zscore"]]


TOKENIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pos", LongType()),
        StructField("token", StringType()),
    ]
)


def tokenize_map_in_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body: 1 input row → N token rows (positional
    tokenization). The UDTF-ish shape: batch in, differently-sized batch
    out, no shuffle."""
    for pdf in batches:
        toks = pdf["text"].str.split()
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].repeat(toks.map(len)).astype("int64"),
                "pos": [p + 1 for ts in toks for p in range(len(ts))],
                "token": [t for ts in toks for t in ts],
            }
        )


def apply_zscore(lineitem: DataFrame) -> DataFrame:
    """Per-supplier quantity z-scores via applyInPandas (one shuffle on
    the group key)."""
    return lineitem.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity"
    ).groupBy("l_suppkey").applyInPandas(zscore_per_group, ZSCORE_SCHEMA)


CHAR_STATS_ARROW_SCHEMA = "doc_id long, n_chars long, n_digits long, n_spaces long"


def char_stats_map_in_arrow(batches):
    """mapInArrow body: per-document character statistics computed with
    pyarrow.compute kernels directly on the Arrow RecordBatch — no
    pandas materialization at all, the lowest-overhead Python entry
    point Spark offers. Counts are exact integers (codepoint length,
    regex digit matches, space occurrences), so the DuckDB oracle
    reproduces them bit-for-bit."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column("text")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("doc_id"),
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(pc.count_substring_regex(text, "[0-9]"), pa.int64()),
                pc.cast(pc.count_substring(text, " "), pa.int64()),
            ],
            names=["doc_id", "n_chars", "n_digits", "n_spaces"],
        )


# Ship these function bodies inside the serialized task instead of as an
# import reference: executors (and the driver harness's Python workers)
# must not need `kinesis_stream_spark` importable on their own sys.path.
cloudpickle.register_pickle_by_value(sys.modules[__name__])
