#!/usr/bin/env python
"""Deterministic scale-up of the driver's sf0.1 fixture for SCALING
measurements (VERDICT r12 item 2: at sf0.1 the heavy tail is
fixed-overhead-bound — the 8-core full run beat the 32-core run — so
parallelism wins have nothing to measure against).

Writes /root/testdata_scaled/sf{0.3,1}/<table>.parquet as K shifted
copies of /root/testdata/sf0.1 (K = 3 / 10). The driver's fixture is
NEVER modified; the output lives outside the repo and is rebuilt from
the parquet inputs on every invocation (nothing here is a query result
or a cached intermediate — it is measurement INPUT, used only via
``SPARK_GRAFT_SF_DIR`` in scaling runs recorded in OPTIMIZATION_r13.md).

Copy discipline (copy 0 is the untouched original):

- ``region``/``nation`` are TPC-H-fixed dimensions: one copy.
- Fact/dim keys shift by ``i * OFF`` (OFF = 10M >> every key range and
  >> the COPY_OFFSET=100k some dedup queries add), so referential
  integrity holds WITHIN each copy and copy key ranges never collide.
- ``documents.text``: every token of copy i > 0 gets a ``k<i>`` prefix
  (n_chars recomputed). Copies are therefore shingle-disjoint — the
  dedup/LSH workload grows LINEARLY in K, mirroring a real corpus,
  instead of every doc acquiring K-1 spurious near-duplicates.
- ``embeddings.embedding``: copy i is the cyclic rotation of the
  original by 7*i dims (same norm/distribution, decorrelated), so ANN
  candidate structure scales instead of collapsing into K-way ties.
- ``part.p_name`` stays IDENTICAL across copies: TPC-H part names draw
  from a fixed color vocabulary, so at higher SF the per-block name
  population genuinely grows ~K and blocked pair work ~K^2 — the honest
  quadratic scaling of the fuzzy-join workload.
- ``events.ts`` is TIMESTAMP(NANOS); DuckDB round-trips it as
  TIMESTAMP_NS, which the engine's loader already handles.

Determinism: pure column transforms of deterministic inputs — no RNG,
no time. Re-running reproduces byte-identical logical content.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST_ROOT = "/root/testdata_scaled"
OFF = 10_000_000

#: (table, [key columns shifted by i*OFF])
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STATIC = ("region", "nation")


def _copy_select(con: duckdb.DuckDBPyConnection, table: str, i: int) -> str:
    cols = [r[0] for r in con.execute(
        f"describe select * from read_parquet('{SRC}/{table}.parquet')"
    ).fetchall()]
    exprs = []
    for c in cols:
        if c in SHIFT.get(table, []):
            exprs.append(f"{c} + {i * OFF} AS {c}")
        elif table == "documents" and c == "text" and i > 0:
            exprs.append(f"regexp_replace(text, '(\\S+)', 'k{i}\\1', 'g') AS text")
        elif table == "documents" and c == "n_chars" and i > 0:
            exprs.append(
                f"CAST(length(regexp_replace(text, '(\\S+)', 'k{i}\\1', 'g'))"
                " AS BIGINT) AS n_chars"
            )
        elif table == "embeddings" and c == "embedding" and i > 0:
            s = (7 * i) % 64
            exprs.append(
                "CAST(list_transform(range(64),"
                f" j -> embedding[((j + {s}) % 64) + 1]) AS FLOAT[]) AS embedding"
            )
        else:
            exprs.append(c)
    return f"SELECT {', '.join(exprs)} FROM read_parquet('{SRC}/{table}.parquet')"


def build(k: int, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t in STATIC:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
            f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in SHIFT:
        union = " UNION ALL ".join(_copy_select(con, t, i) for i in range(k))
        con.execute(f"COPY ({union}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(f"select count(*) from read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{dst}/{t}.parquet rows={n}", flush=True)


if __name__ == "__main__":
    targets = sys.argv[1:] or ["0.3", "1"]
    for sf in targets:
        k = round(float(sf) / 0.1)
        build(k, os.path.join(DST_ROOT, f"sf{sf}"))
