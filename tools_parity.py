"""Ad-hoc parity runner: python tools_parity.py <name>... [--sf DIR]

Runs named queries() entries against their oracle_sql() twins the way
the driver does (row count + schema + value hash), at sf0.001 by
default. Session scratch tool, not part of the driver contract.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from kinesis_stream_spark.queries import all_oracle_sql, all_queries
from kinesis_stream_spark.session import get_spark
from kinesis_stream_spark.testing import compare, run_oracle


def main() -> int:
    argv = sys.argv[1:]
    args: list[str] = []
    sf = "/root/testdata/sf0.001"
    i = 0
    while i < len(argv):
        if argv[i] == "--sf":
            sf = argv[i + 1]
            i += 2
        else:
            args.append(argv[i])
            i += 1
    queries, oracle = all_queries(), all_oracle_sql()
    spark = get_spark("parity-scratch")
    bad = 0
    for name in args:
        t0 = time.time()
        sdf = queries[name](spark, sf)
        if name not in oracle:
            n = sdf.count()
            print(f"{name}: rows-only, {n} rows, {time.time()-t0:.1f}s")
            continue
        odf = run_oracle(oracle[name], sf)
        problems = compare(sdf, odf)
        dt = time.time() - t0
        if problems:
            bad += 1
            print(f"{name}: FAIL {problems} ({dt:.1f}s)")
        else:
            print(f"{name}: ok ({dt:.1f}s)")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
