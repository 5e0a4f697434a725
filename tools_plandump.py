#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named declared queries into
plans/<tag>/<query>_<suffix>.txt (the judge-checkable evidence files;
guide §1 / §7.2).

Usage:
    python tools_plandump.py --tag r13 --suffix before --sf-dir /root/testdata/sf0.1 q1 q2 ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from kinesis_stream_spark.queries import all_queries
    from kinesis_stream_spark.session import get_spark

    spark = get_spark("kinesis-stream-spark-plandump")
    registry = all_queries()
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = registry[name](spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        scans = plan.count("Scan parquet")
        print(
            f"{name}: {len(plan.splitlines())} lines, {scans} parquet scans,"
            f" {plan.count('Exchange')} Exchange -> {path}"
        )


if __name__ == "__main__":
    main()
