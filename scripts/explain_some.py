"""Dump .explain('formatted') for named registry queries to
plans/<outdir>/<query>_<tag>.txt — the optimization-round evidence files
(judge checks plan claims against these).

Usage: python scripts/explain_some.py TAG OUTDIR q1 q2 ... [--sf-dir D]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag")
    ap.add_argument("outdir")
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    from advanced_etl_pipelines_spark.session import get_spark

    spark = get_spark("explain-some")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    os.makedirs(args.outdir, exist_ok=True)
    qs = e.queries()
    for name in args.names:
        df = qs[name](spark, args.sf_dir)
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(mode))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
