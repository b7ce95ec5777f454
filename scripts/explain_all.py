"""Dump the formatted physical plan of every registry query to
PLANS.txt — the artifact to eyeball after optimizer-relevant changes
(pushdown, broadcast, codegen spans), complementing the hard assertions
in tests/test_plans.py.

Usage: python scripts/explain_all.py [sf_dir] [out_file]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_file = sys.argv[2] if len(sys.argv) > 2 else "PLANS.txt"

    from advanced_etl_pipelines_spark.session import get_spark

    spark = get_spark("explain-all")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    with open(out_file, "w") as f:
        for name, fn in e.queries().items():
            f.write(f"{'=' * 72}\n== {name}\n{'=' * 72}\n")
            try:
                df = fn(spark, sf_dir)
                f.write(df._jdf.queryExecution().explainString(mode))
            except Exception as exc:  # noqa: BLE001
                f.write(f"ERROR: {exc}\n")
            f.write("\n")
    print(f"wrote {out_file}")


if __name__ == "__main__":
    main()
