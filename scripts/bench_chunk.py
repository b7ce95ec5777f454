"""Chunked bench runner: time a SLICE of the registry and append results
to an accumulating JSON file, so very long sweeps (sf1+) fit inside
bounded process lifetimes.  Usage:

    python scripts/bench_chunk.py <sf_dir> <out_json> <start> <stop> [runs]

Queries are taken in sorted-name order [start, stop).  ``runs`` (default
1) records best-of-N per query — bench.py's best-of-2 convention
excludes the one-time plan/codegen compile, which at sf1 can be 5-10x
the steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    start, stop = int(sys.argv[3]), int(sys.argv[4])
    runs = int(sys.argv[5]) if len(sys.argv) > 5 else 1

    from advanced_etl_pipelines_spark.session import get_spark
    from advanced_etl_pipelines_spark.sources.readers import cache_sf_tables

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    names = sorted(queries)[start:stop]

    cache_sec = cache_sf_tables(spark, sf_dir)

    acc: dict = {"sf_dir": sf_dir, "cache_secs": [], "queries": {}}
    if os.path.exists(out_path):
        acc = json.load(open(out_path))
    acc["cache_secs"].append(round(cache_sec, 3))

    for name in names:
        try:
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            acc["queries"][name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 — record, keep sweeping
            acc["queries"][name] = f"ERROR {str(ex)[:120]}"
        with open(out_path, "w") as f:
            json.dump(acc, f, indent=1, sort_keys=True)
        print(name, acc["queries"][name], flush=True)


if __name__ == "__main__":
    main()
