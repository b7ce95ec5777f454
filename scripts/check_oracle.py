"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same parquet tables, then compares row count, sorted
column names, and an order-insensitive value multiset (floats rounded to
counteract representation noise — the queries themselves already round).

Usage:  python scripts/check_oracle.py [--json out.json] [sf_dir] [query ...]

``--json`` writes a per-query artifact (status, rows, seconds) — used
for the sf1 answer-correctness gate (round-3 VERDICT item 1), whose
results land in CORRECTNESS_sf1.json + BASELINE.md.
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def row_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod
    from advanced_etl_pipelines_spark.session import get_spark

    spark = get_spark("oracle-check")

    def fresh_con(limit: str = "32GB"):
        # Bounded DuckDB: the Spark JVM shares this box, and DuckDB's
        # default budget (80% of RAM) collides with it on long gates —
        # a 300-query sf1 run OOM-poisoned the connection and every
        # later oracle died with it (round-4 incident).  Cap memory,
        # give it a spill directory, and let the gate loop rebuild the
        # connection on an OOM instead of failing the rest of the run;
        # the retry escalates to 64GB for the one genuinely huge oracle
        # (kcore's 24M-edge peel unroll) while keeping the steady-state
        # budget small.
        c = duckdb.connect()
        c.execute(f"SET memory_limit='{limit}'")
        c.execute("SET temp_directory='/tmp/duckdb_spill'")
        for t in TABLES:
            # driver testdata = one file per table; make_scale_data
            # output = a DIRECTORY of per-copy files
            path = os.path.abspath(os.path.join(sf_dir, f"{t}.parquet"))
            if os.path.isdir(path):
                path = os.path.join(path, "*.parquet")
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
        return c

    con = fresh_con()

    from advanced_etl_pipelines_spark.operators.caching import (
        release_tracked_caches,
    )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = sorted(only - set(qs))
        if unknown:
            # a typo'd name must fail loudly, not report "1/1 passed"
            print(f"FAIL  unknown query name(s): {unknown}")
            return 1
    # Expected-frame oracles are exact only at the driver's sf0.01
    # (VALUES literals for deterministic non-SQL computations); at any
    # other sf they fall back to the rows-only check.
    if os.path.basename(sf_dir.rstrip("/")) != "sf0.01":
        from advanced_etl_pipelines_spark.plans.registry import (
            SF_PINNED_ORACLES,
        )

        oracles = {
            k: v for k, v in oracles.items() if k not in SF_PINNED_ORACLES
        }
    failures = []
    records: dict[str, dict] = {}

    def record(name, status, rows, t0):
        records[name] = {
            "status": status,
            "rows": rows,
            "sec": round(time.time() - t0, 2),
        }
        release_tracked_caches()

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            record(name, "fail:spark-error", 0, t0)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rowsonly {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append(name)
                record(name, "fail:zero-rows", 0, t0)
                print(f"FAIL  {name}: zero rows")
            else:
                record(name, "rowsonly", len(srows), t0)
            continue
        try:
            try:
                res = con.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
            except duckdb.Error as e:
                if "Out of Memory" not in str(e):
                    raise
                # reconnect with a clean pool AND an escalated budget
                # for the one genuinely huge oracle, then drop back to
                # the bounded connection for the rest of the gate
                con.close()
                big = fresh_con("64GB")
                res = big.execute(oracles[name])
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                big.close()
                con = fresh_con()
        except Exception as e:
            failures.append(name)
            record(name, "fail:duckdb-error", len(srows), t0)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok = True
        if len(srows) != len(drows):
            ok = False
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            ok = False
            print(f"FAIL  {name}: cols spark={sorted(scols)} duck={sorted(dcols)}")
        if ok:
            sm = row_multiset(srows, scols)
            dm = row_multiset(drows, dcols)
            if sm != dm:
                ok = False
                diff_s = list((sm - dm).items())[:3]
                diff_d = list((dm - sm).items())[:3]
                print(f"FAIL  {name}: value mismatch\n  spark-only: {diff_s}\n  duck-only:  {diff_d}")
        if ok:
            record(name, "ok", len(srows), t0)
            print(f"OK    {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)
            record(name, "fail:mismatch", len(srows), t0)

    n_run = len(records)  # queries actually executed, not names requested
    print(f"\n{n_run - len(failures)}/{n_run} passed")
    if json_out:
        import json as _json

        ok_n = sum(1 for r in records.values() if r["status"] == "ok")
        with open(json_out, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "n_run": n_run,
                    "n_passed": n_run - len(failures),
                    "n_oracle_ok": ok_n,
                    "failures": sorted(failures),
                    "queries": records,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
