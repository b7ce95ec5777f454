"""Benchmark driver: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE SHORT JSON summary line as the LAST line of stdout
({"metric", "value", "unit", "sf", "n_queries", "queries"}) sized to
survive tail-capture, and writes the full per-query timing map to
bench_queries.json next to this script.  Round 1's driver recorded
"parsed": null because 151 inline per-query timings overflowed the
driver's capture window — the summary line now carries only the top-10
slowest queries inline; the complete map lives in the artifact file.

Timing = wall-clock of plan construction + collect() per query, warm
session (JVM/session startup excluded).  `value` is the sum over all
queries — the headline "full registry sweep" number recorded per round
against BASELINE.md.

Regression guard (round-6 VERDICT item 7): each query's time is
checked against the COMMITTED bench_queries.json (read before this run
overwrites it) with a budget of 2x max(committed, 0.5s) — the 0.5s
floor keeps sub-100ms queries from tripping on scheduler noise.  Any
violation is listed on stderr and the process exits 1 (after the
summary line, so the driver still parses the run), making a per-query
regression fail the builder's own sweep instead of waiting for the
judge's diff.  Per-query ratios are first divided by the sweep's
MEDIAN ratio (clamped >= 1, full sweeps only) so a uniformly loaded
box doesn't false-positive — see guard_violations.  New queries
(absent from the committed artifact) and non-default sf dirs are
skipped; SPARK_GRAFT_BENCH_GUARD=0 disables.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def artifact_name_for(sf_dir: str) -> str:
    """Per-query artifact filename for a bench run at ``sf_dir``.  The
    default sf dir owns bench_queries.json (the committed guard
    baseline); any other dir gets its own file (bench_sf1.json for the
    scale corpus) so a scaling run never clobbers the baseline — the
    round-7 sf1 sweep overwrote it and had to be git-restored."""
    if sf_dir == DEFAULT_SF_DIR:
        return "bench_queries.json"
    base = os.path.basename(sf_dir.rstrip("/"))
    if base == "sf1":
        return "bench_sf1.json"
    return f"bench_queries_{base.replace('.', '_')}.json"


def guard_violations(
    timings: dict[str, float],
    committed: dict[str, float],
    factor: float = 2.0,
    floor: float = 0.5,
) -> list[tuple[str, float, float]]:
    """(name, new, committed) for every query slower than
    factor x max(committed, floor) AFTER dividing out the sweep's
    median slowdown — the regression-guard predicate (module
    docstring), pure so tests can pin its semantics.

    The median normalization kills the load false-positive class
    observed round 7: a busy box slows every query ~uniformly (three
    loaded sweeps each flagged 1-7 queries at 1.19-1.27x median with
    no code change), while a genuine regression is localized to the
    changed query.  The normalizer is clamped to >= 1 so a FASTER box
    never hides a real regression, and is only estimated when enough
    queries overlap for a median to mean anything (a full sweep has
    321; degenerate subsets get load=1, the old strict semantics)."""
    ratios = sorted(
        t / max(committed[name], floor)
        for name, t in timings.items()
        if name in committed
    )
    load = (
        max(1.0, ratios[len(ratios) // 2]) if len(ratios) >= 20 else 1.0
    )
    return [
        (name, t, committed[name])
        for name, t in timings.items()
        if name in committed
        and t / load > factor * max(committed[name], floor)
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from advanced_etl_pipelines_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # Warm the JVM + parquet footer caches outside the timed region.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # Materialize the base tables into the block cache ONCE for the whole
    # sweep (round-2 VERDICT item 8): at 287 queries the repeated parquet
    # scans of the same ten tables dominate the harness, not the
    # operators.  The cache build is timed and reported separately so the
    # one-time scan cost stays visible.  SPARK_GRAFT_BENCH_CACHE=0 runs
    # the old scan-per-query mode.
    cache_sec = 0.0
    if os.environ.get("SPARK_GRAFT_BENCH_CACHE", "1") != "0":
        from advanced_etl_pipelines_spark.sources.readers import (
            cache_sf_tables,
        )

        cache_sec = round(cache_sf_tables(spark, sf_dir), 3)

    # Best-of-N per query (default 2): the first run pays plan + codegen
    # compilation, a one-time cost that is noise at any real scale.
    # Per-query time splits into build (Python plan construction — lazy,
    # no job) and exec (collect: analysis + optimization + run); the
    # split's p50/p95 goes into the artifact so compile-vs-execute
    # dominance is measurable per scale factor.
    runs = max(int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2")), 1)
    timings: dict[str, float] = {}
    build_s: dict[str, float] = {}
    exec_s: dict[str, float] = {}
    for name, fn in queries.items():
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            if t2 - t0 < best:
                best = t2 - t0
                build_s[name] = round(t1 - t0, 3)
                exec_s[name] = round(t2 - t1, 3)
        timings[name] = round(best, 3)
        # Release intermediates the query pinned via tracked_persist —
        # between queries, not between the best-of-N runs of one query
        # (warm reruns legitimately share a query's own caches, same as
        # r3 methodology).  Without this a 289-query sweep accumulates
        # every persisted intermediate in the CacheManager until the
        # session ends (ADVICE r3, medium).
        from advanced_etl_pipelines_spark.operators.caching import (
            release_tracked_caches,
        )

        release_tracked_caches()

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    # Full per-query map -> artifact file (too big for the driver's
    # stdout capture at 150+ queries; see module docstring).  Naming
    # per artifact_name_for: non-default sf dirs write their own file.
    default_sf = sf_dir == DEFAULT_SF_DIR
    artifact = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), artifact_name_for(sf_dir)
    )
    # regression guard: committed per-query map, read before overwrite
    committed: dict[str, float] = {}
    guard_on = (
        os.environ.get("SPARK_GRAFT_BENCH_GUARD", "1") != "0" and default_sf
    )
    if guard_on and os.path.exists(artifact):
        try:
            with open(artifact) as f:
                prior = json.load(f)
            if prior.get("sf") == 0.1:
                committed = prior.get("queries", {})
        except (json.JSONDecodeError, OSError):
            pass
    def pct(vals: list[float], p: float) -> float:
        s = sorted(vals)
        return round(s[min(int(p * len(s)), len(s) - 1)], 3)

    splits = {
        "cache_build_sec": cache_sec,
        "build_p50": pct(list(build_s.values()), 0.50),
        "build_p95": pct(list(build_s.values()), 0.95),
        "exec_p50": pct(list(exec_s.values()), 0.50),
        "exec_p95": pct(list(exec_s.values()), 0.95),
    }
    with open(artifact, "w") as f:
        json.dump(
            {
                "sf": sf_val,
                "n_queries": len(timings),
                "splits": splits,
                "queries": timings,
                "build": build_s,
                "exec": exec_s,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    top10 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # SHORT summary as the LAST stdout line — this is what the driver
    # parses into BENCH_r{N}.json.
    print(
        json.dumps(
            {
                "metric": "registry_sweep_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "cache_build_sec": cache_sec,
                "queries": top10,
            }
        )
    )

    # per-query budget assertion (see module docstring) — after the
    # summary line so the driver's parse still succeeds
    violations = guard_violations(timings, committed)
    if violations:
        for name, t, base in sorted(
            violations, key=lambda v: v[1] / max(v[2], 0.5), reverse=True
        ):
            print(
                f"REGRESSION {name}: {t:.3f}s > 2x committed"
                f" {base:.3f}s (floor 0.5s)",
                file=sys.stderr,
            )
        sys.exit(1)


if __name__ == "__main__":
    main()
