"""The bench.py regression guard (round-6 VERDICT item 7): a >2x
per-query slowdown against the committed bench_queries.json must fail
the builder's own sweep — pinned on the extracted pure predicate."""

import importlib.util
import os


def _bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_guard_flags_only_real_regressions():
    gv = _bench().guard_violations
    committed = {"big": 4.0, "mid": 1.0, "tiny": 0.05}
    # within budget: untouched, below 2x, sub-floor noise, new query
    assert gv(
        {"big": 7.9, "mid": 1.9, "tiny": 0.9, "brand_new": 50.0},
        committed,
    ) == []
    # a real regression on a heavy query is caught
    assert gv({"big": 8.1}, committed) == [("big", 8.1, 4.0)]
    # the 0.5s floor: a 0.05s query is budgeted against the floor, so
    # 0.9s passes (above 2x its own time) but 1.1s fails
    assert gv({"tiny": 1.1}, committed) == [("tiny", 1.1, 0.05)]


def test_guard_median_normalization_absorbs_uniform_load():
    """A uniformly slow box (round-7: three loaded sweeps, 1.19-1.27x
    median, 1-7 false flags each) must not trip the guard; a localized
    regression on that same loaded box still must."""
    gv = _bench().guard_violations
    committed = {f"q{i}": 1.0 for i in range(30)}
    # whole sweep 1.3x slow, one query drifting to 2.2x: no flags —
    # normalized, 2.2/1.3 = 1.69x is inside budget
    slow = {f"q{i}": 1.3 for i in range(30)}
    slow["q7"] = 2.2
    assert gv(slow, committed) == []
    # same load, but one query at 5x: flagged (5/1.3 = 3.8x)
    slow["q7"] = 5.0
    assert gv(slow, committed) == [("q7", 5.0, 1.0)]
    # a FAST box never hides a regression: everything 0.5x except one
    # genuine 2.5x — the normalizer clamps at 1, so it is flagged
    fast = {f"q{i}": 0.5 for i in range(30)}
    fast["q3"] = 2.5
    assert gv(fast, committed) == [("q3", 2.5, 1.0)]
    # degenerate subsets (< 20 overlapping) keep strict semantics:
    # no median estimate, a lone 2.1x trips
    assert gv({"q1": 2.1}, committed) == [("q1", 2.1, 1.0)]


def test_guard_exit_path_is_wired():
    """main() must call the predicate and exit non-zero on violations —
    pinned structurally (running a full sweep in tests is too slow):
    the source routes guard_violations into sys.exit(1)."""
    import inspect

    src = inspect.getsource(_bench().main)
    assert "guard_violations(timings, committed)" in src
    assert "sys.exit(1)" in src


def test_guard_cannot_absorb_position_localized_warmup():
    """Round-7 incident, pinned as the reason the warm-up pass exists:
    a cold JVM ran sweep positions 0-39 at 1.86x median (individual
    queries up to 13x) while positions 40+ sat at 1.08x.  The median
    normalizer sees the 40+ majority (load ~1.08) and correctly does
    NOT absorb the early spikes — so without main()'s untimed warm-up
    pass, cold-start costs flag as regressions.  The fix is upstream:
    retire warm-up before timing, keep the guard strict."""
    gv = _bench().guard_violations
    committed = {f"q{i}": 0.6 for i in range(321)}
    observed = {f"q{i}": 0.6 * 1.08 for i in range(321)}
    for i in range(40):  # cold positions: 2-6x, like the driver's run
        observed[f"q{i}"] = 0.6 * (2.0 + (i % 5))
    flagged = {name for name, _, _ in gv(observed, committed)}
    assert flagged and flagged <= {f"q{i}" for i in range(40)}
    # with warm-up retired (the same sweep minus the cold spikes),
    # the guard is clean
    warmed = {f"q{i}": 0.6 * 1.08 for i in range(321)}
    assert gv(warmed, committed) == []


def test_warmup_pass_is_wired():
    """main() must run the untimed warm-up loop BEFORE the timed
    region (structurally pinned, like the exit path): the warm-up loop
    and the probe both appear in source before the best-of-N loop."""
    import inspect

    src = inspect.getsource(_bench().main)
    warm = src.index("SPARK_GRAFT_BENCH_WARMUP")
    timed = src.index("best = float(\"inf\")")
    assert warm < timed
    assert src.index("probe_sec = round") < timed


def test_estimate_load_is_surfaced_and_clamped():
    est = _bench().estimate_load
    committed = {f"q{i}": 1.0 for i in range(30)}
    assert est({f"q{i}": 1.3 for i in range(30)}, committed) == 1.3
    # clamped at 1 on a fast box; degenerate overlap -> 1
    assert est({f"q{i}": 0.5 for i in range(30)}, committed) == 1.0
    assert est({"q1": 3.0}, committed) == 1.0
    # clamp=False (the drift chain's view) returns the raw median so a
    # faster box UNWINDS the cumulative index; degenerate still 1.0
    assert est({f"q{i}": 0.5 for i in range(30)}, committed, clamp=False) == 0.5
    assert est({"q1": 0.2}, committed, clamp=False) == 1.0


def test_chain_median_excludes_subfloor_committed_queries():
    """Round-9 ADVICE (medium): the guard's t/max(committed, 0.5)
    denominator is fine for its >=1-clamped one-shot verdict, but fed
    raw into the CHAIN it turns every sub-floor query into a ratio of
    t/0.5 — systematically < 1 — and 143/321 committed queries already
    sit under the floor.  Once they crossed half the registry, the raw
    median would multiply a spurious < 1 into cumulative_load every
    refresh, silently unwinding the chain.  clamp=False therefore
    computes the median ONLY over committed >= floor, with exact
    t/committed ratios."""
    est = _bench().estimate_load
    # 25 above-floor queries steady at 1.2x, 26 sub-floor queries whose
    # floored ratios would read 0.04/0.5 = 0.08 and drag the raw median
    # to a fabricated "fast box"
    committed = {f"big{i}": 2.0 for i in range(25)}
    committed.update({f"tiny{i}": 0.02 for i in range(26)})
    timings = {f"big{i}": 2.4 for i in range(25)}
    timings.update({f"tiny{i}": 0.04 for i in range(26)})
    assert est(timings, committed, clamp=False) == 1.2
    # the guard's clamped view keeps the floored denominators (the
    # sub-floor majority's 0.08 ratios own its median, then the >=1
    # clamp holds) — exactly the fabricated <1 factor the chain's
    # unclamped path must never see
    assert est(timings, committed) == 1.0
    # and if too few above-floor queries remain, the chain median
    # degenerates to 1.0 (no fabricated factor) instead of trusting a
    # handful of samples
    few = {f"big{i}": 2.0 for i in range(5)}
    few.update({f"tiny{i}": 0.02 for i in range(40)})
    t_few = {f"big{i}": 2.4 for i in range(5)}
    t_few.update({f"tiny{i}": 0.04 for i in range(40)})
    assert est(t_few, few, clamp=False) == 1.0


def test_committed_baseline_keeps_chain_median_meaningful():
    """The hazard above only stays theoretical while the committed
    baseline keeps a healthy above-floor population: fail loudly when
    sub-CHAIN_FLOOR queries reach half the registry (round-9 ADVICE
    asked for exactly this tripwire — at that point the chain's
    eligible set is the slow half only, and the convention needs
    rethinking).  Round 11 fired the original 0.5 s version of this
    tripwire (190/321 sub-floor after the optimization rounds' real
    speed-ups landed in a fast-box baseline) and took the remedy the
    docstring prescribed: the chain got its own CHAIN_FLOOR (0.3 s,
    ~3x the fixed per-query overhead; guard clamp unchanged at 0.5),
    and this test now asserts against that constant so the NEXT
    speed-up fires it again instead of silently thinning the median."""
    import json

    floor = _bench().CHAIN_FLOOR
    path = os.path.join(os.path.dirname(__file__), "..", "bench_queries.json")
    with open(path) as f:
        q = json.load(f)["queries"]
    sub = sum(1 for v in q.values() if v < floor)
    assert sub / len(q) < 0.5, (
        f"{sub}/{len(q)} committed queries below the {floor}s chain "
        "floor — the drift chain's median now reflects only the "
        "above-floor half; revisit CHAIN_FLOOR before refreshing again"
    )
    assert len(q) - sub >= 20  # the chain median never degenerates


def test_drift_chain_multiplies_raw_median_and_carries_anchor():
    """Round-8 VERDICT item 1: committed baselines ratcheted
    227.8 -> 237.8 -> 284.2 s at constant 321 queries, each refresh
    individually guard-clean — the chain must make the COMPOUNDED
    factor visible.  Pins: multiplication by the raw (unclamped)
    median, verbatim carry of probe_ref_sec + drift_anchor, probe
    attribution ratio, and the seeds for a pre-chain baseline."""
    chain = _bench().chain_drift
    prior = {
        "cumulative_load": 1.2,
        "probe_ref_sec": 0.3,
        "drift_anchor": "driver-r8 box 279.5s, probe 0.315 (r6->r8"
        " segment retired as box band, SCALE.md §16)",
    }
    out = chain(prior, load_raw=1.1, probe_sec=0.45)
    assert out["cumulative_load"] == 1.32  # 1.2 * 1.1
    assert out["probe_ref_sec"] == 0.3  # anchor carried, never refreshed
    assert out["probe_ratio"] == 1.5  # 0.45 / 0.3 — box attribution
    assert out["drift_net"] == 0.88  # 1.32 / 1.5 — box-normalized code term
    assert out["drift_anchor"] == prior["drift_anchor"]
    # a faster box UNWINDS the chain (raw median < 1)
    assert chain(prior, load_raw=0.9, probe_sec=0.3)["cumulative_load"] == 1.08
    # pre-chain baseline: seed from this run (cum = raw, ref = probe)
    seeded = chain({}, load_raw=1.05, probe_sec=0.4)
    assert seeded["cumulative_load"] == 1.05
    assert seeded["probe_ref_sec"] == 0.4
    assert seeded["probe_ratio"] == 1.0
    # the below-1 masking hole (first observed: chain at 0.846 on a
    # fast box): compounding code regressions must not hide behind box
    # speed.  After one 1.6x uniform step the absolute threshold is
    # still blind (cum 1.35 < 1.5) — that single step is caught by the
    # per-refresh LOAD_WARN instead — but drift_net carries the full
    # box-normalized code term forward so the NEXT compounding step
    # (1.35 * 1.2 = 1.62) alarms, where cumulative_load alone would
    # need the box to cooperate.
    masked = chain(
        {"cumulative_load": 0.846, "probe_ref_sec": 0.315},
        load_raw=1.6,
        probe_sec=0.315,
    )
    assert masked["cumulative_load"] < 1.5  # absolute threshold blind
    assert masked["drift_net"] == masked["cumulative_load"]  # probe 1.0
    again = chain(
        {"cumulative_load": masked["cumulative_load"],
         "probe_ref_sec": 0.315},
        load_raw=1.2,
        probe_sec=0.315,
    )
    assert again["drift_net"] > 1.5  # compounding trips the alarm


def test_chain_refuses_drift_net_when_probe_anchor_is_lost(capsys):
    """Round-9 ADVICE (low): a partial / hand-edited baseline carrying
    cumulative_load but NO probe_ref_sec silently reseeds the probe
    anchor from the current run — probe_ratio resets to 1.0 while
    cumulative_load keeps its history, so drift_net would misattribute
    all accumulated box drift to code.  chain_drift must WARN and
    withhold drift_net (None); cumulative_load still chains."""
    chain = _bench().chain_drift
    out = chain({"cumulative_load": 1.3}, load_raw=1.1, probe_sec=0.4)
    assert out["cumulative_load"] == 1.43
    assert out["probe_ref_sec"] == 0.4  # reseeded, by necessity
    assert out["probe_ratio"] == 1.0
    assert out["drift_net"] is None  # refused, not fabricated
    assert "probe anchor lost" in capsys.readouterr().err
    # the legit fresh-seed path (no history at all) keeps drift_net and
    # stays silent
    seeded = chain({}, load_raw=1.05, probe_sec=0.4)
    assert seeded["drift_net"] == 1.05
    assert capsys.readouterr().err == ""
    # and both anchors in the default anchor string name the SAME box
    # (round-10: the r6 time anchor + driver-r8 probe pair smeared
    # drift_net by the boxes' constant offset)
    assert "driver-r8" in seeded["drift_anchor"]
    # main() survives a withheld drift_net: the alarm guards the None
    # and the summary omits None chained keys instead of printing null
    # (round-9 ADVICE, low)
    import inspect

    src = inspect.getsource(_bench().main)
    assert '(chained["drift_net"] or 0) > CUM_DRIFT_WARN' in src
    assert "del summary[k]" in src


def test_drift_alarm_and_chain_are_wired_into_main():
    """main() must chain vs the COMMITTED baseline's splits, write the
    chained fields into the artifact (a clean run's artifact becomes
    the next baseline — writing them IS advancing the chain), and warn
    above CUM_DRIFT_WARN.  Structurally pinned like the exit path."""
    import inspect

    b = _bench()
    assert b.CUM_DRIFT_WARN == 1.5
    src = inspect.getsource(b.main)
    chain_at = src.index("chain_drift(prior_splits, load_raw, probe_sec)")
    write_at = src.index('with open(artifact, "w")')
    assert chain_at < write_at  # chained fields land in the artifact
    assert "splits.update(chained)" in src
    assert 'chained["cumulative_load"] > CUM_DRIFT_WARN' in src
    # the alarm must ALSO fire on the box-normalized code term, or a
    # fast box's sub-1 chain masks a uniform code regression (None-
    # guarded: a withheld drift_net can't crash the alarm)
    assert '(chained["drift_net"] or 0) > CUM_DRIFT_WARN' in src
    # the committed baseline carries the chain's seed, so history
    # predating any given refresh is already in the index
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "bench_queries.json")
    with open(path) as f:
        splits = json.load(f)["splits"]
    # the chain is UNCLAMPED by design — it sat at 0.846 after the
    # round-9 fast-box refreshes — so pin presence and positivity, not
    # a floor
    assert splits["cumulative_load"] > 0
    assert splits["probe_ref_sec"] > 0
    assert splits["drift_net"] > 0
    # round 10: the committed baseline was re-stamped onto the unified
    # driver-r8 anchor (cumulative_load / the 1.227 r6 seed — that
    # segment was proven box band by the r9 datapoints, so dropping it
    # loses no code information and un-smears drift_net)
    assert "driver-r8" in splits["drift_anchor"]


def test_remeasure_uses_fresh_budget_and_is_audited():
    """Round-8 ADVICE: the violator re-measure must use the SAME
    best-of-N budget as the original sample (a fresh minimum, not an
    accumulated best-of-2N that lets an intermittent regression escape
    and commits tighter budgets for the noisiest queries), and the
    re-measured names must be recorded in the artifact for refresh
    audits."""
    import inspect

    src = inspect.getsource(_bench().main)
    rem_at = src.index("SPARK_GRAFT_BENCH_REMEASURE")
    # fresh best inside the remeasure loop: a second float("inf") reset
    # AFTER the remeasure gate, not `best = timings[name]`
    assert 'best = float("inf")' in src[rem_at:]
    assert "best = timings[name]" not in src
    assert "remeasured.append(name)" in src
    assert '"remeasured": sorted(remeasured)' in src


def test_sweep_order_hoists_graph_family_at_scale():
    """Round-8 VERDICT item 3: the sf1 sweep measured triangle_count at
    62 s in-sweep vs 22.6 s standalone-warm — cached-table eviction
    pressure from the text/dedup families that precede it.  At sf >= 1
    the graph family runs first (fresh block cache); the default sf
    keeps registration order so the committed per-query baseline stays
    comparable."""
    so = _bench().sweep_order
    names = [
        "agg_dedup_mean",
        "bpe_vocab_learn",
        "triangle_count_copurchase",
        "dedup_minhash_pairs",
        "pagerank_copurchase",
        "tpch_q1_pricing_summary",
    ]
    # default sf: registration order untouched
    assert so(names, 0.1) == names
    # sf1: graph family hoisted, relative order preserved in each half
    assert so(names, 1.0) == [
        "triangle_count_copurchase",
        "pagerank_copurchase",
        "agg_dedup_mean",
        "bpe_vocab_learn",
        "dedup_minhash_pairs",
        "tpch_q1_pricing_summary",
    ]
    # non-numeric sf labels keep registration order
    assert so(names, "weird") == names
    # main() iterates the order for BOTH warm-up and the timed loop
    import inspect

    src = inspect.getsource(_bench().main)
    assert "order = sweep_order(queries, sf_val)" in src
    assert "for name in order[: max(n_warm, 0)]" in src
    assert "for name in order:" in src


def test_failed_run_never_routes_to_committed_baseline():
    """Round-7 VERDICT item 2: a guard-violating default-sf run must
    write bench_queries.failed.json, never the committed baseline."""
    b = _bench()
    assert b.artifact_name_for(b.DEFAULT_SF_DIR, violated=True) == (
        "bench_queries.failed.json"
    )
    assert b.artifact_name_for(b.DEFAULT_SF_DIR, violated=False) == (
        "bench_queries.json"
    )
    # non-default dirs never guard, so violated is irrelevant there
    assert b.artifact_name_for("/root/repo/.localdata/sf1", violated=True) == (
        "bench_sf1.json"
    )
    # main() wires the verdict into the artifact path before writing
    import inspect

    src = inspect.getsource(b.main)
    assert src.index("violations = guard_violations") < src.index(
        "with open(artifact, \"w\")"
    )
    assert "violated=bool(violations)" in src


def test_violators_are_remeasured_before_the_verdict():
    """Round-8: best-of-2 can land both samples of one query inside a
    GC/compile burst (observed [5.06, 2.10, 1.31, ...] on a quiet box),
    so main() must re-run violators in-session and re-derive the
    verdict from the minima BEFORE routing the artifact.  Structurally
    pinned: first verdict -> re-measure loop -> second verdict -> the
    violated= artifact routing, in that source order."""
    import inspect

    src = inspect.getsource(_bench().main)
    first = src.index("violations = guard_violations")
    rem = src.index("SPARK_GRAFT_BENCH_REMEASURE")
    second = src.index("violations = guard_violations", first + 1)
    route = src.index("violated=bool(violations)")
    assert first < rem < second < route


def test_default_sf_detection_is_realpath_normalized():
    """Round-7 ADVICE: trailing slash / alternate spelling of the
    default dir must still engage the guard + baseline routing."""
    b = _bench()
    assert b.is_default_sf(b.DEFAULT_SF_DIR)
    assert b.is_default_sf(b.DEFAULT_SF_DIR + "/")
    assert b.is_default_sf("/root/testdata//sf0.1/")
    assert not b.is_default_sf("/root/testdata/sf0.01")
    assert b.artifact_name_for(b.DEFAULT_SF_DIR + "/") == "bench_queries.json"


def test_artifact_name_routes_nondefault_sf_dirs_away_from_baseline():
    b = _bench()
    assert b.artifact_name_for(b.DEFAULT_SF_DIR) == "bench_queries.json"
    assert b.artifact_name_for("/root/repo/.localdata/sf1") == (
        "bench_sf1.json"
    )
    assert b.artifact_name_for(".localdata/sf1/") == "bench_sf1.json"
    # anything else gets a derived name, never the guard baseline
    assert b.artifact_name_for("/root/testdata/sf0.01") == (
        "bench_queries_sf0_01.json"
    )


def test_guard_off_run_still_reads_prior_splits_for_the_chain():
    """A SPARK_GRAFT_BENCH_GUARD=0 default-sf run still REPLACES
    bench_queries.json, so it must still read the committed baseline's
    splits — otherwise it silently erases the drift chain's seed.  The
    env toggle may only disable the violation verdict."""
    import inspect

    src = inspect.getsource(_bench().main)
    # baseline read is gated on default_sf, NOT on guard_on
    assert "if default_sf and os.path.exists(baseline_path)" in src
    # the verdict (and only the verdict) respects the toggle
    assert (
        "violations = guard_violations(timings, committed) if guard_on"
        in src
    )
