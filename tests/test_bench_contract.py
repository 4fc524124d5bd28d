"""Bench-headline honesty contract (VERDICT r10 #7): every entry whose
committed sf0.1 sweep line exceeds the 2 s cost threshold must either be
timed by bench.py's HEADLINE set or carry a documented exclusion reason
in bench.py HEADLINE_EXCLUDED — a new expensive registration cannot
silently skip the per-round bench."""

from __future__ import annotations

import pathlib
import re

from numalogic_prometheus_spark import plans

_ROOT = pathlib.Path(__file__).resolve().parent.parent

_THRESHOLD_S = 2.0


def _load_bench_module():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", str(_ROOT / "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _load_bench_sets():
    mod = _load_bench_module()
    return list(mod.HEADLINE), dict(mod.HEADLINE_EXCLUDED)


def test_expensive_sweep_entries_are_benched_or_excluded():
    headline, excluded = _load_bench_sets()
    log = (_ROOT / "SWEEP_sf0.1.log").read_text()
    slow = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r"^PASS (\S+) ([\d.]+)s", log, re.M)
        if float(m.group(2)) > _THRESHOLD_S
    }
    assert slow, "sweep log has no timed entries — format drift?"
    uncovered = {
        n: t for n, t in slow.items()
        if n not in headline and n not in excluded
    }
    assert not uncovered, (
        f"entries >{_THRESHOLD_S}s in SWEEP_sf0.1.log neither benched nor "
        f"excluded-with-reason: {sorted(uncovered.items())}"
    )


def test_headline_and_exclusions_resolve():
    """Every HEADLINE / HEADLINE_EXCLUDED name must be a registered
    query, the two sets must be disjoint, and every exclusion must
    carry a non-empty reason."""
    headline, excluded = _load_bench_sets()
    queries = plans.all_queries()
    missing = [n for n in headline if n not in queries]
    assert not missing, f"HEADLINE names not in registry: {missing}"
    missing_ex = [n for n in excluded if n not in queries]
    assert not missing_ex, f"excluded names not in registry: {missing_ex}"
    overlap = set(headline) & set(excluded)
    assert not overlap, f"benched AND excluded: {sorted(overlap)}"
    assert all(isinstance(r, str) and r.strip() for r in excluded.values())


def test_affected_from_log_attribution():
    """r14 second-review pins: the retry's slow-tick→query attribution
    must survive dropped/timed-out ticks (position-keyed, no index
    shift), brand the final block from the closing tick, and return
    nothing for a flat series."""
    from bench import affected_from_log

    names = [f"q{i}" for i in range(20)]
    timed = set(names)

    # flat series → nothing to re-time
    flat = [(0.2, 0), (0.21, 5), (0.2, 10), (0.22, 15), (0.2, 20)]
    assert affected_from_log(flat, names, timed) == []

    # one slow mid-window tick at position 10 brands q5..q14 (both
    # neighboring blocks — the tick ran between them)
    mid = [(0.2, 0), (0.2, 5), (0.9, 10), (0.2, 15), (0.2, 20)]
    assert affected_from_log(mid, names, timed) == [
        f"q{i}" for i in range(5, 15)
    ]

    # a TIMED-OUT tick is recorded capped at its position — it must
    # brand its neighborhood, and later ticks keep their own positions
    # (the old series-index scheme shifted everything left)
    capped = [(0.2, 0), (60.0, 5), (0.2, 10), (0.2, 15), (0.2, 20)]
    assert affected_from_log(capped, names, timed) == [
        f"q{i}" for i in range(0, 10)
    ]

    # the closing tick (position == len(names)) brands the FINAL block,
    # not an empty slice
    closing = [(0.2, 0), (0.2, 5), (0.2, 10), (0.2, 15), (0.9, 20)]
    assert affected_from_log(closing, names, timed) == [
        f"q{i}" for i in range(15, 20)
    ]

    # entries without a timing are excluded; order is preserved, dups
    # collapsed when two slow ticks overlap
    overlap = [(0.9, 5), (0.9, 10), (0.2, 15), (0.2, 0), (0.2, 20)]
    got = affected_from_log(overlap, names, timed - {"q7"})
    assert got == [f"q{i}" for i in range(0, 15) if i != 7]

    assert affected_from_log([], names, timed) == []

    # ADVICE r14: sustained storm — half or more of the ticks slow. A
    # median baseline equals the slow value and brands NOTHING despite
    # contended=true; the quiet-band-floor baseline needs only the one
    # quiet tick to anchor and brands every slow tick's neighborhood.
    storm = [(0.2, 0), (0.9, 5), (0.9, 10), (0.9, 15), (0.9, 20)]
    assert affected_from_log(storm, names, timed) == [
        f"q{i}" for i in range(0, 20)
    ]

    # r15 self-review: quiet-band jitter up to ~1.7x floor (the
    # committed quiet twins' own spread) must NOT brand — the 2x
    # threshold keeps the bounded retry targeted at storm ticks only
    jitter = [(0.2, 0), (0.34, 5), (0.31, 10), (0.2, 15), (0.26, 20)]
    assert affected_from_log(jitter, names, timed) == []

    # ADVICE r15: one implausibly FAST tick (below 0.7x the committed
    # best-ever quiet floor of 0.140 s) is a measurement fluke, not a
    # quiet anchor — on a 1.4-1.9x host epoch it would otherwise brand
    # nearly the whole window. The fluke is dropped; the remaining
    # plausible ticks (ordinary epoch jitter) brand nothing.
    fluke = [(0.05, 0), (0.21, 5), (0.22, 10), (0.2, 15), (0.26, 20)]
    assert affected_from_log(fluke, names, timed) == []

    # ...but the guard must NOT break storm anchoring: a plausible
    # quiet tick (>= 0.7 * 0.140) still anchors, and storm ticks brand
    fluke_storm = [(0.15, 0), (0.9, 5), (0.9, 10), (0.9, 15), (0.9, 20)]
    assert affected_from_log(fluke_storm, names, timed) == [
        f"q{i}" for i in range(0, 20)
    ]

    # degenerate: EVERY tick implausibly fast (a genuinely faster
    # host) falls back to the raw min instead of inventing a floor
    allfast = [(0.05, 0), (0.05, 5), (0.05, 10), (0.05, 15), (0.05, 20)]
    assert affected_from_log(allfast, names, timed) == []


def test_core32_is_frozen_and_registered():
    """CORE_32 (VERDICT r14 #4) must stay exactly the round-4 artifact
    membership — 32 names, all registered, all in HEADLINE — so
    `value_core` remains cross-round comparable."""
    mod = _load_bench_module()
    assert len(mod.CORE_32) == 32
    assert len(set(mod.CORE_32)) == 32
    queries = plans.all_queries()
    missing = [n for n in mod.CORE_32 if n not in queries]
    assert not missing, f"CORE_32 names not in registry: {missing}"
    not_headline = [n for n in mod.CORE_32 if n not in mod.HEADLINE]
    assert not not_headline, (
        f"CORE_32 members missing from HEADLINE: {not_headline}"
    )
    import json

    r4 = json.loads((_ROOT / "BENCH_r04.json").read_text())
    r4_set = set(r4["parsed"]["queries"])
    assert set(mod.CORE_32) == r4_set, "CORE_32 drifted from the r4 artifact"


def test_quiet_reference_loader():
    """The outlier re-pass reference must resolve to the NEWEST
    committed quiet twin and carry per-entry floors."""
    from bench import _load_quiet_reference

    ref = _load_quiet_reference()
    assert ref, "a BENCH_quiet_r*.json is committed in this repo"
    import re

    m = re.search(r"BENCH_quiet_r(\d+)", ref["_file"])
    assert m and int(m.group(1)) >= 17
    floors = {k: v for k, v in ref.items() if k != "_file"}
    assert len(floors) >= 80
    assert all(isinstance(v, float) and v > 0 for v in floors.values())


def test_printed_line_is_compact():
    """The stdout line is the driver's ONLY capture channel and its tail
    window has truncated full provenance dumps twice (r11, r16 ->
    parsed=null, a lost round-over-round table). Pin: contract_line
    emits ONLY the whitelisted fields, never the provenance ledgers,
    and stays under a 6 kB ceiling even with every HEADLINE entry
    present (87 names alone are ~2.9 kB, so sub-2kB is impossible
    while `queries` is contract-mandated — the ceiling bounds creep,
    the whitelist bounds content)."""
    import json

    mod = _load_bench_module()
    # worst-case realistic artifact: every headline entry timed, plus
    # every provenance field a real run writes
    out = {
        "metric": "headline_queries_total",
        "value": 12345.6789,
        "unit": "sec",
        "queries": {n: 123.4567 for n in mod.HEADLINE},
        "sf": 0.1,
        "value_core": 1234.5678,
        "contended": False,
        "artifact": "BENCH_LATEST.json",
        # provenance that must NOT leak to stdout
        "sentinel_series": [0.1] * 40,
        "pass_counts": {n: 3 for n in mod.HEADLINE},
        "min_phase_counts": {"main": 87},
        "phase_sentinels": {"main": [0.1] * 40},
        "late_recapture": {},
        "outlier_repass": {},
        "load_gate": {"waits_s": []},
        "noisy_floors": {},
    }
    line = mod.contract_line(out)
    parsed = json.loads(line)
    assert set(parsed) == set(mod.CONTRACT_LINE_FIELDS) & set(out)
    assert "pass_counts" not in parsed and "sentinel_series" not in parsed
    assert "\n" not in line
    assert len(line) < 6000, f"printed line grew to {len(line)} chars"
    # contract fields the driver greps for are all present
    for k in ("metric", "value", "unit", "queries", "sf"):
        assert k in parsed
    assert len(parsed["queries"]) == len(mod.HEADLINE)
