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


def _load_bench_sets():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", str(_ROOT / "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
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
