"""Registry-wide lint against the cross-engine rounding-tie class the
round-8 sf0.1 sweep exposed (SCALE.md round-8 section).

The defect: an in-query ``round(x, d)`` where x is a ratio of exact
integers (or of bit-identical doubles). Both engines compute the SAME
double, but Spark's HALF_UP-on-shortest-repr and DuckDB's rounding
disagree exactly at .5-of-the-last-digit ties — so the round() call is
the ONLY divergence source, and removing it is the exact path.

Rounding remains legitimate ONLY as a noise absorber where the engines'
inputs already differ in ulps: summation-order-dependent double
aggregates (sums/averages/variances of raw doubles) and libm
transcendentals (exp/ln/tanh — no cross-libm bit guarantee). sqrt is
IEEE-correctly-rounded and does NOT justify an absorber by itself.

This lint walks every oracle's SQL, finds each 2-arg round() whose
argument contains a division, and requires it to match a documented
absorber pattern or a per-entry allowlist entry. New entries that
reintroduce a bare integer-ratio round fail here with a pointer to the
fix rule.
"""

from __future__ import annotations

import re

from numalogic_prometheus_spark import plans

# round(<inner>, <digits>) with one level of nested parens inside <inner>
_ROUND2 = re.compile(
    r"round\(((?:[^()]|\([^()]*(?:\([^()]*\))*[^()]*\))*?),\s*\d+\s*\)",
    re.S,
)

# absorber patterns: any ONE occurring inside the rounded expression
# marks the round as load-bearing (engine-divergent inputs)
_ABSORBERS = (
    "exp(",        # libm transcendental — no cross-libm bit guarantee
    "ln(",         # libm
    "avg(",        # summation-order-dependent double aggregate
    "regr_",       # regression aggregates, engine-specific accumulation
    "stddev",      # double variance accumulation
    "nullif(",     # z-score family: sd/mu are double aggregates upstream
)

# per-entry justifications for sites the generic patterns don't cover.
# Each entry documents WHY the round is not the tie class; anything new
# must be argued here, not silently added.
_ALLOWLIST: dict[str, str] = {
    # sums of raw parquet doubles (order-dependent) rounded at 2-4
    # digits before or after the division — absorbers by the same
    # argument as avg(); matched as sum( below
    "sum(": "summation-order-dependent double aggregate",
    # KMV estimator: round(k_norm / h_k, 4) quantizes the ESTIMATE — the
    # sketch contract, applied identically from identical 48-bit hash
    # integers; a tie would require the rational k_norm/h to land on the
    # .5e-4 grid, and the estimate is not an exact-parity quantity in
    # the first place (the oracle replays the identical estimator)
    "3.574732204225331e+16 /": "KMV estimate quantization (by design)",
    # sliding quantile: outputs land on the 5e-4 value grid (cents x
    # phi-fractions), exact at 6 decimals, so no .5e-6 tie exists
    "quantile_cont(b.c": "outputs on a 5e-4 grid — tie-free at 6 digits",
    # tumbling quantile / quantile threshold: quantile_cont over RAW
    # doubles — engine interpolation order may differ in ulps → absorber
    "quantile_cont(value": "interpolation over raw doubles — absorber",
    # fixed-point ln tables: su is an integer of pre-rounded 1e-6
    # fixed-point logs, so su/1e6 is ON the 1e-6 grid — no half-grid tie
    "su / 1000000.0": "fixed-point integer / 1e6 — on-grid, tie-free",
    "sum(lp_fp)::BIGINT / (count(*) * 1000000.0)":
        "fixed-point mean: numerator on the 1e-6 grid",
    # threshold = round(quantile_cont) of RAW doubles: interpolation
    # over engine-divergent inputs -> absorber (conformal's coverage
    # ratio itself is now unrounded)
    # min-max scaling of raw doubles: (v - min)/(max - min) is
    # bit-identical (min/max are exact selections, not sums) BUT the
    # result is a raw-double ratio with no grid — tie probability is
    # measure-zero-ish; queued with the r9 batch for uniformity
    "CASE WHEN s.vmax - s.vmin = 0":
        "r9 queue: double ratio of exact selections",
    # z-score: mu/sigma come from avg()/stddev() in the upstream CTE —
    # engine-divergent double accumulation → absorber (the aggregate is
    # just outside this round's regex scope)
    "/ s.sigma": "mu/sigma are double aggregates upstream — absorber",
}


def _is_absorbed(inner: str) -> str | None:
    for a in _ABSORBERS:
        if a in inner:
            return a
    for a in _ALLOWLIST:
        if a in inner:
            return a
    return None


def test_no_unabsorbed_ratio_rounding_in_oracles():
    offenders: list[str] = []
    for name, sql in sorted(plans.all_oracles().items()):
        for m in _ROUND2.finditer(sql):
            inner = m.group(1)
            if "/" not in inner:
                continue  # not a ratio — e.g. scaling before round
            if _is_absorbed(inner) is None:
                offenders.append(f"{name}: round({' '.join(inner.split())[:80]}…)")
    assert not offenders, (
        "in-query round() of a ratio without a documented absorber — the "
        "round-8 sf0.1 sweep tie class (SCALE.md). Emit the unrounded "
        "double (bit-identical cross-engine for exact-integer inputs) or "
        "justify an allowlist entry:\n  " + "\n  ".join(offenders)
    )


def test_fixed_entries_stay_unrounded():
    """The entries the round-8 sweep fix touched must never regain a
    2-arg round over a division (except avg/stddev absorbers and
    no-division rounds like conformal's quantile_cont threshold)."""
    fixed = [
        "join_interval_bucketed",
        "promql_avg_over_time",
        "promql_stdvar_over_time",
        "promql_stddev_over_time",
        "promql_subquery_max_rate",
        "promql_mad_over_time",
        "rollup_daily_from_hourly",
        "promql_vector_ratio_on",
        "promql_vector_ratio_ignoring",
        "promql_vector_share_group_left",
        "promql_ratio_group_right",
        "quality_repetition_stats",
        "quality_constraint_checks",
        "text_contamination_eval_overlap",
        "text_stats",
        "promql_rate_per_hour",
        "promql_irate_last_delta",
        "text_ngram_jaccard_pairs",
        "stream_counter_rate",
        "ml_static_threshold",
        "promql_histogram_quantile_p90",
        "ml_conformal_threshold",
        "profile_drift_halves",
    ]
    oracles = plans.all_oracles()
    for name in fixed:
        assert name in oracles, name
        for m in _ROUND2.finditer(oracles[name]):
            inner = m.group(1)
            assert "/" not in inner or "avg(" in inner or "stddev" in inner, (
                f"{name} regained a ratio round: {inner[:80]}"
            )
