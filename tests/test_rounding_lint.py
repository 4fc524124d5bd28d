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
# marks the round as load-bearing (engine-divergent inputs). Every
# pattern names the SPECIFIC divergence source — a blanket pattern like
# "sum(" would absorb exact-integer sums, the flagship of the very tie
# class this lint blocks (round-9 narrowing, ADVICE r8 item 3).
_ABSORBERS = (
    "exp(",        # libm transcendental — no cross-libm bit guarantee
    "ln(",         # libm
    "avg(",        # summation-order-dependent double aggregate
    "regr_",       # regression aggregates, engine-specific accumulation
    "stddev",      # double variance accumulation
    "nullif(",     # z-score family: sd/mu are double aggregates upstream
    # quantile interpolation over raw doubles: DuckDB's quantile_cont
    # and Spark's percentile may order the a+(b−a)·frac arithmetic
    # differently → ulp-divergent inputs, round is the absorber
    "quantile_cont(",
    # sums whose summand is a RAW PARQUET DOUBLE (TPC-H l.* money
    # columns): accumulation order differs across engines. The dot is
    # load-bearing: "sum(l." does NOT match fixed-point integer sums
    # like sum(lp_fp) — those must be emitted unrounded instead.
    "sum(l.",
    # z-score family: s.sigma/s.mu come from avg()/stddev_samp() in an
    # upstream CTE — engine-divergent double accumulation reaches the
    # ratio even though the aggregate call sits outside the round()
    "/ s.sigma",
)

# Round 9 (VERDICT r8 #1): the per-entry allowlist is EMPTY — every
# former member was either unrounded (KMV estimates, bm25 su/1e6,
# unigram fixed-point mean, minmax ratio of exact selections: all
# bit-identical cross-engine, so their round() calls were pure tie-class
# liabilities) or generalized into a documented absorber pattern above
# (quantile_cont interpolation, raw-double sums, upstream-sigma ratios).
# Keep it empty: a new rounded ratio must either match a named absorber
# or be emitted unrounded.
_ALLOWLIST: dict[str, str] = {}


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
        # round-9 unrounds (the allowlist drain, VERDICT r8 #1)
        "ml_minmax_scaled",
        "agg_approx_distinct",
        "agg_hll_mergeable_daily",
        "text_bm25_topk",
        "text_unigram_logprob",
    ]
    oracles = plans.all_oracles()
    for name in fixed:
        assert name in oracles, name
        for m in _ROUND2.finditer(oracles[name]):
            inner = m.group(1)
            assert "/" not in inner or "avg(" in inner or "stddev" in inner, (
                f"{name} regained a ratio round: {inner[:80]}"
            )
