"""sf1.0-class oracle sweep, part 2 of 2: every oracle-backed entry NOT
already proven by the committed heaviest-21 spot sweep
(SWEEP_sf1_spot.log). Union of the two logs == the FULL registry
differential-verified at ~10x the driver's sf0.1 data
(.testdata_sf1, built by make_bigsf.py).

The spot sweep (VERDICT r8 #2) proved the heavy tail; this run walks
the remaining entries, which are individually light but collectively
the breadth of the surface — sum-overflow, timestamp-edge and approx-
tie divergence would first appear at this volume. Entries registered
after the spot sweep ran (round-9 additions) are picked up here
automatically because they are absent from the spot log.

Timing caveat: this run executes in the BACKGROUND of an active dev
session, so per-entry seconds are contended and not comparable to the
quiet-host spot-sweep numbers; the artifact's claim is correctness
(PASS/FAIL), not latency.

Writes SWEEP_sf1_rest.log (committed); exits non-zero on any mismatch.
Usage: python rest_sweep_sf1.py [name ...]
With names, runs ONLY those entries and APPENDS to the log (the path
that picks up entries registered after the main run).
"""

from __future__ import annotations

import os
import re
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session
from tests.oracle_harness import compare, run_oracle

_REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.path.join(_REPO, ".testdata_sf1")


def already_proven() -> set[str]:
    done: set[str] = set()
    with open(os.path.join(_REPO, "SWEEP_sf1_spot.log")) as f:
        for line in f:
            m = re.match(r"PASS (\S+) ", line.strip())
            if m:
                done.add(m.group(1))
    return done


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name="rest-sweep-sf1")
    queries, oracles = plans.all_queries(), plans.all_oracles()
    only = sys.argv[1:]
    if only:
        names = [n for n in only if n in oracles]
        mode, header = "a", f"# appended run: {' '.join(names)}\n"
    else:
        done = already_proven()
        names = [n for n in sorted(oracles) if n not in done]
        mode, header = "w", (
            f"# sf1.0-class sweep part 2 at {SF_DIR}: {len(names)} "
            f"entries not in SWEEP_sf1_spot.log ({len(done)} already "
            "proven there); contended-background timings\n"
        )
    log_path = os.path.join(_REPO, "SWEEP_sf1_rest.log")
    ok = bad = 0
    t_all = time.perf_counter()
    with open(log_path, mode) as log:
        log.write(header)
        for name in names:
            t0 = time.perf_counter()
            try:
                compare(
                    queries[name](spark, SF_DIR),
                    run_oracle(SF_DIR, oracles[name]),
                    name,
                )
                line = f"PASS {name} {time.perf_counter() - t0:.1f}s"
                ok += 1
            except Exception as exc:  # noqa: BLE001
                line = (
                    f"FAIL {name} {time.perf_counter() - t0:.1f}s "
                    f"{type(exc).__name__}: {str(exc)[:300]}"
                )
                traceback.print_exc()
                bad += 1
            print(line, flush=True)
            log.write(line + "\n")
            log.flush()
        summary = (
            f"# {ok}/{ok + bad} green, {bad} mismatches, "
            f"{time.perf_counter() - t_all:.0f}s total"
        )
        print(summary)
        log.write(summary + "\n")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
