"""Full-registry oracle parity sweep at an arbitrary scale factor
(VERDICT r7 next-round #3): every oracle-backed entry through the
driver-mimic DuckDB compare (tests/oracle_harness.py — row count,
sorted columns, canonicalized value multiset) in ONE Spark session.

All prior hash verification ran at sf0.001 (pytest) / sf0.01 (driver);
sf0.1 is where sum-overflow, approx-tie and timestamp-edge divergence
would first appear. Usage:

    SPARK_GRAFT_SWEEP_SF_DIR=/root/testdata/sf0.1 python sweep_oracles.py

Writes one line per entry to stdout and a committed log
(SWEEP_sf{sf}.log); exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session
from tests.oracle_harness import compare, run_oracle


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name=f"sweep-sf{sf}")
    queries, oracles = plans.all_queries(), plans.all_oracles()
    log_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"SWEEP_sf{sf}.log"
    )
    ok = bad = 0
    t_all = time.perf_counter()
    with open(log_path, "w") as log:
        log.write(f"# oracle parity sweep at {sf_dir} ({len(oracles)} entries)\n")
        for name in sorted(oracles):
            t0 = time.perf_counter()
            try:
                compare(
                    queries[name](spark, sf_dir),
                    run_oracle(sf_dir, oracles[name]),
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
