"""Targeted oracle-parity check for the optimization round: run the
named entries against their DuckDB oracles (driver-mimic compare) at
one or more scale dirs. Exits non-zero on any mismatch.

    python check_parity_r18.py name1 name2 ... [--sf sf0.001,sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session
from tests.oracle_harness import compare, run_oracle


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="sf0.001,sf0.01")
    args = ap.parse_args()

    spark = get_session(app_name="parity_r18")
    queries, oracles = plans.all_queries(), plans.all_oracles()
    failed = []
    for sf in args.sf.split(","):
        sf_dir = f"/root/testdata/{sf}"
        for n in args.names:
            if n not in oracles:
                print(f"SKIP {n}@{sf} (rows-only)")
                continue
            t0 = time.perf_counter()
            try:
                compare(
                    queries[n](spark, sf_dir),
                    run_oracle(sf_dir, oracles[n]),
                    f"{n}@{sf}",
                )
                print(f"OK   {n}@{sf} ({time.perf_counter() - t0:.1f}s)")
            except Exception as exc:  # noqa: BLE001
                failed.append(f"{n}@{sf}")
                print(f"FAIL {n}@{sf}: {exc}")
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("ALL GREEN")


if __name__ == "__main__":
    main()
