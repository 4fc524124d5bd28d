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

Vanilla-session mode (VERDICT r12 #2 — the r12 driver failure was an
entry whose *fixture writer* silently depended on the engine session's
Arrow conf, which `RUNTIME_INVARIANTS` deliberately does NOT re-pin):

    SPARK_GRAFT_SWEEP_VANILLA=1 SPARK_GRAFT_SWEEP_SF_DIR=... python sweep_oracles.py

builds the most vanilla session the driver contract allows — bare
``SparkSession.builder.master(local[N])`` plus shuffle partitions, NO
engine confs; only what ``sources.tables.load_table`` itself re-pins
applies — runs EVERY registered entry (oracle-backed through the DuckDB
compare, rows-only through a collect-count > 0 check, since the driver
checks rows-only entries too and r12's failure was one), and writes
``SWEEP_sf{sf}_vanilla.log``."""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session
from tests.oracle_harness import compare, run_oracle


def build_vanilla_session():
    """The driver-shaped session: master + shuffle partitions and NOTHING
    else — no Arrow, no AQE tweaks, no timezone/map-dedup/nanos confs
    (load_table re-pins the runtime invariants itself; anything a query
    needs beyond that is a latent driver failure, the r12 class)."""
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sweep-vanilla")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "false"
    ), "vanilla sweep session unexpectedly has Arrow enabled"
    return spark


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SWEEP_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    vanilla = os.environ.get("SPARK_GRAFT_SWEEP_VANILLA") == "1"
    if vanilla:
        spark = build_vanilla_session()
    else:
        spark = get_session(app_name=f"sweep-sf{sf}")
    queries, oracles = plans.all_queries(), plans.all_oracles()
    suffix = "_vanilla" if vanilla else ""
    log_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"SWEEP_sf{sf}{suffix}.log",
    )
    # The vanilla sweep covers the WHOLE registry: the driver checks
    # rows-only entries too (rows>0, no error) and the r12 failure was
    # exactly such an entry.
    names = sorted(queries) if vanilla else sorted(oracles)
    ok = bad = 0
    t_all = time.perf_counter()
    with open(log_path, "w") as log:
        session_note = "vanilla driver-shaped session" if vanilla else "engine session"
        log.write(
            f"# oracle parity sweep at {sf_dir} "
            f"({len(names)} entries, {session_note})\n"
        )
        for name in names:
            t0 = time.perf_counter()
            try:
                if name in oracles:
                    compare(
                        queries[name](spark, sf_dir),
                        run_oracle(sf_dir, oracles[name]),
                        name,
                    )
                    line = f"PASS {name} {time.perf_counter() - t0:.1f}s"
                else:
                    n = len(queries[name](spark, sf_dir).collect())
                    if n == 0:  # explicit raise: assert dies under -O
                        raise ValueError(
                            f"{name}: rows-only entry returned 0 rows"
                        )
                    line = (
                        f"PASS {name} {time.perf_counter() - t0:.1f}s "
                        f"(rows-only, {n} rows)"
                    )
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
