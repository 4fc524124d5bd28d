"""Optimization-round isolation harness (guide §1.1/§1.4/§1.5).

Times individual registry entries end-to-end with the noop sink
(min-of-N, cache cleared per pass, jobs labeled) and optionally dumps
``.explain("formatted")`` to plans/r17/<name>_<tag>.txt so plan-shape
claims in OPTIMIZATION_r17.md are committed evidence.

Usage:
    python measure_r17opt.py [--passes N] [--explain TAG] [--out FILE] \
        name1 name2 ...

Prints one JSON line {"queries": {name: min_sec}, "passes": ...} and,
with --out, appends a JSON record to FILE for before/after bookkeeping.
A serial sentinel (counter_hourly) is interleaved every 4 entries so a
contended window self-attributes, same discipline as bench.py.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None, metavar="TAG",
                    help="dump explain('formatted') to plans/r17/<name>_<TAG>.txt")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "12g")
    spark = get_session(app_name="measure_r17opt")
    queries = plans.all_queries()
    here = os.path.dirname(os.path.abspath(__file__))

    names = [n for n in args.names if n in queries]
    missing = [n for n in args.names if n not in queries]
    if missing:
        print(f"WARN unknown entries skipped: {missing}", file=sys.stderr)

    def _noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Warm: table footers + one pass of each entry at sf0.001 (JIT).
    if not args.no_warm:
        warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
        for n in names:
            try:
                _noop(queries[n](spark, warm_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"WARN warm {n}: {exc}", file=sys.stderr)

    if args.explain:
        os.makedirs(os.path.join(here, "plans", "r17"), exist_ok=True)
        for n in names:
            try:
                txt = queries[n](spark, sf_dir)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(here, "plans", "r17", f"{n}_{args.explain}.txt"),
                    "w",
                ) as fh:
                    fh.write(txt)
            except Exception as exc:  # noqa: BLE001
                print(f"WARN explain {n}: {exc}", file=sys.stderr)

    sentinel: list[float] = []

    def _tick() -> None:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _noop(queries["counter_hourly"](spark, sf_dir))
        sentinel.append(round(time.perf_counter() - t0, 4))

    timings: dict[str, float] = {}
    series: dict[str, list[float]] = {n: [] for n in names}
    _tick()
    for p in range(args.passes):
        for i, n in enumerate(names):
            if i % 4 == 0 and p > 0:
                _tick()
            spark.catalog.clearCache()
            gc.collect()
            spark.sparkContext.setJobDescription(f"r17opt:{n}:pass{p}")
            t0 = time.perf_counter()
            try:
                _noop(queries[n](spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                print(f"ERR {n}: {exc}", file=sys.stderr)
                continue
            finally:
                spark.sparkContext.setJobDescription(None)
            took = round(time.perf_counter() - t0, 4)
            series[n].append(took)
            timings[n] = min(timings.get(n, float("inf")), took)
    _tick()

    rec = {
        "sf_dir": sf_dir,
        "passes": args.passes,
        "queries": {n: round(v, 4) for n, v in timings.items()},
        "series": series,
        "sentinel": sentinel,
        "ts": time.time(),
    }
    print(json.dumps({"queries": rec["queries"], "sentinel": sentinel}))
    if args.out:
        with open(args.out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
