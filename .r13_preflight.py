"""r13 window pre-flight: first 50 queries() entries through the
driver-mimic compare on a VANILLA (driver-shaped, Arrow-off) session."""
import sys, time, traceback
sys.path.insert(0, '/root/repo')
from numalogic_prometheus_spark import plans
from sweep_oracles import build_vanilla_session
from tests.oracle_harness import compare, run_oracle

spark = build_vanilla_session()
sf_dir = "/root/testdata/sf0.01"
q, o = plans.all_queries(), plans.all_oracles()
window = list(q)[:50]
ok = bad = 0
for name in window:
    t0 = time.perf_counter()
    try:
        if name in o:
            compare(q[name](spark, sf_dir), run_oracle(sf_dir, o[name]), name)
            tag = "hash"
        else:
            n = len(q[name](spark, sf_dir).collect())
            assert n > 0, f"{name}: 0 rows"
            tag = f"rows-only {n}"
        print(f"PASS {name} {time.perf_counter()-t0:.1f}s ({tag})", flush=True)
        ok += 1
    except Exception as exc:
        traceback.print_exc()
        print(f"FAIL {name} {type(exc).__name__}: {str(exc)[:200]}", flush=True)
        bad += 1
print(f"# window pre-flight: {ok}/{ok+bad} green, {bad} failures")
