"""Capture .explain('formatted') for named queries into plans/r18/.

    python capture_plans_r18.py <suffix> name1 name2 ...

suffix is 'before' or 'after'; output files are
plans/r18/<name>_<suffix>.txt (driver-judge evidence contract).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from numalogic_prometheus_spark import plans
from numalogic_prometheus_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix, names = sys.argv[1], sys.argv[2:]
    spark = get_session(app_name=f"plans_r18_{suffix}")
    queries = plans.all_queries()
    out_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "plans", "r18"
    )
    os.makedirs(out_dir, exist_ok=True)
    for n in names:
        df = queries[n](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
