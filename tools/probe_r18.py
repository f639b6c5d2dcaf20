#!/usr/bin/env python
"""r18 fresh-plan probe: time named catalog entries in a FRESH session
each (first call + warm min), bench-env confs, noop-free full fetch —
the same posture as the r17 scale-probe rows. Usage:
  python tools/probe_r18.py <sf_dir> <reps> query [query ...]
Prints one JSON line {query: {"first": s, "warm": s}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, reps = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]
    out = {}
    for name in names:
        code = f"""
import sys, time, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import os
os.environ.setdefault("SPARK_GRAFT_AQE", "false")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
from de4ml_spark.cache import no_release
from de4ml_spark.queries import catalog
from de4ml_spark.session import get_spark
spark = get_spark("probe")
qs = catalog.queries()
fn = qs[{name!r}]
def fetch(df):
    try:
        return df.toArrow().num_rows
    except Exception:
        return len(df.collect())
with no_release():
    t0 = time.time(); fetch(fn(spark, {sf_dir!r})); first = time.time() - t0
    ts = []
    for _ in range({reps}):
        t0 = time.time(); fetch(fn(spark, {sf_dir!r})); ts.append(time.time() - t0)
print(json.dumps({{"first": round(first, 2), "warm": round(min(ts), 3)}}))
"""
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=900, env=os.environ,
        )
        try:
            out[name] = json.loads(res.stdout.strip().splitlines()[-1])
        except Exception:
            out[name] = {"error": res.stderr[-300:]}
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
