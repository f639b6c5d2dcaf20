#!/usr/bin/env python
"""Time EVERY catalog entry sequentially (r17 optimization round tool).

Methodology mirrors bench.py's sequential lane: warm-up pass at sf0.01
(codegen/JIT) + one at the target SF, then N timed reps per query with
the full-result Arrow fetch; per-query MIN is reported (additive-noise
estimator). ``no_release()`` keeps operator indexes resident like the
bench's steady-state serving posture WITHIN one entry's reps.

r18 hygiene (VERDICT r17 #9): state is released BETWEEN entries —
plan-cache eviction + spark.catalog.clearCache() after each entry's
reps. The r17 run held every entry's persisted frames resident across
the whole 374-entry drain, and late entries' first calls measured
eviction-and-recompute pressure from 300+ unrelated resident indexes
(khop's first_call read 119.7 s vs 15.8 s in a fresh session, same
code). Warm numbers are unaffected (an entry's own indexes stay
resident during its reps); first_call rows now measure the entry, not
the tool's accumulated storage debt.

Usage: python tools/time_catalog.py [out.json] [reps]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/catalog_times.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    os.environ.setdefault("SPARK_GRAFT_AQE", "false")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "4")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")

    from de4ml_spark.cache import no_release
    from de4ml_spark.queries import catalog
    from de4ml_spark.session import get_spark

    spark = get_spark("time_catalog")
    qs = catalog.queries()

    def _fetch(df) -> int:
        try:
            return df.toArrow().num_rows
        except Exception:  # noqa: BLE001
            return len(df.collect())

    times: dict[str, float] = {}
    plan_build: dict[str, float] = {}
    for name, fn in qs.items():
        with no_release():
            # first target-SF call builds the plan (memoized after)
            t0 = time.time()
            try:
                _fetch(fn(spark, sf_dir))
            except Exception as e:  # noqa: BLE001
                print(f"# {name} FAILED: {e}", file=sys.stderr)
                times[name] = -1.0
                continue
            first = time.time() - t0
            plan_build[name] = round(first, 3)
            ts = []
            for _ in range(reps):
                t0 = time.time()
                _fetch(fn(spark, sf_dir))
                ts.append(time.time() - t0)
            times[name] = round(min(ts), 3)
            print(f"# {name}: min {times[name]:.3f}s (first {first:.2f}s)", file=sys.stderr)
        # inter-entry hygiene (header note): drop this entry's memoized
        # plan and every persisted block before the next entry's
        # first-call measurement
        catalog.evict(name, sf_dir)
        spark.catalog.clearCache()
    spark.stop()

    ranked = dict(sorted(times.items(), key=lambda kv: -kv[1]))
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "reps": reps, "times": ranked,
                   "first_call": plan_build}, f, indent=1)
    top = list(ranked.items())[:25]
    print(json.dumps({"total": round(sum(v for v in times.values() if v > 0), 2),
                      "top25": top}))


if __name__ == "__main__":
    main()
