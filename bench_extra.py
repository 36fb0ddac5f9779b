#!/usr/bin/env python
"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement; this file is free to evolve — guide §1.4 noop-sink
isolation per query, plan dumps, repeat control).

    python bench_extra.py --sf /root/testdata/sf1.0 --only semdedup_pairs \
        [--reps 3] [--warmups 1] [--plan plans/r06/x_before.txt]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def explain_formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--only", required=True, help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=1)
    ap.add_argument("--plan-dir", default=None,
                    help="write <name>.txt explain output here")
    ap.add_argument("--plan-suffix", default="")
    args = ap.parse_args()

    import __spark_entry__ as em
    from pdfwf_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="bench_extra", master=f"local[{cpus}]")
    qs = em.queries()

    results: dict[str, list[float]] = {}
    for name in args.only.split(","):
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if args.plan_dir:
            os.makedirs(args.plan_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            with open(
                os.path.join(args.plan_dir, f"{name}{args.plan_suffix}.txt"), "w"
            ) as f:
                f.write(explain_formatted(df))
        for _ in range(args.warmups):
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(args.reps):
            t0 = time.monotonic()
            qs[name](spark, args.sf).write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
        results[name] = runs
        print(f"{name}: {runs}", flush=True)
    print(json.dumps({"sf": args.sf, "cpus": cpus, "runs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
