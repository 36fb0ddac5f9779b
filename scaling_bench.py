#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors).

No real cluster exists in this sandbox, so per the sandbox evidence
plan (BASELINE.md §Target): run the IDENTICAL extraction job at
local[N] and local[4N] on the IDENTICAL deterministic input, report
throughput at both plus efficiency = thr(4N) / (4 x thr(N)).

Each run is a fresh subprocess (fresh JVM) of bench.py
--extract-only so the two measurements are fully isolated. Results
land in BENCH.md and on stdout as JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int, convs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py"), "--extract-only",
         "--convs", str(convs)],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    # ~1M turns (avg ~21 turns/conv incl. mega-convs): large enough
    # that UDF compute dominates fixed per-job overhead at local[8],
    # which is what the efficiency ratio is supposed to measure.
    n = int(os.environ.get("SCALING_N", "8"))
    convs = int(os.environ.get("SCALING_CONVS", "48000"))
    # each run_at warms internally (untimed full pass) and reports the
    # median of BENCH_REPS timed passes; the transcript parquet cache
    # is shared between the two subprocesses
    small = run_at(n, convs)
    large = run_at(4 * n, convs)
    thr_n = small["turns_per_sec"]
    thr_4n = large["turns_per_sec"]
    eff = thr_4n / (4 * thr_n)
    result = {
        "metric": "scaling efficiency thr(4N)/(4*thr(N))",
        "n_cores": n,
        "turns": small["turns"],
        "thr_n": thr_n,
        "thr_4n": thr_4n,
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    with open(os.path.join(HERE, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run (local[{n}] vs local[{4*n}])\n\n"
            f"| cores | turns | turns/sec |\n|---|---|---|\n"
            f"| {n} | {small['turns']} | {thr_n} |\n"
            f"| {4*n} | {large['turns']} | {thr_4n} |\n\n"
            f"Efficiency thr(4N)/(4·thr(N)) = **{eff:.3f}** "
            f"(target ≥ 0.8 → {'PASS' if eff >= 0.8 else 'FAIL'})\n"
        )


if __name__ == "__main__":
    main()
