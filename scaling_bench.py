#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north rule: efficiency >= 0.8
between N and 4N executors).

No real cluster exists in this sandbox, so per the sandbox evidence
plan (BASELINE.md §Target): run the IDENTICAL extraction job at
local[N] and local[4N] on the IDENTICAL deterministic input and report
throughput at both plus efficiency = thr(4N) / (4 x thr(N)).

Protocol, built for a NOISY shared host (observed: identical runs
varying 2-4x over tens of minutes):
- each measurement is its own subprocess (fresh JVM) of
  `bench.py --extract-only`, which internally does one untimed full
  warm-up pass (python-worker pool spawn = the reference's model-init
  warm-start analog) + BENCH_REPS timed passes, reporting the median;
- the two levels are run INTERLEAVED (4N, N, 4N, N, ...) for `ROUNDS`
  rounds so slow host periods hit both levels equally;
- the reported throughput per level is the median across rounds.

Results land in BENCH.md and on stdout as JSON.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_at(cpus: int, convs: int, reps: int) -> dict:
    """One measurement subprocess, PINNED to exactly `cpus` cores.

    Pinning (taskset) is what makes the two levels comparable on one
    box: an unpinned local[N] run on a 4N-core host gets its JVM-side
    work (shuffle write, Arrow encode, window sort, GC) "for free" on
    the idle cores, inflating thr(N) — a real N-core executor pays
    that overhead inside its N cores. Measured here: unpinned local[8]
    read 2535 turns/s/core vs 1486 at local[32] purely from this
    artifact.
    """
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), BENCH_REPS=str(reps))
    out = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}",
         sys.executable, os.path.join(HERE, "bench.py"), "--extract-only",
         "--convs", str(convs)],
        env=env, capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i % 7
    return s


def host_cpu_probe(n: int, per: int = 6_000_000) -> float:
    """Pure-CPU N-vs-4N process scaling of the HOST right now:
    eff = ops/s(4N workers) / (4 x ops/s(N workers)), pinned like the
    engine runs. The engine cannot scale better than the host lets
    same-shaped pure-CPU work scale, so this co-measured ceiling is
    the denominator for interpreting a sub-0.8 engine median: an
    engine efficiency AT the probe ceiling is a throttled-host
    observation, not an engine regression. (Observed on this VM:
    probe itself swings 0.6-1.0 across windows.)"""
    import time
    from concurrent.futures import ProcessPoolExecutor

    # restore the affinity we ENTERED with, not range(cpu_count):
    # the process may itself be pinned (the repo's own protocol), and
    # a restricted cpuset can expose fewer CPUs than cpu_count
    entry_mask = os.sched_getaffinity(0)

    def measure(workers: int) -> float:
        os.sched_setaffinity(0, set(range(workers)))
        try:
            t0 = time.monotonic()
            with ProcessPoolExecutor(workers) as ex:
                list(ex.map(_burn, [per] * workers * 3))
            return workers * 3 * per / (time.monotonic() - t0)
        finally:
            os.sched_setaffinity(0, entry_mask)

    thr_n = measure(n)
    thr_4n = measure(4 * n)
    return thr_4n / (4 * thr_n)


def main() -> None:
    # ~1M turns (avg ~21 turns/conv incl. mega-convs): large enough
    # that UDF compute dominates fixed per-job overhead at local[N].
    # default N=4 (4 vs 16 cores): measured pure-CPU scaling ceiling of
    # this VM is ~0.74 at 8->32 (host throttles past ~16 busy cores),
    # so 8->32 cannot evidence engine scaling; 4->16 has a clean
    # hardware ceiling. See BENCH.md "Measurement-methodology findings".
    n = int(os.environ.get("SCALING_N", "4"))
    convs = int(os.environ.get("SCALING_CONVS", "48000"))
    rounds = int(os.environ.get("SCALING_ROUNDS", "3"))
    reps = int(os.environ.get("BENCH_REPS", "1"))

    probe_pre = host_cpu_probe(n)
    print(json.dumps({"host_probe_pre": round(probe_pre, 3)}), file=sys.stderr)

    thr_small: list[float] = []
    thr_large: list[float] = []
    effs: list[float] = []
    turns = 0
    for r in range(rounds):
        large = run_at(4 * n, convs, reps)
        small = run_at(n, convs, reps)
        thr_large.append(large["turns_per_sec"])
        thr_small.append(small["turns_per_sec"])
        effs.append(large["turns_per_sec"] / (4 * small["turns_per_sec"]))
        turns = small["turns"]
        print(json.dumps({"round": r, "thr_n": small["turns_per_sec"],
                          "thr_4n": large["turns_per_sec"],
                          "eff": round(effs[-1], 3)}), file=sys.stderr)

    thr_n = statistics.median(thr_small)
    thr_4n = statistics.median(thr_large)
    # Two estimators, both reported:
    # - median of PER-ROUND ratios: each round's pair is time-adjacent,
    #   so slow host drift hits numerator and denominator together and
    #   cancels in the ratio;
    # - BEST-WINDOW ratio max(thr_4N)/(4*max(thr_N)): external
    #   contention on this box only ever SLOWS a run (observed: the
    #   same 16-core job measured 6k and 25k turns/s twenty minutes
    #   apart with the host 99% idle in between), so the fastest
    #   observation per level is the honest estimate of engine
    #   capability — the timeit-min convention applied per level.
    # The per-round median is the headline when rounds are clean; the
    # best-window number guards against rounds where a contaminated
    # 4N run yields a physically implausible ratio (4x cores < 1.5x
    # throughput on a job that demonstrably scales).
    eff = statistics.median(effs)
    # diagnostics, never the gate:
    # - best same-round ratio (numerator and denominator time-adjacent,
    #   so host drift cancels — the honest "cleanest round" estimate);
    # - cross-round best-window max(thr4N)/(4*max(thrN)), which can
    #   pair observations from different host conditions and is
    #   therefore only evidence, not a gate.
    eff_best_round = max(effs)
    eff_best_window = max(thr_large) / (4 * max(thr_small))
    result = {
        "metric": "scaling efficiency thr(4N)/(4*thr(N))",
        "n_cores": n,
        "turns": turns,
        "rounds": rounds,
        "thr_n_all": thr_small,
        "thr_4n_all": thr_large,
        "thr_n": round(thr_n, 1),
        "thr_4n": round(thr_4n, 1),
        "eff_all": [round(e, 3) for e in effs],
        "efficiency": round(eff, 3),
        "efficiency_best_round": round(eff_best_round, 3),
        "efficiency_best_window": round(eff_best_window, 3),
        "target": 0.8,
        # THE gate is the per-round median — one declared primary
        # estimator, so a single lucky 4N window can never mask a
        # genuine scaling regression. The best-round/best-window
        # numbers are reported for forensics on contaminated runs.
        "pass": eff >= 0.8,
    }
    probe_post = host_cpu_probe(n)
    result["host_probe_pre"] = round(probe_pre, 3)
    result["host_probe_post"] = round(probe_post, 3)
    # engine efficiency normalized by what the host let pure-CPU work
    # scale in the same window — > 1.0 means the engine scaled BETTER
    # than same-shaped process parallelism did
    host_ceiling = max(probe_pre, probe_post)
    result["eff_vs_host_ceiling"] = round(eff / host_ceiling, 3) if host_ceiling else None
    print(json.dumps(result))

    with open(os.path.join(HERE, "BENCH.md"), "a") as f:
        f.write(
            f"\n## Scaling run (local[{n}] vs local[{4*n}], "
            f"{rounds} interleaved rounds, median)\n\n"
            f"| cores | turns | turns/sec (median) | all rounds |\n|---|---|---|---|\n"
            f"| {n} | {turns} | {thr_n:.1f} | {[round(t) for t in thr_small]} |\n"
            f"| {4*n} | {turns} | {thr_4n:.1f} | {[round(t) for t in thr_large]} |\n\n"
            f"Per-round efficiency: {[round(e, 3) for e in effs]}\n\n"
            f"Efficiency (PRIMARY gate: median of per-round "
            f"thr(4N)/(4·thr(N))) = **{eff:.3f}** (target ≥ 0.8 → "
            f"{'PASS' if eff >= 0.8 else 'FAIL'}); diagnostics: "
            f"best same-round = {eff_best_round:.3f}, cross-round "
            f"best-window = {eff_best_window:.3f}; host pure-CPU "
            f"probe (co-measured ceiling) = {probe_pre:.3f} pre / "
            f"{probe_post:.3f} post, engine/host-ceiling = "
            f"{eff / max(probe_pre, probe_post):.3f}\n"
        )


if __name__ == "__main__":
    main()
