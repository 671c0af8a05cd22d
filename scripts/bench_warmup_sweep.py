"""Sweep JVM-warm-up / partition variants for the sf0.1 bench floor.

The committed floor analysis (FLOOR_ANALYSIS.md) attributes the residual
gap above the ~3.5 s job-granularity floor to JVM warm-up: identical
queries keep getting faster for several repetitions as C2 compiles
Spark's scheduler/codegen paths. This sweep measures, in separate JVMs
(JIT state is process-global so in-process A/B is confounded):

  V0  control: bench.py as shipped (lineitem count as the only warm-up)
  V1  + generic JIT warm-up: run 3 representative plan shapes (scan+agg,
      broadcast join+agg, window+sort) twice each, untimed, before any
      timed query — classic JMH steady-state methodology; cold numbers
      are still recorded per query
  V2  V1 + spark.sql.shuffle.partitions=1 (single reduce partition:
      global sort needs no range-exchange sampling job)
  V3  V1 + C1-only JIT (-XX:TieredStopAtLevel=1): cheap compiles reach
      "compiled" steady state much sooner on a ~10 s run

Usage: python scripts/bench_warmup_sweep.py [reps]
Each variant runs the full 18-query headline via a child process running
bench.py with env knobs; prints per-variant totals.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "V0_control": {"SPARK_GRAFT_BENCH_WARMUP": "0"},
    "V1_warmup": {"SPARK_GRAFT_BENCH_WARMUP": "1"},
    "V2_warmup_p1": {
        "SPARK_GRAFT_BENCH_WARMUP": "1",
        "SPARK_GRAFT_TINY_SHUFFLE_PARTITIONS": "1",
    },
    "V3_warmup_c1": {
        "SPARK_GRAFT_BENCH_WARMUP": "1",
        "SPARK_GRAFT_DRIVER_JAVA_OPTIONS": "-XX:TieredStopAtLevel=1",
    },
}


def run_variant(name: str, env_extra: dict[str, str]) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"{name}: no JSON\n{out.stderr[-2000:]}")


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    results: dict[str, list[float]] = {}
    # round-robin interleave so host drift doesn't flatter one variant
    for r in range(reps):
        for name, env_extra in VARIANTS.items():
            parsed = run_variant(name, env_extra)
            results.setdefault(name, []).append(parsed["value"])
            print(f"rep{r} {name}: {parsed['value']}s", flush=True)
    print(json.dumps({k: {"runs": v, "best": min(v)} for k, v in results.items()}))


if __name__ == "__main__":
    main()
