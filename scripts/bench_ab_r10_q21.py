"""Round-10 code-version A/B: q21 at sf10, HEAD vs the round-8 close
commit, plus HEAD-with-off-switch legs for the two round-9 planner
changes adjacent to q21's machinery.

Targets the round-9 verdict's open question: q21_waiting_supplier
crossed the 2x bar at sf10 (r8 8.7-9.6 s / 1.8-2.0x -> r9 11.5 s /
2.5x) while DuckDB improved (5.4 -> 4.6 s) — is that the round-9
broadcast-margin change (4x -> 2x asymmetry guard), the plan-cache
pin-release-on-hit change, or host drift? Legs alternate rep-by-rep in
separate JVMs on one host so ambient load hits all versions
symmetrically; each leg is scripts/bench_subset.py with interleaved
DuckDB pairs.

Usage: python scripts/bench_ab_r10_q21.py [sf_dir] [rounds=3]
Writes BENCH_AB_Q21_sf10_r10.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/data/sf10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
R8_TREE = f"{REPO}/.r8ab"
QUERIES = "q21_waiting_supplier"

LEGS = [
    ("head", REPO, {}),
    ("r8", R8_TREE, {}),
    ("head_nopinrel", REPO, {"SPARK_GRAFT_NO_PINRELEASE_ON_HIT": "1"}),
    ("head_asym4", REPO, {"SPARK_GRAFT_BCAST_ASYM": "4"}),
]


def run_leg(engine: str, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, f"{REPO}/scripts/bench_subset.py",
         engine, SF, "2", QUERIES],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"leg produced no JSON: {out.stderr[-2000:]}")


def main() -> None:
    results: dict[str, list] = {name: [] for name, _, _ in LEGS}
    for rnd in range(ROUNDS):
        for name, engine, env in LEGS:
            rec = run_leg(engine, env)
            results[name].append(rec["queries"])
            brief = {q: v.get("spark") for q, v in rec["queries"].items()}
            print(f"round {rnd} leg {name}: {brief}", flush=True)
    summary: dict = {}
    for name, _, _ in LEGS:
        per_q: dict = {}
        for q in QUERIES.split(","):
            sparks = [min(r[q]["spark"]) if isinstance(r[q]["spark"], list)
                      else r[q]["spark"] for r in results[name]]
            ducks = [r[q].get("duck") for r in results[name] if r[q].get("duck")]
            ducks = [min(d) if isinstance(d, list) else d for d in ducks]
            per_q[q] = {
                "spark_best": min(sparks),
                "spark_all": sparks,
                "duck_best": min(ducks) if ducks else None,
                "ratio_best": (round(min(sparks) / min(ducks), 2)
                               if ducks else None),
            }
        summary[name] = per_q
    payload = {"metric": "ab_q21_sf10_r10", "sf_dir": SF, "rounds": ROUNDS,
               "legs": summary}
    path = f"{REPO}/BENCH_AB_Q21_sf10_r10.json"
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
