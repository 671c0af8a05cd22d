"""Round-9 code-version A/B: HEAD vs the round-7 close commit at sf10,
plus HEAD-with-off-switch legs, alternated leg-by-leg on one host.

Targets the round-8 verdict's open question: q05 (4.35x -> 4.3-4.9x) and
q13 (4.68x -> 5.3-6.0x) drifted worse at sf10 while q03/q08 improved —
is that the round-8 planner changes (payload gate + sideways information
passing touch q05's defer path; q13 is the eager-agg shape) or host
drift? Legs alternate HEAD, R7, HEAD(no-defer), HEAD(no-eager) so
ambient load hits all versions symmetrically; each leg is a fresh JVM
running scripts/bench_subset.py with interleaved DuckDB pairs.

Usage: python scripts/bench_ab_r9.py [sf_dir] [rounds=3]
Writes BENCH_AB_HEAD_R7_sf10.json at the repo root.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/data/sf10"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
R7_TREE = f"{REPO}/.r7ab"
QUERIES = ("q05_nation_volume,q13_customer_distribution,"
           "q03_shipping_priority,q08_market_share")

LEGS = [
    ("head", REPO, {}),
    ("r7", R7_TREE, {}),
    ("head_nodefer", REPO, {"SPARK_GRAFT_NO_DEFER_DIMS": "1"}),
    ("head_noeager", REPO, {"SPARK_GRAFT_NO_EAGER_AGG": "1"}),
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
            sparks = [r[q]["spark"] for r in results[name]]
            ducks = [r[q].get("duck") for r in results[name] if r[q].get("duck")]
            per_q[q] = {
                "spark_best": min(sparks),
                "spark_all": sparks,
                "duck_best": min(ducks) if ducks else None,
                "ratio_best": (round(min(sparks) / min(ducks), 2)
                               if ducks else None),
            }
        summary[name] = per_q
    payload = {"metric": "ab_head_vs_r7", "sf_dir": SF, "rounds": ROUNDS,
               "legs": summary}
    path = f"{REPO}/BENCH_AB_HEAD_R7_sf10.json"
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
