"""Merge a bench run into BENCH_FLOOR.json (per-query best-ever times).

Usage: python tools/update_bench_floor.py [--reset q1,q2,...] BENCH_rN.json [...]

The floor is the min over all supplied runs and the existing floor, kept
per (scale factor, core count) — bench.py flags any future run at the
same (sf, cpus) that exceeds a floor by more than noise (see bench.py
for the thresholds). Runs at a different core count are skipped: several
sf0.1 entries legitimately run FASTER at low core counts (per-task setup
scales with cores), so an 8-core min is an unreachable floor for a
32-core run (round-15 verdict item 2). Legacy run files without a
"cpus" field need --cpus to assert their core count. Commit the updated
floor alongside the change that achieved it.

``--reset`` names queries whose committed floor is known-dishonest (e.g.
recorded under cross-run cache hits before bench.py released tracked
persists per run): their floors are REPLACED by the supplied run's
times instead of min-merged. Document every reset in docs/perf.md.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR_PATH = os.path.join(REPO, "BENCH_FLOOR.json")


def main(argv: list[str]) -> None:
    reset: set[str] = set()
    paths: list[str] = []
    assumed_cpus: int | None = None
    it = iter(argv)
    for arg in it:
        if arg == "--reset":
            reset.update(next(it).split(","))
        elif arg == "--cpus":
            assumed_cpus = int(next(it))
        else:
            paths.append(arg)

    floor: dict = {"sf": None, "cpus": None, "queries": {}}
    if os.path.exists(FLOOR_PATH):
        with open(FLOOR_PATH) as fh:
            floor = json.load(fh)
    for name in reset:
        floor["queries"].pop(name, None)

    for path in paths:
        with open(path) as fh:
            run = json.load(fh)
        queries = run.get("queries")
        if not queries:
            print(f"skip {path}: no per-query timings", file=sys.stderr)
            continue
        run_cpus = run.get("cpus", assumed_cpus)
        if run_cpus is None:
            print(
                f"skip {path}: no cpus field (pass --cpus N for legacy runs)",
                file=sys.stderr,
            )
            continue
        if floor["sf"] is None:
            floor["sf"] = run.get("sf")
        elif run.get("sf") != floor["sf"]:
            print(
                f"skip {path}: sf={run.get('sf')} != floor sf={floor['sf']}",
                file=sys.stderr,
            )
            continue
        if floor.get("cpus") is None:
            if floor["queries"]:
                # A legacy floor file with floors of unknown core-count
                # provenance must not be min-merged (it would re-create
                # the cross-core poisoning this field exists to stop):
                # rebuild it from scratch instead.
                print(
                    f"skip {path}: floor file has queries but no 'cpus' "
                    "field — delete BENCH_FLOOR.json and rebuild from "
                    "runs of one core count",
                    file=sys.stderr,
                )
                continue
            floor["cpus"] = run_cpus
        elif run_cpus != floor["cpus"]:
            print(
                f"skip {path}: cpus={run_cpus} != floor cpus={floor['cpus']}",
                file=sys.stderr,
            )
            continue
        for name, t in queries.items():
            prev = floor["queries"].get(name)
            floor["queries"][name] = min(t, prev) if prev else t

    with open(FLOOR_PATH, "w") as fh:
        json.dump(floor, fh, indent=2, sort_keys=True)
        fh.write("\n")
    print(f"wrote {FLOOR_PATH} ({len(floor['queries'])} queries)")


if __name__ == "__main__":
    main(sys.argv[1:])
