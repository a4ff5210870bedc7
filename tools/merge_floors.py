#!/usr/bin/env python3
"""Merge a bench run's per-query times into BENCH_FLOORS.json
(monotone best-of across runs — the steal-noise discipline: totals of
single runs are contaminated by hypervisor bursts, floors are not).

Usage: python3 tools/merge_floors.py <bench_json> [<bench_json> ...]
"""
import json, sys

def main(paths):
    floors = json.load(open("BENCH_FLOORS.json"))
    q = floors["queries"]
    for p in paths:
        run = json.load(open(p))
        times = run.get("queries", run)
        for name, t in times.items():
            if name not in q or t < q[name]:
                q[name] = round(t, 3)
    floors["n"] = len(q)
    floors["value"] = round(sum(q.values()), 1)
    json.dump(floors, open("BENCH_FLOORS.json", "w"), indent=1,
              sort_keys=True)
    print(str(floors["n"]) + " queries, floor total " + str(floors["value"]) + "s")

if __name__ == "__main__":
    main(sys.argv[1:])
