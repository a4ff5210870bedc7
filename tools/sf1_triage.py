#!/usr/bin/env python3
"""Superlinear-scaleup triage: compare an sf1 bench sweep against
10x the sf0.1 per-query floors. A query is flagged only when its sf1
time exceeds scale x floor(sf0.1) (default scale 10 - linear budget
for 10x data; the q103-class re-evaluation bugs showed up at 30x).
Steal brackets ride along so a flagged row can be attributed to a
hypervisor burst before anyone reads it as an engine regression.

Usage: python3 tools/sf1_triage.py /tmp/bench_sf1.json [scale=10]
"""
import json
import sys


def main(path, scale=10.0):
    run = json.load(open(path))
    floors = json.load(open("BENCH_FLOORS.json"))["queries"]
    steal = run.get("steal_ticks", {})
    flagged, ok = [], 0
    for name, t in sorted(run["queries"].items()):
        f = floors.get(name)
        if f is None or t < 0:
            continue
        # sub-second floors are scheduler latency, not data work: a
        # fixed +1s grace keeps 4ms-floor queries from false-flagging
        budget = scale * f + 1.0
        if t > budget:
            flagged.append((name, t, f, t / max(f, 1e-9), steal.get(name)))
        else:
            ok += 1
    print(f"{ok} within {scale}x+1s budget, {len(flagged)} flagged")
    for name, t, f, ratio, s in sorted(flagged, key=lambda x: -x[3]):
        print(f"  {name}: sf1 {t:.2f}s vs sf0.1 floor {f:.2f}s "
              f"= {ratio:.1f}x (steal {s})")


if __name__ == "__main__":
    main(sys.argv[1], float(sys.argv[2]) if len(sys.argv) > 2 else 10.0)
