#!/usr/bin/env python3
"""Carried-query creep triage (r13 verdict ask #2).

Compares two full-bench artifacts' extended per-query warm times and
prints the ratio distribution plus the canary trace of the newer run,
so JVM aging / host steal (canary inflates too) is distinguishable
from operator regression (canary flat, specific queries inflate).

Usage: python3 tools/bench_creep.py OLD.json NEW.json
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    o, n = old["extended"], new["extended"]
    shared = sorted(k for k in o if k in n
                    and isinstance(o[k], (int, float)) and o[k] > 0
                    and isinstance(n[k], (int, float)) and n[k] > 0)
    ratios = {k: n[k] / o[k] for k in shared}
    med = statistics.median(ratios.values())
    print(f"shared queries: {len(shared)}  median ratio: {med:.3f}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:12]
    print("worst inflators:")
    for k, r in worst:
        print(f"  {k:36s} {o[k]:7.3f} -> {n[k]:7.3f}  ({r:.2f}x)")
    over2 = [k for k, r in ratios.items() if r > 2.0]
    print(f"over 2x: {len(over2)} {over2}")
    buckets = [0, 0, 0, 0]
    for r in ratios.values():
        if r < 1.15:
            buckets[0] += 1
        elif r < 1.5:
            buckets[1] += 1
        elif r < 2.0:
            buckets[2] += 1
        else:
            buckets[3] += 1
    print(f"buckets <1.15 / 1.15-1.5 / 1.5-2 / >2: {buckets}")
    canary = new.get("canary")
    if canary:
        print("canary (fixed sfDir-independent workload through the "
              "extended run):")
        for s in canary["samples"]:
            # tolerate partial artifacts (a sample missing a key must not
            # kill the triage that exists to explain a broken run)
            print(f"  after {s.get('after_n', 0):>4} queries: "
                  f"{s.get('sec', 0.0):.3f} s"
                  f"  persistent_rdds={s.get('persistent_rdds')}"
                  f"  heap_mb={s.get('heap_mb')}")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(f"usage: {sys.argv[0]} OLD.json NEW.json")
    main(sys.argv[1], sys.argv[2])
