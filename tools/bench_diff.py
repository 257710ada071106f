#!/usr/bin/env python3
"""Round-over-round bench comparison.

Usage: python3 tools/bench_diff.py <old_bench_full.json> <new_bench_full.json>

Prints per-query deltas (sorted by regression size), totals, stream
throughput, and the encode micro numbers — the narrative the judge
reads from BENCH_r{N}.json, reproducible locally.
"""
import json, sys

USAGE = "usage: python3 tools/bench_diff.py <old_bench_full.json> <new_bench_full.json>"

def load(p):
    return json.loads(open(p).read())

def main(old_path, new_path):
    old, new = load(old_path), load(new_path)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq), key=lambda k: oq[k] - nq[k])
    print(f"shared queries: {len(shared)}  "
          f"sum old={sum(oq[k] for k in shared):.2f}s "
          f"new={sum(nq[k] for k in shared):.2f}s")
    print(f"added: {sorted(set(nq) - set(oq))}")
    print(f"removed: {sorted(set(oq) - set(nq))}")
    # sign-aware sections: a query only counts as a regression if it
    # actually got slower (and vice versa), so the two lists never
    # overlap and never mislabel
    regressed = [k for k in shared if nq[k] > oq[k]]
    improved = [k for k in shared if nq[k] < oq[k]]
    print("\nworst regressions:")
    for k in regressed[:8]:
        print(f"  {k:32s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({nq[k]-oq[k]:+.2f}s)")
    print("best improvements:")
    for k in reversed(improved[-8:]):
        print(f"  {k:32s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({nq[k]-oq[k]:+.2f}s)")
    for name in ("stream", "micro"):
        o, n = old.get(name), new.get(name)
        if o or n:
            print(f"\n{name}: old={o}\n{' ' * len(name)}  new={n}")

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(USAGE)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
