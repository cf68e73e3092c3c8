#!/usr/bin/env python3
"""Round-over-round per-query bench diff: compare two bench_detail.json
files (developer tool; pairs with Bench.scala's durable detail output).

Usage: tools/diff_bench.py OLD.json NEW.json [threshold_ratio=1.5]
Prints queries slower than threshold x their old time (descending),
then queries added/removed, then the total.
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
oq, nq = old["queries"], new["queries"]

slower = [(k, oq[k], nq[k], nq[k] / oq[k])
          for k in sorted(set(oq) & set(nq))
          if oq[k] > 0 and nq[k] / oq[k] >= thr]
for k, o, n, r in sorted(slower, key=lambda t: -t[3]):
    print(f"SLOWER {k}: {o:.3f}s -> {n:.3f}s ({r:.2f}x)")
faster = [(k, oq[k], nq[k], oq[k] / nq[k])
          for k in sorted(set(oq) & set(nq))
          if nq[k] > 0 and oq[k] / nq[k] >= thr]
for k, o, n, r in sorted(faster, key=lambda t: -t[3]):
    print(f"faster {k}: {o:.3f}s -> {n:.3f}s ({r:.2f}x)")
for k in sorted(set(nq) - set(oq)):
    print(f"ADDED {k}: {nq[k]:.3f}s")
for k in sorted(set(oq) - set(nq)):
    print(f"REMOVED {k} (was {oq[k]:.3f}s)")
print(f"\ntotal: {old['value']:.1f}s/{len(oq)} -> "
      f"{new['value']:.1f}s/{len(nq)} "
      f"({new['value'] / len(nq):.3f} s/query)")

# Box-drift normalization: calib_secs is a fixed Spark-free CPU probe,
# so its ratio between the two files IS the host-speed ratio. A total
# ratio near the calib ratio means "the box moved, not the code".
if old.get("calib_secs") and new.get("calib_secs"):
    calib = new["calib_secs"] / old["calib_secs"]
    tot = (new["value"] / len(nq)) / (old["value"] / len(oq))
    print(f"calib ratio (box): {calib:.3f}   per-query ratio: {tot:.3f}   "
          f"code ratio (per-query / calib): {tot / calib:.3f}")
# Every suite query runs 32-way, so the MULTI-CORE probe is the right
# normalizer for the totals: it inflates under co-tenant steal that the
# single-thread probe cannot see (r16: mc 0.589 vs st 0.340 while 86
# queries drifted 1.5-50x on identical bytecode). Read the mc-normalized
# code ratio as the steal-corrected estimate; the single-thread ratio
# above remains the clock/thermal gauge.
if old.get("calib_mc_secs") and new.get("calib_mc_secs"):
    mc = new["calib_mc_secs"] / old["calib_mc_secs"]
    tot = (new["value"] / len(nq)) / (old["value"] / len(oq))
    print(f"calib_mc ratio (32-way steal): {mc:.3f}   "
          f"code ratio (per-query / calib_mc): {tot / mc:.3f}")
