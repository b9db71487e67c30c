"""Compare two Bench JSON artifacts (BENCH_rNN.json / BENCH_SF*.json /
PE_rNN.json) and flag per-query drift beyond a threshold.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [ratio_threshold=1.5]

Exit 1 if any query regressed beyond the threshold — wire into a round's
self-check to catch real regressions now that min-of-3 makes the numbers
stable enough to compare (BENCHNOTES r05: a uniform 1.2-1.35x drift on
untouched queries under min-of-2 made this impossible).
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
ok = (old.get("queries") or old.get("workloads"))
nw = (new.get("queries") or new.get("workloads"))
bad = 0
for q in sorted(set(ok) & set(nw)):
    r = nw[q] / ok[q] if ok[q] > 0 else float("inf")
    flag = " <-- REGRESSED" if r > thr else ""
    if r > thr:
        bad += 1
    print(f"{q:28s} {ok[q]:8.2f} -> {nw[q]:8.2f}  {r:5.2f}x{flag}")
only_old = set(ok) - set(nw)
only_new = set(nw) - set(ok)
if only_old:
    print("dropped:", ", ".join(sorted(only_old)))
if only_new:
    print("added:  ", ", ".join(sorted(only_new)))
print(f"total {old['value']:.1f} -> {new['value']:.1f} s; {bad} regression(s) past {thr}x")
sys.exit(1 if bad else 0)
