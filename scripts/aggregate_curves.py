"""Aggregate per-checkpoint curve evals (/tmp/curve_one/*/out.json, written
by the round-3 one-checkpoint-per-process TPU loop) plus the committed
reference curves into the RESULTS.md learning-curve table rows."""
import glob
import json
import re
import sys

ref = {}
for s in (0, 1):
    for row in map(json.loads, open(f"artifacts/curve_ref_s{s}.json")):
        ref.setdefault(row["episodes"], {})[f"ref s{s}"] = row["win_rate_vs_random"]

ours = {}
for path in glob.glob("/tmp/curve_one/*/out.json"):
    m = re.search(r"ourrun_s(\d)_tpu_ep(\d+)", path)
    if not m:
        continue
    s, ep = int(m.group(1)), int(m.group(2))
    data = json.load(open(path))
    (entry,) = [e for v in data.values() for e in v]
    ours.setdefault(ep, {})[f"ours s{s}"] = entry["win_rate_vs_random"]

print("| episodes | ref s0 | ref s1 | ours s0 | ours s1 |")
print("|---|---|---|---|---|")
for ep in sorted(set(ref) | set(ours)):
    if ep == 0:
        continue
    cells = []
    for col in ("ref s0", "ref s1"):
        v = ref.get(ep, {}).get(col)
        cells.append(f"{v:.3f}"[1:] if v is not None else "—")
    for col in ("ours s0", "ours s1"):
        v = ours.get(ep, {}).get(col)
        cells.append(f"{v:.3f}"[1:] if v is not None else "—")
    print(f"| {ep//1000}k | " + " | ".join(cells) + " |")

# max |ours - ref| per seed-matched point, for the "within seed band" claim
diffs = []
for ep, cols in ours.items():
    if ep == 0:
        continue
    for s in (0, 1):
        o, r = cols.get(f"ours s{s}"), ref.get(ep, {}).get(f"ref s{s}")
        if o is not None and r is not None:
            diffs.append((abs(o - r), ep, s))
if diffs:
    mx = max(diffs)
    print(f"\nmax |ours-ref| seed-matched: {mx[0]:.3f} at ep{mx[1]} s{mx[2]}; "
          f"mean {sum(d for d,_,_ in diffs)/len(diffs):.3f} over {len(diffs)} points", file=sys.stderr)
