"""Summarize docs/quality_campaign_r5.jsonl into a paired-seed table.

Prints, per seed: final AP for exact vs hybrid (and hybrid's int8-gather
eval overlay), the paired deltas, and the full AP curves — the acceptance
evidence VERDICT r4 #2 asks for (hybrid within exact's seed spread at
every checkpoint).

Usage: python tools/quality_campaign_report.py [path.jsonl]
"""

import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "docs/quality_campaign_r5.jsonl"
    runs = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            runs[(r["variant"], r["seed"])] = r

    seeds = sorted({s for (_, s) in runs})
    print(f"{len(runs)} runs, seeds {seeds}")
    print(f"{'seed':>4} {'exact AP':>9} {'hybrid AP':>9} {'h-e delta':>9} "
          f"{'int8 AP':>8} {'i8-h delta':>10} {'steps':>6}")
    deltas, i8deltas = [], []
    for s in seeds:
        e = runs.get(("exact", s))
        h = runs.get(("hybrid", s))
        e_ap = e["curve"][-1]["ap"] if e else float("nan")
        h_ap = h["curve"][-1]["ap"] if h else float("nan")
        i8 = (h or {}).get("int8_curve")
        i8_ap = i8[-1]["ap"] if i8 else float("nan")
        d = h_ap - e_ap if e and h else float("nan")
        d8 = i8_ap - h_ap if i8 else float("nan")
        if d == d:
            deltas.append(d)
        if d8 == d8:
            i8deltas.append(d8)
        steps = (h or e or {}).get("steps", "?")
        print(f"{s:>4} {e_ap:>9.3f} {h_ap:>9.3f} {d:>+9.3f} "
              f"{i8_ap:>8.3f} {d8:>+10.3f} {steps:>6}")
    if deltas:
        print(f"\nmean hybrid-exact delta: {sum(deltas)/len(deltas):+.4f} "
              f"over {len(deltas)} paired seeds")
    if i8deltas:
        print(f"mean int8-bf16 eval delta: {sum(i8deltas)/len(i8deltas):+.4f}")

    print("\nAP curves:")
    for (v, s), r in sorted(runs.items()):
        curve = " ".join(f"{p['step']//1000}k:{p['ap']:.3f}" for p in r["curve"])
        print(f"  {v:>7} s{s}: {curve}  (train {r.get('img_s', '?')} img/s)")


if __name__ == "__main__":
    main()
