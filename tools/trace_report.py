"""Aggregate a jax.profiler device trace by named scope.

Pairs the Perfetto trace (vm.trace.json.gz) with the SAME compile's HLO text
(op_name metadata carries the jax.named_scope path) and prints ms/iter per
scope — the map from device time to source regions that op names alone
don't give.

Usage:
    python tools/trace_report.py --trace /tmp/trace/plugins/profile/*/vm.trace.json.gz \
        --hlo /tmp/hlo.txt --iters 3 [--depth 3]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re


def load_opnames(hlo_path: str) -> dict:
    """op name (e.g. fusion.42) -> op_name metadata string."""
    out = {}
    pat = re.compile(r"%(\S+?) = .*?op_name=\"([^\"]*)\"")
    with open(hlo_path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                out[m.group(1)] = m.group(2)
    return out


def scope_of(op_name: str, depth: int) -> str:
    # strip the jit(...)/Module prefix, keep the first `depth` scope segments
    parts = [p for p in op_name.split("/") if p]
    while parts and (parts[0].startswith("jit(") or parts[0][:1].isupper()):
        parts.pop(0)
    if not parts:
        return "(top)"
    return "/".join(parts[:depth])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace", required=True)
    p.add_argument("--hlo", required=True)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--ops-of", default=None,
                   help="also print the top ops inside this scope")
    args = p.parse_args()

    paths = sorted(glob.glob(args.trace))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    # device pid
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    events = [
        e for e in data["traceEvents"]
        if e.get("ph") == "X" and e.get("pid") in dev_pids
    ]
    opnames = load_opnames(args.hlo)

    by_scope = collections.Counter()
    by_op_in = collections.Counter()
    unattributed = collections.Counter()
    total = 0.0
    for e in events:
        name = e["name"]
        if name.startswith("jit_"):  # outer program event double-counts
            continue
        dur = e["dur"]
        total += dur
        meta = opnames.get(name)
        if meta is None:
            unattributed[name] += dur
            continue
        sc = scope_of(meta, args.depth)
        by_scope[sc] += dur
        if args.ops_of and sc.startswith(args.ops_of):
            by_op_in[name] += dur

    it = args.iters
    print(f"total device time: {total / it / 1000:.2f} ms/iter over {it} iters")
    for sc, us in by_scope.most_common(args.top):
        print(f"{us / it / 1000:9.3f} ms/iter  {sc}")
    un = sum(unattributed.values())
    print(f"{un / it / 1000:9.3f} ms/iter  (unattributed: "
          f"{len(unattributed)} op names not in this HLO)")
    for name, us in unattributed.most_common(8):
        print(f"    {us / it / 1000:8.3f}  {name}")
    if args.ops_of:
        print(f"\ntop ops under {args.ops_of}:")
        for name, us in by_op_in.most_common(20):
            print(f"{us / it / 1000:9.3f} ms/iter  {name}")


if __name__ == "__main__":
    main()
