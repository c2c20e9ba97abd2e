"""Summarize a jax.profiler trace: top device ops by total duration.

Usage: python scripts/summarize_trace.py /tmp/gsprof [top_n] [--by-source]

--by-source groups by the emitting source file:line (from op metadata)
instead of the HLO op name — attribution for long tails of small fusions.
"""

import glob
import gzip
import json
import sys
from collections import defaultdict


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    by_source = "--by-source" in sys.argv
    root = args[0] if args else "/tmp/gsprof"
    top_n = int(args[1]) if len(args) > 1 else 30
    path = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path, "rt") as f:
        data = json.load(f)

    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur", 0) > 0]

    # device lanes: pid whose process name contains "TPU" / "/device:"
    names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "device" in n.lower() or "XLA" in n}

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e["pid"] not in dev_pids:
            continue
        name = e["name"]
        if name.startswith("jit_") or name.startswith("PjitFunction") or name.isdigit():
            continue  # whole-program envelope events would double-count
        if by_source:
            a = e.get("args", {})
            name = a.get("source", "") or a.get("tf_op", name)
        g = agg[name]
        g[0] += e["dur"]
        g[1] += 1
        total += e["dur"]

    print(f"trace: {path}")
    print(f"device total: {total/1e3:.2f} ms over {len(agg)} keys")
    print(f"{'us_total':>10} {'count':>6}  name")
    for name, (dur, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:top_n]:
        print(f"{dur:10.0f} {cnt:6d}  {name[:110]}")


if __name__ == "__main__":
    main()
