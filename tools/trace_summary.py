"""Summarize a jax.profiler trace: total device time per HLO op name.

    python tools/prof2d.py            # writes /tmp/prof2d
    python tools/trace_summary.py /tmp/prof2d [top_n]

Pair with the compiled-HLO dump to map fusion names back to source lines
(each instruction's metadata carries source_file/source_line).
"""
import collections
import glob
import gzip
import json
import sys


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof2d"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    path = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {e["pid"]: e["args"]["name"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    by, cnt = collections.Counter(), collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            by[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    print(f"total device ms: {sum(by.values())/1e3:.1f}   ({path})")
    for name, us in by.most_common(top):
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:<5} {name[:100]}")


if __name__ == "__main__":
    main()
