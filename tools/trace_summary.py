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
    traces = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        sys.exit(f"no trace under {root}/plugins/profile/ — run a profiled "
                 "block first (e.g. tools/prof2d.py) or pass the log dir")
    path = traces[-1]
    with gzip.open(path) as f:
        data = json.load(f)
    pids = {e["pid"]: e["args"]["name"] for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # device processes: TPU on hardware, /device: rows in CPU-mesh traces
    # (previously only TPU matched and CPU traces read as 0 ms); fall back
    # to everything if the trace names processes differently
    dev = {p for p, n in pids.items() if "TPU" in n or "/device:" in n}
    if not dev:
        dev = set(pids)
    by, cnt = collections.Counter(), collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in dev:
            by[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    print(f"total device ms: {sum(by.values())/1e3:.1f}   ({path})")
    for name, us in by.most_common(top):
        print(f"{us/1e3:9.2f} ms  x{cnt[name]:<5} {name[:100]}")


if __name__ == "__main__":
    main()
