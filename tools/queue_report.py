"""Summarize detached TPU experiment-queue results.

The round-3 A/B experiments run from detached queues (/tmp/tpu_queue*.sh)
that wait out TPU-pool outages and write one log per experiment to
/tmp/tpu_results/. This prints a one-line digest per experiment — the
measurement lines and any failure tail — so the A/B decisions (engine
default flips, PERF.md tables) can be made at a glance.

Usage: python tools/queue_report.py [results_dir]
"""

import pathlib
import re
import sys

KEY = re.compile(
    r"(ms/call|ms/robot|steps/s|rate:|ate|ms per|passed|failed|error"
    r"|Error|RESOURCE|UNAVAILABLE)", re.I)


def digest(path: pathlib.Path, max_lines: int = 6) -> list[str]:
    try:
        lines = path.read_text(errors="replace").strip().splitlines()
    except OSError as e:
        return [f"<unreadable: {e}>"]
    if not lines:
        return ["<empty>"]
    hits = [ln.strip() for ln in lines if KEY.search(ln)]
    return (hits or lines)[-max_lines:]


def main() -> None:
    root = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_results")
    logs = sorted(root.glob("*.log"), key=lambda p: p.stat().st_mtime)
    if not logs:
        print(f"no experiment logs in {root}")
        return
    for p in logs:
        print(f"== {p.name}")
        for ln in digest(p):
            print(f"   {ln}")
    for q in sorted(pathlib.Path("/tmp").glob("queue*_run.log")) + \
            [pathlib.Path("/tmp/queue_run.log")]:
        if q.exists():
            tail = q.read_text(errors="replace").strip().splitlines()
            if tail:
                print(f"== {q.name}: {tail[-1]}")


if __name__ == "__main__":
    main()
