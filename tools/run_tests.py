#!/usr/bin/env python3
"""Run the test suite per-file in subprocesses, aggregating one summary.

Why this exists: a single-process `pytest tests/ -q` run deterministically
segfaults inside XLA:CPU's `backend_compile_and_load` at suite scale (~31%
in, while compiling an unrelated while_loop; reproduced with the persistent
compile cache already disabled — see tests/conftest.py). The crash is in the
backend, not repo code, and never reproduces for a single file. Per-file
subprocess isolation sidesteps it completely and is the canonical way to get
the full green summary on this image:

    python tools/run_tests.py            # whole suite, one line per file
    python tools/run_tests.py -k icp     # filter files by substring
    python tools/run_tests.py -j 4       # 4 files at a time

Exit code is non-zero if any file fails. Per-file pytest output is kept and
replayed for failing files only.
"""

import argparse
import concurrent.futures as cf
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SUMMARY_RE = re.compile(
    r"(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?(?:, )?(?:(\d+) failed)?"
    r"(?:, )?(?:(\d+) error)?")


def run_file(path, extra):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", path, "-q", *extra],
        capture_output=True, text=True, cwd=ROOT)
    dt = time.time() - t0
    out = proc.stdout + proc.stderr
    passed = skipped = failed = errors = 0
    for line in out.splitlines():
        m = re.search(r"(\d+) passed", line)
        if m:
            passed = int(m.group(1))
        m = re.search(r"(\d+) skipped", line)
        if m:
            skipped = int(m.group(1))
        m = re.search(r"(\d+) failed", line)
        if m:
            failed = int(m.group(1))
        m = re.search(r"(\d+) error", line)
        if m:
            errors = int(m.group(1))
    crashed = proc.returncode not in (0, 1, 5) or (
        proc.returncode == 1 and failed == 0 and errors == 0)
    # rc 5 = no tests collected (e.g. -k filtered everything out): not a
    # failure for an aggregating runner.
    ok = proc.returncode in (0, 5) or (failed == 0 and errors == 0
                                       and not crashed)
    return dict(path=path, ok=ok, passed=passed, skipped=skipped,
                failed=failed, errors=errors, crashed=crashed, dt=dt, out=out,
                rc=proc.returncode)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-k", default=None,
                    help="substring filter on test FILE names")
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="files to run concurrently (default 1: XLA compiles "
                         "are already multi-threaded; >1 can contend)")
    ap.add_argument("pytest_args", nargs="*",
                    help="extra args passed through to pytest")
    args = ap.parse_args()

    test_dir = os.path.join(ROOT, "tests")
    files = sorted(
        os.path.join("tests", f) for f in os.listdir(test_dir)
        if f.startswith("test_") and f.endswith(".py"))
    if args.k:
        files = [f for f in files if args.k in os.path.basename(f)]
    if not files:
        print("no test files matched")
        return 2

    t0 = time.time()
    results = []
    if args.jobs > 1:
        with cf.ThreadPoolExecutor(args.jobs) as ex:
            futs = {ex.submit(run_file, f, args.pytest_args): f
                    for f in files}
            for fut in cf.as_completed(futs):
                r = fut.result()
                results.append(r)
                _report_line(r)
    else:
        for f in files:
            r = run_file(f, args.pytest_args)
            results.append(r)
            _report_line(r)

    results.sort(key=lambda r: r["path"])
    tot = {k: sum(r[k] for r in results)
           for k in ("passed", "skipped", "failed", "errors")}
    bad = [r for r in results if not r["ok"]]
    for r in bad:
        print(f"\n===== {r['path']} (rc={r['rc']}) =====")
        print(r["out"][-8000:])
    print(f"\nTOTAL: {tot['passed']} passed, {tot['skipped']} skipped, "
          f"{tot['failed']} failed, {tot['errors']} errors "
          f"({len(files)} files, {time.time()-t0:.0f}s)")
    return 1 if bad else 0


def _report_line(r):
    mark = "ok " if r["ok"] else ("CRASH" if r["crashed"] else "FAIL")
    print(f"[{mark:5s}] {r['path']:45s} {r['passed']:4d} passed "
          f"{r['skipped']:2d} skipped {r['failed']:2d} failed "
          f"({r['dt']:5.1f}s)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
