#!/usr/bin/env python
"""Full-coverage test runner: one pytest subprocess per test file.

Why this exists: running the whole suite in ONE process segfaults inside
jaxlib's XLA:CPU ``backend_compile_and_load`` after 45+ minutes of
single-process compilation churn (upstream compiler instability, triaged in
STATUS round 4 — every file passes standalone).  This runner makes "full
coverage" one command again: each test file runs in its own subprocess,
a crashed file (segfault / nonzero without a pytest summary) gets ONE
retry, and the result is a machine-readable JSON artifact.

Usage::

    python scripts/run_suite.py                      # whole tests/ dir
    python scripts/run_suite.py tests/test_ops.py    # subset
    python scripts/run_suite.py --out suite.json --jobs 2

Exit status is non-zero if any file fails after its retry.  The artifact
records per-file {passed, failed, skipped, time_s, retried, returncode}.

The reference repo drives its tests through plain pytest (no runner); this
is infrastructure for the TPU port's CI story, not a reference-parity
component.
"""
from __future__ import annotations

import argparse
import concurrent.futures
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _parse_counts(out: str) -> dict:
    """Pull pass/fail/skip counts out of the pytest summary line."""
    counts = {"passed": 0, "failed": 0, "skipped": 0}
    for line in reversed(out.splitlines()):
        # "12 passed in 9.06s" (-q) or "== 3 failed, 9 passed in 9.06s =="
        m = re.search(r"(?:=+ )?([\w ,]*\b(?:passed|failed|skipped|error)"
                      r"[\w ,]*) in [\d.]+s", line)
        if not m:
            continue
        for part in m.group(1).split(", "):
            for key in counts:
                if part.endswith(" " + key):
                    counts[key] = int(part.split()[0])
        for key in ("error", "errors"):
            for part in m.group(1).split(", "):
                if part.endswith(" " + key):
                    counts["failed"] += int(part.split()[0])
        return counts
    return counts


def run_file(path: str, pytest_args: list, timeout: int) -> dict:
    """Run one test file in a subprocess; retry once on a crash (a run that
    dies without producing a pytest summary — segfault, abort, OOM-kill)."""
    rec = {"file": os.path.relpath(path, REPO), "retried": False}
    for attempt in (0, 1):
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", path, "-q", *pytest_args],
                cwd=REPO, capture_output=True, text=True, timeout=timeout)
            out = proc.stdout + proc.stderr
            rc = proc.returncode
        except subprocess.TimeoutExpired as e:
            out = ((e.stdout or b"").decode(errors="replace") if
                   isinstance(e.stdout, bytes) else (e.stdout or "")) + \
                  "\n[run_suite] TIMEOUT"
            rc = -9
        rec["time_s"] = round(time.perf_counter() - t0, 1)
        rec["returncode"] = rc
        rec.update(_parse_counts(out))
        if rc == 5:
            # pytest: no tests collected (e.g. a -k filter deselecting the
            # whole file) — not a failure, not a crash
            rec["ok"] = True
            return rec
        crashed = rc not in (0, 1) or (rc == 1 and rec["failed"] == 0
                                       and rec["passed"] == 0)
        if not crashed or attempt == 1:
            rec["ok"] = rc == 0
            if not rec["ok"]:
                # keep the tail for diagnosis without bloating the artifact
                rec["tail"] = out.splitlines()[-25:]
            return rec
        rec["retried"] = True
    rec["ok"] = False
    return rec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*", default=None,
                    help="test files (default: every tests/test_*.py)")
    ap.add_argument("--out", default=os.path.join(REPO, "suite_results.json"))
    ap.add_argument("--jobs", type=int, default=1,
                    help="parallel subprocesses (keep 1 on the real chip — "
                         "concurrent TPU clients contend for the device)")
    ap.add_argument("--timeout", type=int, default=1800,
                    help="per-file wall clock cap in seconds")
    ap.add_argument("-k", default=None, help="forwarded pytest -k filter")
    args = ap.parse_args()

    paths = args.paths or sorted(
        os.path.join(REPO, "tests", f) for f in os.listdir(
            os.path.join(REPO, "tests")) if f.startswith("test_")
        and f.endswith(".py"))
    pytest_args = ["-k", args.k] if args.k else []

    t0 = time.perf_counter()
    results = []
    if args.jobs > 1:
        with concurrent.futures.ThreadPoolExecutor(args.jobs) as ex:
            futs = {ex.submit(run_file, p, pytest_args, args.timeout): p
                    for p in paths}
            for fut in concurrent.futures.as_completed(futs):
                rec = fut.result()
                results.append(rec)
                print(f"[{'ok' if rec['ok'] else 'FAIL'}] {rec['file']} "
                      f"({rec['passed']}p/{rec['failed']}f/"
                      f"{rec['skipped']}s, {rec['time_s']}s"
                      f"{', retried' if rec['retried'] else ''})",
                      flush=True)
        results.sort(key=lambda r: r["file"])
    else:
        for p in paths:
            rec = run_file(p, pytest_args, args.timeout)
            results.append(rec)
            print(f"[{'ok' if rec['ok'] else 'FAIL'}] {rec['file']} "
                  f"({rec['passed']}p/{rec['failed']}f/{rec['skipped']}s, "
                  f"{rec['time_s']}s"
                  f"{', retried' if rec['retried'] else ''})", flush=True)

    summary = {
        "files": len(results),
        "files_failed": sum(not r["ok"] for r in results),
        "passed": sum(r["passed"] for r in results),
        "failed": sum(r["failed"] for r in results),
        "skipped": sum(r["skipped"] for r in results),
        "retried": sum(r["retried"] for r in results),
        "total_time_s": round(time.perf_counter() - t0, 1),
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{summary['passed']} passed, {summary['failed']} failed, "
          f"{summary['skipped']} skipped across {summary['files']} files "
          f"({summary['files_failed']} failing) in "
          f"{summary['total_time_s']}s -> {args.out}")
    return 1 if summary["files_failed"] else 0


if __name__ == "__main__":
    sys.exit(main())
