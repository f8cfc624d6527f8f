"""One-command green test run (VERDICT r4 weak #4 / ask #7).

``pytest tests/`` in a single process segfaults on this image inside XLA-CPU
compilation after ~150 compilations (jax/_src/compiler.py:362
backend_compile_and_load — a toolchain flake, not a code bug: every test
passes when the suite is split).  This runner executes each test FILE in its
own subprocess, bounding per-process compilation count far below the crash
threshold, and aggregates the results.

Usage:
  python tools/run_tests.py                 # full default suite
  python tools/run_tests.py -k sweep        # pytest args pass through
  python tools/run_tests.py --design-points # include opt-in backend suites

Exit code 0 iff every file's pytest run passed (or was entirely skipped).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tests_dir = os.path.join(repo, "tests")
    files = sorted(f for f in os.listdir(tests_dir)
                   if f.startswith("test_") and f.endswith(".py"))
    passthrough = sys.argv[1:]

    failures = []
    t0 = time.time()
    for i, f in enumerate(files):
        path = os.path.join(tests_dir, f)
        cmd = [sys.executable, "-m", "pytest", path, "-q", *passthrough]
        print(f"[{i + 1}/{len(files)}] {f} ...", flush=True)
        t = time.time()
        r = subprocess.run(cmd, cwd=repo)
        # pytest exit 5 = no tests collected/selected (e.g. a design-points
        # file with every test deselected) — not a failure
        if r.returncode not in (0, 5):
            failures.append((f, r.returncode))
        print(f"    -> exit {r.returncode} in {time.time() - t:.0f}s",
              flush=True)

    total = time.time() - t0
    if failures:
        print(f"\nFAILED files ({len(failures)}/{len(files)}, "
              f"{total:.0f}s total):")
        for f, rc in failures:
            print(f"  {f} (exit {rc})")
        return 1
    print(f"\nAll {len(files)} test files green in {total:.0f}s.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
