"""Cold-compile budget guard (VERDICT r4 next #8).

Round 4's structural fix brought the headline program's fully-cold compile
from 605-770 s down to 319.9 s (artifacts/COMPILE_r4.md); the residual risk
is a silent graph regression re-inflating it until some future driver run
times out (rc=124). This check reads the newest BENCH_r*.json (and, when
present, the verbatim cold number in artifacts/COMPILE_r*.md) and fails
loudly if either exceeds its budget.

Budgets:
- warm/driver compile_s (BENCH_r*.json): <= 120 s — the driver runs with a
  seeded cache; r3/r4 measured 5-17 s warm. 120 gives headroom for partial
  cache hits without letting a cold-class (300+ s) regression pass.
- fully-cold compile (COMPILE_r*.md `cold_compile_s=` line): <= 400 s — the
  r3 verdict's survivability bar.

Run: python tools/check_compile_budget.py   (exit 0 = within budget)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WARM_BUDGET_S = 120.0
COLD_BUDGET_S = 400.0


def latest(pattern: str):
    files = sorted(glob.glob(os.path.join(REPO, pattern)))
    return files[-1] if files else None


def main() -> int:
    failures = []

    bench = latest("BENCH_r*.json")
    if bench:
        with open(bench) as f:
            rec = json.load(f)
        parsed = rec.get("parsed") or {}
        compile_s = parsed.get("compile_s")
        rc = rec.get("rc")
        if rc not in (0, None):
            failures.append(f"{os.path.basename(bench)}: rc={rc}")
        if compile_s is not None and compile_s > WARM_BUDGET_S:
            failures.append(
                f"{os.path.basename(bench)}: compile_s={compile_s} "
                f"> warm budget {WARM_BUDGET_S}")
        print(f"warm: {os.path.basename(bench)} compile_s={compile_s} "
              f"(budget {WARM_BUDGET_S})")
    else:
        print("warm: no BENCH_r*.json yet (round 1?) — skipped")

    cold = latest("artifacts/COMPILE_r*.md")
    if cold:
        with open(cold) as f:
            text = f.read()
        m = re.search(r"cold_compile_s\s*=\s*([0-9.]+)", text)
        if m:
            cold_s = float(m.group(1))
            if cold_s > COLD_BUDGET_S:
                failures.append(
                    f"{os.path.basename(cold)}: cold_compile_s={cold_s} "
                    f"> cold budget {COLD_BUDGET_S}")
            print(f"cold: {os.path.basename(cold)} cold_compile_s={cold_s} "
                  f"(budget {COLD_BUDGET_S})")
        else:
            print(f"cold: {os.path.basename(cold)} has no cold_compile_s= "
                  "line — skipped")

    if failures:
        for f_ in failures:
            print("FAIL:", f_)
        return 1
    print("compile budget OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
