#!/usr/bin/env python
"""Isolated cold A/B runner (VERDICT r12 #7: drift-proof A/B claims).

Runs ``bench.py`` restricted to a comma-separated query list
(``SPARK_GRAFT_BENCH_ONLY``) in N FRESH JVMs (cold each rep, one rep of
the bench's own 3 interleaved reps per JVM unless overridden) and
prints per-query cold medians.  Every A/B in OPTIMIZATION_r13.md quotes
(a) these isolated cold medians before/after and (b) an unchanged
CONTROL query measured in the same pair of runs, so environment drift
is visible instead of silently attributed to the change.

Usage:
  python tools/ab_r13.py <query[,query...]> [n_jvms] [label]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(queries: str, n_jvms: int = 5, label: str = "") -> dict:
    samples: dict[str, list[float]] = {}
    for i in range(n_jvms):
        env = dict(os.environ)
        env["SPARK_GRAFT_BENCH_ONLY"] = queries
        env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        # one interleaved rep-triple per JVM keeps the bench's own
        # median discipline; the cross-JVM median then covers cold noise
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            cwd=REPO,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        parsed = json.loads(line)
        for q, s in parsed["queries"].items():
            samples.setdefault(q, []).append(s)
        print(f"  jvm {i + 1}/{n_jvms}: {parsed['queries']}", flush=True)
    med = {q: round(statistics.median(v), 3) for q, v in samples.items()}
    result = {"label": label, "queries": queries, "n_jvms": n_jvms,
              "medians": med, "samples": samples}
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    qs = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    lbl = sys.argv[3] if len(sys.argv) > 3 else ""
    run(qs, n, lbl)
