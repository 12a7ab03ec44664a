"""el_pipeline bench-swing adjudication (VERDICT r04 task #2).

Round 4's headline el_pipeline regressed 21.7 → 35.5 s (+64%) with —
per the judge's own git diff — NO hot-path code change, and the same
round's interleaved pairs/sec A/B bracketing r3 throughput.  "Box load"
was therefore an inference.  This script turns it into a measurement:
N sequential fresh-JVM runs of EXACTLY the headline el_pipeline region
(bench.py --el-probe — same fixture, warm-up, cold-then-timed protocol
as run_headline), reporting the full warm-wall distribution.  Each rep
is a fresh JVM, so slow box-load drift shows up as spread ACROSS reps
rather than biasing one arm of a comparison — the single-plan analogue
of scaling_ab.py's interleaved confirm mode.

Usage:  python scripts/el_ab.py [--reps N]   (default 6)
Writes the distribution to stdout as one JSON line; paste/summarize
into BENCH/BASELINE.md ("r5 el_pipeline adjudication").
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    env = dict(
        os.environ,
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    runs = []
    for i in range(reps):
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--el-probe"],
            env=env, capture_output=True, text=True,
        )
        if out.returncode != 0:
            # surface the child's traceback and keep the completed reps
            # (each is minutes of fresh-JVM work) instead of discarding
            # the distribution on one failure
            print(f"# rep {i + 1}/{reps} FAILED (exit {out.returncode}):",
                  file=sys.stderr)
            print(out.stderr[-4000:], file=sys.stderr)
            break
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        runs.append(rec)
        print(f"# rep {i + 1}/{reps}: warm {rec['el_wall_warm']} s "
              f"(cold {rec['el_wall_cold']} s)", file=sys.stderr)
    if not runs:
        print(json.dumps({"metric": "el_pipeline_warm_wall_distribution",
                          "reps": 0, "error": "all reps failed"}))
        sys.exit(1)
    warm = [r["el_wall_warm"] for r in runs]
    print(json.dumps({
        "metric": "el_pipeline_warm_wall_distribution",
        "reps": len(runs),
        "reps_requested": reps,
        "walls_warm": warm,
        "median": round(statistics.median(warm), 3),
        "min": min(warm),
        "max": max(warm),
        "walls_cold": [r["el_wall_cold"] for r in runs],
        "pairs": runs[0]["pairs"],
        "cores": runs[0]["cores"],
    }))


if __name__ == "__main__":
    main()
