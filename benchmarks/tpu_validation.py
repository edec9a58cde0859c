"""One-shot TPU validation sweep: run after tunnel recovery.

Round-2 changed the default matcher metric (l2), added l2q8, and
re-tuned the bench methodology; the docs cite round-1 measurements.
This runner produces the doc-ready numbers in one pass on the real
chip:

    python benchmarks/tpu_validation.py [--reps 30]

Prints a markdown table to stdout and writes benchmarks/tpu_r2.json.
Each bench invocation is a SUBPROCESS so one compile failure cannot
take down the sweep, and the one-JSON-line bench contract is consumed
as-is.

After a successful sweep, refresh every doc line that cites the
round-1 chip numbers (354 fps l2 / 240 fps l1, measured BEFORE the
32-lane RANSAC default and the l2q8 mode):
  README.md:15, CLAUDE.md (headline block), docs/performance.md
  (mode table + stage table note), docs/scaling.md (~line 29),
  .claude/skills/verify/SKILL.md (bench expectations),
  docs/limitations.md ("Round-2 TPU re-measurement" item — delete it).
"""

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra, reps, timeout=900):
    cmd = [sys.executable, os.path.join(_REPO, "bench.py"),
           f"--reps={reps}"] + extra
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=_REPO)
    except subprocess.TimeoutExpired:
        return {"error": "timeout"}
    line = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not line:
        return {"error": (proc.stderr or "no output")[-400:]}
    try:
        return json.loads(line[-1])
    except json.JSONDecodeError:
        return {"error": f"bad output: {line[-1][:200]}"}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args(argv)

    modes = {
        "l2 (default)": ["--metric=l2"],
        "l2q8 (int8 MXU)": ["--metric=l2q8"],
        "l1 (strict parity)": ["--metric=l1"],
        "staged w16 (l2)": ["--metric=l2", "--staged", "--window=16"],
    }
    results = {}
    print("| mode | fps (median) | best window | vs baseline |")
    print("|---|---|---|---|")
    for name, extra in modes.items():
        r = run_bench(extra, args.reps)
        results[name] = r
        if "error" in r:
            err = r["error"][:80].replace("|", "/").replace("\n", " ")
            print(f"| {name} | ERROR | | {err} |")
            continue
        best = r.get("value_best_window", "")
        print(f"| {name} | {r['value']} | {best} | {r['vs_baseline']}x |",
              flush=True)

    out = os.path.join(_REPO, "benchmarks", "tpu_r2.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
