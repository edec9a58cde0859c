"""One-shot TPU validation sweep: run after tunnel recovery.

The tunnel's dispatch-overlap quality varies by session (round 3
measured per-frame K=1 at 208 fps where round 2 saw 382 — same binary,
same chip), so docs cite numbers from whichever sweep last ran.  This
runner produces the doc-ready numbers in one pass on the real chip:

    python benchmarks/tpu_validation.py [--reps 32] [--round N]

Prints a markdown table to stdout and writes benchmarks/tpu_r{N}.json.
Each bench invocation is a SUBPROCESS so one compile failure cannot
take down the sweep, and the one-JSON-line bench contract is consumed
as-is.

After a successful sweep, refresh every doc line that cites chip
numbers:
  README.md (headline), CLAUDE.md (headline block), docs/performance.md
  (mode table + "Chunked streaming" + "Multi-stream serving"),
  docs/scaling.md (~line 29), .claude/skills/verify/SKILL.md (bench
  expectations), PARITY.md (multi-stream row).
"""

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(extra, reps, timeout=1800):
    # 1800 s: the tunnel's remote-compile service has slow phases where
    # one compile alone exceeds the 900 s that normally suffices (two
    # modes timed out in the round-3 sweep and re-ran fine)
    cmd = [sys.executable, os.path.join(_REPO, "bench.py"),
           f"--reps={reps}"] + extra
    env = dict(os.environ, BENCH_TIMEOUT_S=str(timeout - 60))
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=_REPO, env=env)
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
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--round", type=int, default=3)
    args = ap.parse_args(argv)

    modes = {
        # single-sequence modes (the headline family)
        "chunk4 l2 (default)": [],
        "per-frame K=1 (latency mode)": ["--chunk=1"],
        "chunk8": ["--chunk=8"],
        "l2q8 chunk4 (int8 MXU)": ["--metric=l2q8"],
        "l1 chunk4 (strict parity)": ["--metric=l1"],
        "staged w16 (l2)": ["--staged", "--window=16"],
        # serving modes (aggregate throughput, opt-in)
        "serving S=4 K=1": ["--streams=4", "--chunk=1"],
        "serving S=4 K=4": ["--streams=4"],
        "serving S=8 K=4": ["--streams=8"],
        # monocular modes (round 4; vs MONO_BASELINE_FPS = 14.98)
        "mono 5pt (default)": ["--mono"],
        "mono 5pt fast (fp8pt h32)": ["--mono", "--mono-first-pass=8pt",
                                      "--mono-hyp=32"],
        "mono 8pt": ["--mono", "--mono-8pt"],
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

    out = os.path.join(_REPO, "benchmarks", f"tpu_r{args.round}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"\nwrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
