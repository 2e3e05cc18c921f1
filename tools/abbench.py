#!/usr/bin/env python3
"""Same-session A/B bench (review r15 #7): pinned-worktree back-to-back
comparison, the only per-query signal the r14 drift adjudication found
trustworthy — close-to-close totals across sessions sit inside a ±24%
same-code host band, while interleaved runs on one host cancel the
band out.

Usage: python3 tools/abbench.py <baseRef> [sfDir] [runsPerSide]

  baseRef      git ref to compare against (e.g. the last close commit)
  sfDir        testdata dir (default /root/testdata/sf0.1)
  runsPerSide  interleaved A/B rounds, min-of-N per side (default 2)

Checks out <baseRef> into a cached worktree under /tmp, then alternates
B(base) / H(head) Bench runs — B H B H … — so host drift hits both
sides equally. Reports per-query min-of-N seconds, flags regressions
> 1.3x (only for queries slower than 0.15 s on both sides — below that
the JVM noise floor dominates), and prints shared-query totals.
Exit 1 if any regression is flagged.
"""
import json
import os
import subprocess
import sys
from pathlib import Path


def run_bench(cwd, sf_dir):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        cwd=cwd, env=env, capture_output=True, text=True, check=False)
    for line in (out.stdout + out.stderr).splitlines():
        line = line.strip()
        # sbt may prefix program stdout with its log label depending on
        # the project's output strategy (observed in fresh worktrees)
        for p in ("[info] ", "[error] "):
            if line.startswith(p):
                line = line[len(p):]
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    sys.exit(f"no bench JSON line from {cwd}:\n{out.stdout[-3000:]}\n"
             f"{out.stderr[-3000:]}")


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    base_ref = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    repo = Path(subprocess.check_output(
        ["git", "rev-parse", "--show-toplevel"], text=True).strip())
    sha = subprocess.check_output(
        ["git", "rev-parse", "--short", base_ref], text=True,
        cwd=repo).strip()
    wt = Path(f"/tmp/graft_ab_{sha}")
    if not wt.exists():
        subprocess.run(["git", "worktree", "add", "--detach", str(wt), sha],
                       cwd=repo, check=True)

    base_runs, head_runs = [], []
    for i in range(runs):
        print(f"-- round {i + 1}/{runs}: base({sha})", flush=True)
        base_runs.append(run_bench(wt, sf_dir))
        print(f"-- round {i + 1}/{runs}: head", flush=True)
        head_runs.append(run_bench(repo, sf_dir))

    def min_of(rs):
        qs = {}
        for r in rs:
            for q, s in r["queries"].items():
                qs[q] = min(qs.get(q, float("inf")), s)
        return qs

    base_q, head_q = min_of(base_runs), min_of(head_runs)
    shared = sorted(set(base_q) & set(head_q))
    only_b = sorted(set(base_q) - set(head_q))
    only_h = sorted(set(head_q) - set(base_q))
    tot_b = sum(base_q[q] for q in shared)
    tot_h = sum(head_q[q] for q in shared)

    regressions, improvements = [], []
    for q in shared:
        b, h = base_q[q], head_q[q]
        if h > 1.3 * b and b > 0.15 and h > 0.15:
            regressions.append((q, b, h))
        elif b > 1.3 * h and b > 0.15 and h > 0.15:
            improvements.append((q, b, h))

    print(f"\n== A/B bench: base {sha} vs head, sf={sf_dir}, "
          f"min-of-{runs} interleaved ==")
    print(f"shared {len(shared)} queries: base {tot_b:.1f}s -> "
          f"head {tot_h:.1f}s ({(tot_h / tot_b - 1) * 100:+.1f}%)")
    if only_h:
        print(f"new in head ({len(only_h)}): "
              f"{', '.join(only_h)} = "
              f"{sum(head_q[q] for q in only_h):.1f}s")
    if only_b:
        print(f"removed from head ({len(only_b)}): {', '.join(only_b)}")
    for name, rows in (("REGRESSION > 1.3x", regressions),
                       ("improvement > 1.3x", improvements)):
        for q, b, h in sorted(rows, key=lambda r: r[2] - r[1],
                              reverse=name.startswith("REG")):
            print(f"  {name}: {q}  {b:.2f}s -> {h:.2f}s ({h / b:.2f}x)")
    report = {"base": sha, "sf_dir": sf_dir, "runs": runs,
              "total_base": round(tot_b, 2), "total_head": round(tot_h, 2),
              "regressions": [
                  {"q": q, "base": b, "head": h} for q, b, h in regressions],
              "base_queries": base_q, "head_queries": head_q}
    out = Path("/tmp/abbench_report.json")
    out.write_text(json.dumps(report, indent=1, sort_keys=True))
    print(f"report: {out}")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
