#!/usr/bin/env python
"""One-command round close (round-12 verdict ask #6).

Runs the proven close sequence serially, in order, with the resource
fences each step needs, and emits ONE summary artifact
``artifacts/close_r{N}.json`` for the judge:

    1. registry-count sync invariants (test_registry EXPECTED ==
       SURVEY.md running total == README.md count == len(QUERIES))
    2. full oracle sweep at sf0.01  -> artifacts/sweep_sf001_r{N}.log
    3. full oracle sweep at sf0.1   -> artifacts/sweep_sf01_r{N}.log
    4. full oracle sweep at sf1     -> artifacts/sweep_sf1_r{N}.log
       (.scratch/sf1 tiled fixture; 64g driver + fenced DuckDB)
    5. full plan audit              -> artifacts/audit_r{N}.log
       (count of ': clean' lines must equal the registry count)
    6. bench.py                     -> BENCH_SWEEP.json + stdout line
       (quiet-host precondition re-checked right before this step)
    7. bench_budget.py              (per-key 2x ceilings)
    8. full pytest                  (slow tests included)
    9. smoke_local_cluster.py over the whole registry
       (separate executor JVMs must reproduce local results)

Usage:
    python tools/close_round.py --round 12
    python tools/close_round.py --round 12 --skip sf1,smoke  # iterate
    python tools/close_round.py --round 12 --force           # ignore load

The quiet-host precondition (1-min loadavg below --max-load1, default
3.0 on the 32-thread box) is enforced at start and re-checked before
the bench step, because sweeps 2-4 themselves leave a load tail;
the tool WAITS (up to --load-wait seconds) for the load to settle
rather than failing. Timing-sensitive steps never overlap anything.

Exit 0 = every step green; exit 1 = at least one step failed (the
summary still lands so a partial close is diagnosable).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "artifacts")

SF1_ENV = {
    "SPARK_GRAFT_DRIVER_MEM": "64g",
    "SPARK_GRAFT_DUCK_MEM": "48GB",
    "SPARK_GRAFT_DUCK_TMP": os.path.join(REPO, ".scratch", "ducktmp_close"),
    "SPARK_GRAFT_DUCK_TMP_MAX": "40GB",
}


def registry_count() -> int:
    out = subprocess.run(
        [sys.executable, "-c",
         "from etl_tool_rep_spark.queries.registry import QUERIES;"
         "print(len(QUERIES))"],
        cwd=REPO, capture_output=True, text=True, check=True)
    return int(out.stdout.strip().splitlines()[-1])


def grep_one(path: str, pattern: str) -> int | None:
    with open(os.path.join(REPO, path)) as fh:
        m = re.search(pattern, fh.read(), re.MULTILINE)
    return int(m.group(1)) if m else None


def check_sync_invariants(n_reg: int) -> dict:
    vals = {
        "registry_len": n_reg,
        "test_registry_EXPECTED": grep_one(
            "tests/test_registry.py", r"^EXPECTED = (\d+)"),
        "survey_running_total": grep_one(
            "SURVEY.md", r"Running total in round \d+: (\d+)"),
        "readme_count": grep_one(
            "README.md", r"driver contract, (\d+)"),
    }
    # a missing anchor (None) is a sync FAILURE, not a free pass
    vals["in_sync"] = (all(isinstance(v, int) for v in vals.values())
                       and len(set(vals.values())) == 1)
    return vals


def wait_quiet(max_load1: float, wait_s: int, force: bool) -> float:
    deadline = time.time() + wait_s
    while True:
        load1 = os.getloadavg()[0]
        if load1 <= max_load1 or force:
            return load1
        if time.time() > deadline:
            raise SystemExit(
                f"host not quiet: load1={load1:.2f} > {max_load1} "
                f"after waiting {wait_s}s (use --force to override)")
        print(f"  waiting for load to settle: load1={load1:.2f} "
              f"(need <= {max_load1})", flush=True)
        time.sleep(30)


def run_step(name: str, cmd: list[str], log_path: str | None,
             extra_env: dict | None = None,
             timeout_s: int = 7200) -> dict:
    env = {**os.environ, **(extra_env or {})}
    t0 = time.perf_counter()
    print(f"== {name}: {' '.join(cmd)}", flush=True)
    timed_out = False
    # a hung step must not abort the whole close before the summary
    # lands (the docstring's "partial close is diagnosable" promise):
    # catch TimeoutExpired and record it as a step failure instead
    if log_path:
        # "w": each step owns its log; a rerun must not double-count
        # pass/clean lines from a previous attempt
        with open(os.path.join(REPO, log_path), "w") as fh:
            try:
                rc = subprocess.run(cmd, cwd=REPO, stdout=fh,
                                    stderr=subprocess.STDOUT, env=env,
                                    timeout=timeout_s).returncode
            except subprocess.TimeoutExpired:
                rc, timed_out = -1, True
        with open(os.path.join(REPO, log_path)) as fh:
            tail = fh.read()[-2000:]
    else:
        try:
            p = subprocess.run(cmd, cwd=REPO, capture_output=True,
                               text=True, env=env, timeout=timeout_s)
            # keep stdout's tail SEPARATE from stderr's: Spark WARN
            # spam on stderr must not push the one-line JSON contract
            # (or the pytest summary) out of the captured window
            rc = p.returncode
            tail = (p.stdout[-2000:] + "\n--- stderr ---\n"
                    + p.stderr[-500:])
        except subprocess.TimeoutExpired as e:
            rc, timed_out = -1, True
            out = e.stdout or b""
            tail = (out if isinstance(out, str)
                    else out.decode(errors="replace"))[-2000:]
    dt = round(time.perf_counter() - t0, 1)
    print(f"   rc={rc} in {dt}s"
          + (f" (TIMED OUT after {timeout_s}s)" if timed_out else ""),
          flush=True)
    step = {"rc": rc, "sec": dt, "log": log_path, "tail": tail}
    if timed_out:
        step["timed_out"] = timeout_s
    return step


def sweep_verdict(step: dict, n_reg: int) -> dict:
    m = re.search(r"(\d+) pass, (\d+) fail", step["tail"])
    step["pass"] = int(m.group(1)) if m else None
    step["fail"] = int(m.group(2)) if m else None
    step["ok"] = (step["rc"] == 0 and step["pass"] == n_reg
                  and step["fail"] == 0)
    return step


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--skip", default="",
                    help="comma list of: sf001,sf01,sf1,audit,bench,"
                         "budget,pytest,smoke")
    ap.add_argument("--max-load1", type=float, default=3.0)
    ap.add_argument("--load-wait", type=int, default=900)
    ap.add_argument("--force", action="store_true",
                    help="skip the quiet-host precondition")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    n = args.round
    os.makedirs(ART, exist_ok=True)

    summary: dict = {"round": n, "started_utc": time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    n_reg = registry_count()
    summary["sync_invariants"] = check_sync_invariants(n_reg)
    print(f"== registry sync: {summary['sync_invariants']}", flush=True)

    summary["load1_at_start"] = wait_quiet(
        args.max_load1, args.load_wait, args.force)

    py = sys.executable
    steps: dict[str, dict] = {}
    summary["steps"] = steps

    # a re-run with --skip carries the skipped steps' results forward
    # from the existing summary (marked carried: true) so one
    # artifact always holds the whole close — re-running ONE flaky
    # step must not discard seven green ones
    prior_path = os.path.join(ART, f"close_r{n}.json")
    prior_steps: dict = {}
    if skip and os.path.exists(prior_path):
        with open(prior_path) as fh:
            prior_steps = json.load(fh).get("steps", {})

    def carry(step_key: str) -> None:
        if step_key in prior_steps:
            steps[step_key] = {**prior_steps[step_key], "carried": True}
        else:
            # a --skip with no prior result is a MISSING step, not a
            # free pass: record a failed placeholder so all_ok (which
            # is computed over the full expected step set below) can
            # never report a close whose required step never ran
            steps[step_key] = {"ok": False, "missing": True,
                               "note": "skipped with no prior result"}

    if "sf001" not in skip:
        steps["sweep_sf001"] = sweep_verdict(run_step(
            "sweep sf0.01",
            [py, "tools/check_oracle.py", "--sf", "/root/testdata/sf0.01"],
            f"artifacts/sweep_sf001_r{n}.log"), n_reg)
    else:
        carry("sweep_sf001")
    if "sf01" not in skip:
        steps["sweep_sf01"] = sweep_verdict(run_step(
            "sweep sf0.1",
            [py, "tools/check_oracle.py", "--sf", "/root/testdata/sf0.1"],
            f"artifacts/sweep_sf01_r{n}.log"), n_reg)
    else:
        carry("sweep_sf01")
    if "sf1" not in skip:
        steps["sweep_sf1"] = sweep_verdict(run_step(
            "sweep sf1 (fenced)",
            [py, "tools/check_oracle.py", "--sf", ".scratch/sf1"],
            f"artifacts/sweep_sf1_r{n}.log", SF1_ENV), n_reg)

    else:
        carry("sweep_sf1")
    if "audit" not in skip:
        st = run_step("plan audit", [py, "tools/explain_audit.py"],
                      f"artifacts/audit_r{n}.log")
        with open(os.path.join(ART, f"audit_r{n}.log")) as fh:
            st["clean"] = fh.read().count(": clean")
        st["ok"] = st["rc"] == 0 and st["clean"] == n_reg
        steps["audit"] = st

    else:
        carry("audit")
    if "bench" not in skip:
        summary["load1_before_bench"] = wait_quiet(
            args.max_load1, args.load_wait, args.force)
        st = run_step("bench", [py, "bench.py"], None)
        line = next((ln for ln in reversed(st["tail"].splitlines())
                     if ln.startswith("{")), None)
        st["headline"] = json.loads(line) if line else None
        if st["headline"]:
            st["headline"].pop("queries", None)
        st["ok"] = st["rc"] == 0 and st["headline"] is not None
        steps["bench"] = st

    else:
        carry("bench")
    if "budget" not in skip:
        st = run_step("bench budget", [py, "tools/bench_budget.py"], None)
        st["ok"] = st["rc"] == 0
        steps["budget"] = st

    else:
        carry("budget")
    if "pytest" not in skip:
        st = run_step("pytest", [py, "-m", "pytest", "tests/", "-q"],
                      None, timeout_s=3600)
        m = re.search(r"(\d+) passed", st["tail"])
        st["passed"] = int(m.group(1)) if m else None
        st["ok"] = st["rc"] == 0
        steps["pytest"] = st

    else:
        carry("pytest")
    if "smoke" not in skip:
        st = run_step("local-cluster smoke (full registry)",
                      [py, "tools/smoke_local_cluster.py", "--all"],
                      f"artifacts/smoke_local_cluster_r{n}.log",
                      timeout_s=7200)
        m = re.search(r"(\d+)/(\d+) keys identical", st["tail"])
        st["identical"] = m.group(0) if m else None
        st["ok"] = st["rc"] == 0 and m and m.group(1) == m.group(2)
        steps["smoke"] = st

    if "smoke" in skip:
        carry("smoke")

    # all_ok ranges over the FULL expected step set, not just the
    # steps that happen to be present — so eight green steps plus one
    # silently-absent one can never sum to all_ok=true
    expected = ("sweep_sf001", "sweep_sf01", "sweep_sf1", "audit",
                "bench", "budget", "pytest", "smoke")
    summary["all_ok"] = (summary["sync_invariants"]["in_sync"]
                         and all(steps.get(k, {}).get("ok")
                                 for k in expected))
    summary["finished_utc"] = time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    out_path = os.path.join(ART, f"close_r{n}.json")
    for s in steps.values():
        s.pop("tail", None)  # logs carry the detail; keep the JSON tight
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1)
    print(f"== close summary -> {out_path}\n"
          f"== all_ok={summary['all_ok']}", flush=True)
    return 0 if summary["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
