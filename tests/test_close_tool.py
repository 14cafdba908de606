"""The one-command close tool's accounting must be fail-closed.

Round-13 advisor finding: a step skipped via --skip with no prior
close_r{N}.json entry used to vanish from `steps`, and all_ok was
computed only over steps present — so a close with every step skipped
and no prior artifact reported all_ok=true with zero steps run. The
fix records a failed placeholder for each absent carried step and
computes all_ok over the full expected step set. This test runs the
real tool (all steps skipped, fresh round number) and asserts the
fail-closed behavior.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_SKIPS = "sf001,sf01,sf1,audit,bench,budget,pytest,smoke"
EXPECTED_STEPS = {"sweep_sf001", "sweep_sf01", "sweep_sf1", "audit",
                  "bench", "budget", "pytest", "smoke"}


def _run_close(round_no: int) -> tuple[int, dict]:
    out_path = os.path.join(REPO, "artifacts", f"close_r{round_no}.json")
    if os.path.exists(out_path):
        os.remove(out_path)
    try:
        p = subprocess.run(
            [sys.executable, "tools/close_round.py", "--round",
             str(round_no), "--skip", ALL_SKIPS, "--force"],
            cwd=REPO, capture_output=True, text=True, timeout=300)
        with open(out_path) as fh:
            return p.returncode, json.load(fh)
    finally:
        if os.path.exists(out_path):
            os.remove(out_path)


def test_all_skipped_no_prior_is_not_all_ok():
    rc, summary = _run_close(9991)
    assert rc == 1
    assert summary["all_ok"] is False
    # every expected step is present as a failed 'missing' placeholder
    assert set(summary["steps"]) == EXPECTED_STEPS
    for name, st in summary["steps"].items():
        assert st.get("ok") is False, name
        assert st.get("missing") is True, name


def test_prior_green_steps_carry_but_missing_one_still_fails():
    # seed a prior summary with 7 green steps, leave 'smoke' absent
    out_path = os.path.join(REPO, "artifacts", "close_r9992.json")
    prior = {"steps": {k: {"ok": True} for k in EXPECTED_STEPS
                       if k != "smoke"}}
    with open(out_path, "w") as fh:
        json.dump(prior, fh)
    try:
        p = subprocess.run(
            [sys.executable, "tools/close_round.py", "--round", "9992",
             "--skip", ALL_SKIPS, "--force"],
            cwd=REPO, capture_output=True, text=True, timeout=300)
        with open(out_path) as fh:
            summary = json.load(fh)
    finally:
        os.remove(out_path)
    assert p.returncode == 1
    assert summary["all_ok"] is False
    assert summary["steps"]["smoke"] == {
        "ok": False, "missing": True,
        "note": "skipped with no prior result"}
    # the seven seeded steps carried forward as green
    for k in EXPECTED_STEPS - {"smoke"}:
        assert summary["steps"][k]["ok"] is True
        assert summary["steps"][k]["carried"] is True
