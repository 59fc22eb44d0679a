"""bench.py hot-box self-defense (round 14, VERDICT r13 item 3).

BENCH_r13 recorded a load1_start of 7.96 under the old threshold of 8
and read +16% on unchanged code. The guard now: threshold 2 by default,
a hot run flags itself ``"contaminated": true`` in the JSON, and
``--require-quiet`` refuses outright (exit 3, machine-readable error
line). Pinned via subprocess with the knobs forced through env so no
actual waiting or benching happens.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # spawns full bench subprocesses (~2 min); excluded from the default (driver-verify) run

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_require_quiet_refuses_hot_box():
    """With an impossible quiet threshold and a zero wait budget,
    --require-quiet must exit 3 and print one JSON error line naming
    the load and the threshold — never a timings line."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_QUIET_LOAD="0.0",  # every box is "hot"
        SPARK_GRAFT_BENCH_REQUIRE_QUIET_MAX_WAIT="0",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--require-quiet"],
        capture_output=True, text=True, timeout=300, env=env, cwd=REPO)
    assert p.returncode == 3, (p.returncode, p.stdout[-500:],
                               p.stderr[-500:])
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    doc = json.loads(line)
    assert doc["error"] == "box never quieted"
    assert doc["quiet_load_threshold"] == 0.0
    assert "load1" in doc
    assert "queries" not in doc  # it refused BEFORE timing anything


def test_default_mode_flags_contamination_without_refusing():
    """Without --require-quiet a hot box still benches (the driver's
    artifact must exist) but the output must carry contaminated: true.
    Run with a single repeat at sf0.001 to keep it cheap."""
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_QUIET_LOAD="0.0",
        SPARK_GRAFT_BENCH_MAX_WAIT="0",
        SPARK_GRAFT_BENCH_REPEATS="1",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
    )
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert p.returncode == 0, (p.returncode, p.stderr[-800:])
    line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
    doc = json.loads(line)
    assert doc["contaminated"] is True
    assert doc["queries"] and doc["value"] > 0
    assert "WARNING" in p.stderr and "HOT box" in p.stderr
