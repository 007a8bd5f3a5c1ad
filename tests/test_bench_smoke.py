"""bench.py emits exactly one valid JSON line (the driver's BENCH
contract) — run at sf0.001 so the smoke is fast."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_json_line():
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_CPUS"] = "8"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "suite_seconds"
    assert out["unit"] == "sec"
    assert out["sf"] == 0.001
    assert out["value"] > 0
    assert len(out["queries"]) >= 16
