"""The driver benchmark artifact contract (round-5 hardening).

BENCH_r04 was rc=124/parsed=null because the bench only emitted its JSON
at the very end. This test runs bench.py's full control flow in
DYNODE_BENCH_SMALL mode (CPU, tiny widths -- numbers meaningless, flow
identical) and asserts the contract the driver relies on: multiple
self-contained JSON emissions, required keys present, rc 0.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_bench_small_mode_emits_incremental_valid_json():
    env = dict(os.environ)
    env["DYNODE_BENCH_SMALL"] = "1"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import bench; bench.main()",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    # incremental: at least one emission per completed stage
    assert len(lines) >= 3, proc.stdout[-2000:]
    records = [json.loads(ln) for ln in lines]
    final = records[-1]
    for key in (
        "metric", "value", "unit", "vs_baseline", "traj_per_sec",
        "traj_per_sec_adaptive", "roofline", "measurements", "regressions",
        "elapsed_s",
    ):
        assert key in final, key
    assert final["metric"] == "multistrain_seirs_trajectories_per_sec"
    assert final["value"] > 0
    # monotonic growth: every earlier emission's keys survive to the end
    for rec in records:
        missing = set(rec) - set(final)
        assert not missing, missing
