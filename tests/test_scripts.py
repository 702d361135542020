"""Ops-script tests: log plotting (scrapes JSON rows from log.txt like the
reference's scripts/plot.py) and the retry wrapper."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_plot_script(tmp_path):
    run_dir = tmp_path / "logs" / "cfg" / "123"
    run_dir.mkdir(parents=True)
    lines = []
    for step in range(1, 30):
        row = {"model.loss": 5.0 / step, "global_step": step, "lr": 1e-4}
        lines.append(f"2026-01-01 - root - INFO - GR=0 - {json.dumps(row)}")
    (run_dir / "log.txt").write_text("\n".join(lines))

    out = tmp_path / "curve.png"
    subprocess.check_call(
        [sys.executable, str(REPO / "scripts" / "plot.py"),
         "--log-dir", str(tmp_path / "logs"), "--ys", "model.loss",
         "--out", str(out)],
    )
    assert out.exists() and out.stat().st_size > 0


def test_run_sh_retries(tmp_path):
    """run.sh relaunches until the command succeeds (scripts/run.sh)."""
    marker = tmp_path / "count"
    script = tmp_path / "flaky.sh"
    script.write_text(
        "#!/bin/bash\n"
        f'n=$(cat {marker} 2>/dev/null || echo 0)\n'
        f'echo $((n+1)) > {marker}\n'
        "[ $n -ge 2 ]\n"
    )
    script.chmod(0o755)
    subprocess.check_call(["bash", str(REPO / "scripts" / "run.sh"), str(script)])
    assert int(marker.read_text()) == 3  # failed twice, succeeded third
