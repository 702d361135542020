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


def test_shell_scripts_parse():
    """bash -n over every ops script — cheap insurance that edits keep
    them loadable."""
    import pathlib
    import subprocess

    root = pathlib.Path(__file__).resolve().parents[1]
    for name in ("run.sh", "e2e_demo.sh", "soak.sh", "check.sh"):
        subprocess.run(["bash", "-n", str(root / "scripts" / name)],
                       check=True)


def test_soak_check_assertions(tmp_path):
    """scripts/soak_check.py: green on a synthetic kill+resume log pair;
    red when the resume or the loss decrease is missing."""
    import importlib.util
    import json
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "soak_check", root / "scripts" / "soak_check.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def write_log(subdir, rows, extra=()):
        d = tmp_path / subdir
        d.mkdir(parents=True)
        lines = list(extra)
        for step, nll in rows:
            lines.append(
                "2026-01-01 - trainer - INFO - GR=0 - "
                + json.dumps({"global_step": step, "nll": nll})
            )
        (d / "log.txt").write_text("\n".join(lines) + "\n")

    # healthy: two segments, restore logged, loss decreasing, one eval
    write_log("100", [(i, 8.0 - i * 0.01) for i in range(1, 300)])
    write_log("200", [(i, 8.0 - i * 0.01) for i in range(280, 1001)],
              extra=["... Restored checkpoint .../step_00000280 (step 280)",
                     "... Eval: {'loss': 1.0, 'name': 'val'}."])
    out = mod.check(str(tmp_path), 1000)
    assert out["resumed_from"] == 280 and out["soak_steps"] == 1000
    assert out["n_evals"] == 1

    # missing restore line → fail
    import shutil
    bad = tmp_path / "bad"
    shutil.copytree(tmp_path / "100", bad / "100")
    shutil.copytree(tmp_path / "200", bad / "200")
    log2 = (bad / "200" / "log.txt")
    log2.write_text(log2.read_text().replace("Restored checkpoint", "x"))
    import pytest as _pytest
    with _pytest.raises(AssertionError, match="resume"):
        mod.check(str(bad), 1000)
