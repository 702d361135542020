"""Soak-log assertions: resume, loss decrease, evals (see scripts/soak.sh).

    python scripts/soak_check.py <log_root_for_run> <max_iter>

``<log_root_for_run>`` contains one timestamped subdir per launch (the
kill segment and each resume segment), each with a rank-stamped JSON-lines
``log.txt``.  Exits nonzero unless: at least two launch segments exist, a
non-zero checkpoint restore was logged, global_step reached ``max_iter``,
the mean loss of the last 50 logged steps is below the first 50's, and at
least one eval tick was logged.
"""

from __future__ import annotations

import glob
import json
import re
import sys


def check(log_dir: str, max_iter: int) -> dict:
    paths = sorted(glob.glob(f"{log_dir}/*/log.txt"))
    assert len(paths) >= 2, f"expected >=2 launch logs (kill + resume): {paths}"

    rows, restored, n_evals = [], [], 0
    for path in paths:
        for line in open(path):
            if "Restored checkpoint" in line:
                m = re.search(r"step (\d+)", line)
                if m:
                    restored.append(int(m.group(1)))
            if "Eval: " in line:
                n_evals += 1
                continue
            m = re.search(r"(\{.*\})\s*$", line)
            if m:
                try:
                    row = json.loads(m.group(1))
                except json.JSONDecodeError:
                    continue
                if "global_step" in row:
                    rows.append(row)

    assert restored and max(restored) > 0, (
        f"no non-zero checkpoint restore logged (restores: {restored}) — "
        "the relaunch did not resume"
    )
    steps = [r["global_step"] for r in rows]
    assert max(steps) >= max_iter, f"did not reach max_iter: {max(steps)}"
    losses = [r["nll"] for r in rows if "nll" in r]
    assert losses, "no 'nll' training rows found in the log"
    head = sum(losses[:50]) / len(losses[:50])
    tail = sum(losses[-50:]) / len(losses[-50:])
    assert tail < head, f"loss did not decrease across the soak: {head} -> {tail}"
    assert n_evals > 0, "no eval stats logged"
    return {
        "soak_steps": int(max(steps)),
        "resumed_from": max(restored),
        "loss_first50": round(head, 4),
        "loss_last50": round(tail, 4),
        "n_evals": n_evals,
    }


if __name__ == "__main__":
    print(json.dumps(check(sys.argv[1], int(sys.argv[2]))))
