"""Plot training curves from JSON-line logs (≡ the reference's
``scripts/plot.py``): scrape JSON stat rows out of ``logs/**/log.txt``,
group by run, EWM-smooth, and plot requested metrics vs global_step.

Usage: python scripts/plot.py --log-dir logs --ys model.loss [--out loss.png]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

JSON_RE = re.compile(r"(\{.*\})")


def load_rows(log_dir: Path):
    rows = []
    for path in sorted(log_dir.rglob("log.txt")):
        run = path.parent.name
        for line in path.read_text(errors="ignore").splitlines():
            m = JSON_RE.search(line)
            if not m:
                continue
            try:
                data = json.loads(m.group(1))
            except json.JSONDecodeError:
                continue
            if "global_step" in data:
                data["run"] = run
                rows.append(data)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--log-dir", type=Path, default=Path("logs"))
    parser.add_argument("--ys", nargs="+", default=["model.loss"])
    parser.add_argument("--out", type=Path, default=Path("plot.png"))
    parser.add_argument("--span", type=int, default=50, help="EWM span")
    args = parser.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    rows = load_rows(args.log_dir)
    if not rows:
        raise SystemExit(f"No JSON stat rows found under {args.log_dir}")
    df = pd.DataFrame(rows)

    fig, ax = plt.subplots(figsize=(8, 5))
    for run, group in df.groupby("run"):
        group = group.sort_values("global_step")
        for y in args.ys:
            if y not in group:
                continue
            smooth = group[y].ewm(span=args.span).mean()
            ax.plot(group["global_step"], smooth, label=f"{run}:{y}")
    ax.set_xlabel("global_step")
    ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(args.out, "saved.")


if __name__ == "__main__":
    main()
