#!/usr/bin/env python
"""Render the round-4 generalization evidence curves to a committed PNG.

Reads the evidence dir produced by ``scripts/gen_evidence_v2_all.sh``
(benchmarks/gen_r4/) and draws three stacked panels over global step:

  1. loss            — per-step training loss (smoothed) vs held-out val loss
  2. token accuracy  — generated level-0 accuracy, val vs subtrain, + chance
  3. DTW-MCD         — decoded-wav mel-cepstral distortion, val vs subtrain

Color follows the entity across panels (val = blue, train side = orange);
one measure per axis — three panels instead of dual axes.

Usage: python scripts/gen_r4_plots.py [evidence_dir] [--out curves.png]
"""
from __future__ import annotations

import argparse
import ast
import json
import re
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# categorical slots 1/2 (light mode) + text/surface tokens
C_VAL = "#2a78d6"
C_TRAIN = "#eb6834"
INK = "#1a1a19"
INK_2 = "#5f5e58"
GRID = "#e4e3df"


def read_eval_jsonl(path: Path, name: str):
    """``Eval: {'loss': ..., 'global_step': ..., 'name': 'val'}`` log lines."""
    steps, losses = [], []
    if not path.exists():
        return steps, losses
    for line in path.read_text().splitlines():
        m = re.search(r"Eval: (\{.*\})", line)
        if not m:
            continue
        d = ast.literal_eval(m.group(1))
        if d.get("name") == name:
            steps.append(int(d["global_step"]))
            losses.append(float(d["loss"]))
    return steps, losses


def read_train_jsonl(path: Path):
    steps, losses = [], []
    if not path.exists():
        return steps, losses
    for line in path.read_text().splitlines():
        m = re.search(r"(\{.*\})\s*$", line)
        if not m:
            continue
        try:
            d = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        if "model.loss" in d:
            steps.append(int(d["global_step"]))
            losses.append(float(d["model.loss"]))
    return steps, losses


def ewm(xs, alpha=0.05):
    out, acc = [], None
    for x in xs:
        acc = x if acc is None else (1 - alpha) * acc + alpha * x
        out.append(acc)
    return out


def read_metrics(evid: Path, prefix: str, split: str):
    """metrics_{prefix}_{split}_step{N}.json → (steps, accs, mcds)."""
    rows = []
    for p in evid.glob(f"metrics_{prefix}_{split}_step*.json"):
        d = json.load(open(p))["mean"]
        # a tick whose hypotheses were all empty aggregates without
        # 'mcd' (and possibly 'acc') — skip it rather than crash
        if "acc" not in d or "mcd" not in d:
            continue
        rows.append((int(d["global_step"]), float(d["acc"]), float(d["mcd"])))
    rows.sort()
    return ([r[0] for r in rows], [r[1] for r in rows], [r[2] for r in rows])


def style_axis(ax):
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(INK_2)
    ax.tick_params(colors=INK_2, labelsize=9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("evidence", nargs="?", default="benchmarks/gen_r4",
                    type=Path)
    ap.add_argument("--prefix", default="diffusion_v2")
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--title", default="D3PM generalization on the "
                    "32-speaker synthetic corpus (95/5 held-out split)")
    ap.add_argument("--acc-label", default="generated level-0\ntoken accuracy")
    args = ap.parse_args()
    evid = args.evidence
    out = args.out or evid / "curves.png"

    tr_s, tr_l = read_train_jsonl(evid / f"{args.prefix}_train.jsonl")
    va_s, va_l = read_eval_jsonl(evid / f"{args.prefix}_val.jsonl", "val")
    mv = read_metrics(evid, args.prefix, "val")
    ms = read_metrics(evid, args.prefix, "subtrain")

    fig, (ax1, ax2, ax3) = plt.subplots(
        3, 1, figsize=(7.2, 8.4), sharex=True, dpi=150,
        gridspec_kw={"hspace": 0.28},
    )
    fig.patch.set_facecolor("white")

    # panel 1: loss
    if tr_s:
        ax1.plot(tr_s, ewm(tr_l), color=C_TRAIN, lw=2, zorder=3,
                 label="train loss (per-step, smoothed)")
    if va_s:
        ax1.plot(va_s, va_l, color=C_VAL, lw=2, marker="o", ms=4, zorder=4,
                 label="val loss (held-out utterances)")
        i = min(range(len(va_l)), key=va_l.__getitem__)
        # flip the label leftward when the minimum sits at the curve's end
        left = i >= len(va_l) - 2
        ax1.annotate(f"val min {va_l[i]:.3f} @ {va_s[i]}",
                     (va_s[i], va_l[i]), textcoords="offset points",
                     xytext=(-8 if left else 8, -14), fontsize=9, color=INK,
                     ha="right" if left else "left")
        ax1.scatter([va_s[i]], [va_l[i]], s=46, facecolor="white",
                    edgecolor=C_VAL, lw=2, zorder=5)
    ax1.set_ylabel("cross-entropy loss", fontsize=10, color=INK)
    ax1.legend(frameon=False, fontsize=9, loc="upper right")

    # panel 2: generated token accuracy
    if ms[0]:
        ax2.plot(ms[0], ms[1], color=C_TRAIN, lw=2, marker="o", ms=4,
                 zorder=3, label="subtrain (training utterances)")
    if mv[0]:
        ax2.plot(mv[0], mv[1], color=C_VAL, lw=2, marker="o", ms=4,
                 zorder=4, label="val (held-out utterances)")
    ax2.axhline(1 / 1024, color=INK_2, lw=1.2, ls=(0, (4, 3)), zorder=2)
    if mv[0] or ms[0]:
        x_right = max(mv[0][-1] if mv[0] else 0, ms[0][-1] if ms[0] else 0)
        ax2.annotate("chance (1/1024)", (x_right, 1 / 1024),
                     textcoords="offset points", xytext=(-90, 5),
                     fontsize=9, color=INK_2)
    ax2.set_ylabel(args.acc_label, fontsize=10, color=INK)
    ax2.set_yscale("log")
    ax2.legend(frameon=False, fontsize=9, loc="upper left")

    # panel 3: MCD
    if ms[0]:
        ax3.plot(ms[0], ms[2], color=C_TRAIN, lw=2, marker="o", ms=4,
                 zorder=3, label="subtrain")
    if mv[0]:
        ax3.plot(mv[0], mv[2], color=C_VAL, lw=2, marker="o", ms=4,
                 zorder=4, label="val")
    ax3.set_ylabel("DTW-MCD (dB)\nof decoded wav", fontsize=10, color=INK)
    ax3.set_xlabel("global step", fontsize=10, color=INK)
    ax3.legend(frameon=False, fontsize=9, loc="upper right")

    for ax in (ax1, ax2, ax3):
        style_axis(ax)

    fig.suptitle(args.title, fontsize=11, color=INK, y=0.995)
    fig.savefig(out, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
