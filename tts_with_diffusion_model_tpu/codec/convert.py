"""torch → flax weight conversion for the EnCodec-24kHz codec.

Maps the published ``encodec`` checkpoint state_dict (or the same tensors
re-exported from transformers' EncodecModel) onto ``codec/encodec.py``'s
parameter tree.  SURVEY §7.3 flags codec fidelity as a hard part: tokens
define the dataset, so the converter keeps every tensor bit-exact (only
layout transposes happen here; weight-norm (v, g) pairs are preserved, not
folded).

Usage:
    python -m tts_with_diffusion_model_tpu.codec.convert encodec_24khz.th \
        [zoo/encodec_24khz.npz]

Layout notes:
  - Conv1d weight_v (Cout, Cin, K) → (K, Cin, Cout); weight_g (Cout, 1, 1)
    → (1, 1, Cout).
  - ConvTranspose1d weight_v (Cin, Cout, K) → (K, Cin, Cout); weight_g
    (Cin, 1, 1) → (1, Cin, 1)  (torch weight_norm dim=0 ⇒ per-Cin norm).
  - LSTM weight_ih_l{n} (4H, C) → (C, 4H); the two torch biases are summed.
  - RVQ codebooks: quantizer.vq.layers.{q}._codebook.embed stacked.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _conv(sd: dict, prefix: str) -> dict:
    """NormConv1d inside SConv1d: ``<prefix>.conv.weight_{g,v}`` + bias."""
    v = _t(sd[f"{prefix}.conv.weight_v"])  # (Cout, Cin, K)
    g = _t(sd[f"{prefix}.conv.weight_g"])  # (Cout, 1, 1)
    b = _t(sd[f"{prefix}.conv.bias"])
    return {
        "v": v.transpose(2, 1, 0),
        "g": g.reshape(1, 1, -1),
        "b": b,
    }


def _convtr(sd: dict, prefix: str) -> dict:
    v = _t(sd[f"{prefix}.convtr.weight_v"])  # (Cin, Cout, K)
    g = _t(sd[f"{prefix}.convtr.weight_g"])  # (Cin, 1, 1)
    b = _t(sd[f"{prefix}.convtr.bias"])
    return {
        "v": v.transpose(2, 0, 1),
        "g": g.reshape(1, -1, 1),
        "b": b,
    }


def _lstm(sd: dict, prefix: str, num_layers: int = 2) -> dict:
    out = {}
    for layer in range(num_layers):
        w_ih = _t(sd[f"{prefix}.lstm.weight_ih_l{layer}"])  # (4H, C)
        w_hh = _t(sd[f"{prefix}.lstm.weight_hh_l{layer}"])  # (4H, H)
        b = _t(sd[f"{prefix}.lstm.bias_ih_l{layer}"]) + _t(
            sd[f"{prefix}.lstm.bias_hh_l{layer}"]
        )
        out[f"w_ih_l{layer}"] = w_ih.T
        out[f"w_hh_l{layer}"] = w_hh.T
        out[f"b_l{layer}"] = b
    return out


def _resblock(sd: dict, prefix: str) -> dict:
    out = {
        "conv1": _conv(sd, f"{prefix}.block.1"),
        "conv2": _conv(sd, f"{prefix}.block.3"),
    }
    if f"{prefix}.shortcut.conv.weight_v" in sd:
        out["shortcut"] = _conv(sd, f"{prefix}.shortcut")
    return out


def normalize_checkpoint_keys(sd: dict) -> dict:
    """Canonicalize the known public layouts of the EnCodec-24kHz weights
    onto the official ``encodec`` package's key names:

      - HF ``transformers`` ``EncodecModel``: ``encoder.layers.N...`` and
        ``quantizer.layers.q.codebook.embed`` instead of
        ``encoder.model.N...`` / ``quantizer.vq.layers.q._codebook.embed``.
      - torch ≥ 2.1 parametrized weight norm:
        ``...parametrizations.weight.original0/original1`` instead of
        ``...weight_g/weight_v``.

    Returns a new dict; unknown keys pass through untouched.
    """
    import re

    out = {}
    for k, v in sd.items():
        k = re.sub(r"^(encoder|decoder)\.layers\.", r"\1.model.", k)
        # HF names the decoder's *transposed* convs ``conv`` too; the
        # official layout calls them ``convtr``.  For the fixed 24 kHz
        # topology the upsample layers sit at decoder indices 3/6/9/12
        # (official checkpoints already say ``convtr`` there, so this
        # rewrite only ever fires on HF keys).
        k = re.sub(r"^decoder\.model\.(3|6|9|12)\.conv\.", r"decoder.model.\1.convtr.", k)
        # Official ``encodec`` nests SConv1d→NormConv1d→Conv1d (and the
        # transposed analogue), so its state_dict doubles the module name:
        # ``...conv.conv.weight_g`` / ``...convtr.convtr.weight_g``.
        # Collapse to the single-level canonical names.
        k = k.replace(".conv.conv.", ".conv.").replace(".convtr.convtr.", ".convtr.")
        k = re.sub(
            r"^quantizer\.layers\.(\d+)\.codebook\.embed$",
            r"quantizer.vq.layers.\1._codebook.embed",
            k,
        )
        k = k.replace(".parametrizations.weight.original0", ".weight_g")
        k = k.replace(".parametrizations.weight.original1", ".weight_v")
        out[k] = v
    return out


def verify_params(params: dict) -> dict:
    """Checkpoint-validation battery for converted codec weights.

    Runs the converted parameters through encode → decode on a deterministic
    multi-tone signal and checks structural health: codes within the
    codebook range, more than one distinct code in use (a broken conversion
    typically collapses the quantizer), finite audio out, and a finite
    encode(decode(codes)) second pass.  Returns a report dict with ``ok``.

    This certifies a conversion mechanically; numerical equivalence of the
    conversion itself is proven against a full-architecture torch oracle in
    ``tests/test_codec_full_oracle.py``.
    """
    import jax.numpy as jnp

    from .encodec import HOP, EncodecModel

    model = EncodecModel()
    t = np.arange(HOP * 16) / 24_000.0
    wav = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 880 * t + 0.5)
        + 0.1 * np.sin(2 * np.pi * 3520 * t)
    ).astype(np.float32)
    x = jnp.asarray(wav)[None, :, None]

    codes = np.asarray(model.apply(params, x, 8, method=EncodecModel.encode))
    out = np.asarray(model.apply(params, jnp.asarray(codes), method=EncodecModel.decode))
    codes2 = np.asarray(
        model.apply(params, jnp.asarray(out), 8, method=EncodecModel.encode)
    )

    bins = params["params"]["quantizer"]["codebooks"].shape[1]
    report = {
        "codes_shape": list(codes.shape),
        "codes_in_range": bool((codes >= 0).all() and (codes < bins).all()),
        "distinct_codes": int(len(np.unique(codes))),
        "finite_audio": bool(np.isfinite(out).all()),
        "audio_rms": float(np.sqrt((out**2).mean())),
        "reencode_finite": bool((codes2 >= 0).all() and (codes2 < bins).all()),
        "reencode_l0_match": float((codes2[:, 0] == codes[:, 0]).mean()),
    }
    report["ok"] = (
        report["codes_in_range"]
        and report["finite_audio"]
        and report["distinct_codes"] > 1
        and report["reencode_finite"]
    )
    return report


def convert_state_dict(sd: dict) -> dict:
    """encodec state_dict (numpy tensors) → flax param tree for EncodecModel.

    Accepts the official ``encodec`` layout, the HF ``transformers``
    ``EncodecModel`` layout, and torch ≥ 2.1 parametrized weight norm
    (see ``normalize_checkpoint_keys``)."""
    sd = normalize_checkpoint_keys(sd)
    n_ratios = 4
    enc = {"conv_in": _conv(sd, "encoder.model.0")}
    for i in range(n_ratios):
        enc[f"block_{i}"] = _resblock(sd, f"encoder.model.{1 + 3 * i}")
        enc[f"down_{i}"] = _conv(sd, f"encoder.model.{3 + 3 * i}")
    enc["lstm"] = _lstm(sd, f"encoder.model.{1 + 3 * n_ratios}")
    enc["conv_out"] = _conv(sd, f"encoder.model.{3 + 3 * n_ratios}")

    dec = {"conv_in": _conv(sd, "decoder.model.0"), "lstm": _lstm(sd, "decoder.model.1")}
    for i in range(n_ratios):
        dec[f"up_{i}"] = _convtr(sd, f"decoder.model.{3 + 3 * i}")
        dec[f"block_{i}"] = _resblock(sd, f"decoder.model.{4 + 3 * i}")
    # The decoder ends [..., res13, ELU14, conv15]: the final conv sits at
    # 3 + 3·n_ratios (= 15), after the trailing activation — verified
    # against the real transformers EncodecModel layout (index 14 is the
    # parameterless ELU and appears in no checkpoint).
    dec["conv_out"] = _conv(sd, f"decoder.model.{3 + 3 * n_ratios}")

    n_q = 0
    while f"quantizer.vq.layers.{n_q}._codebook.embed" in sd:
        n_q += 1
    codebooks = np.stack(
        [_t(sd[f"quantizer.vq.layers.{q}._codebook.embed"]) for q in range(n_q)]
    )

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quantizer": {"codebooks": codebooks},
        }
    }


def load_torch_checkpoint(path: str | Path) -> dict:
    """Load a checkpoint file: the official ``.th`` release, a plain torch
    state_dict, or an HF ``.safetensors`` file."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(str(path)))
    import torch

    obj = torch.load(str(path), map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "best_state" in obj:  # official release format
        obj = obj["best_state"]
    return {k: v.numpy() for k, v in obj.items()}


def save_npz_params(params: dict, path: str | Path):
    flat = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(node)

    rec("", params)
    np.savez(path, **flat)


def load_npz_params(path: str | Path) -> dict:
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def main():
    import json

    args = [a for a in sys.argv[1:] if a != "--verify"]
    verify = "--verify" in sys.argv[1:]
    if not args:
        print(__doc__)
        print("Flags:\n  --verify  run the checkpoint-validation battery "
              "after conversion (or on an existing .npz)")
        sys.exit(1)
    src = Path(args[0])
    if src.suffix == ".npz":
        params = load_npz_params(src)
        dst = src
    else:
        dst = Path(args[1]) if len(args) > 1 else Path("zoo/encodec_24khz.npz")
        dst.parent.mkdir(parents=True, exist_ok=True)
        params = convert_state_dict(load_torch_checkpoint(src))
        save_npz_params(params, dst)
        print(f"{dst} saved.")
    if verify:
        report = verify_params(params)
        print(json.dumps(report, indent=2))
        if not report["ok"]:
            sys.exit(2)
        print("verification OK")


if __name__ == "__main__":
    main()
