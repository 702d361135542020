"""Codec tests: numerical parity of the Flax primitives against torch
oracles (weight-normed causal conv, transposed conv, LSTM), RVQ properties,
full-model shape/determinism, and converter structural round-trip.

The encodec pip package is absent in this environment, so parity is proven
against torch primitives configured identically (torch is the numerics
oracle the published checkpoint was trained with) — SURVEY §7.3 "EnCodec
fidelity" risk reduction.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from tts_with_diffusion_model_tpu.codec.convert import (
    _conv,
    _convtr,
    _lstm,
    convert_state_dict,
    load_npz_params,
    save_npz_params,
)
from tts_with_diffusion_model_tpu.codec.encodec import HOP, Codec, EncodecModel
from tts_with_diffusion_model_tpu.codec.rvq import ResidualVQ, nearest_code
from tts_with_diffusion_model_tpu.codec.seanet import (
    ResidualLSTM,
    StreamableConv1d,
    StreamableConvTranspose1d,
    extra_padding_for_frames,
)

torch.manual_seed(0)


def _causal_pad_torch(x, k_eff, stride, mode="reflect"):
    pad_total = k_eff - stride
    length = x.shape[-1]
    n_frames = (length - k_eff + pad_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad_total)
    extra = max(0, ideal - length)
    return torch.nn.functional.pad(x, (pad_total, extra), mode=mode)


def test_streamable_conv_matches_torch():
    Cin, Cout, K, S, T = 4, 6, 7, 2, 50
    conv = tnn.utils.weight_norm(tnn.Conv1d(Cin, Cout, K, stride=S))
    x = torch.randn(2, Cin, T)
    with torch.no_grad():
        y_t = conv(_causal_pad_torch(x, K, S)).numpy()

    sd = {
        "m.conv.weight_v": conv.weight_v.detach().numpy(),
        "m.conv.weight_g": conv.weight_g.detach().numpy(),
        "m.conv.bias": conv.bias.detach().numpy(),
    }
    params = {"params": _conv(sd, "m")}
    mod = StreamableConv1d(Cin, Cout, K, stride=S)
    y_j = mod.apply(params, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(
        np.asarray(y_j).transpose(0, 2, 1), y_t, atol=2e-5
    )


def test_streamable_conv_dilated_matches_torch():
    Cin, Cout, K, D, T = 3, 5, 3, 2, 40
    conv = tnn.utils.weight_norm(tnn.Conv1d(Cin, Cout, K, dilation=D))
    x = torch.randn(1, Cin, T)
    k_eff = (K - 1) * D + 1
    with torch.no_grad():
        y_t = conv(_causal_pad_torch(x, k_eff, 1)).numpy()
    sd = {
        "m.conv.weight_v": conv.weight_v.detach().numpy(),
        "m.conv.weight_g": conv.weight_g.detach().numpy(),
        "m.conv.bias": conv.bias.detach().numpy(),
    }
    mod = StreamableConv1d(Cin, Cout, K, dilation=D)
    y_j = mod.apply({"params": _conv(sd, "m")}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1), y_t, atol=2e-5)


def test_streamable_convtranspose_matches_torch():
    Cin, Cout, R, T = 6, 3, 5, 20
    K = 2 * R
    convtr = tnn.utils.weight_norm(tnn.ConvTranspose1d(Cin, Cout, K, stride=R))
    x = torch.randn(2, Cin, T)
    with torch.no_grad():
        y_full = convtr(x)
        pad_total = K - R
        y_t = y_full[..., : y_full.shape[-1] - pad_total].numpy()

    sd = {
        "m.convtr.weight_v": convtr.weight_v.detach().numpy(),
        "m.convtr.weight_g": convtr.weight_g.detach().numpy(),
        "m.convtr.bias": convtr.bias.detach().numpy(),
    }
    mod = StreamableConvTranspose1d(Cin, Cout, K, stride=R)
    y_j = mod.apply({"params": _convtr(sd, "m")}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 2, 1), y_t, atol=2e-5)


def test_residual_lstm_matches_torch():
    C, T = 8, 12
    lstm = tnn.LSTM(C, C, num_layers=2)
    x = torch.randn(T, 2, C)  # (T, B, C) torch layout
    with torch.no_grad():
        y_t, _ = lstm(x)
        y_t = (y_t + x).numpy()

    sd = {f"m.lstm.{k}": v.detach().numpy() for k, v in lstm.named_parameters()}
    params = {"params": _lstm(sd, "m")}
    mod = ResidualLSTM(C)
    xj = jnp.asarray(x.numpy().transpose(1, 0, 2))  # (B, T, C)
    y_j = mod.apply(params, xj)
    np.testing.assert_allclose(
        np.asarray(y_j).transpose(1, 0, 2), y_t, atol=2e-5
    )


def test_nearest_code_exact():
    rng = jax.random.PRNGKey(0)
    codebook = jax.random.normal(rng, (16, 8)) * 10
    idx = nearest_code(codebook[5][None], codebook)
    assert int(idx[0]) == 5


def test_rvq_residual_error_decreases():
    """With hierarchically-scaled codebooks (coarse→fine, as trained RVQ
    codebooks are) the reconstruction error decreases with depth."""
    rvq = ResidualVQ(n_q=4, bins=64, dim=16)
    rng = jax.random.PRNGKey(0)
    params = rvq.init(rng, jnp.zeros((1, 4, 16)), 2)
    cb = np.asarray(params["params"]["codebooks"]).copy()
    for q in range(4):
        cb[q] *= 4.0 ** (-q)  # scales 1, 1/4, 1/16, 1/64
    params = {"params": {"codebooks": jnp.asarray(cb)}}
    # data: sum of one code per level → perfectly representable
    rng_i = np.random.default_rng(0)
    idx = rng_i.integers(0, 64, size=(4, 2, 10))
    x = jnp.asarray(sum(cb[q][idx[q]] for q in range(4)))
    errs = []
    for q in (1, 2, 4):
        dec, codes = rvq.apply(params, x, q)
        assert codes.shape == (2, q, 10)
        errs.append(float(jnp.mean((dec - x) ** 2)))
    assert errs[0] > errs[1] > errs[2]


def test_rvq_decode_encode_consistency():
    """Codes produced from a decoded latent re-encode to themselves when the
    codebooks are well-separated."""
    rvq = ResidualVQ(n_q=2, bins=8, dim=4)
    rng = jax.random.PRNGKey(1)
    params = rvq.init(rng, jnp.zeros((1, 3, 4)), 2)
    # use scaled codebooks so levels are separable
    cb = np.asarray(params["params"]["codebooks"]).copy()
    cb[0] *= 100.0
    params = {"params": {"codebooks": jnp.asarray(cb)}}
    codes = jnp.array([[[1, 3, 5], [2, 4, 6]]], jnp.int32)  # (1, 2, 3)
    dec = rvq.apply(params, codes, method=ResidualVQ.decode)
    codes2 = rvq.apply(params, dec, 2, method=ResidualVQ.encode)
    np.testing.assert_array_equal(np.asarray(codes2), np.asarray(codes))


@pytest.mark.slow
def test_full_codec_shapes_and_determinism():
    codec = Codec()
    T = HOP * 6 + 37  # non-multiple of hop
    wav = np.sin(np.linspace(0, 40, T)).astype(np.float32)
    codes = codec.encode(wav)
    assert codes.shape == (8, math.ceil(T / HOP))
    codes2 = codec.encode(wav)
    np.testing.assert_array_equal(codes, codes2)
    out, sr = codec.decode(codes)
    assert sr == 24_000
    assert out.shape[0] == codes.shape[1] * HOP


@pytest.mark.slow
def test_converter_structural_roundtrip(tmp_path):
    """A synthetic full encodec state_dict converts into exactly the param
    tree EncodecModel.init produces (names + shapes)."""

    def ratios_channels():
        # encoder channel progression: 32→64→128→256→512
        return [(32 * 2**i, 32 * 2 ** (i + 1)) for i in range(4)]

    rng = np.random.default_rng(0)

    def t(*s):
        return rng.normal(size=s).astype(np.float32)

    sd = {}

    def add_conv(prefix, cin, cout, k):
        sd[f"{prefix}.conv.weight_v"] = t(cout, cin, k)
        sd[f"{prefix}.conv.weight_g"] = t(cout, 1, 1)
        sd[f"{prefix}.conv.bias"] = t(cout)

    def add_convtr(prefix, cin, cout, k):
        sd[f"{prefix}.convtr.weight_v"] = t(cin, cout, k)
        sd[f"{prefix}.convtr.weight_g"] = t(cin, 1, 1)
        sd[f"{prefix}.convtr.bias"] = t(cout)

    def add_block(prefix, dim):
        add_conv(f"{prefix}.block.1", dim, dim // 2, 3)
        add_conv(f"{prefix}.block.3", dim // 2, dim, 1)
        add_conv(f"{prefix}.shortcut", dim, dim, 1)

    def add_lstm(prefix, dim):
        for layer in range(2):
            sd[f"{prefix}.lstm.weight_ih_l{layer}"] = t(4 * dim, dim)
            sd[f"{prefix}.lstm.weight_hh_l{layer}"] = t(4 * dim, dim)
            sd[f"{prefix}.lstm.bias_ih_l{layer}"] = t(4 * dim)
            sd[f"{prefix}.lstm.bias_hh_l{layer}"] = t(4 * dim)

    # encoder: ratios reversed = [2,4,5,8]
    add_conv("encoder.model.0", 1, 32, 7)
    for i, (cin, cout) in enumerate(ratios_channels()):
        r = [2, 4, 5, 8][i]
        add_block(f"encoder.model.{1 + 3 * i}", cin)
        add_conv(f"encoder.model.{3 + 3 * i}", cin, cout, 2 * r)
    add_lstm("encoder.model.13", 512)
    add_conv("encoder.model.15", 512, 128, 7)

    # decoder: ratios = [8,5,4,2]
    add_conv("decoder.model.0", 128, 512, 7)
    add_lstm("decoder.model.1", 512)
    chans = [(512, 256), (256, 128), (128, 64), (64, 32)]
    for i, (cin, cout) in enumerate(chans):
        r = [8, 5, 4, 2][i]
        add_convtr(f"decoder.model.{3 + 3 * i}", cin, cout, 2 * r)
        add_block(f"decoder.model.{4 + 3 * i}", cout)
    add_conv("decoder.model.15", 32, 1, 7)  # after the trailing ELU (real layout)

    for q in range(32):
        sd[f"quantizer.vq.layers.{q}._codebook.embed"] = t(1024, 128)

    converted = convert_state_dict(sd)

    model = EncodecModel()
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, HOP * 2, 1)))
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: tuple(x.shape), converted)
    assert ref_shapes == got_shapes

    # npz round-trip
    save_npz_params(converted, tmp_path / "w.npz")
    loaded = load_npz_params(tmp_path / "w.npz")
    assert jax.tree.map(lambda x: tuple(x.shape), loaded) == got_shapes

    # converted weights actually run
    wav = jnp.zeros((1, HOP * 3, 1))
    out, codes = model.apply(converted, wav)
    assert codes.shape == (1, 8, 3)


def test_composed_encoder_stack_matches_torch():
    """Composition-level converter check: a mini SEANet-style stack
    (causal conv → resblock with conv shortcut → strided down conv → 2-layer
    residual LSTM → out conv) built in torch with weight_norm must match the
    Flax encoder modules through the converted weights end-to-end."""
    import torch.nn.functional as tF

    from tts_with_diffusion_model_tpu.codec.seanet import (
        ResidualLSTM,
        SEANetResnetBlock,
        StreamableConv1d,
    )

    torch.manual_seed(1)
    C0, C1, R, T = 1, 4, 2, 64

    conv_in = tnn.utils.weight_norm(tnn.Conv1d(C0, C1, 7))
    blk1 = tnn.utils.weight_norm(tnn.Conv1d(C1, C1 // 2, 3))
    blk2 = tnn.utils.weight_norm(tnn.Conv1d(C1 // 2, C1, 1))
    shortcut = tnn.utils.weight_norm(tnn.Conv1d(C1, C1, 1))
    down = tnn.utils.weight_norm(tnn.Conv1d(C1, 2 * C1, 2 * R, stride=R))
    lstm = tnn.LSTM(2 * C1, 2 * C1, num_layers=2)
    conv_out = tnn.utils.weight_norm(tnn.Conv1d(2 * C1, 3, 7))

    x = torch.randn(1, C0, T)
    with torch.no_grad():
        h = conv_in(_causal_pad_torch(x, 7, 1))
        r = blk2(_causal_pad_torch(tF.elu(
            blk1(_causal_pad_torch(tF.elu(h), 3, 1))), 1, 1))
        h = shortcut(_causal_pad_torch(h, 1, 1)) + r
        h = down(_causal_pad_torch(tF.elu(h), 2 * R, R))
        y_l, _ = lstm(h.permute(2, 0, 1))
        h = h + y_l.permute(1, 2, 0)
        y_t = conv_out(_causal_pad_torch(tF.elu(h), 7, 1)).numpy()

    def conv_sd(mod, name):
        return {
            f"{name}.conv.weight_v": mod.weight_v.detach().numpy(),
            f"{name}.conv.weight_g": mod.weight_g.detach().numpy(),
            f"{name}.conv.bias": mod.bias.detach().numpy(),
        }

    from tts_with_diffusion_model_tpu.codec.convert import _conv, _lstm

    sd = {}
    for mod, name in [(conv_in, "ci"), (blk1, "b1"), (blk2, "b2"),
                      (shortcut, "sc"), (down, "dn"), (conv_out, "co")]:
        sd.update(conv_sd(mod, name))
    sd.update({f"l.lstm.{k}": v.detach().numpy()
               for k, v in lstm.named_parameters()})

    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    h = StreamableConv1d(C0, C1, 7).apply({"params": _conv(sd, "ci")}, xj)
    blk_params = {"params": {"conv1": _conv(sd, "b1"), "conv2": _conv(sd, "b2"),
                             "shortcut": _conv(sd, "sc")}}
    h = SEANetResnetBlock(C1).apply(blk_params, h)
    h = jax.nn.elu(h)
    h = StreamableConv1d(C1, 2 * C1, 2 * R, stride=R).apply(
        {"params": _conv(sd, "dn")}, h)
    h = ResidualLSTM(2 * C1).apply({"params": _lstm(sd, "l")}, h)
    h = jax.nn.elu(h)
    y_j = StreamableConv1d(2 * C1, 3, 7).apply({"params": _conv(sd, "co")}, h)

    np.testing.assert_allclose(
        np.asarray(y_j).transpose(0, 2, 1), y_t, atol=5e-5
    )
