"""Training entrypoint: ``python -m tts_with_diffusion_model_tpu.train yaml=<cfg>``.

≡ ``vall_e/train.py``: builds the model from ``cfg.model`` (ar*/nar*/
diffusion*), wires the per-model loss feeder (``train.py:50-85``), wraps it
in an Engine, and hands everything to the generic trainer loop.  The eval
loop the reference disabled (``train.py:89``) is re-enabled: it computes val
losses and (when a codec is available) decodes hypothesis/reference wavs
under ``log_dir/<step>/{hyp,ref}`` (``train.py:90-145``).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, cfg as _cfg_proxy
from ..data.dataset import BucketSpec, create_train_val_dataloader
from ..models import get_model
from ..utils import setup_logging
from ..utils.distributed import init_distributed
from . import trainer
from .engine import Engine

_logger = logging.getLogger(__name__)


def build_model(cfg: Config):
    """Model from cfg, with the training-only knobs threaded in:
    ``diffusion_train_mode`` ("sampled" | "all_t" reference parity),
    ``gradient_checkpointing`` (per-block remat), and ``use_fp16``
    (bf16 compute on TPU when true — the default — else fp32,
    ≡ the reference's fp16 toggle, ``vall_e/config.py:57-60``).
    Explicit ``model_overrides`` win."""
    overrides = dict(cfg.model_overrides or {})
    if cfg.model.startswith("diffusion"):
        overrides.setdefault("train_mode", cfg.diffusion_train_mode)
    overrides.setdefault("remat", cfg.gradient_checkpointing)
    overrides.setdefault("remat_policy", cfg.gradient_checkpointing_policy)
    if cfg.attn_impl is not None:
        overrides.setdefault("attn_impl", cfg.attn_impl)
    dtype = jnp.bfloat16 if cfg.use_fp16 else jnp.float32
    return get_model(cfg.model, cfg.num_tokens, overrides, dtype=dtype)


def make_bucket(cfg: Config, model) -> BucketSpec:
    c = getattr(model, "config", None)
    if c is not None and hasattr(c, "resp_len"):  # diffusion family models
        return BucketSpec(c.text_len, c.prom_len, c.resp_len)
    return BucketSpec(cfg.max_text_len, cfg.max_prom_len, cfg.max_resp_len)


def make_loss_fn(cfg: Config, model):
    """Per-model loss feeders (≡ ``train_feeder`` dispatch, ``train.py:50-85``)."""
    name = cfg.model

    if name.startswith("diffusion"):
        max_t = cfg.max_train_diffusion_steps
        if max_t is not None:
            max_t = min(max_t, model.config.timesteps)

        def loss_fn(params, batch, rng):
            return model.loss(params, batch, rng, max_t=max_t)

        return loss_fn

    if name.startswith("ar"):

        def loss_fn(params, batch, rng):
            _, losses = model.apply(
                params,
                batch["text"],
                batch["text_mask"],
                batch["proms"],
                batch["prom_mask"],
                batch["resp"],
                batch["resp_mask"],
                deterministic=False,
                rngs={"dropout": rng},
            )
            return sum(losses.values()), losses

        return loss_fn

    if name.startswith("nar"):

        def loss_fn(params, batch, rng):
            rng_l, rng_d = jax.random.split(rng)
            B = batch["text"].shape[0]
            quant_levels = jax.random.randint(rng_l, (B,), 0, 7)
            _, losses = model.apply(
                params,
                batch["text"],
                batch["text_mask"],
                batch["proms"],
                batch["prom_mask"],
                batch["resps"],
                batch["resp_mask"],
                quant_levels,
                deterministic=False,
                rngs={"dropout": rng_d},
            )
            return sum(losses.values()), losses

        return loss_fn

    raise NotImplementedError(name)


def init_params(cfg: Config, model, bucket: BucketSpec, rng):
    if not hasattr(model, "apply"):  # diffusion-family functional wrappers
        return model.init(rng)
    B = 2
    text = jnp.zeros((B, bucket.text_len), jnp.int32)
    tm = jnp.ones((B, bucket.text_len), jnp.float32)
    proms = jnp.zeros((B, bucket.prom_len, 8), jnp.int32)
    pm = jnp.ones((B, bucket.prom_len), jnp.float32)
    if cfg.model.startswith("nar"):
        resps = jnp.zeros((B, bucket.resp_len, 8), jnp.int32)
        rm = jnp.ones((B, bucket.resp_len), jnp.float32)
        ql = jnp.zeros((B,), jnp.int32)
        return model.init(rng, text, tm, proms, pm, resps, rm, ql)
    resp = jnp.zeros((B, bucket.resp_len), jnp.int32)
    rm = jnp.ones((B, bucket.resp_len), jnp.float32)
    return model.init(rng, text, tm, proms, pm, resp, rm)


def load_engines(cfg: Config | None = None):
    """≡ ``train.py:25-41``: model → distributed init → Engine → resume."""
    if cfg is None:
        cfg = Config.from_cli()
    init_distributed()
    model = build_model(cfg)
    bucket = make_bucket(cfg, model)
    rng = jax.random.PRNGKey(cfg.seed)
    params = init_params(cfg, model, bucket, rng)

    from ..parallel.mesh import build_mesh

    mesh = build_mesh(cfg.mesh_dp, cfg.mesh_tp)
    opt_cfg = dict(cfg.optimizer_cfg)
    # max_grad_norm (generic-config knob, ≡ ``utils/config.py:21``) overrides
    # the project-level gradient_clipping when set.
    clip = cfg.max_grad_norm if cfg.max_grad_norm is not None else cfg.gradient_clipping
    opt_cfg["gradient_clipping"] = clip
    opt_cfg["gradient_accumulation_steps"] = cfg.gradient_accumulation_steps
    engines = dict(
        model=Engine(
            name="model",
            init_params=params,
            loss_fn=make_loss_fn(cfg, model),
            opt_cfg=opt_cfg,
            ckpt_root=cfg.ckpt_dir,
            mesh=mesh,
            zero1=cfg.zero1,
            ema_decay=cfg.ema_decay,
        )
    )
    return trainer.load_engines(engines, cfg)


def main(cfg: Config | None = None):
    if cfg is None:
        cfg = Config.from_cli()
    _cfg_proxy.set(cfg)
    setup_logging(cfg.log_dir)

    model = build_model(cfg)
    bucket = make_bucket(cfg, model)
    train_dl, subtrain_dl, val_dl = create_train_val_dataloader(cfg, bucket)

    def eval_params(engine):
        """The weights eval runs with: the EMA average when
        ``eval_use_ema`` is set and tracked, else the raw params."""
        if cfg.eval_use_ema and engine.ema_params is not None:
            return engine.ema_params
        return engine.params

    def decode_eval_audio(engines, name, batch):
        """Hyp/ref wav dumps (≡ the disabled eval body, ``train.py:90-145``):
        generate with the current model, EnCodec-decode both hypothesis and
        reference under ``log_dir/<step>/<name>/{hyp,ref}``."""
        import jax.numpy as jnp

        from ..emb import qnt

        engine = engines["model"]
        params = eval_params(engine)
        rng = jax.random.PRNGKey(engines.global_step)
        out_root = Path(cfg.log_dir) / str(engines.global_step) / name

        if cfg.model.startswith("ar"):
            from ..models.ar import ar_generate

            toks, lens = ar_generate(
                model, params, jnp.asarray(batch["text"]),
                jnp.asarray(batch["text_mask"]), jnp.asarray(batch["proms"]),
                jnp.asarray(batch["prom_mask"]), rng,
                max_steps=cfg.max_val_ar_steps,
                sampling_temperature=cfg.sampling_temperature,
            )
            hyps = [np.asarray(toks[i, : int(lens[i])])[:, None]
                    for i in range(toks.shape[0])]
        elif cfg.model.startswith("nar"):
            from ..models.nar import nar_generate

            out = nar_generate(
                model, params, jnp.asarray(batch["text"]),
                jnp.asarray(batch["text_mask"]), jnp.asarray(batch["proms"]),
                jnp.asarray(batch["prom_mask"]),
                jnp.asarray(batch["resp"], jnp.int32),
                jnp.asarray(batch["resp_mask"]), rng,
                sampling_temperature=cfg.sampling_temperature,
            )
            hyps = [
                np.asarray(out[i])[: int(batch["resp_mask"][i].sum())]
                for i in range(out.shape[0])
            ]
        else:  # diffusion family
            out = model.generate(
                params, jnp.asarray(batch["text"]),
                jnp.asarray(batch["text_mask"]), jnp.asarray(batch["proms"]),
                jnp.asarray(batch["prom_mask"]), rng,
            )
            # This family generates a fixed window (the reference's D3PM
            # emits its full 448-frame bucket too, ``ar_discrete.py:592``);
            # utterance length is externally set, not model-chosen.  Score
            # the reference's span — otherwise the padding tail beyond the
            # utterance dominates the DTW-MCD with content-free frames.
            hyps = [
                np.asarray(out[i])[: int(batch["resp_mask"][i].sum()), None]
                for i in range(out.shape[0])
            ]

        from ..audio.wavio import write_wav
        from ..codec.encodec import HOP
        from ..utils.metrics import aggregate_metrics, eval_utterance_metrics

        def decode_rows(rows):
            """Batch-decode a list of (t_i, q) code arrays in ONE codec call.

            Per-row decode compiles one XLA program per DISTINCT length —
            the AR eval's generated lengths are model-chosen, so its first
            tick paid ~45 min of tunnel compiles for ~64 lengths.  Pad every
            row to the batch max rounded up to 64 frames (edge-replicated
            codes, so the convolutional decoder sees signal-like context
            rather than a zero cliff), decode once, slice each wav back to
            its row's t_i·HOP samples.  Eval-dump-only path: the few frames
            of receptive-field overlap with the replicated tail differ
            imperceptibly from an exact-length decode.
            """
            lens = [len(r) for r in rows]
            T = -(-max(lens) // 64) * 64
            padded = np.stack([
                np.concatenate(
                    [r, np.repeat(r[-1:], T - len(r), axis=0)], axis=0)
                for r in rows
            ])  # (B, T, q)
            wavs, sr = qnt.decode(np.moveaxis(padded, 1, 2))
            return [wavs[i, : lens[i] * HOP] for i in range(len(rows))], sr

        # The NAR is *given* ground-truth level 0 (it only generates levels
        # 1+), so scoring level 0 would pad 'acc' with a guaranteed-perfect
        # level; report it as teacher-provided instead.
        teacher_levels = 1 if cfg.model.startswith("nar") else 0
        refs = [
            np.asarray(batch["resps"][i][: int(batch["resp_mask"][i].sum())])
            for i in range(len(batch["path"]))
        ]
        ref_wavs, sr = decode_rows(refs)
        nonempty = [i for i, h in enumerate(hyps) if len(h) > 0]
        hyp_wavs = {}
        if nonempty:
            ws, _ = decode_rows([np.asarray(hyps[i]) for i in nonempty])
            hyp_wavs = dict(zip(nonempty, ws))
        per_utt = []
        for i, path in enumerate(batch["path"]):
            rel = Path(path).name.split(".")[0]
            hyp_path = out_root / "hyp" / f"{rel}.wav"
            ref_path = out_root / "ref" / f"{rel}.wav"
            hyp_path.parent.mkdir(parents=True, exist_ok=True)
            ref_path.parent.mkdir(parents=True, exist_ok=True)
            write_wav(ref_path, ref_wavs[i], sr)
            if i in hyp_wavs:
                write_wav(hyp_path, hyp_wavs[i], sr)
                per_utt.append(eval_utterance_metrics(
                    hyps[i], refs[i], hyp_wavs[i], ref_wavs[i], sr,
                    teacher_levels=teacher_levels))
            else:
                per_utt.append({"len_ratio": 0.0, "acc": 0.0})
        # Objective numbers per eval tick (the reference's eval dumps wavs
        # and losses only, ``train.py:90-145``): per-level token accuracy
        # and DTW-aligned mel-cepstral distortion (utils/metrics.py).
        metrics = aggregate_metrics(per_utt)
        metrics.update({"global_step": engines.global_step, "name": name})
        _logger.info(f"Eval metrics: {json.dumps(metrics)}.")
        with open(out_root / "metrics.json", "w") as f:
            json.dump({"mean": metrics, "per_utt": per_utt}, f, indent=1)

    # Compiled once per process; reused across eval ticks (re-jitting inside
    # run_eval would recompile the loss on every eval).
    eval_loss_fn = jax.jit(make_loss_fn(cfg, model))

    def run_eval(engines, name, dl):
        """Val-loss eval (re-enabling the intent of ``train.py:90-145``)."""
        engine = engines["model"]
        rng = jax.random.PRNGKey(0)
        losses = []
        loss_fn = eval_loss_fn
        first_batch = None
        for batch in dl:
            arrays = {
                k: v for k, v in batch.items() if isinstance(v, np.ndarray)
            }
            loss, _ = loss_fn(eval_params(engine), arrays, rng)
            losses.append(float(loss))
            if first_batch is None:
                first_batch = batch
        if losses:
            stats = {
                "loss": sum(losses) / len(losses),
                "global_step": engines.global_step,
                "name": name,
            }
            _logger.info(f"Eval: {stats}.")
        if cfg.eval_decode_audio and first_batch is not None:
            decode_eval_audio(engines, name, first_batch)
        return 0

    def eval_fn(engines):
        run_eval(engines, "subtrain", subtrain_dl)
        run_eval(engines, "val", val_dl)

    trainer.train(
        engines_loader=lambda: load_engines(cfg),
        train_dl=train_dl,
        eval_fn=eval_fn,
    )


if __name__ == "__main__":
    main()
