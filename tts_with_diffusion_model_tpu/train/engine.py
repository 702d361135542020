"""Engine / Engines: the optax+orbax training runtime.

TPU-native rebuild of the reference's DeepSpeed wrapper
(``vall_e/utils/engines.py:19-185``), preserving its *contract*:

  - ``Engine`` owns one model's (params, optimizer state, step) and knows how
    to step, save, and load itself under ``ckpt_dir/<name>`` (``:95-107``);
  - ``Engines`` is a dict of engines with a combined ``step(feeder, batch)``
    returning a flat stats dict {loss, lr, grad_norm, elapsed_time,
    engine_step, ...} (``:126-166``); global step = max engine step
    (``:109-111``);
  - auto-resume is non-strict in spirit: missing checkpoints are tolerated.

What DeepSpeed provided is rebuilt natively: Adam + WarmupDecayLR ≡ optax
adam + linear warmup→decay schedule (``vall_e/config.py:62-83``), fp16+loss
scaling ≡ bf16 compute (no scaling needed on TPU), gradient all-reduce ≡
XLA psum inserted by jit over the ``dp`` mesh axis, gradient clipping ≡
``optax.clip_by_global_norm``.  The OOM→checkpoint→raise path (``:167-178``)
maps to catching XlaRuntimeError RESOURCE_EXHAUSTED.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Callable, Protocol

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import (
    batch_sharding,
    build_mesh,
    param_shardings,
    replicated,
    zero1_shardings,
)

_logger = logging.getLogger(__name__)


def warmup_decay_schedule(
    warmup_min_lr: float,
    warmup_max_lr: float,
    warmup_num_steps: int,
    total_num_steps: int,
) -> optax.Schedule:
    """DeepSpeed WarmupDecayLR: linear warmup min→max, then linear decay →0
    (≡ the scheduler block in ``vall_e/config.py:68-77``)."""
    warm = optax.linear_schedule(warmup_min_lr, warmup_max_lr, warmup_num_steps)
    decay = optax.linear_schedule(
        warmup_max_lr, 0.0, max(total_num_steps - warmup_num_steps, 1)
    )
    return optax.join_schedules([warm, decay], [warmup_num_steps])


def make_optimizer(
    opt_cfg: dict, params=None, trainable_filter=None
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    sched_cfg = opt_cfg["scheduler"]
    schedule = warmup_decay_schedule(
        sched_cfg["warmup_min_lr"],
        sched_cfg["warmup_max_lr"],
        sched_cfg["warmup_num_steps"],
        sched_cfg["total_num_steps"],
    )
    tx = optax.chain(
        optax.clip_by_global_norm(opt_cfg.get("gradient_clipping", 1.0)),
        optax.adam(schedule),
    )
    if trainable_filter is not None:
        # Freeze support (≡ Engine.freeze/unfreeze, ``engines.py:25-34``):
        # parameters whose path fails the filter get zero updates.
        assert params is not None
        import flax

        flat = flax.traverse_util.flatten_dict(params, sep="/")
        mask = flax.traverse_util.unflatten_dict(
            {k: bool(trainable_filter(k)) for k in flat}, sep="/"
        )
        tx = optax.multi_transform({True: tx, False: optax.set_to_zero()}, mask)
    accum = opt_cfg.get("gradient_accumulation_steps", 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule


class LossFn(Protocol):
    def __call__(self, params, batch: dict, rng: jax.Array) -> tuple[jax.Array, dict]:
        ...


class Engine:
    """One model's training state + pjit-compiled step.

    Compile behavior on TPU: the first step compiles with default input
    layouts and XLA may hand back donated outputs in its preferred layouts,
    so the *second* step triggers one more compile; steady state from step
    three.  Benchmarks should warm up two steps.
    """

    def __init__(
        self,
        name: str,
        init_params,
        loss_fn: LossFn,
        opt_cfg: dict,
        ckpt_root: Path,
        mesh=None,
        trainable_filter=None,
        zero1: bool = False,
        ema_decay: float | None = None,
    ):
        self.name = name
        self.loss_fn = loss_fn
        self.mesh = mesh if mesh is not None else build_mesh()
        from flax import linen as _nn

        self.tx, self.schedule = make_optimizer(
            opt_cfg, _nn.meta.unbox(init_params), trainable_filter
        ) if trainable_filter is not None else make_optimizer(opt_cfg)
        self.ckpt_root = Path(ckpt_root)

        # Shard params per their flax logical annotations; opt state mirrors.
        # The step function donates its input buffers, so the engine takes a
        # private copy — the caller's init_params stay valid.  Params are
        # stored unboxed (plain arrays) — the logical-partitioning metadata
        # is only needed to derive shardings here.
        from flax import linen as nn

        unboxed = nn.meta.unbox(init_params)
        if self.mesh.size > 1:
            self.param_sharding = param_shardings(self.mesh, init_params)
            self.params = jax.tree.map(
                lambda x, s: jax.device_put(jnp.asarray(x).copy(), s),
                unboxed,
                self.param_sharding,
            )
        else:
            # Single-device mesh: plain placement.  (Committing with a 1×1
            # NamedSharding makes jit outputs come back SingleDeviceSharding,
            # so the second step recompiles — a ~2 min tax on TPU.)
            dev = self.mesh.devices.flat[0]
            self.param_sharding = None
            self.params = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x).copy(), dev), unboxed
            )
        # optimizer moments are created as zeros_like(params) and inherit
        # the param shardings.
        self.opt_state = self.tx.init(self.params)
        # Commit every optimizer-state leaf: optax creates its step
        # counters as *uncommitted* scalars, and orbax restores arrays onto
        # the restore target's placement — an uncommitted scalar would come
        # back pinned to one device next to mesh-sharded params, making the
        # first post-restore step fail with mixed device sets (exposed by
        # the mesh-reshape restore test).
        from jax.sharding import NamedSharding

        self._opt_shardings = None
        if zero1 and self.mesh.shape.get("dp", 1) > 1:
            # ZeRO-1: shard optimizer moments over the dp axis (the
            # reference turns DeepSpeed ZeRO *off*, ``train.py:23`` — here
            # it is one sharding annotation; see parallel/mesh.py).
            self._opt_shardings = zero1_shardings(self.mesh, self.opt_state)
            self.opt_state = jax.tree.map(
                lambda x, s: jax.device_put(jnp.asarray(x), s),
                self.opt_state,
                self._opt_shardings,
            )
        elif self.mesh.size > 1:
            rep_sh = replicated(self.mesh)
            self.opt_state = jax.tree.map(
                lambda x: x
                if isinstance(getattr(x, "sharding", None), NamedSharding)
                else jax.device_put(jnp.asarray(x), rep_sh),
                self.opt_state,
            )
        else:
            dev0 = self.mesh.devices.flat[0]
            self.opt_state = jax.tree.map(
                lambda x: jax.device_put(jnp.asarray(x), dev0), self.opt_state
            )
        self.step = 0

        # Exponential moving average of params (diffusion-training staple
        # the reference lacks; sample from `ema_params` via export --ema).
        # Updated inside the jitted step — no extra host round-trip.
        self.ema_decay = ema_decay
        self.ema_params = (
            jax.tree.map(jnp.copy, self.params) if ema_decay else None
        )

        bsh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)

        def train_step(params, opt_state, ema, batch, rng):
            def lfn(p):
                loss, stats = self.loss_fn(p, batch, rng)
                return loss, stats

            (loss, stats), grads = jax.value_and_grad(lfn, has_aux=True)(params)
            grad_norm = optax.global_norm(grads)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            if self._opt_shardings is not None:
                # pin the ZeRO-1 layout so GSPMD keeps moments dp-sharded
                # across steps instead of silently replicating them
                opt_state = jax.lax.with_sharding_constraint(
                    opt_state, self._opt_shardings
                )
            params = optax.apply_updates(params, updates)
            if self.ema_decay:  # static at trace time
                d = jnp.float32(self.ema_decay)
                ema = jax.tree.map(
                    lambda e, p: (d * e + (1.0 - d) * p).astype(e.dtype),
                    ema,
                    params,
                )
            stats = dict(stats)
            stats["grad_norm"] = grad_norm
            return params, opt_state, ema, loss, stats

        self._train_step = jax.jit(
            train_step,
            donate_argnums=(0, 1, 2),
        )
        self._bsh = bsh
        self._rep = rep

    @property
    def global_step(self) -> int:
        return self.step

    def lr(self) -> float:
        return float(self.schedule(self.step))

    def train_batch(self, batch: dict, rng: jax.Array, sync: bool = True) -> dict:
        """One optimizer step.  ``sync=True`` fetches scalar stats to host
        floats immediately (per-step host sync, the reference's behavior);
        ``sync=False`` returns the device scalars so the caller can overlap
        the fetch with the next step's dispatch (see ``Engines.step``)."""
        dst = self._bsh if self.mesh.size > 1 else self.mesh.devices.flat[0]
        arrays = {
            k: jax.device_put(v, dst)
            for k, v in batch.items()
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1
        }
        with self.mesh:
            (
                self.params, self.opt_state, self.ema_params, loss, stats,
            ) = self._train_step(
                self.params, self.opt_state, self.ema_params, arrays, rng
            )
        self.step += 1
        out = {f"{self.name}.loss": loss, "lr": self.lr()}
        out.update(stats)
        if sync:
            out = _to_floats(out)
        return out

    def diagnose(self, batch: dict, rng: jax.Array, diagnostic):
        """Feed one batch's gradients + current params into a Diagnostic
        (the hook-based collection the reference does in
        ``utils/diagnostic.py:81-111``, reconstructed from the grad pytree)."""
        if not hasattr(self, "_grad_fn"):
            self._grad_fn = jax.jit(
                lambda p, b, r: jax.grad(
                    lambda pp: self.loss_fn(pp, b, r)[0]
                )(p)
            )
        arrays = {
            k: v for k, v in batch.items()
            if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1
        }
        grads = self._grad_fn(self.params, arrays, rng)
        diagnostic.observe_grads(grads)
        diagnostic.observe_params(self.params)
        return diagnostic

    # ---------------- checkpointing (≡ ``engines.py:95-107``) ----------------

    def _ckpt_dir(self) -> Path:
        return self.ckpt_root / self.name

    def save_checkpoint(self, keep: int = 3):
        import shutil

        import orbax.checkpoint as ocp

        path = (self._ckpt_dir() / f"step_{self.step:08d}").absolute()
        state = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
        }
        if self.ema_params is not None:
            state["ema_params"] = self.ema_params
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path, state, force=True)
        _logger.info(f"Saved checkpoint {path}")
        # retention: keep the newest ``keep`` complete step dirs (in-flight
        # ``*.orbax-checkpoint-tmp`` dirs are not checkpoints)
        steps = sorted(
            p for p in self._ckpt_dir().iterdir()
            if p.name.startswith("step_")
            and not p.name.endswith(".orbax-checkpoint-tmp")
        )
        for old in steps[:-keep]:
            shutil.rmtree(old, ignore_errors=True)

    def load_checkpoint(self, step: int | None = None) -> bool:
        """Auto-resume from the latest *complete* checkpoint if present
        (non-strict: a missing dir is fine, ≡ the reference's tolerant
        resume).  ``step`` pins an exact checkpoint instead of the latest
        (post-hoc export at a chosen eval tick, e.g. a val-loss minimum);
        a missing pinned step is an error, not a silent fresh start.

        A crash or SIGKILL mid-save leaves an ``*.orbax-checkpoint-tmp``
        directory; orbax refuses to restore it, and treating it as the
        latest step would crash-loop the relaunch wrapper forever (found by
        ``scripts/soak.sh`` on-chip).  Stale tmp dirs are removed here —
        the engine is the checkpoint dir's only writer, and at load time no
        save of ours is in flight."""
        import shutil

        import orbax.checkpoint as ocp

        d = self._ckpt_dir()
        if not d.exists():
            return False
        for tmp in d.glob("*.orbax-checkpoint-tmp"):
            _logger.warning(
                f"Removing incomplete checkpoint {tmp} (killed mid-save)"
            )
            shutil.rmtree(tmp, ignore_errors=True)
        steps = sorted(p for p in d.iterdir() if p.name.startswith("step_"))
        if not steps:
            if step is not None:
                raise FileNotFoundError(
                    f"restore_step={step}: no checkpoints under {d}"
                )
            return False
        if step is not None:
            want = d / f"step_{step:08d}"
            if want not in steps:
                have = ", ".join(p.name for p in steps)
                raise FileNotFoundError(
                    f"restore_step={step}: {want.name} not found "
                    f"(have: {have})"
                )
            path = want.absolute()
        else:
            path = steps[-1].absolute()
        target = {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
        }
        if self.ema_params is not None:
            target["ema_params"] = self.ema_params
        with ocp.StandardCheckpointer() as ckptr:
            try:
                restored = ckptr.restore(path, target)
            except Exception:
                # ema presence mismatch between engine and checkpoint
                # (ema_decay toggled between runs): retry the other shape.
                if self.ema_params is not None:
                    # checkpoint predates ema: restore without, then seed
                    # the average from the restored params
                    del target["ema_params"]
                    restored = ckptr.restore(path, target)
                    restored["ema_params"] = jax.tree.map(
                        jnp.copy, restored["params"]
                    )
                    _logger.warning(
                        "Checkpoint has no ema_params; seeding EMA from params"
                    )
                else:
                    # checkpoint carries ema the engine doesn't track:
                    # restore it into a params-shaped slot and discard
                    target["ema_params"] = self.params
                    restored = ckptr.restore(path, target)
                    restored.pop("ema_params")
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.ema_params = restored.get("ema_params", self.ema_params)
        self.step = int(restored["step"])
        _logger.info(f"Restored checkpoint {path} (step {self.step})")
        return True


def _to_floats(stats: dict) -> dict:
    return {
        k: float(v) if hasattr(v, "item") or jnp.isscalar(v) else v
        for k, v in stats.items()
    }


class Engines(dict):
    """Multi-engine step + combined stats (≡ ``engines.py:68-185``)."""

    def setup(self, cfg):
        self.cfg = cfg
        self._rng = jax.random.PRNGKey(getattr(cfg, "seed", 0))
        self._pending = None  # lagged device stats when cfg.async_stats

    @property
    def global_step(self) -> int:
        return max(e.global_step for e in self.values())

    def save_checkpoint(self):
        keep = int(getattr(self.cfg, "ckpt_keep", 3) or 3)
        for e in self.values():
            e.save_checkpoint(keep=keep)

    def load_checkpoint(self):
        step = getattr(self.cfg, "restore_step", None)
        for e in self.values():
            e.load_checkpoint(step=step)

    def step(self, batch: dict) -> dict:
        """One step across all engines with wall-clock timing
        (≡ ``engines.py:121-166``; the feeder is baked into each engine's
        jitted loss, the idiomatic JAX equivalent).

        With ``cfg.async_stats`` on, the per-step device sync is skipped:
        stats come back lagged by one step (step N's line is emitted while
        step N+1 runs), so dispatch never serializes against the device and
        ``elapsed_time`` measures dispatch-to-dispatch.  Default off —
        exact per-step timing, the reference's ``cuda.synchronize``
        semantics (``engines.py:127-128,149-151``).
        """
        async_stats = getattr(self.cfg, "async_stats", False)
        t0 = time.time()
        stats: dict = {}
        for name, engine in self.items():
            self._rng, sub = jax.random.split(self._rng)
            engine_stats = self._oom_guard(
                lambda: engine.train_batch(batch, sub, sync=False)
            )
            stats |= engine_stats
            stats[f"{name}.engine_step"] = engine.global_step
        stats["global_step"] = self.global_step

        if async_stats:
            pending, self._pending = self._pending, (stats, time.time())
            if pending is None:
                return {"global_step": self.global_step, "wall_time": time.time()}
            # device work long since finished — but an async OOM from the
            # *previous* step surfaces exactly here, so it rides the same
            # save-on-oom guard as dispatch (ADVICE r2)
            out = self._oom_guard(lambda: _to_floats(pending[0]))
            out["elapsed_time"] = time.time() - t0
            out["wall_time"] = pending[1]
            return out

        self._oom_guard(
            lambda: jax.block_until_ready(next(iter(self.values())).params)
        )
        out = self._oom_guard(lambda: _to_floats(stats))
        out["elapsed_time"] = time.time() - t0
        out["wall_time"] = time.time()
        return out

    def _oom_guard(self, fn):
        """OOM → checkpoint everything → re-raise (≡ ``engines.py:167-178``).

        Wraps every point where device errors can materialize — dispatch,
        the sync-path block, and the async-path lagged fetch — so the
        save-on-oom guarantee holds in both stats modes."""
        try:
            return fn()
        except jax.errors.JaxRuntimeError as e:
            if "RESOURCE_EXHAUSTED" in str(e) and getattr(
                self.cfg, "save_on_oom", True
            ):
                try:
                    self.save_checkpoint()
                except Exception:  # noqa: BLE001 — keep the original error
                    _logger.exception("save-on-oom checkpoint failed")
            raise

    def flush_stats(self) -> dict | None:
        """Drain the lagged stats slot after the final step.

        With ``cfg.async_stats`` on, each ``step`` returns the *previous*
        step's stats — without a flush the last step's loss would never be
        logged (it matters most on short runs and early quits)."""
        pending, self._pending = self._pending, None
        if pending is None:
            return None
        out = self._oom_guard(lambda: _to_floats(pending[0]))
        out["wall_time"] = pending[1]
        return out
