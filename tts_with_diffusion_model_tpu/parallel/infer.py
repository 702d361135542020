"""Mesh-sharded (SPMD) inference for the diffusion first stage.

The reference has no multi-device inference at all — the CLI pins a single
GPU (``/root/reference/vall_e/__main__.py:50``).  Here the D3PM reverse
loop runs SPMD over a ``dp×tp`` :class:`jax.sharding.Mesh`:

  - ``dp``: request rows shard over it — a serving cohort splits across
    chips, each chip running the full denoiser on its rows (embarrassingly
    parallel; no cross-chip traffic inside the scan);
  - ``tp``: attention heads / MLP hidden / vocab shard over it (the same
    logical annotations the trainer uses, ``models/dit.py``), so a model
    too large for one chip's HBM — or a latency target one chip can't
    reach — spreads each matmul over the axis with XLA-inserted
    collectives riding ICI.

Outputs are **dp-invariant**: every sampler draw comes from the row's own
PRNG key (``utils/rng.py``), so a request's tokens do not depend on how
rows were split across chips.  Under ``tp > 1`` the split matmul
reductions may reassociate floating-point sums; tokens stay identical in
practice (asserted on the 8-virtual-device CPU mesh,
``tests/test_parallel_infer.py``) because sampling decisions have finite
logit margins.
"""

from __future__ import annotations

import jax

from ..utils.rng import as_row_keys
from .mesh import batch_sharding, param_shardings, replicated


def shard_params(mesh, params):
    """Place a param tree on the mesh per its logical annotations.

    Resolves the flax partitioning tags (heads/mlp/vocab → ``tp``) exactly
    as the trainer does and ``device_put``s every leaf; call once at load.
    """
    return jax.device_put(params, param_shardings(mesh, params))


def make_sharded_generate(model, mesh):
    """Build a jitted SPMD ``generate`` for a :class:`DiffusionModel`.

    Returns ``gen(params, text, text_mask, proms, prom_mask, rng, *,
    gen_len=None, stride=1, resp_bucket=None)``.  ``params`` must already
    be placed with :func:`shard_params`.  The batch axis of every input is
    sharded over ``dp`` (batch must divide it); the per-row keys derived
    from ``rng`` shard with their rows; outputs are gathered to a fully
    replicated array.
    """
    bs = batch_sharding(mesh)
    rep = replicated(mesh)
    dp = mesh.shape.get("dp", 1)

    def _gen(params, text, text_mask, proms, prom_mask, row_keys,
             gen_len, stride, resp_bucket):
        return model.generate(
            params, text, text_mask, proms, prom_mask, row_keys,
            gen_len=gen_len, stride=stride, resp_bucket=resp_bucket,
        )

    _gen = jax.jit(_gen, static_argnums=(6, 7, 8), out_shardings=rep)

    def gen(params, text, text_mask, proms, prom_mask, rng, *,
            gen_len=None, stride=1, resp_bucket=None):
        B = text.shape[0]
        if B % dp != 0:
            raise ValueError(
                f"batch {B} does not divide the dp mesh axis ({dp}); pad the "
                f"cohort to a multiple of dp"
            )
        row_keys = as_row_keys(rng, B)
        args = [
            jax.device_put(a, bs)
            for a in (text, text_mask, proms, prom_mask, row_keys)
        ]
        return _gen(params, *args, gen_len, stride, resp_bucket)

    return gen
