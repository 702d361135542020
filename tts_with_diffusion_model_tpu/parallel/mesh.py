"""Device mesh + sharding rules (SURVEY §2.2 TPU-native plan).

The reference's only parallelism is DeepSpeed data parallelism with NCCL
all-reduce (``utils/engines.py:144-147``); the rebuild scales through a
2-axis ``jax.sharding.Mesh``:

  - ``dp``: data parallelism — batches shard over it, gradient psum is
    inserted by XLA under jit (the NCCL all-reduce equivalent, riding ICI);
  - ``tp``: tensor parallelism — attention heads / MLP hidden / vocab
    dimensions shard over it via flax logical partitioning annotations
    (``models/base.py`` tags kernels with "heads"/"mlp"/"vocab").

Single chip degenerates to a 1×1 mesh — the same code path everywhere, the
mesh-of-one analogue of the reference's ``fix_unset_envs``
(``utils/distributed.py:13-29``).
"""

from __future__ import annotations

import jax
import numpy as np
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# logical axis → physical mesh axis
LOGICAL_RULES = (
    ("batch", "dp"),
    ("embed", None),
    ("heads", "tp"),
    ("mlp", "tp"),
    ("vocab", "tp"),
)


def build_mesh(dp: int = -1, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, (
        f"mesh dp={dp} x tp={tp} needs {dp * tp} devices but only {n} are "
        f"available ({[getattr(d, 'platform', '?') for d in devices[:4]]}...)"
    )
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def param_shardings(mesh: Mesh, params):
    """Resolve flax logical annotations into NamedShardings for a param tree.

    Dimensions that don't divide evenly by their mesh axis (e.g. the 1025-way
    vocab with a stop token over tp=2) fall back to replication — correctness
    over partitioning for ragged dims.
    """
    specs = nn.get_partition_spec(params)
    shardings = nn.logical_to_mesh_sharding(specs, mesh, LOGICAL_RULES)
    shapes = jax.tree.map(lambda x: x.shape, nn.meta.unbox(params))

    def fix(shape, sharding: NamedSharding) -> NamedSharding:
        spec = list(sharding.spec)
        spec += [None] * (len(shape) - len(spec))
        changed = False
        for i, axis in enumerate(spec):
            if axis is None:
                continue
            names = axis if isinstance(axis, tuple) else (axis,)
            size = int(np.prod([mesh.shape[n] for n in names]))
            if shape[i] % size != 0:
                spec[i] = None
                changed = True
        if changed:
            return NamedSharding(mesh, P(*spec))
        return sharding

    return jax.tree.map(
        fix, shapes, shardings,
        is_leaf=lambda x: isinstance(x, tuple) and all(isinstance(i, int) for i in x),
    )


def zero1_shardings(mesh: Mesh, opt_state):
    """ZeRO-1-style shardings for an optax state tree: every array leaf
    gains a ``dp`` sharding on its first evenly-divisible *unsharded*
    dimension, while axes already sharded (the tp layout Adam moments
    inherit from the params they mirror) are kept — on a dp×tp mesh the
    moments end up sharded over both axes, never worse than either alone.
    Scalars and ragged leaves replicate over dp.

    The reference explicitly disables DeepSpeed ZeRO
    (``vall_e/train.py:23``); here optimizer-state sharding is a mesh
    annotation — XLA GSPMD turns the gradient all-reduce into
    reduce-scatter + sharded Adam math + an update all-gather, riding ICI.
    Memory: Adam moments drop from 8 bytes/param to 8/dp (8/(dp·tp) where
    tp already applied).
    """
    dp = mesh.shape.get("dp", 1)

    def leaf(x) -> NamedSharding:
        shape = getattr(x, "shape", ())
        cur = getattr(x, "sharding", None)
        spec = list(cur.spec) if isinstance(cur, NamedSharding) else []
        spec += [None] * (len(shape) - len(spec))
        if dp > 1:
            for i, d in enumerate(shape):
                if spec[i] is None and d % dp == 0 and d > 0:
                    spec[i] = "dp"
                    break
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(leaf, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate over tp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device-put numpy batch arrays with batch-axis sharding.

    Raises a clear error (instead of an opaque XLA one) when the batch size
    does not divide the ``dp`` axis.
    """
    dp = mesh.shape.get("dp", 1)
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            if v.shape[0] % dp != 0:
                raise ValueError(
                    f"batch axis of '{k}' has size {v.shape[0]}, which is not "
                    f"divisible by the dp mesh axis ({dp}); pick a batch_size "
                    f"that is a multiple of dp"
                )
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out
