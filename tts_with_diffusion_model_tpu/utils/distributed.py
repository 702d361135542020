"""Multi-host process/leader helpers, TPU-native.

Counterpart of ``vall_e/utils/distributed.py``: the reference uses env-var rank
bootstrapping (RANK / LOCAL_RANK / WORLD_SIZE) with a fabricated single-process
world when no launcher is present, plus leader-only decorators.  On TPU the
process model comes from ``jax.distributed`` / the TPU runtime, so rank
identity maps onto ``jax.process_index()`` and the single-process fallback is
simply "jax wasn't initialized for multi-host" — exercised degenerately on
every local run, same as the reference's ``fix_unset_envs``.
"""

from __future__ import annotations

import os
from functools import cache, wraps


@cache
def init_distributed() -> bool:
    """Initialize jax.distributed when launched under a multi-host launcher.

    Analogue of ``deepspeed.comm.init_distributed`` (``train.py:29-31``): when
    coordinator env vars are present, join the cluster; otherwise run as a
    world of one.  Returns True when multi-host initialization happened.

    ``JAX_COORDINATOR_ADDRESS`` (+ optional ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``) are passed explicitly so the same bootstrap works on
    bare multi-process CPU clusters (the test harness) and TPU pods (where
    the runtime fills in the rest).
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if addr:
        import jax

        kwargs = {"coordinator_address": addr}
        if os.environ.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        if os.environ.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
        jax.distributed.initialize(**kwargs)
        return True
    return False


def world_size() -> int:
    try:
        import jax

        return jax.process_count()
    except Exception:
        return 1


def global_rank() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def local_rank() -> int:
    # One jax process per host; "local rank" is process-local and hence 0
    # unless an explicit override is given (e.g. multi-process-per-host runs).
    return int(os.environ.get("LOCAL_RANK", 0))


def is_global_leader() -> bool:
    return global_rank() == 0


def is_local_leader() -> bool:
    return local_rank() == 0


def _leader_only(check, default=None):
    def decorator(fn):
        @wraps(fn)
        def wrapped(*args, **kwargs):
            if check():
                return fn(*args, **kwargs)
            return default

        return wrapped

    return decorator


def global_leader_only(fn=None, *, default=None):
    """Run only on the global leader; other processes get ``default``."""
    if fn is None:
        return _leader_only(is_global_leader, default)
    return _leader_only(is_global_leader, default)(fn)


def local_leader_only(fn=None, *, default=None):
    if fn is None:
        return _leader_only(is_local_leader, default)
    return _leader_only(is_local_leader, default)(fn)


def barrier():
    """Host-level sync, analogue of ``torch.distributed.barrier()``."""
    if world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("tts_tpu_barrier")


def broadcast_object(obj, src: int = 0):
    """Broadcast a small python object from the leader to all processes.

    Analogue of ``broadcast_object_list`` used for the trainer's stdin command
    fan-out (``utils/trainer.py:95``).  ``broadcast_one_to_all`` only moves
    array pytrees, so the object is pickled into a uint8 buffer and sent in
    two phases (length, then payload) — arbitrary small commands/configs
    travel, not just arrays.
    """
    if world_size() <= 1:
        return obj
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    is_src = global_rank() == src
    payload = pickle.dumps(obj) if is_src else b""
    n = int(
        multihost_utils.broadcast_one_to_all(
            np.int64(len(payload)), is_source=is_src
        )
    )
    buf = np.zeros((n,), np.uint8)
    if is_src:
        buf[:] = np.frombuffer(payload, np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf, is_source=is_src)
    return pickle.loads(np.asarray(out).tobytes())


def all_reduce_max_int(value: int) -> int:
    """Max of a small host-side integer across all processes.

    Every process must call this at the same point (it is a collective).
    Used by the length-bucketed loader to agree on a per-batch pad shape:
    each host draws different samples, so the covering bucket must be the
    max of every host's local need or the SPMD train step would receive
    differently-shaped arrays and hang.  World-of-one returns the input.
    """
    if world_size() <= 1:
        return int(value)
    import numpy as np
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.int64(value))
    return int(np.max(np.asarray(gathered)))
