"""Small shared utilities (tree maps, dict flattening, device transfer).

Counterpart of ``vall_e/utils/utils.py``.  The reference's
``gather_attribute`` loss-stashing pattern (models set ``self.loss``, trainer
pops it) does not fit JAX's functional paradigm — here model apply functions
*return* ``(output, loss_dict)`` and the feeder passes the dict through, which
is the idiomatic equivalent.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np


def flatten_dict(d: dict, sep: str = ".") -> dict:
    """Flatten nested dicts: {"a": {"b": 1}} -> {"a.b": 1}."""
    out: dict[str, Any] = {}

    def rec(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                rec(f"{prefix}{sep}{k}" if prefix else str(k), v)
        else:
            out[prefix] = obj

    rec("", d)
    return out


def tree_map(fn: Callable, x):
    if isinstance(x, list):
        return [tree_map(fn, xi) for xi in x]
    if isinstance(x, tuple):
        return tuple(tree_map(fn, xi) for xi in x)
    if isinstance(x, dict):
        return {k: tree_map(fn, v) for k, v in x.items()}
    return fn(x)


def to_device(x, device=None):
    """Move numpy/jax leaves of a pytree onto a jax device (host→HBM)."""
    import jax

    if device is None:
        device = jax.devices()[0]

    def move(leaf):
        if isinstance(leaf, (np.ndarray, jax.Array)):
            return jax.device_put(leaf, device)
        return leaf

    return tree_map(move, x)


def to_numpy(x):
    import jax

    def pull(leaf):
        if isinstance(leaf, jax.Array):
            return np.asarray(leaf)
        return leaf

    return tree_map(pull, x)


def hard_exit_if_tunnel(code: int = 0):
    """Work around an axon TPU-tunnel teardown wedge (observed round 5):
    interpreter shutdown can block forever joining the tunnel's runtime
    threads after all work has completed, and a process killed in that
    state can wedge the NEXT process's device attach for minutes.  CLI
    entry points call this as their final statement — after every output
    file is written and stdout is flushed — so multi-stage shell recipes
    (scripts/make_aux_bundles.sh) chain without stalls.  No-op when the
    tunnel is not in use, so normal interpreter shutdown (and with it
    atexit/profiling hooks) is preserved everywhere else."""
    import os
    import sys

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    # only act when this process actually attached the tunnel backend —
    # and never trigger a fresh backend init just to decide
    if "jax" not in sys.modules:
        return
    try:
        from jax._src import xla_bridge

        backends = getattr(xla_bridge, "_backends", {})
        if not any(p == "axon" for p in backends):
            return
    except Exception:
        return
    sys.stdout.flush()
    sys.stderr.flush()
    # Best-effort graceful detach first: an abrupt exit can leave the
    # tunnel server holding the device session, wedging the NEXT process's
    # attach (observed: a train launched 11 s after a hard-exited qnt hung
    # forever; the same transition with a ~60 s gap worked).  Run the
    # detach in a daemon thread with a deadline so a wedged detach cannot
    # re-introduce the shutdown hang this function exists to dodge.
    import threading

    def _detach():
        try:
            import jax

            jax.clear_backends()
        except Exception:
            pass

    t = threading.Thread(target=_detach, daemon=True)
    t.start()
    t.join(timeout=15)
    os._exit(code)
