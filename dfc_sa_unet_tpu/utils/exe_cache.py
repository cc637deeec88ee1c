"""Compiled-executable cache: skip the tunnel's first-compile cost.

The axon-tunneled backend has no persistent XLA compilation cache and a
fresh process pays 380-930 s to compile the flagship forward (PERF.md).
`jax.experimental.serialize_executable` round-trips the *compiled*
executable through a file: measured on the real chip, deserialize+load
is 0.3 s and the first call ~110 s (device program + weight upload) —
a 3-8x warm start.  Results are bit-identical to the in-process compile
(verified: same scalar to all printed digits, scripts/compile_cache_probe.py).

Usage:

    fn = cached_compile(jitted_fn, cache_dir, tag, *example_args)
    out = fn(*args)

Cache entries are keyed by ``tag`` plus the abstract shapes/dtypes of the
example args, so a stale file for different shapes is never reused.  The
returned callable degrades gracefully: if the cached executable fails to
load OR to execute (foreign device/topology — e.g. the multi-device CPU
test backend, where deserialized executables mis-handle device
assignment), it falls back to the plain jitted function permanently.
"""

import hashlib
import os
import pickle
from typing import Callable

import jax


def _key(tag: str, args) -> str:
    parts = [tag]
    for a in jax.tree.leaves(args):
        parts.append(f"{getattr(a, 'shape', ())}:{getattr(a, 'dtype', type(a).__name__)}")
    return hashlib.sha1("|".join(map(str, parts)).encode()).hexdigest()[:20]


def cached_compile(jitted: Callable, cache_dir: str, tag: str, *args) -> Callable:
    """Return a callable equivalent to ``jitted`` for arguments shaped
    like ``args``, backed by an on-disk compiled executable when possible."""
    from jax.experimental import serialize_executable as se

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"exe_{_key(tag, args)}.bin")
    exe = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = se.deserialize_and_load(payload, in_tree, out_tree)
        except Exception as e:  # noqa: BLE001 — stale/foreign entry
            print(f"exe_cache: reload failed ({type(e).__name__}); recompiling")
    if exe is None:
        exe = jitted.lower(*args).compile()
        try:
            payload, in_tree, out_tree = se.serialize(exe)
            tmp = path + ".tmp"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception as e:  # noqa: BLE001 — cache write is best-effort
            print(f"exe_cache: serialize failed ({type(e).__name__}); continuing uncached")

    state = {"exe": exe}

    def call(*a):
        if state["exe"] is not None:
            try:
                return state["exe"](*a)
            except Exception as e:  # noqa: BLE001 — foreign executable
                print(f"exe_cache: cached executable unusable here "
                      f"({type(e).__name__}); falling back to jit")
                state["exe"] = None
        return jitted(*a)

    return call
