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

Staleness safety — a serialized executable bakes in everything that was
a compile-time constant, so the key must cover all of it:

  * the abstract shapes/dtypes of the example args (per-shape entries),
  * a **source fingerprint**: sha1 over every ``dfc_sa_unet_tpu/**/*.py``
    plus the jax/jaxlib versions — editing model math invalidates every
    entry (previously an edited ``blocks.py`` would silently serve the
    old model's results),
  * a caller-provided ``salt`` for constants the source hash cannot see —
    e.g. weights closed over by an engine-mode apply_fn (the Predictor
    hashes the model config; inference.py adds a folded-weights
    fingerprint via :func:`tree_fingerprint`), or the Trainer's
    loss/optimizer hyperparameters (traced in as constants).

Donation safety — for a step compiled with ``donate_argnums`` the
catch-and-retry fallback is unsound: if the cached executable fails
*after* the inputs were donated, retrying with the same (now deleted)
buffers crashes.  Pass ``donates=True`` and the loaded executable is
instead verified up front with a **dry run on zero-filled dummies**; a
failure discards the cache entry and compiles fresh, before any caller
buffer is ever donated.
"""

import hashlib
import os
import pickle
from typing import Callable

import jax
import jax.numpy as jnp

_SOURCE_FP_CACHE: dict = {}


def source_fingerprint(pkg_root: str | None = None) -> str:
    """sha1 over the package's .py sources + jax/jaxlib versions.

    Any edit to the framework's Python (and hence, conservatively, to any
    math that could be baked into a compiled executable) produces a new
    fingerprint and so a cache miss.  Computed once per process for the
    default root; an explicit ``pkg_root`` bypasses the memo (used by the
    invalidation test to hash a modified copy of the tree).
    """
    if pkg_root is None:
        if "fp" in _SOURCE_FP_CACHE:
            return _SOURCE_FP_CACHE["fp"]
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        memoize = True
    else:
        memoize = False
    import jaxlib

    h = hashlib.sha1()
    h.update(f"jax={jax.__version__};jaxlib={jaxlib.__version__};".encode())
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            h.update(os.path.relpath(path, pkg_root).encode())
            with open(path, "rb") as f:
                h.update(f.read())
    fp = h.hexdigest()[:16]
    if memoize:
        _SOURCE_FP_CACHE["fp"] = fp
    return fp


def tree_fingerprint(tree) -> str:
    """sha1 over a pytree's leaf shapes/dtypes/values (for salting cache
    keys with constants that get baked into an executable, e.g. engine
    weights closed over by the apply_fn)."""
    import numpy as np

    h = hashlib.sha1()
    for leaf in jax.tree.leaves(tree):
        arr = np.asarray(leaf)
        h.update(f"{arr.shape}:{arr.dtype};".encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:16]


def _key(tag: str, salt: str, args) -> str:
    # topology: an executable compiled for one device set/mesh is not the
    # one for another (a single-device entry must never be served to a
    # --data_parallel run of the same shapes, nor vice versa)
    topo = ",".join(f"{d.platform}:{d.id}" for d in jax.devices())
    parts = [tag, salt, source_fingerprint(), topo]
    for a in jax.tree.leaves(args):
        parts.append(f"{getattr(a, 'shape', ())}:{getattr(a, 'dtype', type(a).__name__)}"
                     f":{getattr(a, 'sharding', '')}")
    return hashlib.sha1("|".join(map(str, parts)).encode()).hexdigest()[:20]


def _dry_run(exe, args) -> None:
    """Execute ``exe`` once on zero-filled dummies shaped like ``args``.

    Proves the executable is runnable on the local backend/topology
    before any real (possibly to-be-donated) buffers are handed to it.
    Dummies are placed with each arg's own sharding, so mesh-compiled
    entries (sharded/replicated TrainState) verify rather than failing
    on layout mismatch.  The dummies are themselves donated/consumed —
    that's fine, they are garbage.  Raises on any failure."""
    import numpy as np

    def _dummy(a):
        if not hasattr(a, "shape"):
            return a
        sharding = getattr(a, "sharding", None)
        if sharding is None:
            return jnp.zeros(a.shape, a.dtype)
        if jax.process_count() > 1:
            # device_put cannot target another process's devices; build
            # the global dummy from per-device zero callbacks instead
            def _zeros(idx):
                shape = tuple(
                    (sl.stop if sl.stop is not None else d)
                    - (sl.start or 0)
                    for sl, d in zip(idx, a.shape))
                return np.zeros(shape, a.dtype)

            return jax.make_array_from_callback(a.shape, sharding, _zeros)
        return jax.device_put(jnp.zeros(a.shape, a.dtype), sharding)

    dummies = jax.tree.map(_dummy, args)
    jax.block_until_ready(exe(*dummies))


def cached_compile(jitted: Callable, cache_dir: str, tag: str, *args,
                   salt: str = "", donates: bool = False) -> Callable:
    """Return a callable equivalent to ``jitted`` for arguments shaped
    like ``args``, backed by an on-disk compiled executable when possible.

    ``salt`` extends the cache key (see module docstring).  ``donates``
    marks a function compiled with donate_argnums: the cached executable
    is then dry-run-verified before first use instead of relying on the
    catch-and-retry fallback (which would replay donated buffers)."""
    from jax.experimental import serialize_executable as se

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"exe_{_key(tag, salt, args)}.bin")
    exe = None
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree = pickle.load(f)
            exe = se.deserialize_and_load(payload, in_tree, out_tree)
            if donates:
                _dry_run(exe, args)
        except Exception as e:  # noqa: BLE001 — stale/foreign entry
            print(f"exe_cache: cached executable unusable here "
                  f"({type(e).__name__}); recompiling")
            exe = None
    if exe is None:
        exe = jitted.lower(*args).compile()
        try:
            payload, in_tree, out_tree = se.serialize(exe)
            # unique per writer: in multihost runs every process computes
            # the same key and may share the cache dir via a network fs
            tmp = f"{path}.tmp.{jax.process_index()}.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception as e:  # noqa: BLE001 — cache write is best-effort
            print(f"exe_cache: serialize failed ({type(e).__name__}); continuing uncached")
    expected = tuple(
        (a.shape, str(a.dtype))
        for a in jax.tree.leaves(args) if hasattr(a, "shape")
    )

    def _shapes(a):
        return tuple((x.shape, str(x.dtype)) for x in jax.tree.leaves(a) if hasattr(x, "shape"))

    state = {"exe": exe}

    def call(*a):
        if state["exe"] is not None and _shapes(a) == expected:
            if donates:
                # fresh compile or dry-run-verified: safe to call directly
                # (no catch-retry — the inputs may be donated mid-failure)
                return state["exe"](*a)
            try:
                return state["exe"](*a)
            except Exception as e:  # noqa: BLE001 — foreign executable
                print(f"exe_cache: cached executable unusable here "
                      f"({type(e).__name__}); falling back to jit")
                state["exe"] = None
        # different shapes (e.g. a partial final batch) or disabled cache
        return jitted(*a)

    return call
