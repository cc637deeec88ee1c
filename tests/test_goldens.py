"""Golden regression: committed torch-reference outputs, no torch or
mounted reference needed at test time.

tests/goldens/*.npz hold converted weights + input + the PyTorch
reference's output, captured while the reference was mounted.  This
pins the numerics forever, independent of the environment.
"""

import os

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _unflatten(flat):
    params, stats = {}, {}
    for key, val in flat.items():
        if key.startswith("__"):
            continue
        coll, path = key.split("::", 1)
        node = params if coll == "params" else stats
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return {"params": params, "batch_stats": stats}


def test_dfc_sa_res_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "dfc_sa_res_small.npz"))
    flat = {k: g[k] for k in g.files}
    variables = _unflatten(flat)
    x = jnp.asarray(np.transpose(flat["__input__"], (0, 2, 3, 1)))
    want = flat["__output__"]

    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}
    mdl = create_model(cfg)
    got = mdl.apply(variables, x, train=False)
    got_nchw = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got_nchw, want, atol=5e-4, rtol=1e-3)


def test_concat_fusion_golden():
    g = np.load(os.path.join(GOLDEN_DIR, "concat_fusion_small.npz"))
    flat = {k: g[k] for k in g.files}
    variables = _unflatten(flat)
    x = jnp.asarray(np.transpose(flat["__input__"], (0, 2, 3, 1)))
    cfg = {"model": {"name": "UNet_ConcatFusion", "features": [8, 16, 24, 32], "pool_size": 4}}
    got = create_model(cfg).apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), flat["__output__"], atol=5e-4, rtol=1e-3
    )
