"""DFCEngine (folded + fused inference path) vs model.apply."""

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.engine import DFCEngine, fold_conv_bn
from dfc_sa_unet_tpu.models.factory import create_model

CFG = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}


def _trained_like_variables(model, x, seed=0):
    """Init then randomize batch_stats so BN folding is actually exercised."""
    variables = model.init(jax.random.key(seed), x, train=False)
    rng = np.random.default_rng(seed)

    def jitter(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = np.asarray(leaf)
        if name == "mean":
            return jnp.asarray(arr + rng.normal(0, 0.3, arr.shape).astype(np.float32))
        if name == "var":
            return jnp.asarray(arr * rng.uniform(0.5, 2.0, arr.shape).astype(np.float32))
        return leaf

    stats = jax.tree_util.tree_map_with_path(jitter, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


def test_fold_conv_bn_formula():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(6), jnp.float32)
    bn_p = {"scale": jnp.asarray(rng.uniform(0.5, 2, 6), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(6), jnp.float32)}
    bn_s = {"mean": jnp.asarray(rng.standard_normal(6), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.5, 2, 6), jnp.float32)}
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)

    def conv(x, k, b):
        y = jax.lax.conv_general_dilated(x, k, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b

    want = (conv(x, k, b) - bn_s["mean"]) / jnp.sqrt(bn_s["var"] + 1e-5)
    want = want * bn_p["scale"] + bn_p["bias"]
    kf, bf = fold_conv_bn(k, b, bn_p, bn_s)
    got = conv(x, kf, bf)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_engine_matches_model_apply():
    model = create_model(CFG)
    # 28 divides by the kernel's 14-row blocks; pool_size 4 divides 28
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 28, 28, 3)), jnp.float32)
    variables = _trained_like_variables(model, x)
    want = np.asarray(model.apply(variables, x, train=False))
    engine = DFCEngine(CFG, variables, dtype=jnp.float32)
    got = np.asarray(engine(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_engine_odd_size_fallback():
    """Non-14-divisible sizes use the lax tail and adaptive pool matmul."""
    model = create_model(CFG)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 48, 40, 3)), jnp.float32)
    variables = _trained_like_variables(model, x, seed=2)
    want = np.asarray(model.apply(variables, x, train=False))
    engine = DFCEngine(CFG, variables, dtype=jnp.float32)
    got = np.asarray(engine(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_engine_pallas_conv_levels_matches_model_apply():
    """The all-Pallas block path (3x3 conv + DFC tail in one kernel,
    ops/pallas_conv.dfc_tail_from_x) must be numerically equivalent."""
    model = create_model(CFG)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 28, 28, 3)), jnp.float32)
    variables = _trained_like_variables(model, x, seed=3)
    want = np.asarray(model.apply(variables, x, train=False))
    engine = DFCEngine(CFG, variables, dtype=jnp.float32,
                       pallas_conv_levels="auto")
    got = np.asarray(engine(x))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
