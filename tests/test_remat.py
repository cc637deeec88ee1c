"""Selective rematerialization: 'l12' and 'all' must be numerically
identical to no-remat (remat changes memory, never math)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'

CFG = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}


def _grads(remat):
    cfg = {"model": {**CFG["model"], "remat": remat}}
    model = create_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(jnp.square(out))

    return jax.grad(loss_fn)(variables["params"])


def test_remat_modes_match():
    base = _grads(False)
    for mode in ("l12", "all", "deep"):
        got = _grads(mode)
        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


def _tf_grads(name, remat):
    if name == "VisionTransformerSegmentation":
        cfg = {"model": {"name": name, "img_dim": 32, "patch_dim": 8, "embed_dim": 48,
                         "num_layers": 2, "num_heads": 6, "mlp_dim": 96, "dropout": 0.0,
                         "in_channels": 3, "out_channels": 1},
               "dataset": {"img_size": [32, 32]}}
        size = 32
    else:
        cfg = {"model": {"name": name, "in_channels": 3, "out_channels": 1},
               "dataset": {"img_size": [32, 32]}}
        size = 32
    model = create_model(cfg, remat=remat)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, size, size, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    stats = variables.get("batch_stats", {})

    def loss_fn(params):
        v = {"params": params}
        if stats:
            v["batch_stats"] = stats
        out = model.apply(v, x, train=True, mutable=["batch_stats"] if stats else False,
                          rngs={"dropout": jax.random.key(2)})
        out = out[0] if stats else out
        return jnp.mean(jnp.square(out))

    return jax.grad(loss_fn)(variables["params"])


@pytest.mark.parametrize("name", ["VisionTransformerSegmentation", "TransUNet"])
def test_transformer_remat_matches(name):
    """remat=True on the transformer families (every encoder block /
    ResNet unit / decoder block rematerialized) must be grad-identical to
    remat=False — it changes memory, never math."""
    base = _tf_grads(name, False)
    got = _tf_grads(name, True)
    # TransUNet's recomputed WSConv/GroupNorm reduction chains differ in
    # the last ulps from the stored-activation compilation (recompute is
    # a different XLA program, not different math) — tolerance reflects
    # that, not a semantic deviation.
    for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=2e-2)
