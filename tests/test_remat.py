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
    for mode in ("l12", "all"):
        got = _grads(mode)
        for a, b in zip(jax.tree.leaves(base), jax.tree.leaves(got)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)
