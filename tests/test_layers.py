"""Parity tests: nn layers vs torch layers (semantics, not just shapes)."""

import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.nn import BatchNorm, Dense, GroupNorm, LayerNorm, WSConv


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_batchnorm_matches_torch_train_and_eval():
    x_steps = [_rand((4, 6, 6, 5), seed=s) for s in range(3)]
    tbn = tnn.BatchNorm2d(5)
    tbn.weight.data = torch.from_numpy(_rand((5,), 10))
    tbn.bias.data = torch.from_numpy(_rand((5,), 11))

    mdl = BatchNorm()
    variables = mdl.init(jax.random.key(0), jnp.asarray(x_steps[0]), train=False)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()), "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],
    }

    # three training steps: outputs and running stats must track torch
    tbn.train()
    for x in x_steps:
        want = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        got, mutated = mdl.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
        variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
        np.testing.assert_allclose(
            np.asarray(got), np.transpose(want.detach().numpy(), (0, 2, 3, 1)), atol=1e-5, rtol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]), tbn.running_mean.numpy(), atol=1e-6, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]), tbn.running_var.numpy(), atol=1e-6, rtol=1e-5
    )

    # eval mode uses running stats
    tbn.eval()
    x = _rand((2, 6, 6, 5), seed=99)
    want = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = mdl.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.detach().numpy(), (0, 2, 3, 1)), atol=1e-5, rtol=1e-5
    )


def test_groupnorm_matches_torch():
    x = _rand((2, 7, 7, 64), seed=3)
    tgn = tnn.GroupNorm(32, 64, eps=1e-6)
    tgn.weight.data = torch.from_numpy(_rand((64,), 4))
    tgn.bias.data = torch.from_numpy(_rand((64,), 5))
    mdl = GroupNorm(num_groups=32, eps=1e-6)
    variables = {"params": {"scale": jnp.asarray(tgn.weight.detach().numpy()), "bias": jnp.asarray(tgn.bias.detach().numpy())}}
    got = mdl.apply(variables, jnp.asarray(x))
    want = tgn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.detach().numpy(), (0, 2, 3, 1)), atol=1e-5, rtol=1e-4
    )


def test_layernorm_matches_torch():
    x = _rand((2, 17, 768), seed=6)
    tln = tnn.LayerNorm(768, eps=1e-6)
    tln.weight.data = torch.from_numpy(_rand((768,), 7))
    tln.bias.data = torch.from_numpy(_rand((768,), 8))
    mdl = LayerNorm(eps=1e-6)
    variables = {"params": {"scale": jnp.asarray(tln.weight.detach().numpy()), "bias": jnp.asarray(tln.bias.detach().numpy())}}
    got = mdl.apply(variables, jnp.asarray(x))
    want = tln(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5, rtol=1e-4)


def test_wsconv_matches_reference_stdconv_formula():
    """StdConv2d standardizes the kernel with biased var and eps=1e-5
    before a normal conv (reference models/transformer_unet.py:21-27)."""
    x = _rand((2, 16, 16, 8), seed=9)
    w = _rand((12, 8, 3, 3), seed=10)  # torch OIHW
    tw = torch.from_numpy(w)
    v, m = torch.var_mean(tw, dim=[1, 2, 3], keepdim=True, unbiased=False)
    tw_std = (tw - m) / torch.sqrt(v + 1e-5)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), tw_std, None, 1, 1
    )
    mdl = WSConv(12, 3, padding=1)
    variables = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}}
    got = mdl.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), np.transpose(want.detach().numpy(), (0, 2, 3, 1)), atol=2e-5, rtol=1e-4
    )


def test_dense_matches_torch_linear():
    x = _rand((3, 7, 16), seed=11)
    tl = tnn.Linear(16, 24)
    mdl = Dense(24)
    variables = {
        "params": {
            "kernel": jnp.asarray(tl.weight.detach().numpy().T),
            "bias": jnp.asarray(tl.bias.detach().numpy()),
        }
    }
    got = mdl.apply(variables, jnp.asarray(x))
    want = tl(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(), atol=1e-5, rtol=1e-4)
