"""Pallas fused attention vs the lax reference path (interpreter on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from dfc_sa_unet_tpu.ops.attention import pooled_self_attention
from dfc_sa_unet_tpu.ops.pallas_attention import fused_pooled_attention


@pytest.mark.parametrize("p,cq,c", [(8, 8, 64), (4, 16, 128), (16, 8, 64)])
def test_fused_matches_lax(p, cq, c):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, p, p, cq)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, p, p, cq)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, p, p, c)), jnp.float32)
    got = np.asarray(fused_pooled_attention(q, k, v))
    want = np.asarray(pooled_self_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_model_with_pallas_flag_matches():
    """UNetDFCSARes(use_pallas=True) must equal the lax path."""
    import jax
    from dfc_sa_unet_tpu.models.factory import create_model

    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4}}
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 32, 32, 3)), jnp.float32)
    m_lax = create_model(cfg)
    variables = m_lax.init(jax.random.key(0), x, train=False)
    m_pl = create_model(cfg, use_pallas=True)
    y_lax = m_lax.apply(variables, x, train=False)
    y_pl = m_pl.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_lax), atol=1e-4, rtol=1e-3)


def test_full_res_model_with_pallas_flag_matches():
    """UNet_FullResAttention(use_pallas=True): the fused kernel now also
    serves the full-resolution ablation when N=H*W <= 4096 fits VMEM
    (reference models/unet_dfc_sa_ablation_attention.py:15-26) — the
    N*N-stays-in-VMEM property matters most on this model."""
    import jax
    from dfc_sa_unet_tpu.models.factory import create_model

    cfg = {"model": {"name": "UNet_FullResAttention",
                     "features": [8, 16, 24, 32], "pool_size": 4}}
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 32, 32, 3)), jnp.float32)
    m_lax = create_model(cfg)
    variables = m_lax.init(jax.random.key(0), x, train=False)
    m_pl = create_model(cfg, use_pallas=True)
    y_lax = m_lax.apply(variables, x, train=False)
    y_pl = m_pl.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_lax), atol=1e-4, rtol=1e-3)


def test_fused_full_res_core_matches_lax_at_n4096_shape():
    """Non-square token grid + the largest supported N-path shape family
    (full-res level-1 style): fused == lax through the same wrapper."""
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((1, 16, 8, 4)), jnp.float32)  # N=128
    k = jnp.asarray(rng.standard_normal((1, 16, 8, 4)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 16, 8, 32)), jnp.float32)
    got = np.asarray(fused_pooled_attention(q, k, v))
    want = np.asarray(pooled_self_attention(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_attention_is_differentiable():
    """The Pallas kernel carries a custom VJP (lax-math backward), so
    use_pallas=True models are trainable."""
    import jax

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 4, 4, 16)), jnp.float32)

    def loss_fused(q, k, v):
        return fused_pooled_attention(q, k, v).sum()

    def loss_lax(q, k, v):
        return pooled_self_attention(q, k, v).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_lax = jax.grad(loss_lax, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fused, g_lax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


# ---- fused transformer MHA (ViT-seg packed qkv / TransUNet separate qkv) ----


def test_fused_mha_packed_matches_reference():
    from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha, _mha_reference

    rng = np.random.default_rng(2)
    qkv = jnp.asarray(rng.standard_normal((2, 49, 3 * 96)), jnp.float32)
    got = np.asarray(fused_mha(qkv, 6))
    want = np.asarray(_mha_reference(qkv, 6))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mha_sep_matches_reference():
    from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha_sep, _mha_sep_reference

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((2, 49, 96)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 49, 96)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 49, 96)), jnp.float32)
    got = np.asarray(fused_mha_sep(q, k, v, 6))
    want = np.asarray(_mha_sep_reference(q, k, v, 6))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_fused_mha_grads_match_reference():
    import jax
    from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha, _mha_reference

    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.standard_normal((1, 16, 3 * 32)), jnp.float32)
    g_fused = jax.grad(lambda t: fused_mha(t, 4).sum())(qkv)
    g_ref = jax.grad(lambda t: _mha_reference(t, 4).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref), atol=1e-5, rtol=1e-4)


def test_vit_seg_use_pallas_matches_lax():
    """VisionTransformerForSegmentation(use_pallas=True) == lax path in eval."""
    import jax
    from dfc_sa_unet_tpu.models.vit_seg import VisionTransformerForSegmentation

    kw = dict(img_dim=32, patch_dim=16, in_channels=3, num_classes=1,
              embed_dim=96, num_layers=2, num_heads=6, mlp_dim=128,
              dropout=0.1, upsample_layers=4)
    x = jnp.asarray(np.random.default_rng(6).standard_normal((2, 32, 32, 3)), jnp.float32)
    m_lax = VisionTransformerForSegmentation(**kw)
    variables = m_lax.init(jax.random.key(0), x, train=False)
    m_pl = VisionTransformerForSegmentation(**kw, use_pallas=True)
    y_lax = m_lax.apply(variables, x, train=False)
    y_pl = m_pl.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_lax), atol=1e-4, rtol=1e-3)


def test_transunet_attention_use_pallas_matches_lax():
    """TransUNet _Attention(use_pallas=True) == lax path in eval (module-level
    — the full R50 backbone is identical either way and slow on CPU)."""
    import jax
    from dfc_sa_unet_tpu.models.transunet import _Attention

    x = jnp.asarray(np.random.default_rng(7).standard_normal((2, 49, 96)), jnp.float32)
    m_lax = _Attention(num_heads=6, attn_dropout=0.1)
    variables = m_lax.init(jax.random.key(0), x, train=False)
    m_pl = _Attention(num_heads=6, attn_dropout=0.1, use_pallas=True)
    y_lax = m_lax.apply(variables, x, train=False)
    y_pl = m_pl.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_lax), atol=2e-5, rtol=1e-4)


def test_fused_mha_bf16_close_to_f32_reference():
    """bf16 serving mode: the fused kernel's f32-scores softmax keeps bf16
    outputs within bf16 resolution of the f32 reference."""
    from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha, _mha_reference

    rng = np.random.default_rng(8)
    qkv_f32 = jnp.asarray(rng.standard_normal((2, 49, 3 * 96)), jnp.float32)
    got = np.asarray(fused_mha(qkv_f32.astype(jnp.bfloat16), 6), np.float32)
    want = np.asarray(_mha_reference(qkv_f32, 6))
    np.testing.assert_allclose(got, want, atol=0.04, rtol=0.05)


@pytest.mark.slow
def test_transunet_fused_mha_training_dynamics_match_lax():
    """`train.py --use_pallas` trains TransUNet through the fused kernel
    (its attention dropout is 0.0): several SGD steps from identical init
    and batches must track the lax path — the custom VJP backward IS the
    lax math, so any drift is forward-value float noise only."""
    import jax

    from dfc_sa_unet_tpu.losses import compute_loss
    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.train import optim

    cfg = {"model": {"name": "TransUNet", "in_channels": 3, "out_channels": 1},
           "dataset": {"img_size": [64, 64]}}
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    t = jnp.asarray((rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32))

    def train(use_pallas, steps=3):
        model = create_model(cfg, use_pallas=use_pallas)
        variables = model.init(jax.random.key(0), x[:1], train=False)
        params, stats = variables["params"], variables["batch_stats"]
        tx = optim.sgd_with_clip(0.05, 0.9, 1e-4, clip_norm=1.0)
        opt = tx.init(params)

        @jax.jit
        def step(params, stats, opt):
            def loss_fn(p, s):
                out, mut = model.apply(
                    {"params": p, "batch_stats": s}, x, train=True,
                    mutable=["batch_stats"], rngs={"dropout": jax.random.key(3)},
                )
                probs = jax.nn.sigmoid(out.astype(jnp.float32))
                return compute_loss(probs, t, "bce_dice", {}), mut["batch_stats"]

            (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
            updates, opt2 = tx.update(grads, opt, params)
            return jax.tree.map(lambda a, u: a + u, params, updates), stats2, opt2, loss

        losses = []
        for _ in range(steps):
            params, stats, opt, loss = step(params, stats, opt)
            losses.append(float(loss))
        return params, losses

    p_lax, l_lax = train(False)
    p_pl, l_pl = train(True)
    np.testing.assert_allclose(l_pl, l_lax, atol=1e-5, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_lax), jax.tree.leaves(p_pl)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-3)
