"""fused_dfc_tail kernel (interpret mode) vs a pure-jnp reference."""

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.ops.pallas_dfc_tail import _pick_rows, fused_dfc_tail, tail_supported


def _reference_tail(y3, a, x, bc, wg, bg, wf, bf, wr):
    c = y3.shape[-1]
    local = jnp.maximum(y3.astype(jnp.float32) + bc, 0.0)
    g = jax.nn.sigmoid(
        jnp.einsum("bhwc,cf->bhwf", local, wg[:c].astype(jnp.float32))
        + jnp.einsum("bhwc,cf->bhwf", a.astype(jnp.float32), wg[c:].astype(jnp.float32))
        + bg
    )
    fused = g * local + (1.0 - g) * a.astype(jnp.float32)
    o = (
        jnp.einsum("bhwc,cf->bhwf", fused, wf[:c].astype(jnp.float32))
        + jnp.einsum("bhwc,cf->bhwf", local, wf[c : 2 * c].astype(jnp.float32))
        + jnp.einsum("bhwc,cf->bhwf", a.astype(jnp.float32), wf[2 * c :].astype(jnp.float32))
        + bf
    )
    o = jnp.maximum(o, 0.0)
    return o + jnp.einsum("bhwc,cf->bhwf", x.astype(jnp.float32), wr.astype(jnp.float32))


def _case(b, h, w, c, cin, seed=0):
    rng = np.random.default_rng(seed)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))  # noqa: E731
    return (f32(b, h, w, c), f32(b, h, w, c), f32(b, h, w, cin), f32(c),
            f32(2 * c, c) * 0.1, f32(c), f32(3 * c, c) * 0.1, f32(c), f32(cin, c) * 0.1)


def test_tail_kernel_matches_reference():
    args = _case(2, 8, 16, 8, 4)
    got = fused_dfc_tail(*args, interpret=True)
    want = _reference_tail(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_tail_kernel_multiple_tiles():
    # t = 4*16*16 = 1024 with tile 512/1024 -> exercises the grid
    args = _case(4, 16, 16, 8, 8, seed=1)
    got = fused_dfc_tail(*args, interpret=True)
    want = _reference_tail(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_pick_rows_and_supported():
    # the 224-track level shapes at batch 128 all split cleanly into
    # (1, rows, W, C) tiles whose [rows*W, C] collapse is sublane-aligned
    for h, c, cin in [(224, 64, 3), (112, 128, 64), (56, 256, 128),
                      (224, 64, 128), (112, 128, 256), (56, 256, 512)]:
        rh = _pick_rows(h, h, c, cin)
        assert rh >= 1 and h % rh == 0 and (rh * h) % 8 == 0, (h, c, cin, rh)
        assert tail_supported(128, h, h, c, cin)
    # bottleneck C=1024 is excluded (weights would not stay VMEM-resident)
    assert not tail_supported(128, 14, 14, 1024, 512)
