"""Inference engine: a compiled fast path for the DFC-SA U-Net family.

Takes (config, trained variables) and builds a jitted forward that is
numerically equivalent to ``model.apply(..., train=False)`` but optimized
for serving:

  * every Conv+BatchNorm pair is folded into a single conv (eval-mode BN
    is an affine per out-channel: W' = W*a, b' = (b-mean)*a + beta),
  * activations stay in the compute dtype end to end,
  * optionally (``pallas_conv_levels``) whole DFC blocks run as single
    Pallas kernels (ops/pallas_conv) — measured slower than XLA's conv
    emitter on v5e (PERF.md round-2 evidence chain) but kept behind the
    flag with a parity test for future Mosaic releases.

On this chip the default engine ties the plain module path (871 img/s
at B=128 bf16) — XLA already fuses the elementwise epilogues optimally;
the engine's value is the folded weights (fewer passes on paper) and the
single place to A/B serving formulations.

Supported: 'DFC-SA-Res-Block' (UNetDFCSA/UNetDFCSARes).  Other models
fall back to the regular module apply (Predictor handles this).
"""

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.ops.attention import pooled_self_attention
from dfc_sa_unet_tpu.ops.convt import conv_transpose_2x2
from dfc_sa_unet_tpu.ops.pallas_conv import conv_supported, dfc_tail_from_x
from dfc_sa_unet_tpu.ops.pooling import adaptive_avg_pool, max_pool
from dfc_sa_unet_tpu.ops.resize import resize_bilinear


def fold_conv_bn(kernel, bias, bn_params, bn_stats, eps: float = 1e-5):
    """Fold eval-mode BatchNorm into the preceding conv's weights."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    k = kernel * a  # broadcasts over the trailing (out-channel) dim
    b = ((bias if bias is not None else 0.0) - bn_stats["mean"]) * a + bn_params["bias"]
    return k, b


def _pet(x):
    """Conv/einsum output dtype: f32 in parity mode, else the compute dtype
    (the MXU accumulates f32 internally either way; an f32 output would be
    written to HBM at double width and converted in a separate pass)."""
    return jnp.float32 if x.dtype == jnp.float32 else x.dtype


def _conv(x, kernel, bias, padding):
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=_pet(x),
    )
    return (y + bias).astype(x.dtype)


def _avg_pool_reshape(x, p):
    """Exact adaptive pool for the evenly-divisible case: window mean."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    y = xf.reshape(b, p, h // p, w, c).mean(axis=2)
    y = y.reshape(b, p, p, w // p, c).mean(axis=3)
    return y.astype(x.dtype)


class DFCEngine:
    """Compiled inference for UNetDFCSA(Res).  Call with normalized NHWC
    activations (same contract as model.apply)."""

    def __init__(
        self,
        config: Mapping[str, Any],
        variables: Mapping[str, Any],
        dtype=jnp.bfloat16,
        # all-Pallas blocks: the 3x3 conv AND the whole DFC tail run in one
        # Pallas kernel per level (ops/pallas_conv.dfc_tail_from_x), so no
        # pallas_call ever consumes an XLA conv output (the boundary-relayout
        # trap, PERF.md).  Measured 0.6-0.9x XLA per level on v5e -- None
        # (off) is the fast default; set a level set / "auto" to A/B.
        pallas_conv_levels=None,
    ):
        m = config["model"]
        assert m["name"] == "DFC-SA-Res-Block", m["name"]
        self.features = list(m.get("features", [64, 128, 256, 512]))
        self.pool_size = m.get("pool_size", 8)
        self.dtype = dtype
        if pallas_conv_levels == "auto":
            pallas_conv_levels = {"down2", "down3", "down4", "up_conv4", "up_conv3",
                                  "up_conv2", "up_conv1"}
        self.pallas_conv_levels = set(pallas_conv_levels or ())
        self.interpret = jax.default_backend() not in ("tpu", "axon")
        self.blocks = {}
        params = variables["params"]
        stats = variables.get("batch_stats", {})
        block_names = [f"down{i}" for i in range(1, 5)] + ["bottleneck"] + [
            f"up_conv{i}" for i in range(4, 0, -1)
        ]
        for name in block_names:
            self.blocks[name] = self._fold_block(params[name], stats.get(name, {}))
        self.ups = {
            f"up{i}": (
                jnp.asarray(params[f"up{i}"]["kernel_t"], dtype),
                jnp.asarray(params[f"up{i}"]["bias"], jnp.float32),
            )
            for i in range(1, 5)
        }
        self.final = (
            jnp.asarray(params["final_conv"]["kernel"], dtype),
            jnp.asarray(params["final_conv"]["bias"], jnp.float32),
        )
        self._forward = jax.jit(self._build_forward())

    # ------------------------------------------------------------- folding

    def _fold_block(self, p, s):
        d = {}
        kc, bc = fold_conv_bn(p["conv_branch_0"]["kernel"], p["conv_branch_0"]["bias"],
                              p["conv_branch_1"], s["conv_branch_1"])
        ka, ba = fold_conv_bn(p["attn_branch_0"]["kernel"], p["attn_branch_0"]["bias"],
                              p["attn_branch_1"], s["attn_branch_1"])
        kg, bg = fold_conv_bn(p["gate_0"]["kernel"], p["gate_0"]["bias"],
                              p["gate_1"], s["gate_1"])
        kf, bf = fold_conv_bn(p["fusion_conv_0"]["kernel"], p["fusion_conv_0"]["bias"],
                              p["fusion_conv_1"], s["fusion_conv_1"])
        d["conv"] = (jnp.asarray(kc, self.dtype), jnp.asarray(bc, jnp.float32))
        d["attn0"] = (jnp.asarray(ka, self.dtype), jnp.asarray(ba, jnp.float32))
        # gate/fusion kept as 4D 1x1 kernels: lax.conv lowers far better on
        # TPU than einsum/dot for these shapes (PERF.md)
        d["kg"] = (jnp.asarray(kg, self.dtype), jnp.asarray(bg, jnp.float32))
        d["kf"] = (jnp.asarray(kf, self.dtype), jnp.asarray(bf, jnp.float32))
        # flat [K, C] copies for the Pallas tail kernel
        d["bc"] = jnp.asarray(bc, jnp.float32)
        d["wg"] = jnp.asarray(kg[0, 0], self.dtype)
        d["bg"] = jnp.asarray(bg, jnp.float32)
        d["wf"] = jnp.asarray(kf[0, 0], self.dtype)
        d["bf"] = jnp.asarray(bf, jnp.float32)
        res_scale = jnp.asarray(p["res_scale"], jnp.float32)
        if "residual_conv" in p:
            d["kr"] = jnp.asarray(p["residual_conv"]["kernel"] * res_scale, self.dtype)
            d["wr"] = jnp.asarray(p["residual_conv"]["kernel"][0, 0] * res_scale, self.dtype)
        else:
            d["kr"] = None
            d["wr"] = None
            d["res_scale"] = res_scale
        lsa = p["attn_branch_3"]
        d["lsa"] = {
            "q": (jnp.asarray(lsa["query_conv"]["kernel"][0, 0], self.dtype),
                  jnp.asarray(lsa["query_conv"]["bias"], jnp.float32)),
            "k": (jnp.asarray(lsa["key_conv"]["kernel"][0, 0], self.dtype),
                  jnp.asarray(lsa["key_conv"]["bias"], jnp.float32)),
            "v": (jnp.asarray(lsa["value_conv"]["kernel"][0, 0], self.dtype),
                  jnp.asarray(lsa["value_conv"]["bias"], jnp.float32)),
            "gamma": jnp.asarray(lsa["gamma"], jnp.float32),
        }
        return d

    # ------------------------------------------------------------- forward

    def _lsa(self, d, a):
        b, h, w, c = a.shape
        p = self.pool_size
        # NOTE: matmul pooling measured faster in-context than reshape-mean
        # (reshapes split the sublane dim and force relayouts; PERF.md)
        pooled = adaptive_avg_pool(a, (p, p))

        def proj(t, wb):
            wk, bias = wb
            return _conv(t, wk[None, None], bias, padding=0)

        q = proj(pooled, d["q"])
        k = proj(pooled, d["k"])
        v = proj(pooled, d["v"])
        o = pooled_self_attention(q, k, v)
        o = resize_bilinear(o, (h, w), align_corners=False)
        return (d["gamma"] * o.astype(jnp.float32) + a.astype(jnp.float32)).astype(a.dtype)

    def _tail_lax(self, d, local, a, x, name=None, ranges=None):
        """Mirror of the module tail with BN pre-folded; concat + lax.conv
        (the TPU-fast formulation, see PERF.md).  With ``ranges`` (a dict,
        calibration mode) the int8 quantization points c2/c3 are recorded
        via quant.range_tap — serving and calibration share this one
        forward implementation."""
        from dfc_sa_unet_tpu.infer.quant import range_tap

        pct = getattr(self, "calib_percentile", None)
        combined = jnp.concatenate([local, a], axis=-1)
        range_tap(ranges, f"{name}.c2", combined, pct)
        g = _conv(combined, *d["kg"], padding=0)
        g = jax.nn.sigmoid(g.astype(jnp.float32))
        lf, af = local.astype(jnp.float32), a.astype(jnp.float32)
        fused = (g * lf + (1.0 - g) * af).astype(local.dtype)
        cat3 = jnp.concatenate([fused, combined], axis=-1)
        range_tap(ranges, f"{name}.c3", cat3, pct)
        o = _conv(cat3, *d["kf"], padding=0)
        o = jnp.maximum(o.astype(jnp.float32), 0.0)
        if d["kr"] is not None:
            res = jax.lax.conv_general_dilated(
                x, d["kr"].astype(x.dtype), (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=_pet(x),
            )
            o = o + res
        else:
            o = o + d["res_scale"] * x.astype(jnp.float32)
        return o.astype(local.dtype)

    def _block(self, name, x, ranges=None):
        d = self.blocks[name]
        kc, bc = d["conv"]
        if ranges is not None:
            from dfc_sa_unet_tpu.infer.quant import range_tap

            range_tap(ranges, f"{name}.x", x, getattr(self, "calib_percentile", None))
        if ranges is None and name in self.pallas_conv_levels and conv_supported(
            x.shape[0], x.shape[1], x.shape[2], x.shape[-1], kc.shape[-1],
            itemsize=x.dtype.itemsize,
        ):
            a = jnp.maximum(
                _conv(x, *d["attn0"], padding=0).astype(jnp.float32), 0.0
            ).astype(x.dtype)
            a = self._lsa(d["lsa"], a)
            wr = d["wr"]
            if wr is None:  # identity residual (Cin == C): eye * res_scale
                wr = (jnp.eye(kc.shape[-1], dtype=jnp.float32) * d["res_scale"]).astype(x.dtype)
            return dfc_tail_from_x(
                x, a, kc, d["bc"], d["wg"], d["bg"], d["wf"], d["bf"], wr,
                interpret=self.interpret,
            )
        # bias-free 3x3 conv: the +bc / ReLU epilogue is applied in the
        # fused tail kernel (or one XLA fusion pass on the fallback path)
        y3 = jax.lax.conv_general_dilated(
            x, kc.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=_pet(x),
        ).astype(x.dtype)
        a = jnp.maximum(_conv(x, *d["attn0"], padding=0).astype(jnp.float32), 0.0).astype(x.dtype)
        a = self._lsa(d["lsa"], a)
        local = jnp.maximum(y3.astype(jnp.float32) + bc, 0.0).astype(x.dtype)
        return self._tail_lax(d, local, a, x, name=name, ranges=ranges)

    def _fwd(self, x, ranges=None):
        """The one forward implementation: serving (``ranges=None``) and
        int8 calibration (``ranges`` dict collects quantization-point
        statistics) share it, so they cannot drift apart."""
        x = x.astype(self.dtype)
        skips = []
        h = x
        for i in range(1, 5):
            h = self._block(f"down{i}", h, ranges)
            skips.append(h)
            h = max_pool(h, 2, 2)
        h = self._block("bottleneck", h, ranges)
        for i in range(4, 0, -1):
            skip = skips[i - 1]
            kt, bt = self.ups[f"up{i}"]
            h = conv_transpose_2x2(h, kt.astype(h.dtype), bt)
            if h.shape[1:3] != skip.shape[1:3]:
                h = resize_bilinear(h, skip.shape[1:3], align_corners=False)
            h = jnp.concatenate([h, skip], axis=-1)
            h = self._block(f"up_conv{i}", h, ranges)
        kf, bf = self.final
        return _conv(h, kf, bf, padding=0)

    def _build_forward(self):
        return lambda x: self._fwd(x)

    def __call__(self, x):
        return self._forward(x)
