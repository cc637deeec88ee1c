"""Int8 serving engine for the transformer families' ViT-B encoder.

Why: the transformer families are MATMUL-bound where the DFC family is
conv-emitter-bound — ViT-seg serves at 91.5% of the chip's sustained
bf16 matmul ceiling (PERF.md round-3 roofline), so the one lever left
is the MXU's higher int8 rate.  scripts/bench_int8_mha.py measured the
per-block linear stack (qkv + out + fc1 + fc2 at ViT-B shapes, B=128,
M=25088) at **1.15-1.22x** bf16 with the full realistic chain (per-
tensor activation quantize -> s8xs8->s32 -> per-out-column f32 dequant
+ bias [+ GELU] -> bf16), projecting ~9-14 ms off a 52.5 ms forward.
Per-matmul: qkv 1.05-1.16x, fc1 1.03-1.10x, fc2 1.00-1.19x, out_proj
0.90-0.95x in isolation — but the composed "all four" stack beat the
out-proj-excluded variant both runs, so AUTO quantizes all four.  An
s8-linked fc1->fc2 variant (s8 GELU intermediate in HBM) measured
SLOWER (the requant epilogue breaks XLA's fusion) and is not offered.

Scheme (same post-training quantization as infer/quant.py):
  * weights: per-out-column symmetric int8 of the [in, out] Dense
    kernels (scale_w[o] = max|W[:, o]| / 127),
  * activations: per-tensor symmetric int8, STATIC scales calibrated
    offline (max-abs over calibration batches),
  * each quantized linear runs s8 x s8 -> s32 on the MXU, then one
    fused f32 epilogue: y * (s_x * s_w[o]) + bias [-> exact GELU],
  * attention itself (the fused Pallas MHA: scores, softmax, AV),
    LayerNorms, residual adds, patch embedding, and the ConvTranspose
    segmentation head stay bf16/f32 — the head's BN is folded like the
    DFC engine's.

The accuracy gate is END-METRIC (BASELINE.json: Dice/IoU delta <=
1e-3), pinned by tests/test_quant_vit.py on CPU; throughput A/B runs
on the real chip via ``bench.py --model VisionTransformerSegmentation
--int8``.

Reference math anchor: /root/reference/models/vision_transformer.py
(ViT-B/16 + ConvTranspose head; torch post-norm encoder).
"""

from typing import Any, Iterable, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.engine import fold_conv_bn
from dfc_sa_unet_tpu.infer.quant import quantize_act, quantize_weight
from dfc_sa_unet_tpu.ops.resize import resize_bilinear

VIT_OPS = frozenset({"qkv", "out", "fc1", "fc2"})


def _layernorm(x, scale, bias, eps=1e-5):
    """torch LayerNorm over the last dim, f32 math, x.dtype out
    (mirrors nn/layers.py:LayerNorm)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _dense(x, kernel, bias, dtype):
    """nn/layers.py:Dense numerics: compute-dtype operands, f32 MXU
    accumulation, f32 bias add, dtype out.  Mirrors Dense's output-dtype
    policy: bf16 mode emits bf16 from the dot (an f32 output doubles the
    HBM write + epilogue read — round-4 census), f32 mode stays f32."""
    y = jnp.einsum(
        "...i,io->...o", x.astype(dtype), kernel.astype(dtype),
        preferred_element_type=jnp.float32 if dtype == jnp.float32 else None,
    )
    return (y + bias).astype(dtype)


def _dense_s8(x, q, w_scale, x_scale, bias):
    """Quantized linear: s8 x s8 -> s32 MXU, one f32 epilogue.  Returns
    f32 (callers fuse GELU / residual / cast into the epilogue)."""
    x8 = quantize_act(x, x_scale)
    y = jnp.dot(x8, q, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (x_scale * w_scale) + bias


class Int8ViTEngine:
    """Compiled int8 serving for 'VisionTransformerSegmentation'.

    Call with normalized NHWC activations (same contract as
    ``model.apply(..., train=False)``); eval-mode dropout is identity so
    it is omitted.  ``int8_ops`` selects which of the four per-block
    linears quantize: "auto" (all four, the composed probe winner), an
    op-name iterable applied to every block, or a {layer_idx: op-set}
    mapping for per-layer A/B.  With ``int8_ops={}`` this is the fp
    engine — numerically the module path (parity-tested).
    """

    def __init__(
        self,
        config: Mapping[str, Any],
        variables: Mapping[str, Any],
        dtype=jnp.bfloat16,
        int8_ops="auto",
        act_scales: Optional[Mapping[str, float]] = None,
        calib_batches: Optional[Iterable] = None,
        use_pallas: bool = True,
        calib_percentile: Optional[float] = None,
        holdout_batch=None,
    ):
        m = config["model"]
        if m.get("name") != "VisionTransformerSegmentation":
            raise ValueError(f"Int8ViTEngine serves VisionTransformerSegmentation, "
                             f"got {m.get('name')!r}")
        self.dtype = dtype
        self.use_pallas = use_pallas
        self.calib_percentile = calib_percentile
        self.calib_batch = None
        self.calib_fp_probs = None
        # held-out batch for int8_self_check (VERDICT r4 item 7): its fp
        # probs are captured during calibration with the same compiled
        # fp forward
        self.holdout_batch = None if holdout_batch is None else jnp.asarray(holdout_batch)
        self.holdout_fp_probs = None
        self.img_dim = m.get("img_dim", 224)
        self.patch_dim = m.get("patch_dim", 16)
        self.num_heads = m.get("num_heads", 12)
        self.num_layers = m.get("num_layers", 12)

        p = variables["params"]
        s = variables.get("batch_stats", {})
        f32 = lambda a: jnp.asarray(a, jnp.float32)

        self.patch_k = f32(p["patch_embed"]["proj"]["kernel"])
        self.patch_b = f32(p["patch_embed"]["proj"]["bias"])
        self.pos = f32(p["pos_embed"])

        self.layers = []
        enc = p["transformer_encoder"]
        for i in range(self.num_layers):
            lp = enc[f"layers_{i}"]
            self.layers.append({
                "in_w": f32(lp["self_attn"]["in_proj_weight"]),
                "in_b": f32(lp["self_attn"]["in_proj_bias"]),
                "out_w": f32(lp["self_attn"]["out_proj"]["kernel"]),
                "out_b": f32(lp["self_attn"]["out_proj"]["bias"]),
                "n1s": f32(lp["norm1"]["scale"]), "n1b": f32(lp["norm1"]["bias"]),
                "w1": f32(lp["linear1"]["kernel"]), "b1": f32(lp["linear1"]["bias"]),
                "w2": f32(lp["linear2"]["kernel"]), "b2": f32(lp["linear2"]["bias"]),
                "n2s": f32(lp["norm2"]["scale"]), "n2b": f32(lp["norm2"]["bias"]),
            })

        # segmentation head: ConvTranspose(k4 s2 p1)+BN(folded)+ReLU
        # stages (names segmentation_head_{3i}/{3i+1}) + the final 1x1
        self.head = []
        i = 0
        while f"segmentation_head_{3 * i + 1}" in p:
            ct = p[f"segmentation_head_{3 * i}"]
            k, b = fold_conv_bn(
                f32(ct["kernel_t"]), f32(ct["bias"]),
                p[f"segmentation_head_{3 * i + 1}"],
                s[f"segmentation_head_{3 * i + 1}"],
            )
            self.head.append((k, b))
            i += 1
        fin = p[f"segmentation_head_{3 * i}"]
        self.final_k, self.final_b = f32(fin["kernel"]), f32(fin["bias"])

        # --- int8 selection + quantized weights
        if int8_ops == "auto":
            sel = {i: VIT_OPS for i in range(self.num_layers)}
        elif isinstance(int8_ops, Mapping):
            sel = {int(i): frozenset(ops) for i, ops in int8_ops.items() if ops}
        else:
            ops = frozenset(int8_ops)
            sel = {i: ops for i in range(self.num_layers)} if ops else {}
        bad = [i for i in sel if not (0 <= i < self.num_layers)] + [
            o for ops in sel.values() for o in ops if o not in VIT_OPS
        ]
        if bad:
            raise ValueError(f"unknown layers/ops: {bad}")
        self.int8_ops = sel

        key_of = {"qkv": "in_w", "out": "out_w", "fc1": "w1", "fc2": "w2"}
        self.qlayers = {
            i: {op: quantize_weight(self.layers[i][key_of[op]]) for op in ops}
            for i, ops in sel.items()
        }

        if act_scales == "timing":
            # placeholder scales: identical compute graph and speed,
            # garbage accuracy — for throughput benchmarking only
            act_scales = {f"{i}.{t}": 0.05 for i in sel
                          for t in ("x", "attn", "ln1", "gelu")}
        if act_scales is None:
            if sel and calib_batches is None:
                raise ValueError("Int8ViTEngine needs act_scales or calib_batches")
            act_scales = self.collect_act_scales(calib_batches or [])
        self.act_scales = {k: float(v) for k, v in act_scales.items()}
        need = {"qkv": "x", "out": "attn", "fc1": "ln1", "fc2": "gelu"}
        missing = [f"{i}.{need[o]}" for i, ops in sel.items() for o in ops
                   if f"{i}.{need[o]}" not in self.act_scales]
        if missing:
            raise ValueError(f"act_scales missing entries: {missing}")

        self._forward = jax.jit(self._build_forward())

    # ---- forward pieces -------------------------------------------------
    def _attention(self, qkv):
        b, n, _ = qkv.shape
        nh = self.num_heads
        if self.use_pallas:
            from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha

            return fused_mha(qkv.astype(self.dtype), nh)
        e = qkv.shape[-1] // 3
        hd = e // nh
        q, k, v = jnp.split(qkv.astype(self.dtype), 3, axis=-1)
        heads = lambda t: t.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32
        ).astype(self.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, n, e)

    def _layer(self, i, x, ranges=None):
        """One encoder block.  With ``ranges`` (calibration mode) the fp
        math runs unconditionally and the four quantization points are
        recorded via quant.range_tap — serving and calibration share
        this one implementation (an edit here cannot silently diverge
        from the calibration graph)."""
        from dfc_sa_unet_tpu.infer.quant import range_tap

        d = self.layers[i]
        ops = frozenset() if ranges is not None else self.int8_ops.get(i, frozenset())
        q = self.qlayers.get(i, {})
        dt = self.dtype

        range_tap(ranges, f"{i}.x", x, self.calib_percentile)
        if "qkv" in ops:
            qw, sw = q["qkv"]
            qkv = _dense_s8(x, qw, sw, self.act_scales[f"{i}.x"], d["in_b"])
        else:
            # model numerics (vit_seg.py:74-80): f32 accumulate + f32 bias
            qkv = jnp.einsum(
                "bne,ef->bnf", x.astype(dt), d["in_w"].astype(dt),
                preferred_element_type=jnp.float32 if dt == jnp.float32 else None,
            ) + d["in_b"]
        a = self._attention(qkv.astype(dt))
        range_tap(ranges, f"{i}.attn", a, self.calib_percentile)

        if "out" in ops:
            ow, so = q["out"]
            sa = _dense_s8(a, ow, so, self.act_scales[f"{i}.attn"], d["out_b"]).astype(dt)
        else:
            sa = _dense(a, d["out_w"], d["out_b"], dt)
        x = _layernorm(x + sa, d["n1s"], d["n1b"])
        range_tap(ranges, f"{i}.ln1", x, self.calib_percentile)

        if "fc1" in ops:
            w1, s1 = q["fc1"]
            h = _dense_s8(x, w1, s1, self.act_scales[f"{i}.ln1"], d["b1"])
            h = jax.nn.gelu(h, approximate=False).astype(dt)
        else:
            h = _dense(x, d["w1"], d["b1"], dt)
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        range_tap(ranges, f"{i}.gelu", h, self.calib_percentile)
        if "fc2" in ops:
            w2, s2 = q["fc2"]
            h = _dense_s8(h, w2, s2, self.act_scales[f"{i}.gelu"], d["b2"]).astype(dt)
        else:
            h = _dense(h, d["w2"], d["b2"], dt)
        return _layernorm(x + h, d["n2s"], d["n2b"])

    def _embed(self, x):
        dt = self.dtype
        pd = self.patch_dim
        y = jax.lax.conv_general_dilated(
            x.astype(dt), self.patch_k.astype(dt), (pd, pd), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if dt == jnp.float32 else dt,
        )
        y = (y + self.patch_b).astype(dt)
        b, h, w, e = y.shape
        # + pos promotes to f32, exactly like the module path (pos_embed
        # is an f32 param); the first layer's matmul casts back to dtype
        return y.reshape(b, h * w, e) + self.pos

    def _head(self, y):
        dt = self.dtype
        for k, b in self.head:
            flipped = k[::-1, ::-1, :, :]
            z = jax.lax.conv_general_dilated(
                y.astype(dt), flipped.astype(dt), (1, 1), ((2, 2), (2, 2)),
                lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32 if dt == jnp.float32 else dt,
            )
            y = jnp.maximum(z.astype(jnp.float32) + b, 0.0).astype(dt)
        z = jax.lax.conv_general_dilated(
            y.astype(dt), self.final_k.astype(dt), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if dt == jnp.float32 else dt,
        )
        return z.astype(jnp.float32) + self.final_b

    def _fwd(self, x, ranges=None):
        """The one forward implementation: serving (``ranges=None``) and
        calibration (``ranges`` dict, fp math + range taps) share it."""
        b, h, w, _ = x.shape
        feat = self.img_dim // self.patch_dim
        y = self._embed(x)
        for i in range(self.num_layers):
            y = self._layer(i, y, ranges)
        y = y.reshape(b, feat, feat, y.shape[-1]).astype(self.dtype)
        logits = self._head(y)
        if logits.shape[1:3] != (h, w):
            logits = resize_bilinear(logits, (h, w), align_corners=False)
        return logits

    def _build_forward(self):
        return lambda x: self._fwd(x)

    # ---- calibration -----------------------------------------------------
    def _forward_ranges(self, x):
        """fp forward returning (logits, per-layer range statistics of the
        four quantization points: block input, attention output, norm1
        output, GELU output)."""
        ranges: dict = {}
        logits = self._fwd(x, ranges)
        return logits, ranges

    def collect_act_scales(self, calib_batches: Iterable) -> dict:
        """Static per-tensor scales over calibration batches (normalized
        NHWC, same contract as __call__): max-abs, or the ctor's
        ``calib_percentile`` of |t|.  Captures the first batch + its fp
        probs for quant.int8_self_check."""
        from dfc_sa_unet_tpu.infer.quant import (
            _engine_weight_bytes, calibration_forward)
        # Calibrate through the LAX attention path: the fused Pallas MHA
        # cannot trace for calibration_forward's host-CPU fallback, and
        # its fp outputs match lax to ~1e-4 (PARITY_TPU fused rows) —
        # noise next to /127 scale quantization.  Serving keeps pallas.
        saved_pallas = self.use_pallas
        self.use_pallas = False
        try:
            fn = calibration_forward(self._forward_ranges,
                                     _engine_weight_bytes(self))
            acc = {}
            first = True
            for xb in calib_batches:
                logits, r = fn(jnp.asarray(xb))
                if first:
                    self.calib_batch = jnp.asarray(xb)
                    self.calib_fp_probs = jax.nn.sigmoid(logits.astype(jnp.float32))
                    first = False
                for k, v in r.items():
                    acc[k] = max(acc.get(k, 0.0), float(v))
            if self.holdout_batch is not None:
                # same jitted fp forward, same shape -> no extra compile
                logits, _ = fn(self.holdout_batch)
                self.holdout_fp_probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        finally:
            self.use_pallas = saved_pallas
        return {k: max(v, 1e-6) / 127.0 for k, v in acc.items()}

    def __call__(self, x):
        return self._forward(x)
