"""Int8 serving engine for TransUNet's ViT-B encoder.

Why: TransUNet serves at ~70% of the chip's sustained bf16 matmul
ceiling (PERF.md round-3 roofline) and its 12 encoder blocks are the
exact linear-stack shapes scripts/bench_int8_mha.py measured at
**1.15-1.22x** bf16 at B=128 / M=25088 (hidden 768, mlp 3072 — shared
with ViT-seg, whose in-model A/B realized +15.0%).  The encoder is the
matmul-bound fraction of the model; the ResNetV2 backbone and
DecoderCup are conv-emitter-bound where the DFC investigation showed
int8 only pays at <=56 px, so they stay bf16.

Scheme (same post-training quantization as infer/quant.py /
infer/quant_vit.py):
  * the separate q/k/v Dense kernels are PACKED into one [in, 3E]
    matmul at engine build — the probe's winning "qkv" shape (a packed
    768->2304 measured 1.05-1.16x where an isolated 768->768 loses),
    and one quantize boundary instead of three,
  * weights: per-out-column symmetric int8 (scale_w[o] = max|W[:,o]|/127),
  * activations: per-tensor symmetric int8, STATIC scales calibrated
    offline (max-abs over calibration batches),
  * each quantized linear runs s8 x s8 -> s32 on the MXU with one fused
    f32 epilogue: y * (s_x * s_w[o]) + bias [-> exact GELU],
  * attention itself (fused Pallas MHA), all LayerNorms (eps=1e-6),
    residual adds, the hybrid ResNetV2 backbone + patch embeddings, the
    DecoderCup, and the segmentation head stay bf16/f32.  The backbone /
    decoder / head run through the SAME flax submodules as the module
    path (weights closed over as constants — XLA constant-folds the
    WSConv weight standardization, which the module path recomputes
    per step).

The accuracy gate is END-METRIC (BASELINE.json: Dice/IoU delta <=
1e-3), pinned by tests/test_quant_transunet.py on CPU; throughput A/B
runs on the real chip via ``bench.py --model TransformerUNet --int8``.

Reference math anchor: /root/reference/models/transformer_unet.py
(R50-ViT-B/16: Attention :116-157, Block :202-220, DecoderCup :254-300).
"""

from typing import Any, Iterable, Mapping, Optional

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.infer.quant import quantize_act, quantize_weight
from dfc_sa_unet_tpu.infer.quant_vit import _dense, _dense_s8, _layernorm
from dfc_sa_unet_tpu.models.transunet import (
    _DecoderCup,
    _Embeddings,
    get_r50_b16_config,
)
from dfc_sa_unet_tpu.nn.layers import Conv

TRANSUNET_OPS = frozenset({"qkv", "out", "fc1", "fc2"})

# scale key suffix per quantized op: qkv reads the attention_norm
# output, out the attention output, fc1 the ffn_norm output, fc2 the
# (exact) GELU output
_NEED = {"qkv": "ln_a", "out": "attn", "fc1": "ln_f", "fc2": "gelu"}


class Int8TransUNetEngine:
    """Compiled int8 serving for 'TransformerUNet' / 'TransUNet'.

    Call with normalized NHWC activations (same contract as
    ``model.apply(..., train=False)``; 1-channel inputs are repeated to
    3 like the module).  ``int8_ops`` selects which of the per-block
    linears quantize: "auto" (all four, the composed probe winner), an
    op-name iterable applied to every block, or a {layer_idx: op-set}
    mapping for per-layer A/B.  With ``int8_ops={}`` this is the fp
    engine — numerically the module path (parity-tested).

    ``vit_config`` overrides the R50-B16 hyperparameters (tests use
    shrunk encoders); by default it is derived from ``config`` exactly
    like models/factory.py:61-76.
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
        vit_config: Optional[Mapping[str, Any]] = None,
        calib_percentile: Optional[float] = None,
        holdout_batch=None,
    ):
        m = config["model"]
        if m.get("name") not in ("TransformerUNet", "TransUNet"):
            raise ValueError(f"Int8TransUNetEngine serves TransformerUNet, "
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

        img_size_cfg = config.get("dataset", {}).get("img_size", [224, 224])
        self.img_size = (img_size_cfg[0] if isinstance(img_size_cfg, (list, tuple))
                         else img_size_cfg)
        if vit_config is None:
            vit_config = get_r50_b16_config()
            vit_config["n_classes"] = m.get("out_channels", 1)
            vit_config["patches_grid"] = (self.img_size // 16, self.img_size // 16)
        self.cfg = dict(vit_config)
        self.num_heads = self.cfg["num_heads"]
        self.num_layers = self.cfg["num_layers"]

        p = variables["params"]
        bs = variables.get("batch_stats", {})
        f32 = lambda a: jnp.asarray(a, jnp.float32)

        # --- encoder blocks (hand-rolled; q/k/v packed at build time)
        self.layers = []
        enc = p["transformer"]["encoder"]
        for i in range(self.num_layers):
            lp = enc[f"layer_{i}"]
            at = lp["attn"]
            self.layers.append({
                "in_w": jnp.concatenate(
                    [f32(at[n]["kernel"]) for n in ("query", "key", "value")], axis=1
                ),
                "in_b": jnp.concatenate(
                    [f32(at[n]["bias"]) for n in ("query", "key", "value")]
                ),
                "out_w": f32(at["out"]["kernel"]), "out_b": f32(at["out"]["bias"]),
                "n1s": f32(lp["attention_norm"]["scale"]),
                "n1b": f32(lp["attention_norm"]["bias"]),
                "w1": f32(lp["ffn"]["fc1"]["kernel"]), "b1": f32(lp["ffn"]["fc1"]["bias"]),
                "w2": f32(lp["ffn"]["fc2"]["kernel"]), "b2": f32(lp["ffn"]["fc2"]["bias"]),
                "n2s": f32(lp["ffn_norm"]["scale"]), "n2b": f32(lp["ffn_norm"]["bias"]),
            })
        self.enc_ns = f32(enc["encoder_norm"]["scale"])
        self.enc_nb = f32(enc["encoder_norm"]["bias"])

        # --- backbone / decoder / head: the module path's own flax
        # submodules with their weight subtrees closed over as constants
        self._embed_mod = _Embeddings(self.cfg, self.img_size, dtype=dtype)
        self._embed_vars = {"params": p["transformer"]["embeddings"]}
        self._decoder_mod = _DecoderCup(self.cfg, dtype=dtype)
        self._decoder_vars = {"params": p["decoder"], "batch_stats": bs["decoder"]}
        self._head_mod = Conv(self.cfg["n_classes"], 3, padding=1, dtype=dtype)
        self._head_vars = {"params": p["segmentation_head_0"]}

        # --- int8 selection + quantized weights
        if int8_ops == "auto":
            sel = {i: TRANSUNET_OPS for i in range(self.num_layers)}
        elif isinstance(int8_ops, Mapping):
            sel = {int(i): frozenset(ops) for i, ops in int8_ops.items() if ops}
        else:
            ops = frozenset(int8_ops)
            sel = {i: ops for i in range(self.num_layers)} if ops else {}
        bad = [i for i in sel if not (0 <= i < self.num_layers)] + [
            o for ops in sel.values() for o in ops if o not in TRANSUNET_OPS
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
                          for t in ("ln_a", "attn", "ln_f", "gelu")}
        if act_scales is None:
            if sel and calib_batches is None:
                raise ValueError("Int8TransUNetEngine needs act_scales or calib_batches")
            act_scales = self.collect_act_scales(calib_batches or [])
        self.act_scales = {k: float(v) for k, v in act_scales.items()}
        missing = [f"{i}.{_NEED[o]}" for i, ops in sel.items() for o in ops
                   if f"{i}.{_NEED[o]}" not in self.act_scales]
        if missing:
            raise ValueError(f"act_scales missing entries: {missing}")

        self._forward = jax.jit(self._build_forward())

    # ---- forward pieces -------------------------------------------------
    def _attention(self, qkv):
        """Packed-qkv MHA, 1/sqrt(head_dim) scaling — the q/k/v Denses
        were packed at build so both paths mirror models/transunet.py
        _Attention exactly."""
        b, n, _ = qkv.shape
        nh = self.num_heads
        if self.use_pallas:
            from dfc_sa_unet_tpu.ops.pallas_attention import fused_mha

            return fused_mha(qkv.astype(self.dtype), nh)
        e = qkv.shape[-1] // 3
        hd = e // nh
        prec = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        q, k, v = jnp.split(qkv.astype(self.dtype), 3, axis=-1)
        heads = lambda t: t.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)
        q, k, v = heads(q), heads(k), heads(v)
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32,
            precision=prec,
        ) / np.sqrt(hd)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(q.dtype)
        return out.transpose(0, 2, 1, 3).reshape(b, n, e)

    def _layer(self, i, x, ranges=None):
        """Pre-norm block (models/transunet.py:_VitBlock); the residual
        stream stays f32 exactly like the module path (LayerNorm emits
        x.dtype, the f32 stream promotes every residual add).  With
        ``ranges`` (calibration mode) the fp math runs unconditionally
        and the four quantization points are recorded via
        quant.range_tap — serving and calibration share this one
        implementation."""
        from dfc_sa_unet_tpu.infer.quant import range_tap

        d = self.layers[i]
        ops = frozenset() if ranges is not None else self.int8_ops.get(i, frozenset())
        q = self.qlayers.get(i, {})
        dt = self.dtype

        y = _layernorm(x, d["n1s"], d["n1b"], eps=1e-6)
        range_tap(ranges, f"{i}.ln_a", y, self.calib_percentile)
        if "qkv" in ops:
            qw, sw = q["qkv"]
            qkv = _dense_s8(y, qw, sw, self.act_scales[f"{i}.ln_a"], d["in_b"])
        else:
            qkv = jnp.einsum(
                "bne,ef->bnf", y.astype(dt), d["in_w"].astype(dt),
                preferred_element_type=jnp.float32 if dt == jnp.float32 else None,
            ) + d["in_b"]
        a = self._attention(qkv.astype(dt))
        range_tap(ranges, f"{i}.attn", a, self.calib_percentile)
        if "out" in ops:
            ow, so = q["out"]
            sa = _dense_s8(a, ow, so, self.act_scales[f"{i}.attn"], d["out_b"]).astype(dt)
        else:
            sa = _dense(a, d["out_w"], d["out_b"], dt)
        x = x + sa

        y = _layernorm(x, d["n2s"], d["n2b"], eps=1e-6)
        range_tap(ranges, f"{i}.ln_f", y, self.calib_percentile)
        if "fc1" in ops:
            w1, s1 = q["fc1"]
            h = _dense_s8(y, w1, s1, self.act_scales[f"{i}.ln_f"], d["b1"])
            h = jax.nn.gelu(h, approximate=False).astype(dt)
        else:
            h = _dense(y, d["w1"], d["b1"], dt)
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(h.dtype)
        range_tap(ranges, f"{i}.gelu", h, self.calib_percentile)
        if "fc2" in ops:
            w2, s2 = q["fc2"]
            h = _dense_s8(h, w2, s2, self.act_scales[f"{i}.gelu"], d["b2"]).astype(dt)
        else:
            h = _dense(h, d["w2"], d["b2"], dt)
        return x + h

    def _encode(self, x, ranges=None):
        """Hybrid embed -> 12 int8/fp blocks -> encoder_norm; returns
        (tokens, skip features)."""
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        y, feats = self._embed_mod.apply(self._embed_vars, x, False)
        for i in range(self.num_layers):
            y = self._layer(i, y, ranges)
        return _layernorm(y, self.enc_ns, self.enc_nb, eps=1e-6), feats

    def _fwd(self, x, ranges=None):
        """The one forward implementation: serving (``ranges=None``) and
        calibration (``ranges`` dict, fp math + range taps) share it."""
        y, feats = self._encode(x, ranges)
        y = self._decoder_mod.apply(self._decoder_vars, y, feats, False)
        return self._head_mod.apply(self._head_vars, y)

    def _build_forward(self):
        return lambda x: self._fwd(x)

    # ---- calibration -----------------------------------------------------
    def _forward_ranges(self, x):
        """fp forward returning (logits, per-layer range statistics of the
        four quantization points: attention_norm out, attention out,
        ffn_norm out, GELU out)."""
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
