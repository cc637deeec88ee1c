#!/usr/bin/env python
"""Inference entry point — CLI-compatible with the reference inference.py
(including its README's flag spellings: --model/--model_path and
--output/--output_dir are both accepted, fixing reference defect #5).

    python inference.py --config CFG.yaml --model CKPT --input DIR
        [--output DIR] [--csv_dir DIR] [--threshold 0.5]
        [--tile_size 224] [--overlap 50] [--resize W H]
        [--no_slide_window] [--tta] [--bf16] [--batch_size 32]

CKPT may be an Orbax checkpoint directory produced by train.py (full
trainer state or best_model) or a PyTorch ``.pth`` from the reference
(raw state_dict or trainer checkpoint) — converted on load.

Eval-mode autodetect: if DIR contains ``original/`` and ``mask/``
subdirectories, per-image and global micro-averaged metrics are computed
and written to CSV (the reference computes micro-averaged global metrics
but labels them "Macro-Averaged", inference.py:349-368 — defect #7; we
label them correctly).
"""

import argparse
import csv
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.config import load_config, merge_parallel_flags
from dfc_sa_unet_tpu.infer.predictor import Predictor, load_image
from dfc_sa_unet_tpu.metrics import metrics_from_counts
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.utils.visualization import create_combined_visualization, create_overlay


def _norm(p):
    return p.replace("\\", "/") if p else p


def load_model_variables(model, model_path, img_size, in_channels=3):
    """Load weights from an Orbax dir or a torch .pth (factory.load_variables)."""
    from dfc_sa_unet_tpu.models.factory import load_variables

    model_path = _norm(model_path)
    variables = load_variables(model, model_path, img_size=img_size, in_channels=in_channels)
    kind = "PyTorch weights" if model_path.endswith((".pth", ".pt")) else "checkpoint"
    print(f"Loaded {kind} from {model_path}")
    return variables


def save_prediction(original_image, pred_prob, pred_binary, output_dir, filename, gt_mask=None):
    """Artifact set per image (reference inference.py:155-186)."""
    import cv2

    output_dir = _norm(output_dir)
    os.makedirs(output_dir, exist_ok=True)
    pred_binary_img = (pred_binary * 255).astype(np.uint8)
    gt_vis = ((gt_mask > 0) * 255).astype(np.uint8) if gt_mask is not None else None

    if gt_vis is not None:
        create_combined_visualization(
            original_image, pred_binary_img, gt_vis, filename,
            os.path.join(output_dir, f"{filename}_combined_view.png"),
        )

    individual = os.path.join(output_dir, filename)
    os.makedirs(individual, exist_ok=True)
    heatmap = cv2.applyColorMap((pred_prob * 255).astype(np.uint8), cv2.COLORMAP_JET)
    overlay = create_overlay(original_image, pred_binary)
    cv2.imwrite(os.path.join(individual, "original.png"), cv2.cvtColor(original_image, cv2.COLOR_RGB2BGR))
    cv2.imwrite(os.path.join(individual, "pred_heatmap.png"), heatmap)
    cv2.imwrite(os.path.join(individual, "pred_binary.png"), pred_binary_img)
    cv2.imwrite(os.path.join(individual, "pred_overlay.png"), cv2.cvtColor(overlay, cv2.COLOR_RGB2BGR))
    if gt_vis is not None:
        cv2.imwrite(os.path.join(individual, "ground_truth.png"), gt_vis)


def main(args):
    import cv2

    from dfc_sa_unet_tpu.parallel import multihost as mh

    config = load_config(_norm(args.config))
    # optional inference: section — serving-side data_parallel /
    # spatial_parallel / multihost / bf16 from YAML (CLI flags win)
    merge_parallel_flags(args, config, sections=("inference",))

    if args.multihost or args.coordinator:
        # pod serving: every process drives its own chips over a strided
        # shard of the file list (no cross-host collectives); artifacts
        # land in the shared output dir and the primary merges the CSVs
        mh.initialize(args.coordinator, args.num_processes, args.process_id)
    nproc, pid = jax.process_count(), jax.process_index()
    primary = pid == 0

    img = config["dataset"].get("img_size", [224, 224])
    img_size = (img, img) if isinstance(img, int) else tuple(img)

    # --model wins; the config's pretrained_path is the fallback (the
    # reference loads pretrained_path inside get_model, model_factory.py:50-72)
    model_path = args.model or config["model"].get("pretrained_path")
    if not model_path:
        raise SystemExit("no weights: pass --model or set model.pretrained_path in the config")

    dtype = jnp.bfloat16 if args.bf16 else None
    # bf16 serving default for the transformer families: the fused Pallas
    # MHA is eval-exact and measured +31% (ViT-seg) / +15% (TransUNet) at
    # B=128 (PERF.md round 3).  f32 keeps the lax path (bit-parity mode);
    # --no_pallas opts out.
    use_pallas = (
        args.bf16
        and not args.no_pallas
        and config["model"].get("name")
        in ("TransformerUNet", "TransUNet", "VisionTransformerSegmentation")
    )
    model = ModelFactory.get_model(config, dtype=dtype, use_pallas=use_pallas)
    variables = load_model_variables(model, model_path, img_size, config["model"].get("in_channels", 3))
    if primary:
        print(f"Model {config['model'].get('name')} ready on {jax.local_devices()[0]}")
        if nproc > 1:
            print(f"Multi-host serving: {nproc} processes x "
                  f"{jax.local_device_count()} local devices; file list "
                  f"shards round-robin; output dir must be shared.")
        if args.tta:
            print("Test-time augmentation (TTA) enabled.")
        print("Mode: " + ("direct prediction" if args.no_slide_window else "sliding window"))

    output_dir = _norm(args.output)
    os.makedirs(output_dir, exist_ok=True)

    # eval-mode autodetect (reference inference.py:240-250)
    input_dir = _norm(args.input)
    evaluate = False
    original_dir = input_dir
    mask_dir = os.path.join(input_dir, "mask")
    if os.path.isdir(mask_dir):
        cand = os.path.join(input_dir, "original")
        if os.path.isdir(cand):
            original_dir, evaluate = cand, True
            print("Found 'original' and 'mask' subdirectories — evaluation enabled.")
        else:
            print("Warning: 'mask' found without 'original'; skipping evaluation.")

    image_files = []
    for ext in ("*.png", "*.jpg", "*.jpeg", "*.tif", "*.tiff"):
        image_files.extend(sorted(glob.glob(os.path.join(original_dir, ext))))
    if not image_files:
        print(f"No image files found in {original_dir}.")
        return

    apply_fn = None
    # use_pallas changes the compiled math at identical shapes — keep the
    # fused/lax executables apart when runs share an --exe_cache dir.
    cache_salt = "pallas:" if use_pallas else ""
    is_dfc = config["model"]["name"] == "DFC-SA-Res-Block"
    is_vit = config["model"]["name"] == "VisionTransformerSegmentation"
    is_tu = config["model"]["name"] in ("TransformerUNet", "TransUNet")
    if args.int8 and not (is_dfc or is_vit or is_tu):
        print("(--int8 supports DFC-SA-Res-Block, "
              "VisionTransformerSegmentation, and TransformerUNet; "
              "using standard path)")
    if args.engine and not args.int8 and not is_dfc:
        print("(--engine only supports DFC-SA-Res-Block; using standard path)")
    if (args.int8 and (is_dfc or is_vit or is_tu)) or (args.engine and is_dfc):
        if args.int8:
            from dfc_sa_unet_tpu.data.loader import normalize_on_device

            if getattr(args, "int8_maxabs", False):
                args.int8_percentile = None

            # calibrate activation scales on the first input images at the
            # model's working resolution (scales are per-tensor scalars, so
            # any spatial size works; tiles and full frames share them).
            # ViT models only accept img_dim inputs (the module asserts),
            # so their calibration side is pinned there.
            side = args.tile_size if not args.no_slide_window else img_size[0]
            if is_vit:
                side = config["model"].get("img_dim", 224)
            if is_tu:
                # TransUNet's pos-emb grid is sized from dataset img_size
                # (factory.py:66-69) — calibrating at --tile_size would
                # fail deep in _Embeddings with a broadcast error
                side = img_size[0]
            calib = []
            for path in image_files[:8]:
                im, _ = load_image(path, target_size=(side, side))
                if im is not None:
                    calib.append(im)
            if not calib:
                raise SystemExit("--int8: no readable calibration images")
            xs = normalize_on_device(
                jnp.asarray(np.stack(calib)), dtype or jnp.float32
            )
            # held-out batch for the self-check whenever more images exist
            # than the calibration slice: the static scales are gated on
            # data they were NOT fit to (VERDICT r4 item 7).  Cycled to the
            # calibration batch size so the fp forward compiles only once.
            holdout = None
            if len(image_files) > 8:
                him = []
                for path in image_files[8:16]:
                    im, _ = load_image(path, target_size=(side, side))
                    if im is not None:
                        him.append(im)
                if him:
                    him = (him * ((len(calib) + len(him) - 1) // len(him)))[:len(calib)]
                    holdout = normalize_on_device(
                        jnp.asarray(np.stack(him)), dtype or jnp.float32
                    )
            if is_vit:
                from dfc_sa_unet_tpu.infer.quant_vit import Int8ViTEngine

                engine = Int8ViTEngine(config, variables,
                                       dtype=dtype or jnp.float32,
                                       calib_batches=[xs],
                                       use_pallas=use_pallas,
                                       calib_percentile=args.int8_percentile,
                                       holdout_batch=holdout)
                print(f"Using the int8 transformer serving engine "
                      f"(all four linears x {engine.num_layers} blocks; "
                      f"calibrated on {len(calib)} images).")
            elif is_tu:
                from dfc_sa_unet_tpu.infer.quant_transunet import Int8TransUNetEngine

                engine = Int8TransUNetEngine(config, variables,
                                             dtype=dtype or jnp.float32,
                                             calib_batches=[xs],
                                             use_pallas=use_pallas,
                                             calib_percentile=args.int8_percentile,
                                             holdout_batch=holdout)
                print(f"Using the int8 TransUNet serving engine "
                      f"(all four encoder linears x {engine.num_layers} "
                      f"blocks; calibrated on {len(calib)} images).")
            else:
                from dfc_sa_unet_tpu.infer.quant import Int8DFCEngine

                engine = Int8DFCEngine(config, variables,
                                       dtype=dtype or jnp.float32,
                                       calib_batches=[xs],
                                       calib_percentile=args.int8_percentile,
                                       holdout_batch=holdout)
                print(f"Using the int8 quantized serving engine "
                      f"(levels: {sorted(engine.int8_levels)}; "
                      f"calibrated on {len(calib)} images).")
            if not args.no_int8_check:
                # engine-vs-fp agreement on the calibration batch: guards
                # an arbitrary checkpoint + outlier calibration data (the
                # test-suite Dice gates only cover the shipped models)
                from dfc_sa_unet_tpu.infer.quant import int8_self_check

                chk = int8_self_check(engine, strict=args.strict)
                if chk is not None:
                    extra = (f"; held-out flip rate {chk['holdout_flip_rate']:.3%}"
                             if "holdout_flip_rate" in chk else "")
                    print(f"int8 self-check: mask flip rate "
                          f"{chk['flip_rate']:.3%}, mean |dprob| "
                          f"{chk['mean_abs_dprob']:.5f}{extra}")
        else:
            from dfc_sa_unet_tpu.infer.engine import DFCEngine

            engine = DFCEngine(config, variables, dtype=dtype or jnp.float32)
            print("Using the folded+fused inference engine.")
        apply_fn = lambda _, x: engine._forward(x)  # noqa: E731
        if args.exe_cache:
            # engine weights are baked constants in the compiled
            # executable (apply_fn closes over them) — key the cache on
            # their values so a different checkpoint never reuses them
            from dfc_sa_unet_tpu.utils.exe_cache import tree_fingerprint

            if is_vit and args.int8:
                # use_pallas switches the engine's attention between the
                # fused kernel and lax at identical shapes — salt it too
                salt_tree = {"layers": engine.layers, "head": engine.head,
                             "final": (engine.final_k, engine.final_b),
                             "patch": (engine.patch_k, engine.patch_b),
                             "pallas": int(engine.use_pallas)}
            elif is_tu and args.int8:
                salt_tree = {"layers": engine.layers,
                             "enc_norm": (engine.enc_ns, engine.enc_nb),
                             "embed": engine._embed_vars,
                             "decoder": engine._decoder_vars,
                             "head": engine._head_vars,
                             "pallas": int(engine.use_pallas)}
            else:
                salt_tree = {"blocks": engine.blocks, "ups": engine.ups,
                             "final": engine.final}
            if args.int8:
                salt_tree["scales"] = dict(engine.act_scales)
            cache_salt = ("int8:" if args.int8 else "engine:") + tree_fingerprint(salt_tree)
    # the global file-list order drives int8 calibration (above) and the
    # merged CSV order (below); each process then serves a strided shard
    global_files = image_files
    if nproc > 1:
        image_files = image_files[pid::nproc]
    mesh = None
    # multi-host serving meshes span only THIS process's chips — each
    # process is an independent server over its shard; no collectives
    devices = jax.local_devices() if nproc > 1 else jax.devices()
    if args.spatial_parallel > 1:
        if len(devices) % args.spatial_parallel == 0 and len(devices) > 1:
            from dfc_sa_unet_tpu.parallel import serving_mesh

            mesh = serving_mesh(spatial=args.spatial_parallel, devices=devices)
            if primary:
                print(f"2-D serving mesh over {len(devices)} devices: "
                      f"data={mesh.shape['data']} x spatial={args.spatial_parallel} "
                      f"(image rows shard too — XLA inserts conv halo exchanges; "
                      f"exact, no tile seams).")
        elif primary:
            print(f"(--spatial_parallel {args.spatial_parallel}: needs a multiple "
                  f"of {args.spatial_parallel} devices, have {len(devices)}; "
                  f"running single-chip)")
    elif args.data_parallel:
        if len(devices) > 1:
            from dfc_sa_unet_tpu.parallel import data_parallel_mesh

            mesh = data_parallel_mesh(devices=devices)
            if primary:
                print(f"Data-parallel serving over {len(devices)} devices "
                      f"(batches shard on 'data'; variables replicated).")
        elif primary:
            print("(--data_parallel: only one device visible; running single-chip)")
    predictor = Predictor(model, variables, compute_dtype=dtype, apply_fn=apply_fn,
                          exe_cache_dir=args.exe_cache, cache_salt=cache_salt,
                          mesh=mesh)

    all_metrics = []
    totals = {"tp": 0, "fp": 0, "fn": 0, "tn": 0}

    from concurrent.futures import ThreadPoolExecutor

    from tqdm import tqdm

    from dfc_sa_unet_tpu.infer.predictor import prefetch

    def decoded():
        """Host decode (image + optional GT mask), run ahead of the device
        in a prefetch thread — the reference decodes serially per image."""
        for image_path in image_files:
            filename = os.path.splitext(os.path.basename(image_path))[0]
            target = tuple(args.resize) if (args.no_slide_window and args.resize) else None
            img, original = load_image(image_path, target_size=target)
            if original is None:
                continue
            gt_gray = None
            if evaluate:
                mask_path = next(iter(glob.glob(os.path.join(mask_dir, f"{filename}.*"))), None)
                if mask_path and os.path.exists(mask_path):
                    _, gt_full = load_image(mask_path)
                    if gt_full is not None:
                        gt_gray = cv2.cvtColor(gt_full, cv2.COLOR_RGB2GRAY)
                    else:
                        print(f"Warning: could not load mask {mask_path}")
                else:
                    print(f"Warning: no mask found for '{filename}'")
            yield filename, img, original, gt_gray

    stream = decoded() if args.serial else prefetch(decoded(), depth=2)
    saver = None if args.serial else ThreadPoolExecutor(max_workers=2)
    pending = []

    if args.no_slide_window or args.serial:
        # per-image prediction (the --serial A/B baseline mirrors the
        # reference's decode -> predict -> save loop)
        def predicted():
            for filename, img, original, gt_gray in stream:
                if args.no_slide_window:
                    prob_small = predictor.predict_single(img)
                    oh, ow = original.shape[:2]
                    pred_prob = cv2.resize(prob_small, (ow, oh), interpolation=cv2.INTER_LINEAR)
                else:
                    pred_prob = predictor.predict_sliding(
                        original, args.tile_size, args.overlap, args.batch_size, tta=args.tta
                    )
                yield filename, original, gt_gray, pred_prob
    else:
        # sliding mode: batch tiles ACROSS images so short-tile images
        # (a 512x512 image is only 9 tiles) still fill the TPU-fast
        # batch of 128 (predictor.predict_sliding_stream)
        meta: dict = {}

        def keyed():
            for i, (filename, img, original, gt_gray) in enumerate(stream):
                meta[i] = (filename, original, gt_gray)
                yield i, original

        def predicted():
            for i, pred_prob in predictor.predict_sliding_stream(
                keyed(), args.tile_size, args.overlap, args.batch_size, tta=args.tta
            ):
                filename, original, gt_gray = meta.pop(i)
                yield filename, original, gt_gray, pred_prob

    for filename, original, gt_gray, pred_prob in tqdm(
        predicted(), total=len(image_files), desc="Inference",
        disable=not primary,
    ):  # reference inference.py:264
        pred_binary = (pred_prob > args.threshold).astype(np.uint8)

        gt_mask = None
        if gt_gray is not None:
            ph, pw = pred_prob.shape
            gt_resized = (cv2.resize(gt_gray, (pw, ph), interpolation=cv2.INTER_NEAREST) > 128).astype(np.uint8)
            gt_mask = (gt_gray > 128).astype(np.uint8)
            tp = int(np.sum((pred_binary > 0) & (gt_resized > 0)))
            fp = int(pred_binary.sum()) - tp
            fn = int(gt_resized.sum()) - tp
            tn = pred_binary.size - tp - fp - fn
            for k, v in zip(("tp", "fp", "fn", "tn"), (tp, fp, fn, tn)):
                totals[k] += v
            m = metrics_from_counts(tp, fp, fn, tn)
            m.update({"file": filename, "tp": tp, "fp": fp, "fn": fn, "tn": tn})
            all_metrics.append(m)

        if saver is None:
            save_prediction(original, pred_prob, pred_binary, output_dir, filename, gt_mask=gt_mask)
        else:
            # PNG encode/write overlaps the next image's decode + predict
            pending.append(saver.submit(
                save_prediction, original, pred_prob, pred_binary, output_dir, filename, gt_mask
            ))

    if saver is not None:
        for f in pending:
            f.result()
        saver.shutdown()

    if evaluate and nproc > 1:
        # merge via the shared output dir: every process writes its rows,
        # barrier, then the primary assembles the global CSV and summary
        import json

        part = os.path.join(output_dir, f"evaluation_metrics.part{pid}.json")
        with open(part, "w", encoding="utf-8") as f:
            json.dump({"rows": all_metrics, "totals": totals}, f)
        mh.sync("eval_parts")
        if not primary:
            mh.sync("done")
            return
        all_metrics, totals = [], {"tp": 0, "fp": 0, "fn": 0, "tn": 0}
        for p in range(nproc):
            pp = os.path.join(output_dir, f"evaluation_metrics.part{p}.json")
            if not os.path.exists(pp):
                print(f"Warning: eval partial from process {p} is missing "
                      f"(is the output dir shared?); summary covers the rest")
                continue
            with open(pp, encoding="utf-8") as f:
                d = json.load(f)
            all_metrics.extend(d["rows"])
            for k in totals:
                totals[k] += d["totals"][k]
            os.remove(pp)
        order = {os.path.splitext(os.path.basename(fp))[0]: i
                 for i, fp in enumerate(global_files)}
        all_metrics.sort(key=lambda m: order.get(m["file"], 1 << 30))

    if evaluate and all_metrics:
        g = metrics_from_counts(totals["tp"], totals["fp"], totals["fn"], totals["tn"])
        print("\n" + "=" * 80)
        print("--- Inference evaluation summary ---")
        keys = ["iou", "dice_f1", "accuracy", "recall", "precision", "tp", "fp", "fn", "tn"]
        print(f"{'File':<30}" + "".join(f"{k.upper():>12}" for k in keys))
        for m in all_metrics:
            print(f"{m['file']:<30}" + "".join(f"{m[k]:>12.4f}" for k in keys))
        print("\n--- Global metrics (Micro-Averaged) ---")
        for k in ("iou", "dice_f1", "accuracy", "recall", "precision"):
            print(f"{k:<15} | {g[k]:.4f}")
        print("=" * 80)

        if args.csv_dir:
            csv_dir = _norm(args.csv_dir)
            os.makedirs(csv_dir, exist_ok=True)
            cfg_name = os.path.splitext(os.path.basename(args.config))[0]
            csv_path = os.path.join(csv_dir, f"{cfg_name}_metrics.csv")
        else:
            csv_path = os.path.join(output_dir, "evaluation_metrics.csv")
        with open(csv_path, "w", newline="", encoding="utf-8") as f:
            writer = csv.DictWriter(f, fieldnames=["file"] + keys)
            writer.writeheader()
            writer.writerows(all_metrics)
        print(f"\nMetrics CSV saved to: {csv_path}")

    if primary:
        print(f"\nInference complete. Results saved to {output_dir}")
    if nproc > 1:
        # process 0 hosts the coordination service: leaving before the
        # others finish would kill their distributed-runtime heartbeats
        mh.sync("done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Run inference (sliding window, TTA, metrics)")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--model", "--model_path", dest="model", type=str, default=None,
                        help="weights (Orbax dir or torch .pth); falls back to "
                             "the config's model.pretrained_path")
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", "--output_dir", dest="output", type=str, default="results")
    parser.add_argument("--csv_dir", type=str, default=None)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--tile_size", type=int, default=224)
    parser.add_argument("--overlap", type=int, default=50)
    parser.add_argument("--resize", nargs=2, type=int, metavar=("WIDTH", "HEIGHT"))
    parser.add_argument("--no_slide_window", action="store_true")
    parser.add_argument("--tta", action="store_true")
    parser.add_argument("--bf16", action="store_true", default=None)
    parser.add_argument("--no_bf16", action="store_false", dest="bf16",
                        help="override a config-enabled inference.bf16")
    parser.add_argument("--no_pallas", action="store_true",
                        help="disable the fused Pallas MHA that bf16 serving "
                             "enables by default for the transformer families")
    parser.add_argument("--exe_cache", type=str, default=None,
                        help="directory for compiled-executable caching (skips the "
                             "~6-15 min first TPU compile on warm starts)")
    parser.add_argument("--engine", action="store_true",
                        help="folded+fused inference engine (DFC-SA-Res-Block)")
    parser.add_argument("--int8", action="store_true",
                        help="int8 quantized serving engine (DFC-SA-Res-Block, "
                             "VisionTransformerSegmentation, TransformerUNet): "
                             "s8 MXU matmuls/convs where measured faster on v5e, "
                             "end-metric |Dice delta| <= 1e-3 (calibrates on the "
                             "first input images)")
    parser.add_argument("--int8_percentile", type=float, default=99.9,
                        help="with --int8: calibrate activation scales from this "
                             "percentile of |t| instead of max-abs — robust to an "
                             "outlier calibration image.  DEFAULT 99.9 since r5 "
                             "(identical compiled graph/speed, only the scale "
                             "constants differ; accuracy gates in tests/test_quant*) "
                             "— use --int8_maxabs for the old max-abs behavior")
    parser.add_argument("--int8_maxabs", action="store_true",
                        help="with --int8: max-abs calibration (pre-r5 default)")
    parser.add_argument("--no_int8_check", action="store_true",
                        help="with --int8: skip the post-build engine-vs-fp "
                             "self-check on the calibration batch (saves one "
                             "extra compile on the tunneled TPU backend)")
    parser.add_argument("--strict", action="store_true",
                        help="with --int8: refuse to serve (instead of warning) "
                             "when the self-check's mask flip rate exceeds the "
                             "gate")
    parser.add_argument("--batch_size", type=int, default=128,
                        help="tile batch; 128/256 are ~2x faster than 32-96 on TPU (XLA conv-layout cliff, PERF.md)")
    parser.add_argument("--serial", action="store_true",
                        help="disable decode/compute/save pipelining (A/B timing)")
    parser.add_argument("--data_parallel", action="store_true", default=None,
                        help="shard prediction batches over all visible devices "
                             "(1-D 'data' mesh; exact-match with single-chip)")
    parser.add_argument("--no_data_parallel", action="store_false", dest="data_parallel",
                        help="override a config-enabled inference.data_parallel")
    parser.add_argument("--spatial_parallel", type=int, default=None,
                        help="additionally shard image ROWS over this many devices "
                             "(2-D data x spatial mesh) — serves one large image "
                             "exactly across chips (no sliding-window seams; XLA "
                             "inserts the conv halo exchanges); best with "
                             "--no_slide_window on images whose activations "
                             "exceed one chip's HBM. Height must be divisible "
                             "by this factor (else batch-only sharding)")
    parser.add_argument("--multihost", action="store_true", default=None,
                        help="join a multi-process (TPU pod) cluster via "
                             "jax.distributed: each process serves a strided "
                             "shard of the file list on its own chips "
                             "(optionally with a LOCAL --data_parallel/"
                             "--spatial_parallel mesh); the output dir must "
                             "be shared — the primary merges the eval CSVs")
    parser.add_argument("--no_multihost", action="store_false", dest="multihost",
                        help="override a config-enabled inference.multihost")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator host:port for explicit clusters")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    main(parser.parse_args())
