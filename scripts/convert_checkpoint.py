#!/usr/bin/env python
"""Convert checkpoints between the reference's torch format and ours.

Torch -> Orbax (load a reference ``.pth`` into the TPU stack):

    python scripts/convert_checkpoint.py --config configs/<model>.yaml \
        --pth best_model.pth --out converted_ckpt

The output directory loads directly via ``inference.py --model <out>`` or
``dfc_sa_unet_tpu.utils.checkpoint.restore_pytree``.

Orbax -> torch (export a TPU-trained checkpoint back to the reference's
tooling; the ``.pth`` is a raw state_dict, exactly what reference
inference.py:222-229 and model_factory.py:65-71 accept):

    python scripts/convert_checkpoint.py --config configs/<model>.yaml \
        --ckpt logs/checkpoints/best --out best_model.pth --to_torch
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfc_sa_unet_tpu.config import load_config
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util
from dfc_sa_unet_tpu.utils.torch_convert import save_torch_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--pth", help="input .pth (torch -> Orbax direction)")
    p.add_argument("--ckpt", help="input Orbax dir (with --to_torch)")
    p.add_argument("--out", required=True)
    p.add_argument("--to_torch", action="store_true",
                   help="export an Orbax checkpoint dir (--ckpt) to a torch .pth")
    args = p.parse_args()

    config = load_config(args.config)
    img_size = config["dataset"].get("img_size", [224, 224])
    if isinstance(img_size, int):
        img_size = [img_size, img_size]
    model = ModelFactory.get_model(config)
    in_channels = config["model"].get("in_channels", 3)
    # Both directions share factory.load_variables: it templates the model
    # and dispatches on the source format (.pth via load_torch_checkpoint,
    # directories via restore_pytree) — the same path train.py's
    # pretrained_path warm start uses.
    src = args.ckpt if args.to_torch else args.pth
    if not src:
        p.error("--to_torch requires --ckpt (an Orbax checkpoint directory)"
                if args.to_torch else "the torch -> Orbax direction requires --pth")
    from dfc_sa_unet_tpu.models.factory import load_variables

    variables = load_variables(
        model, src, img_size=tuple(img_size), in_channels=in_channels,
    )
    if args.to_torch:
        save_torch_checkpoint(args.out, variables)
        print(f"Exported {args.ckpt} -> {args.out} (raw torch state_dict)")
    else:
        ckpt_util.save_pytree(args.out, variables)
        print(f"Converted {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
