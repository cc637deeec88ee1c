#!/usr/bin/env python
"""Convert a reference PyTorch ``.pth`` checkpoint to an Orbax directory.

    python scripts/convert_checkpoint.py --config configs/<model>.yaml \
        --pth best_model.pth --out converted_ckpt

The output directory loads directly via ``inference.py --model <out>`` or
``dfc_sa_unet_tpu.utils.checkpoint.restore_pytree``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.config import load_config
from dfc_sa_unet_tpu.models.factory import ModelFactory
from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util
from dfc_sa_unet_tpu.utils.torch_convert import load_torch_checkpoint


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    config = load_config(args.config)
    img_size = config["dataset"].get("img_size", [224, 224])
    model = ModelFactory.get_model(config)
    x = jnp.zeros((1, img_size[0], img_size[1], config["model"].get("in_channels", 3)))
    template = model.init(jax.random.key(0), x, train=False)
    variables = load_torch_checkpoint(args.pth, template)
    ckpt_util.save_pytree(args.out, variables)
    print(f"Converted {args.pth} -> {args.out}")


if __name__ == "__main__":
    main()
