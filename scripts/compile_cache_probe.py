#!/usr/bin/env python
"""Probe: can a compiled executable be serialized in one process and
reloaded in another, skipping the 380-930 s first tunnel compile?

    python scripts/compile_cache_probe.py --save /tmp/exe.bin
    python scripts/compile_cache_probe.py --load /tmp/exe.bin
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import serialize_executable as se

from dfc_sa_unet_tpu.models.factory import create_model

SIZE = 224


def build():
    cfg = {"model": {"name": "DFC-SA-Res-Block", "features": [64, 128, 256, 512],
                     "pool_size": 8}}
    model = create_model(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.bfloat16),
                           train=False)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((128, SIZE, SIZE, 3)),
                    jnp.bfloat16)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x, train=False).astype(jnp.float32).mean()

    return fwd, variables, x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--save", type=str)
    p.add_argument("--load", type=str)
    args = p.parse_args()
    fwd, variables, x = build()

    if args.save:
        t0 = time.time()
        lowered = fwd.lower(variables, x)
        compiled = lowered.compile()
        print(f"compile: {time.time() - t0:.1f} s")
        t0 = time.time()
        payload, in_tree, out_tree = se.serialize(compiled)
        with open(args.save, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        print(f"serialize: {time.time() - t0:.1f} s, {os.path.getsize(args.save)/2**20:.1f} MB")
        print("result:", float(compiled(variables, x)))
    else:
        t0 = time.time()
        with open(args.load, "rb") as f:
            payload, in_tree, out_tree = pickle.load(f)
        compiled = se.deserialize_and_load(payload, in_tree, out_tree)
        print(f"deserialize+load: {time.time() - t0:.1f} s")
        t0 = time.time()
        out = float(compiled(variables, x))
        print(f"first call: {time.time() - t0:.1f} s, result: {out}")


if __name__ == "__main__":
    main()
