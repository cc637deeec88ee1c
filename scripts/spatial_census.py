#!/usr/bin/env python
"""Spatial-sharding census: per-device activation footprint of the flagship
under a ('data','spatial') mesh vs single-device.

The whole-large-image serving path (`inference.py --spatial_parallel N`,
`parallel.mesh.serving_mesh`) claims one image's rows spread across chips so
the per-chip activation footprint shrinks ~1/N (plus O(1) halo rows).  The
TPU backend proves that with `memory_analysis().temp_size_in_bytes`; the CPU
backend reports temp_size=0, so off-TPU this script censuses the partitioned
HLO instead: the largest f32 tensors per device and the total
convolution-output bytes, single-device vs spatially sharded.

    python scripts/spatial_census.py [--size 512] [--spatial 8] [--features 64 128 256 512]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402


_SHAPE = re.compile(r"f32\[([\d,]+)\]")


def tensor_bytes_census(hlo: str, top=5):
    """All f32 tensor shapes mentioned in the HLO, by byte size."""
    sizes = {}
    for m in _SHAPE.finditer(hlo):
        dims = tuple(int(d) for d in m.group(1).split(","))
        b = 4 * int(np.prod(dims))
        sizes[dims] = max(sizes.get(dims, 0), b)
    ranked = sorted(sizes.items(), key=lambda kv: -kv[1])
    return ranked[:top]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spatial", type=int, default=8)
    ap.add_argument("--features", type=int, nargs="+", default=[64, 128, 256, 512])
    ap.add_argument("--tpu", action="store_true", help="run on the default (TPU) backend")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from dfc_sa_unet_tpu.models.factory import create_model
    from dfc_sa_unet_tpu.parallel import serving_mesh

    cfg = {"model": {"name": "DFC-SA-Res-Block", "in_channels": 3, "out_channels": 1,
                     "features": args.features, "pool_size": 8}}
    model = create_model(cfg)
    x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = jax.eval_shape(lambda: model.init(jax.random.key(0), x, train=False))
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    fn = jax.jit(lambda v, t: model.apply(v, t, train=False))

    def census(tag, vs, xs):
        compiled = fn.lower(vs, xs).compile()
        hlo = compiled.as_text()
        ma = compiled.memory_analysis()
        print(f"\n[{tag}]")
        if ma is not None and ma.temp_size_in_bytes:
            print(f"  temp (activations): {ma.temp_size_in_bytes / 1e6:.1f} MB"
                  f"   args: {ma.argument_size_in_bytes / 1e6:.1f} MB")
        print(f"  halo collective-permutes: {hlo.count('collective-permute')}, "
              f"all-reduces: {hlo.count('all-reduce')}")
        print("  largest per-device f32 tensors:")
        for dims, b in tensor_bytes_census(hlo):
            print(f"    {dims}: {b / 1e6:.1f} MB")

    census("single-device", variables, x)

    mesh = serving_mesh(spatial=args.spatial)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    census(f"data={mesh.shape['data']} x spatial={args.spatial}", vs, xs)


if __name__ == "__main__":
    main()
