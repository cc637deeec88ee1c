"""dfc_sa_unet_tpu — a TPU-native JAX/Flax/Pallas segmentation framework.

A from-scratch rebuild of the capabilities of the DFC-SA-UNet reference
(PyTorch, single-GPU) as an idiomatic TPU stack:

  * NHWC tensors end-to-end (TPU-native conv layout).
  * Functional jitted train/eval steps; optax optimizer; Orbax checkpoints.
  * Exact-parity numerics vs the PyTorch reference (adaptive pooling,
    bilinear interpolation, BatchNorm semantics) so converted checkpoints
    reproduce Dice/IoU to <=1e-3.
  * One mesh-parameterized data-parallel path (jax.sharding) that is a
    no-op on one chip and rides ICI on a pod slice.
  * A Pallas fused pooled-attention kernel for the DFC-SA hot path.

Reference layer map: see SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS=cpu even when the host image's sitecustomize pins
# jax_platforms to a hardware plugin (observed: the 'axon' tunnel
# overrides the env var).  Only the CPU override is applied — re-setting
# a plugin platform here can race its registration (setting 'axon' before
# the plugin registers makes backend init fail).
import os as _os

if _os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:  # backend already initialized — leave it be
        pass
del _os
