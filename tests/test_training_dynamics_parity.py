"""Training-dynamics parity: several full SGD steps vs the PyTorch
reference from identical weights and data.

This goes beyond forward parity — it checks the whole training loop
semantics at once: sigmoid->BCE+Dice loss, gradients, global-norm clip
at 1.0, SGD momentum+weight-decay, and BatchNorm's train-mode statistics
and running-stat updates."""

import pytest

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dfc_sa_unet_tpu.models.factory import create_model
from dfc_sa_unet_tpu.train.trainer import Trainer
from dfc_sa_unet_tpu.utils.torch_convert import torch_state_dict_to_variables

from tests._reference import load_ref_module, load_ref_utils, require_reference

pytestmark = pytest.mark.slow  # >60s on the CPU conftest; run with -m 'slow or not slow'

LR, MOMENTUM, WD = 0.05, 0.9, 1e-4
STEPS = 4


def test_sgd_steps_match_torch(tmp_path):
    require_reference()
    ref = load_ref_module("unet_dfc_sa_res")
    ref_metrics = load_ref_utils("metrics")
    torch.manual_seed(21)
    tmodel = ref.UNetDFCSARes(features=[8, 16, 24, 32], pool_size=4)
    tmodel.train()
    opt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=MOMENTUM, weight_decay=WD)
    criterion = ref_metrics.BCEDiceLoss(0.5, 0.5)

    rng = np.random.default_rng(21)
    xs = rng.standard_normal((STEPS, 2, 3, 32, 32)).astype(np.float32)
    ts = (rng.uniform(size=(STEPS, 2, 1, 32, 32)) > 0.6).astype(np.float32)

    config = {
        "training": {"num_epochs": 1, "batch_size": 2, "learning_rate": LR,
                     "momentum": MOMENTUM, "weight_decay": WD, "num_workers": 1,
                     "save_checkpoint_freq": 10, "device": "auto",
                     "loss": {"type": "bce_dice", "params": {"weight_bce": 0.5, "weight_dice": 0.5}}},
        "model": {"name": "DFC-SA-Res-Block", "features": [8, 16, 24, 32], "pool_size": 4},
        "dataset": {"train_dir": "", "val_dir": "", "img_size": [32, 32], "augmentation": False},
        "logging": {"log_dir": str(tmp_path), "images_dir": str(tmp_path / "i"),
                    "save_best_worst_samples": 0},
    }
    jmodel = create_model(config)
    trainer = Trainer(jmodel, None, None, config, seed=0)
    template = jmodel.init(jax.random.key(0), jnp.asarray(xs[0].transpose(0, 2, 3, 1)), train=False)
    variables = torch_state_dict_to_variables(tmodel.state_dict(), template)
    from dfc_sa_unet_tpu.train.trainer import TrainState

    state = TrainState(
        params=jax.tree.map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree.map(jnp.asarray, variables["batch_stats"]),
        opt_state=trainer.tx.init(jax.tree.map(jnp.asarray, variables["params"])),
        step=jnp.zeros((), jnp.int32),
    )

    # Our trainer consumes uint8 and normalizes on device; for parity we
    # bypass that by feeding pre-normalized floats through the raw step
    # math: reconstruct the internal step with float inputs.
    from dfc_sa_unet_tpu.losses import compute_loss
    from dfc_sa_unet_tpu.metrics import hard_dice_iou  # noqa: F401

    @jax.jit
    def train_step(state, x, t):
        def loss_fn(params):
            out, mut = jmodel.apply(
                {"params": params, "batch_stats": state.batch_stats}, x, train=True,
                mutable=["batch_stats"],
            )
            probs = jax.nn.sigmoid(out.astype(jnp.float32))
            loss = compute_loss(probs, t, "bce_dice", {"weight_bce": 0.5, "weight_dice": 0.5})
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = trainer.tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss

    torch_losses, jax_losses = [], []
    for i in range(STEPS):
        xb = torch.from_numpy(xs[i])
        tb = torch.from_numpy(ts[i])
        opt.zero_grad()
        out = tmodel(xb)
        loss = criterion(torch.sigmoid(out), tb)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tmodel.parameters(), max_norm=1.0)
        opt.step()
        torch_losses.append(float(loss.detach()))

        xj = jnp.asarray(xs[i].transpose(0, 2, 3, 1))
        tj = jnp.asarray(ts[i].transpose(0, 2, 3, 1))
        state, jloss = train_step(state, xj, tj)
        jax_losses.append(float(jloss))

    np.testing.assert_allclose(jax_losses, torch_losses, atol=1e-3, rtol=1e-3)

    # final weights agree (spot check a few leaves incl. BN running stats)
    final_sd = tmodel.state_dict()
    final_vars = torch_state_dict_to_variables(final_sd, template)
    for path in [
        ("params", "down1", "conv_branch_0", "kernel"),
        ("params", "up_conv1", "gate_0", "bias"),
        ("params", "final_conv", "kernel"),
        ("batch_stats", "bottleneck", "fusion_conv_1", "mean"),
    ]:
        want = final_vars[path[0]]
        got = {"params": state.params, "batch_stats": state.batch_stats}[path[0]]
        for k in path[1:]:
            want, got = want[k], got[k]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=5e-3)
