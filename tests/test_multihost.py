"""Multi-host (pod-scale) training: loader sharding + a real 2-process
CPU cluster (jax.distributed + Gloo collectives) vs single-process.

The reference is strictly single-process (SURVEY.md §2.4); the framework
extends GSPMD data parallelism across processes (parallel/multihost.py).
The cluster test spawns 2 subprocesses x 4 virtual CPU devices each and
asserts the run matches the in-process 8-device single-controller run —
same final params, same history, same per-sample validation metrics.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from dfc_sa_unet_tpu.data.loader import DataLoaderFactory
from dfc_sa_unet_tpu.data.synthetic import generate

import _multihost_worker as worker  # tests/ is on sys.path (no __init__.py)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------- loader sharding


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    train = generate(str(tmp / "train"), n=20, size=16, seed=31)
    val = generate(str(tmp / "val"), n=10, size=16, seed=32)
    return train, val, str(tmp)


def _batches(loader):
    return list(iter(loader))


def test_loader_shard_reassembles_to_single_process(data):
    """Concatenating every process's chunk in process order must equal the
    unsharded batch plus per-process trailing zeros, with a correct valid
    mask and the full global filename list."""
    train, val, _ = data
    cfg = worker._config(train, val, "/tmp/unused")
    nproc, m = 2, 4
    ref = _batches(DataLoaderFactory(cfg, seed=0).get_val_loader())
    shards = [
        _batches(DataLoaderFactory(cfg, seed=0).get_val_loader(
            shard=(p, nproc), shard_pad_multiple=m))
        for p in range(nproc)
    ]
    assert len(ref) == len(shards[0]) == len(shards[1])
    for b, rb in enumerate(ref):
        chunks = [shards[p][b] for p in range(nproc)]
        g = rb["image"].shape[0]
        imgs = np.concatenate([c["image"] for c in chunks])
        masks = np.concatenate([c["mask"] for c in chunks])
        L = imgs.shape[0]
        assert L % (nproc * m) == 0
        # real rows of the padded layout sit at each process's chunk prefix
        chunk = L // nproc
        real = []
        for p in range(nproc):
            take = min(max(g - p * chunk, 0), chunk)
            real.append((imgs[p * chunk:p * chunk + take],
                         masks[p * chunk:p * chunk + take]))
            # padding rows are zeros
            assert not imgs[p * chunk + take:(p + 1) * chunk].any()
            if "valid" in chunks[p]:
                np.testing.assert_array_equal(
                    chunks[p]["valid"],
                    np.concatenate([np.ones(take, np.float32),
                                    np.zeros(chunk - take, np.float32)]))
        np.testing.assert_array_equal(
            np.concatenate([r[0] for r in real]), rb["image"])
        np.testing.assert_array_equal(
            np.concatenate([r[1] for r in real]), rb["mask"])
        for c in chunks:
            assert c["filename_global"] == rb["filename"]
        assert sum((c["filename"] for c in chunks), []) == rb["filename"]
        # padded batches carry the mask on every process; exact ones don't
        assert ("valid" in chunks[0]) == (L != g)


def test_loader_shard_replicate_policy(data):
    """partial='replicate': a partial train batch loads in FULL on every
    process (zero rows would perturb BN batch stats); full batches shard."""
    train, val, _ = data
    cfg = worker._config(train, val, "/tmp/unused")  # train n=20, batch=8
    nproc, m = 2, 4
    ref = _batches(DataLoaderFactory(cfg, seed=0).get_train_loader(drop_last=False))
    shards = [
        _batches(DataLoaderFactory(cfg, seed=0).get_train_loader(
            drop_last=False, shard=(p, nproc), shard_pad_multiple=m))
        for p in range(nproc)
    ]
    assert len(ref) == 3  # 8 + 8 + 4
    for b, rb in enumerate(ref):
        g = rb["image"].shape[0]
        if g % (nproc * m) == 0:
            imgs = np.concatenate([shards[p][b]["image"] for p in range(nproc)])
            np.testing.assert_array_equal(imgs, rb["image"])
            assert not shards[0][b].get("replicated")
        else:
            for p in range(nproc):
                assert shards[p][b]["replicated"] is True
                np.testing.assert_array_equal(shards[p][b]["image"], rb["image"])
                assert shards[p][b]["filename"] == rb["filename"]


# --------------------------------------------------------- real 2-proc cluster


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_cluster(data, tmp_path, spatial=1, split_resume=False,
                 extra_args=None, return_logs=False):
    """Launch a 2-process x 4-device cluster run; return its npz results.

    ``extra_args``: {pid: [argv...]} appended to that worker only (e.g.
    the async-preemption flag goes to a single process)."""
    train, val, _ = data
    port = _free_port()
    out = str(tmp_path / f"cluster_s{spatial}.npz")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "_multihost_worker.py"),
             "--pid", str(p), "--nproc", "2", "--port", str(port),
             "--train_dir", train, "--val_dir", val, "--spatial", str(spatial),
             # split_resume restores the PRIMARY's checkpoint on every
             # process — the log dir must be shared, as on a real pod
             "--log_dir", str(tmp_path / ("mh_logs_shared" if split_resume
                                          else f"mh_logs_s{spatial}_{p}")),
             "--out", out]
            + (["--split_resume"] if split_resume else [])
            + (extra_args or {}).get(p, []),
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker pid={p.args[3]} failed:\n{log[-4000:]}"
    got = np.load(out, allow_pickle=False)
    return (got, logs) if return_logs else got


def _assert_matches(got, ref):
    np.testing.assert_allclose(
        got["params_flat"], ref["params_flat"], rtol=1e-5, atol=1e-6)
    for k in ref:
        if k.startswith("hist_") or k in ("val_loss", "val_dice"):
            np.testing.assert_allclose(
                got[k], ref[k], rtol=1e-5, atol=1e-6, err_msg=k)
    # per-sample validation metrics, matched by filename (order-independent)
    ref_map = dict(zip(ref["record_names"].tolist(), ref["record_dice"]))
    got_map = dict(zip(got["record_names"].tolist(), got["record_dice"]))
    assert set(ref_map) == set(got_map)
    for name, dice in ref_map.items():
        np.testing.assert_allclose(got_map[name], dice, rtol=1e-5, atol=1e-6,
                                   err_msg=name)


@pytest.mark.slow  # ~4 min on the 1-core host: 2 subprocesses x full XLA compiles
def test_two_process_cluster_matches_single_process(data, tmp_path):
    """2 processes x 4 devices (Gloo collectives) == 1 process x 8 devices:
    final params, epoch history, and per-sample validation Dice all match.
    Covers global-batch assembly, cross-process grad/BN reductions, the
    replicate policy for the partial train batch, the pad+mask policy for
    the partial val batch (incl. one process holding only padding rows),
    and the per-sample allgather."""
    train, val, _ = data
    ref = worker.train_once(train, val, str(tmp_path / "ref_logs"))
    _assert_matches(_run_cluster(data, tmp_path), ref)


@pytest.mark.slow
@pytest.mark.parametrize("spatial", [2, 8])
def test_two_process_cluster_spatial(data, tmp_path, spatial):
    """Multi-host x 2-D ('data','spatial') mesh == single-process, same mesh.

    spatial=2 (data=4): per-process loader chunks on a 2-D mesh —
    batch rows AND image rows shard, halo exchanges stay intra-process.
    spatial=8 (data=1): the data axis is smaller than the process count,
    so every process loads FULL batches (train.py's fallback, mirrored in
    the worker) and the trainer slices them on device via an explicit
    global_shape; conv halo exchanges cross the process boundary (Gloo)."""
    train, val, _ = data
    ref = worker.train_once(train, val, str(tmp_path / "ref_logs"),
                            spatial=spatial)
    _assert_matches(_run_cluster(data, tmp_path, spatial=spatial), ref)


@pytest.mark.slow
def test_two_process_cluster_async_preemption(data, tmp_path):
    """SIGTERM reaching ONE process mid-epoch stops the WHOLE cluster
    cleanly: the collective stop check (Trainer._check_stop) OR-reduces
    the flag so both processes leave the step loop at the same batch —
    no desynchronized collectives, a preemption checkpoint is written,
    and every process holds the identical final state."""
    train, val, _ = data
    got0, logs = _run_cluster(
        data, tmp_path,
        extra_args={0: ["--preempt_at_step", "2"]},  # process 0 only
        return_logs=True)
    got1 = np.load(str(tmp_path / "cluster_s1.p1.npz"), allow_pickle=False)
    # training actually stopped early (1 partial epoch, not the full 2)
    assert got0["hist_train_losses"].shape[0] == 1
    # both processes agreed on the stop and hold bit-identical state
    np.testing.assert_array_equal(got0["params_flat"], got1["params_flat"])
    assert "Preemption checkpoint saved" in logs[0]
    ckpts = os.listdir(str(tmp_path / "mh_logs_s1_0" / "checkpoints"))
    assert any(c.startswith("checkpoint_epoch_") for c in ckpts), ckpts


@pytest.mark.slow
def test_two_process_cluster_grad_accum_spatial(data, tmp_path):
    """The most loaded combination: gradient accumulation (microbatch
    reshape + pinned shardings) x 2-D data x spatial mesh x multi-host.
    The round-3 grad-accum/2-D-mesh miscompile fix must hold when the
    mesh spans processes: cluster == single-process, same mesh."""
    train, val, _ = data
    ref = worker.train_once(train, val, str(tmp_path / "ref_logs"),
                            spatial=2, grad_accum=2)
    got = _run_cluster(data, tmp_path, spatial=2,
                       extra_args={0: ["--grad_accum", "2"],
                                   1: ["--grad_accum", "2"]})
    _assert_matches(got, ref)


@pytest.mark.slow
def test_two_process_cluster_inference(data, tmp_path):
    """Pod serving: `inference.py --multihost` shards the file list across
    processes (each serving on its own local devices), writes artifacts to
    the shared output dir, and the primary merges the eval CSV — outputs
    and metrics identical to the single-process run."""
    import csv

    import jax
    import yaml

    from dfc_sa_unet_tpu.models.factory import ModelFactory
    from dfc_sa_unet_tpu.utils import checkpoint as ckpt_util

    train, val, _ = data
    cfg = worker._config(train, val, str(tmp_path / "unused"))
    cfg["model"].update(name="UNet_Baseline", in_channels=3, out_channels=1,
                        features=[8, 16, 24, 32])
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    model = ModelFactory.get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 16, 16, 3), np.float32))
    ckpt = str(tmp_path / "best_model")
    ckpt_util.save_pytree(ckpt, {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    })

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    base = [sys.executable, os.path.join(REPO, "inference.py"),
            "--config", cfg_path, "--model", ckpt, "--input", val,
            "--no_slide_window", "--batch_size", "4"]

    ref_out = str(tmp_path / "ref_out")
    r = subprocess.run(base + ["--output", ref_out], env=env, cwd=REPO,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]

    mh_out = str(tmp_path / "mh_out")
    port = _free_port()
    procs = [
        subprocess.Popen(
            base + ["--output", mh_out, "--multihost",
                    "--coordinator", f"localhost:{port}",
                    "--num_processes", "2", "--process_id", str(p)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for p in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"server {p.args[-1]} failed:\n{log[-4000:]}"

    def read_csv(d):
        with open(os.path.join(d, "evaluation_metrics.csv"), newline="") as f:
            return list(csv.DictReader(f))

    ref_rows, mh_rows = read_csv(ref_out), read_csv(mh_out)
    assert [r["file"] for r in mh_rows] == [r["file"] for r in ref_rows]
    for rr, mr in zip(ref_rows, mh_rows):
        for k, v in rr.items():
            if k == "file":
                continue
            np.testing.assert_allclose(float(mr[k]), float(v), rtol=1e-6,
                                       err_msg=f"{rr['file']}:{k}")
    # artifact sets match file-for-file, bytes included (same math, same
    # encoder); every image appears exactly once despite the sharding
    ref_files = sorted(os.listdir(ref_out))
    assert sorted(os.listdir(mh_out)) == ref_files
    for name in ref_files:
        if name.endswith(".png"):
            with open(os.path.join(ref_out, name), "rb") as a, \
                 open(os.path.join(mh_out, name), "rb") as b:
                assert a.read() == b.read(), name


@pytest.mark.slow
def test_two_process_cluster_resume(data, tmp_path):
    """Pod-scale preemption/resume: train epoch 1 in the cluster, tear the
    Trainer down, resume every process from the primary's checkpoint
    (shared log dir) — the final state matches an uninterrupted straight
    2-epoch single-process run: params, history, per-sample Dice."""
    train, val, _ = data
    ref = worker.train_once(train, val, str(tmp_path / "ref_logs"))
    _assert_matches(_run_cluster(data, tmp_path, split_resume=True), ref)
