"""bench.py's default int8 path must degrade to the module path, never 0.

The driver runs `python bench.py` at the end of every round; if the
Int8DFCEngine fails on the real backend at build, compile, or first-run
time, the headline must come from the plain module path instead of being
reported as 0 img/s.  These tests exercise main()'s fallback control flow
with a stubbed build_chained (the real engine/module paths are covered by
test_quant.py / test_engine.py).
"""

import json
import sys

import jax.numpy as jnp
import pytest

import bench


def _tiny_build(int8_behavior):
    """A build_chained stub: module path returns a working chained fn;
    int8 path misbehaves per `int8_behavior` ('build' raises at build time,
    'run' raises at first call)."""

    def build(model_name, dtype, use_pallas, batch, k, size=224, engine=False, int8=False):
        if int8 and int8_behavior == "build":
            raise RuntimeError("synthetic build failure")

        x = jnp.zeros((batch, 4, 4, 3), jnp.uint8)

        def fn(variables, x_u8):
            if int8 and int8_behavior == "run":
                raise RuntimeError("synthetic first-run failure")
            return jnp.float32(1.0)

        return fn, {}, x

    return build


def _run_main(monkeypatch, capsys, argv, int8_behavior):
    monkeypatch.setattr(bench, "build_chained", _tiny_build(int8_behavior))
    monkeypatch.setattr(sys, "argv", ["bench.py", "--batch", "2", "--k", "1",
                                      "--repeats", "1"] + argv)
    bench.main()
    out = [l for l in capsys.readouterr().out.strip().splitlines() if l.startswith("{")]
    return json.loads(out[-1])


@pytest.mark.parametrize("behavior", ["build", "run"])
def test_bench_int8_failure_falls_back_to_module(monkeypatch, capsys, behavior):
    rec = _run_main(monkeypatch, capsys, [], behavior)
    assert rec["value"] > 0, rec
    assert "int8" not in rec["metric"], rec


def test_bench_forced_int8_does_not_fall_back(monkeypatch, capsys):
    # forced --int8 must surface the failure (no silent module-path numbers):
    # the batch is skipped and the headline reads 0 rather than lying
    rec = _run_main(monkeypatch, capsys, ["--int8"], "build")
    assert rec["value"] == 0.0, rec


def test_bench_default_int8_success_is_reported_as_int8(monkeypatch, capsys):
    rec = _run_main(monkeypatch, capsys, [], "none")
    assert rec["value"] > 0, rec
    assert "int8" in rec["metric"], rec
