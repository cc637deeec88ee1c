"""bench.py driver contract: a valid JSON headline must ALWAYS land.

Round 3's regression: the default path compiled the int8 engine first
and printed nothing until everything finished — a slow tunnel compile
blew the driver budget with zero output (BENCH_r03.json rc=124).  The
reworked contract (these tests pin it):

  * the plain module path's JSON line is printed and flushed BEFORE any
    int8 upgrade attempt;
  * the upgrade runs in a timeout-bounded subprocess; timeout/failure/
    slower-than-module results leave the module line as the last line;
  * a winning upgrade prints a second line (the driver parses the last);
  * when phase 1 already consumed most of the budget (cold compile),
    the upgrade is skipped entirely;
  * forced --int8 surfaces failures as a value-0 record (no silent
    module-path numbers).

main()'s control flow is exercised with a stubbed build_chained and a
stubbed subprocess runner (the real engine/module paths are covered by
test_quant*.py / test_engine.py).
"""

import json
import sys

import jax.numpy as jnp
import pytest

import bench


def _tiny_build(int8_behavior):
    """build_chained stub: module path works; int8 path misbehaves per
    `int8_behavior` ('build' raises at build time, 'run' at first call)."""

    def build(model_name, dtype, use_pallas, batch, k, size=224, engine=False, int8=False,
              pool_size=8):
        if int8 and int8_behavior == "build":
            raise RuntimeError("synthetic build failure")

        x = jnp.zeros((batch, 4, 4, 3), jnp.uint8)

        def fn(variables, x_u8):
            if int8 and int8_behavior == "run":
                raise RuntimeError("synthetic first-run failure")
            return jnp.float32(1.0)

        return fn, {}, x

    return build


BASE_ARGV = ["bench.py", "--batch", "2", "--k", "1", "--repeats", "1",
             "--no_exe_cache"]


def _records(text):
    return [json.loads(ln) for ln in text.strip().splitlines() if ln.startswith("{")]


def test_module_line_lands_before_upgrade_attempt(monkeypatch, capsys):
    """The headline is already on stdout when the int8 subprocess starts —
    the driver gets a parseable line even if the child then hangs/crashes."""
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    at_attempt = {}

    def fake_sub(batch, k, repeats, timeout_s, exe_cache):
        at_attempt["stdout"] = capsys.readouterr().out
        at_attempt["timeout_s"] = timeout_s
        return {"metric": "DFC-SA-Res-Block ... (int8-composed engine)",
                "value": 1e12, "unit": "images/sec", "vs_baseline": 0.4995,
                "batch": batch, "device": "stub"}

    monkeypatch.setattr(bench, "_run_int8_subprocess", fake_sub)
    monkeypatch.setattr(sys, "argv", BASE_ARGV)
    bench.main()

    before = _records(at_attempt["stdout"])
    assert len(before) == 1 and before[0]["value"] > 0, at_attempt
    assert "int8" not in before[0]["metric"]
    assert at_attempt["timeout_s"] > 0
    after = _records(capsys.readouterr().out)
    assert after[-1]["value"] == 1e12 and "int8" in after[-1]["metric"]


@pytest.mark.parametrize("sub_result", [None, {"value": 0.5, "metric": "int8"}])
def test_failed_or_slower_upgrade_keeps_module_headline(monkeypatch, capsys, sub_result):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    monkeypatch.setattr(bench, "_run_int8_subprocess",
                        lambda *a, **kw: sub_result)
    monkeypatch.setattr(sys, "argv", BASE_ARGV)
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert len(recs) == 1, recs
    assert recs[0]["value"] > 0 and "int8" not in recs[0]["metric"]


def test_budget_exhausted_skips_upgrade(monkeypatch, capsys):
    """Slow phase 1 (cold compile) must not trigger phase 2 at all."""
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    called = []
    monkeypatch.setattr(bench, "_run_int8_subprocess",
                        lambda *a, **kw: called.append(1))
    # budget 0: phase 1 has by definition consumed >60% of it
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--budget", "0"])
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert len(recs) == 1 and recs[0]["value"] > 0
    assert not called


def test_module_phase_failure_still_prints_a_line(monkeypatch, capsys):
    def broken_build(*a, **kw):
        raise RuntimeError("synthetic module failure")

    monkeypatch.setattr(bench, "build_chained", broken_build)
    monkeypatch.setattr(bench, "_run_int8_subprocess", lambda *a, **kw: None)
    monkeypatch.setattr(sys, "argv", BASE_ARGV)
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert len(recs) == 1 and recs[0]["value"] == 0.0


def test_bench_forced_int8_does_not_fall_back(monkeypatch, capsys):
    # forced --int8 must surface the failure (no silent module-path
    # numbers): the headline reads 0 rather than lying
    monkeypatch.setattr(bench, "build_chained", _tiny_build("build"))
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--int8"])
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert recs[-1]["value"] == 0.0 and "int8" in recs[-1]["metric"]


def test_forced_int8_success_is_reported_as_int8(monkeypatch, capsys):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--int8"])
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert recs[-1]["value"] > 0 and "int8" in recs[-1]["metric"]


def test_zoo_emits_per_family_lines_and_artifact(monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    out = tmp_path / "BENCH_ZOO.json"
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--zoo", "--zoo_out", str(out)])
    bench.main()
    recs = _records(capsys.readouterr().out)
    # one line per ZOO_PATHS row + the repeated flagship headline
    assert len(recs) == len(bench.ZOO_FAST) + 1
    assert recs[-1]["metric"].startswith("DFC-SA-Res-Block")
    names = {r["metric"] for r in recs[:-1]}
    assert any("VisionTransformerSegmentation" in n and "int8" in n for n in names)
    assert any("TransformerUNet" in n and "int8" not in n for n in names)
    saved = json.loads(out.read_text())
    assert len(saved) == len(bench.ZOO_FAST)


def test_zoo_family_failure_is_skipped_not_fatal(monkeypatch, capsys, tmp_path):
    base = _tiny_build("none")

    def build(model_name, *a, **kw):
        if model_name == "UNet":
            raise RuntimeError("synthetic family failure")
        return base(model_name, *a, **kw)

    monkeypatch.setattr(bench, "build_chained", build)
    out = tmp_path / "BENCH_ZOO.json"
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--zoo", "--zoo_out", str(out)])
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert len(recs) == len(bench.ZOO_FAST)  # one family dropped, +1 headline
    assert recs[-1]["metric"].startswith("DFC-SA-Res-Block")


def test_zoo_full_tier_adds_ablations_and_pool_sweep(monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    out = tmp_path / "BENCH_ZOO.json"
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--zoo", "full", "--zoo_out", str(out)])
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert len(recs) == len(bench.ZOO_FAST) + len(bench.ZOO_FULL_EXTRA) + 1
    names = {r["metric"] for r in recs}
    assert any("UNet_BothStandardConv" in n for n in names)
    assert any("(p32)" in n for n in names)
    # full-res A/B: lax + pallas rows at 64x64
    fr = [n for n in names if "UNet_FullResAttention 64x64" in n]
    assert len(fr) == 2 and any("(pallas)" in n for n in fr)
    # the flagship headline excludes pool-sweep rows
    assert recs[-1]["metric"].startswith("DFC-SA-Res-Block") and "(p" not in recs[-1]["metric"]


def test_zoo_rejects_conflicting_single_path_flags(monkeypatch, capsys):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--zoo", "--fp32"])
    with pytest.raises(SystemExit):
        bench.main()


def test_records_carry_spread_and_vs_sol(monkeypatch, capsys):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--repeats", "3", "--module"])
    bench.main()
    rec = _records(capsys.readouterr().out)[-1]
    assert rec["n"] == 3 and len(rec["samples"]) == 3
    assert rec["min"] <= rec["median"] <= rec["max"]
    assert rec["n_sessions"] == 1
    # flagship is censused -> vs_sol against the 1,181 img/s ceiling
    assert rec["vs_sol"] == round(rec["value"] / 1181.0, 4)


def test_zoo_merge_accumulates_sessions(monkeypatch, capsys, tmp_path):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    out = tmp_path / "BENCH_ZOO.json"
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--zoo", "--zoo_out", str(out)])
    bench.main()
    capsys.readouterr()
    first = json.loads(out.read_text())
    monkeypatch.setattr(sys, "argv",
                        BASE_ARGV + ["--zoo", "--zoo_merge", "--zoo_out", str(out)])
    bench.main()
    capsys.readouterr()
    merged = json.loads(out.read_text())
    assert len(merged) == len(first)
    for rec in merged:
        assert rec["n_sessions"] == 2
        assert rec["n"] == 2 * first[0]["n"]
        assert rec["min"] <= rec["median"] <= rec["max"]
    # vs_sol recomputed against the merged best for censused families
    flag = [r for r in merged if r["metric"].startswith("DFC-SA-Res-Block")
            and "int8" not in r["metric"]][0]
    assert flag["vs_sol"] == round(flag["value"] / 1181.0, 4)


def test_warm_mode_runs_module_and_int8_unbudgeted(monkeypatch, capsys):
    monkeypatch.setattr(bench, "build_chained", _tiny_build("none"))
    monkeypatch.setattr(sys, "argv", BASE_ARGV + ["--warm", "--budget", "0"])
    bench.main()
    recs = _records(capsys.readouterr().out)
    assert len(recs) == 2
    assert "int8" not in recs[0]["metric"] and "int8" in recs[1]["metric"]
