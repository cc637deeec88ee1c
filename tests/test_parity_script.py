"""CPU smoke for scripts/check_parity_tpu.py (VERDICT r4 item 1).

The real run happens on the TPU backend (PARITY_TPU.json artifact);
this pins the script's contract — it runs, emits the JSON schema, and
its f32 golden comparison agrees with tests/test_goldens.py.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_script_goldens_smoke(tmp_path):
    out = tmp_path / "parity.json"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single-device is fine for forwards
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_parity_tpu.py"),
         "--sections", "goldens", "--limit", "1", "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    artifact = json.loads(out.read_text())
    assert artifact["all_pass"] and artifact["n_rows"] == 2
    secs = {row["section"] for row in artifact["rows"]}
    assert secs == {"goldens_f32", "goldens_bf16"}
    for row in artifact["rows"]:
        assert {"max_abs_dprob", "flip_rate", "dice_gap", "hard_dice"} <= set(row)
        assert row["dice_gap"] <= 1e-3
