"""The driver contract: bench.py prints ONE JSON line with the agreed keys.

Runs the real bench.py in a subprocess on the CPU backend (small shapes);
a broken import, a renamed key, or a non-JSON print would otherwise only
surface when the round's benchmark is recorded.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_prints_one_json_line():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, timeout=600, check=True,
    ).stdout
    json_lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    assert len(json_lines) == 1, out
    d = json.loads(json_lines[0])
    assert d["metric"] == "inference_sites_per_sec"
    assert d["unit"] == "sites/s"
    assert d["value"] > 0 and d["vs_baseline"] > 0
