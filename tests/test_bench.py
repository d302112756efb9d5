"""bench.py must keep running end to end: the round driver executes it on
real hardware and records its one JSON line — a bitrotted bench is a silent
scoreboard failure. Runs the full script body on CPU with a tiny config."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_runs_and_prints_json(tmp_path):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "BENCH_BATCH": "1",
        "BENCH_REPS": "1",
        "BENCH_OVERRIDES": ("exp=test_cqtdiff_22k exp.audio_len=2048 "
                            "network.cqt.num_octs=3 network.cqt.bins_per_oct=8 "
                            "network.Ns=[8,8,8] network.num_dils=[1,1,1] "
                            "network.attention_layers=[0,0,0,0] "
                            "network.compute_dtype=float32 "
                            "tester.T=2 tester.order=1 "
                            f"model_dir={tmp_path}"),
    })
    out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                         capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["metric"] == "inpaint_rtf"
    assert line["unit"] == "x_realtime"
    assert line["value"] > 0
    # vs_baseline is rtf/10 computed before rounding; allow rounding slack
    assert abs(line["vs_baseline"] - line["value"] / 10.0) < 1e-3
