"""Host-side data-loader throughput benchmark.

Measures batches/s of the MAESTRO train pipeline (native WAV segment decode ->
batched() -> prefetch) for several worker counts, against the flagship train
step (BASELINE.md: 439 ms/step at global batch 4 => the loader must sustain
>= 9.1 segments/s per chip to stay off the critical path; multi-chip dp
multiplies that by the dp degree).

The corpus is synthetic but realistically sized (MAESTRO files are minutes
long; the loader reads random ~18 s native-rate windows via random-access
decode, reference datasets/maestro_dataset.py:84-100), so the measured cost
per segment -- open + seek + decode + copy -- matches the real corpus shape.

Usage:  python scripts/bench_loader.py [--files N] [--secs S] [--batches K]
Never imports jax (pure host path, reference DataLoader-parity benchmark).
"""
import argparse
import csv
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _signal(j: int, secs: float, fs: int, rng) -> np.ndarray:
    t = np.arange(int(secs * fs)) / fs
    f0 = 110.0 * (1 + j % 8)
    return (0.2 * np.sin(2 * np.pi * f0 * t)
            + 0.05 * rng.standard_normal(t.size)).astype(np.float32)


def make_corpus(root: str, n_files: int, secs: float, fs: int = 44100):
    from aid_tpu.data import audio_io
    rows = []
    rng = np.random.default_rng(0)
    for j in range(n_files):
        rel = f"2015/file_{j}.wav"
        os.makedirs(os.path.join(root, "2015"), exist_ok=True)
        audio_io.write(os.path.join(root, rel), _signal(j, secs, fs, rng), fs)
        rows.append({"year": 2015, "split": "train", "audio_filename": rel})
    with open(os.path.join(root, "maestro-v3.0.0.csv"), "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["year", "split", "audio_filename"])
        w.writeheader()
        w.writerows(rows)


def make_flac_corpus(root: str, n_files: int, secs: float, fs: int = 16000):
    """LibriSpeech-shaped corpus: per-speaker dirs of .flac utterances
    (decode cost is the realistic part: LPC FLAC at the corpus rate)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
    import flac_fixture
    rng = np.random.default_rng(0)
    for j in range(n_files):
        d = os.path.join(root, f"{100 + j}", "1")
        os.makedirs(d, exist_ok=True)
        flac_fixture.encode(os.path.join(d, f"{100 + j}-1-{j:04d}.flac"),
                            [_signal(j, secs, fs, rng)], fs)


def bench(args, callable_name, batch_size, num_workers, n_batches):
    from aid_tpu.data.loader import MultiProcessLoader, make_train_loader
    from aid_tpu.utils.registry import call_func_by_name
    if num_workers > 0:
        it = MultiProcessLoader(args, callable_name, batch_size, num_workers)
    else:
        ds = call_func_by_name(args, func_name=callable_name)
        it = make_train_loader(iter(ds), batch_size)
    try:
        next(it)  # warmup: worker spawn + first decode
        t0 = time.perf_counter()
        for _ in range(n_batches):
            next(it)
        dt = time.perf_counter() - t0
    finally:
        if num_workers > 0:
            it.close()
    return n_batches / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=12)
    ap.add_argument("--secs", type=float, default=120.0)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--step-ms", type=float, default=439.0,
                    help="train-step budget to compare against (BASELINE.md)")
    ap.add_argument("--flac", action="store_true",
                    help="LibriSpeech-shaped FLAC corpus (native LPC decode) "
                         "instead of MAESTRO WAV")
    opts = ap.parse_args()

    from aid_tpu.utils.config import compose
    with tempfile.TemporaryDirectory() as root:
        kind = "flac" if opts.flac else "wav"
        print(f"generating {kind} corpus: {opts.files} files x {opts.secs:.0f}s ...")
        if opts.flac:
            make_flac_corpus(root, opts.files, opts.secs)
            overrides = ["dset=librispeech", f"dset.path={root}"]
        else:
            make_corpus(root, opts.files, opts.secs)
            overrides = ["dset=maestro_allyears", f"dset.path={root}",
                         "dset.load_len=800000"]  # ~18 s native window, ref load_len
        args = compose(overrides=overrides + [
            "logging.print_model_summary=False", "model_dir=/tmp/aid_bench_loader",
        ])
        callable_name = args.dset.callable
        need = opts.batch_size / (opts.step_ms / 1e3)
        print(f"train step budget {opts.step_ms:.0f} ms @ batch "
              f"{opts.batch_size} => need {need:.1f} segments/s\n")
        for nw in (0, 2, 4):
            bps = bench(args, callable_name, opts.batch_size, nw, opts.batches)
            sps = bps * opts.batch_size
            ok = "OK" if sps >= need else "BOTTLENECK"
            print(f"num_workers={nw}:  {bps:6.2f} batches/s  "
                  f"{sps:7.1f} segments/s  {sps / need:6.1f}x budget  [{ok}]")


if __name__ == "__main__":
    main()
