"""Host-RSS leak probe for the training loop (round-5 investigation).

The round-4 flagship run's host RSS grows ~1 GB per 2 minutes during plain
training (no checkpoint saves) and reached ~65 GB. This probe runs the SAME
loop structure (loader -> shard -> donated jitted step -> interval logging)
at tiny shapes on CPU and prints RSS every N its. A flat curve here points
the leak at the axon device client; a growing one at the loop.

Usage: JAX_PLATFORMS=cpu python scripts/probe_rss_leak.py [its] [log_every]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def main():
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    every = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    import numpy as np
    from aid_tpu import setup as asetup
    from aid_tpu.utils.config import compose

    tmp = "/tmp/probe_rss"
    os.makedirs(tmp, exist_ok=True)
    args = compose(overrides=[
        "exp=maestro22k_8s", f"model_dir={tmp}",
        "network.depth=2", "network.emb_dim=32",
        "network.Ns=[8,8]", "network.attention_layers=[0,0,1]",
        "network.num_dils=[1,1]", "network.cqt.num_octs=2",
        "network.cqt.bins_per_oct=8",
        "exp.audio_len=8192", "exp.batch=4", "exp.total_its=%d" % total,
        "exp.stall_timeout_s=0", "logging.log_interval=%d" % every,
        "logging.save_interval=1000000000",
        "logging.heavy_log_interval=1000000000",
        "logging.print_model_summary=False",
    ])

    class SynthData:
        def __iter__(self):
            rng = np.random.default_rng(0)
            while True:
                yield (rng.standard_normal((4, 16384)).astype(np.float32)
                       * 0.063, np.full((4,), 44100, np.int64))

    bundle = asetup.setup_network(args)
    ediff = asetup.setup_diff_parameters(args)
    tr = asetup.setup_trainer(args, dset=iter(SynthData()), network=bundle,
                              diff_params=ediff)
    tr.init_state()
    base = None
    for it in range(1, total + 1):
        audio, fs = tr.get_batch()
        metrics = tr.train_step(audio, fs)
        if it % every == 0:
            tr.easy_logging(metrics)  # full logging tier, incl. the png
            if os.environ.get("PROBE_TRIM"):
                tr._trim_host_heap()   # mirror training_loop's log-cadence trim
            m = rss_mb()
            if base is None:
                base = m
            print(f"it {it:5d}  RSS {m:8.1f} MB  (+{m - base:7.1f})",
                  flush=True)
    print("done")


if __name__ == "__main__":
    main()
