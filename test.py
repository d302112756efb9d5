"""Inference/evaluation CLI (reference test.py:30-83 semantics, hydra-free).

Usage:
    python test.py tester=inpainting_tester tester.checkpoint=path/to.ckpt \
                   [group=name ...] [dotted.key=value ...]

Checkpoint resolution (reference test.py:66-72): an explicit
tester.checkpoint wins; otherwise the latest checkpoint in model_dir.
Accepts both this framework's orbax .ckpt dirs and reference .pt files.
"""
import sys


def _main(args) -> int:
    import jax

    from aid_tpu import setup as asetup
    from aid_tpu.parallel.mesh import init_distributed
    from aid_tpu.utils.xla import enable_compile_cache

    init_distributed(bool(args.exp.mesh.get("distributed", False)))
    enable_compile_cache()

    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}",
          flush=True)
    diff_params = asetup.setup_diff_parameters(args)
    network = asetup.setup_network(args)
    network.init(jax.random.PRNGKey(0), 1, int(args.exp.audio_len))
    test_set = asetup.setup_dataset_test(args)
    tester = asetup.setup_tester(args, network=network, diff_params=diff_params,
                                 test_set=test_set)
    if tester is None:
        print("tester.do_test is False; nothing to do")
        return 0

    ckpt = str(args.tester.get("checkpoint") or "")
    if ckpt and ckpt != "None":
        ok = tester.load_checkpoint(ckpt)
    else:
        ok = tester.load_latest_checkpoint()
    if not ok:
        print("WARNING: no checkpoint found/loaded - running with random init")
    results = tester.dodajob()
    for mode, res in results.items():
        print(f"{mode}: {res if not isinstance(res, list) else len(res)} items "
              f"-> {tester.base_dir}")
    return 0


def main() -> int:
    from aid_tpu.utils.config import compose
    args = compose(overrides=sys.argv[1:])
    return _main(args)


if __name__ == "__main__":
    raise SystemExit(main())
