"""Training CLI (reference train.py:31-86 semantics, hydra-free).

Usage:
    python train.py [group=name ...] [dotted.key=value ...]
e.g.
    python train.py exp=maestro22k_8s dset=maestro_allyears model_dir=experiments/a
"""
import sys


def _main(args) -> int:
    import jax

    from aid_tpu import setup as asetup
    from aid_tpu.parallel.mesh import init_distributed
    from aid_tpu.utils.xla import enable_compile_cache

    init_distributed(bool(args.exp.mesh.get("distributed", False)))
    enable_compile_cache()

    if bool(args.get("dry_run", False)):
        import yaml
        print(yaml.safe_dump(args.to_dict(), sort_keys=False))
        return 0

    if bool(args.exp.get("debug_nans", False)):
        jax.config.update("jax_debug_nans", True)

    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}",
          flush=True)
    diff_params = asetup.setup_diff_parameters(args)
    network = asetup.setup_network(args)
    dset = asetup.setup_dataset(args)
    try:
        test_set = asetup.setup_dataset_test(args)
    except Exception as e:
        print(f"[train] no test set ({e}); heavy logging disabled")
        test_set = None
    tester = None
    if test_set is not None:
        try:
            tester = asetup.setup_tester(args, network=network,
                                         diff_params=diff_params,
                                         test_set=test_set, in_training=True)
        except Exception as e:
            print(f"[train] tester disabled: {e}")
    trainer = asetup.setup_trainer(args, dset=dset, network=network,
                                   diff_params=diff_params, tester=tester)
    final_it = trainer.training_loop()
    print(f"done at iteration {final_it}")
    return 0


def main() -> int:
    from aid_tpu.utils.config import compose
    overrides = sys.argv[1:]
    args = compose(overrides=overrides)
    # Flagship training on one 15.75G chip needs rematerialization to fit
    # (18.3G live without remat); sampling keeps remat=False for a faster
    # guidance backprop, so the network configs default it off. The train
    # entry flips it on unless the user explicitly chose.
    if not any(o.startswith("network.remat=") for o in overrides):
        args.network["remat"] = True
    return _main(args)


if __name__ == "__main__":
    raise SystemExit(main())
