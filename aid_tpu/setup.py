"""Component factories: config tree -> constructed objects.

Capability parity with reference utils/setup.py:10-76 — configs carry
``callable:`` strings, factories resolve them through the registry, so the
config system stays the dependency-injection mechanism (SURVEY.md L7 note).
"""
from __future__ import annotations

from typing import Any, Optional

from aid_tpu.utils.registry import call_func_by_name


def setup_dataset(args) -> Any:
    """Infinite training-batch iterator (reference setup.py:10-27 wraps an
    IterableDataset in a torch DataLoader; here loaders are plain Python
    iterators yielding (audio [B,T] numpy, fs [B]))."""
    from aid_tpu.data.loader import MultiProcessLoader, make_train_loader
    nw = int(args.exp.get("num_workers", 0))
    if nw > 0:
        # reference DataLoader num_workers parity (utils/setup.py:10-27):
        # spawned decode subprocesses, batches in completion order
        return MultiProcessLoader(args, str(args.dset.callable),
                                  int(args.exp.batch), nw)
    ds = call_func_by_name(args, func_name=args.dset.callable)
    return make_train_loader(iter(ds), int(args.exp.batch))


def setup_dataset_test(args) -> Any:
    """Finite test set yielding (audio, fs, filename) tuples
    (reference setup.py:29-38)."""
    ds = call_func_by_name(args, func_name=args.dset.test.callable)
    return ds


def setup_diff_parameters(args) -> Any:
    """EDM object (reference setup.py:40-44)."""
    return call_func_by_name(args, func_name=args.diff_params.callable)


def setup_network(args, device=None) -> Any:
    """NetBundle wrapping the flax module (reference setup.py:46-53 returns the
    torch module .to(device); device placement is implicit in JAX)."""
    from aid_tpu.models.bundle import NetBundle
    module = call_func_by_name(args, func_name=args.network.callable)
    return NetBundle(module=module, name=args.network.get("name", "net"))


def setup_tester(args, network=None, diff_params=None, test_set=None,
                 device=None, in_training=False) -> Optional[Any]:
    """Tester (reference setup.py:60-68; returns None when do_test is off)."""
    if not bool(args.tester.get("do_test", True)) and not in_training:
        return None
    return call_func_by_name(args=args, network=network,
                             diff_params=diff_params, test_set=test_set,
                             in_training=in_training,
                             func_name=args.tester.callable)


def setup_trainer(args, dset=None, network=None, diff_params=None,
                  tester=None, device=None) -> Any:
    """Trainer (reference setup.py:70-76)."""
    return call_func_by_name(args, dset, network, diff_params, tester, device,
                             func_name=args.exp.trainer_callable)


def setup_sampler(args, network=None, diff_params=None, rid=False) -> Any:
    """Sampler facade (reference tester_inpainting.py:165-167)."""
    return call_func_by_name(network, diff_params, args, rid,
                             func_name=args.tester.sampler_callable)
