"""String-callable registry: configs name components, components are built from config.

Capability parity with the reference's dependency-injection mechanism
(``dnnlib.call_func_by_name`` / ``get_obj_by_name``, reference
utils/dnnlib/util.py:235-298, resolved by utils/setup.py factories): every
config group carries a ``callable:`` key naming a Python object by dotted path.
"""
from __future__ import annotations

import importlib
from typing import Any

# Aliases let configs keep reference-style callable strings while resolving to
# this package's implementations (reference conf/*/..yaml `callable:` keys).
_ALIASES = {
    "networks.unet_cqt_oct_with_projattention_adaLN_2.Unet_CQT_oct_with_attention":
        "aid_tpu.models.unet_cqt.build_unet",
    "diff_params.edm.EDM": "aid_tpu.diffusion.edm.EDM",
    "testing.tester_inpainting.Tester": "aid_tpu.testing.tester.Tester",
    "testing.tester.Tester": "aid_tpu.testing.tester.Tester",
    "testing.edm_sampler_inpainting.Sampler": "aid_tpu.sampling.sampler.Sampler",
    "testing.edm_sampler.Sampler": "aid_tpu.sampling.sampler.Sampler",
    "training.trainer.Trainer": "aid_tpu.training.trainer.Trainer",
    "datasets.maestro_dataset.MaestroDataset_fs": "aid_tpu.data.maestro.MaestroDatasetFs",
    "datasets.maestro_dataset.MaestroDataset": "aid_tpu.data.maestro.MaestroDataset",
    "datasets.maestro_dataset_test.MaestroDatasetTestChunks":
        "aid_tpu.data.maestro.MaestroDatasetTestChunks",
    "datasets.audiofolder.AudioFolderDataset": "aid_tpu.data.audiofolder.AudioFolderDataset",
    "datasets.audiofolder_test.AudioFolderDatasetTest":
        "aid_tpu.data.audiofolder.AudioFolderDatasetTest",
    "datasets.librispeech.LibrispeechTrain": "aid_tpu.data.librispeech.LibrispeechTrain",
    "datasets.librispeech.LibrispeechTest": "aid_tpu.data.librispeech.LibrispeechTest",
}


def get_obj_by_name(name: str) -> Any:
    """Resolve a dotted path (``pkg.module.Object``) to a Python object."""
    name = _ALIASES.get(name, name)
    parts = name.split(".")
    for i in range(len(parts) - 1, 0, -1):
        module_name = ".".join(parts[:i])
        try:
            module = importlib.import_module(module_name)
        except ImportError:
            continue
        obj: Any = module
        try:
            for attr in parts[i:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ImportError(f"Cannot resolve object by name: {name!r}")


def call_func_by_name(*args: Any, func_name: str, **kwargs: Any) -> Any:
    """Construct/call the object named by ``func_name`` with the given args."""
    return get_obj_by_name(func_name)(*args, **kwargs)
