"""Import shims for running the reference checkout's Python on this image.

The reference pins torch 2.0-era deps; this image lacks torchvision, timm,
omegaconf, webdataset and ships a newer transformers. These stubs satisfy
module-level imports only -- tests exercise reference code paths that never
call into the stubbed symbols."""

import importlib.machinery as machinery
import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


class _T:  # no-op transform
    def __init__(self, *a, **k):
        pass

    def __call__(self, x):
        return x


def ensure_reference_importable():
    if REF not in sys.path:
        sys.path.insert(0, REF)

    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.transforms = _stub("torchvision.transforms", Compose=_T,
                              Normalize=_T, Resize=_T, CenterCrop=_T,
                              ToTensor=_T, InterpolationMode=type(
                                  "InterpolationMode", (),
                                  {"BICUBIC": 3, "BILINEAR": 2}))
        tv.transforms.functional = _stub(
            "torchvision.transforms.functional")
    if "omegaconf" not in sys.modules:
        _stub("omegaconf", OmegaConf=type("OmegaConf", (), {}))
    if "timm" not in sys.modules:
        _stub("timm")
        _stub("timm.models", hub=None)
        _stub("timm.models.hub", download_cached_file=lambda *a, **k: None)
    if "webdataset" not in sys.modules:
        _stub("webdataset", warn_and_continue=lambda *a, **k: None,
              DataPipeline=type("DataPipeline", (), {}),
              ResampledShards=_T, tarfile_to_samples=lambda *a, **k: None,
              shuffle=lambda *a, **k: None, decode=lambda *a, **k: None,
              to_tuple=lambda *a, **k: None, map=lambda *a, **k: None)
    if "decord" not in sys.modules:
        _stub("decord")

    # symbols newer transformers removed but the 4.30-era reference imports
    import transformers.generation.logits_process as lp
    if not hasattr(lp, "ForceTokensLogitsProcessor"):
        lp.ForceTokensLogitsProcessor = lp.ForcedBOSTokenLogitsProcessor
    import transformers.generation.stopping_criteria as sc
    if not hasattr(sc, "validate_stopping_criteria"):
        sc.validate_stopping_criteria = lambda c, m: c
