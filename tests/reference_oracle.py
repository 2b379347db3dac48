"""Import the PyTorch reference (/root/reference) as a numerical oracle.

The reference depends on GPU-era packages that are absent from this image
(torchvision, decord, ftfy, ipdb, fvcore, oss2, pkg_resources).  None of
them participate in the numerics we compare against — they are stubbed
with inert placeholders so ``models.base.few_shot`` imports on CPU torch.

Everything here is test-support code: the framework itself never imports
the reference.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


def _module(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__path__ = []  # mark as package so submodule imports resolve
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


class _Inert:
    """Callable/attribute sink for stubbed APIs that must never run."""

    def __init__(self, label: str):
        self._label = label

    def __call__(self, *a, **k):
        raise RuntimeError(f"stubbed reference dependency used at runtime: {self._label}")

    def __getattr__(self, item):
        return _Inert(f"{self._label}.{item}")


def _install_stubs() -> None:
    if "torchvision" in sys.modules and not hasattr(sys.modules["torchvision"], "__parity_stub__"):
        return  # real torchvision present somehow

    tv = _module("torchvision", __parity_stub__=True)

    def _fake_resnet(**kw):
        # CNN_FSHead slices children()[:-1]; tests replace .backbone anyway
        import torch.nn as nn

        return nn.Sequential(nn.Identity(), nn.Identity())

    tv.models = _module("torchvision.models", resnet18=_fake_resnet, resnet34=_fake_resnet, resnet50=_fake_resnet)
    tv.utils = _module("torchvision.utils", make_grid=_Inert("make_grid"), save_image=_Inert("save_image"))

    class _InterpolationMode:
        BICUBIC = "bicubic"
        BILINEAR = "bilinear"

    # Lambda/Compose are real (the reference ColorJitter executes them)
    class _Lambda:
        def __init__(self, fn):
            self.fn = fn

        def __call__(self, x):
            return self.fn(x)

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    tv.transforms = _module(
        "torchvision.transforms",
        Compose=_Compose,
        Lambda=_Lambda,
        Resize=_Inert("Resize"),
        CenterCrop=_Inert("CenterCrop"),
        ToTensor=_Inert("ToTensor"),
        Normalize=_Inert("Normalize"),
        InterpolationMode=_InterpolationMode,
    )
    tv.transforms.functional = _module("torchvision.transforms.functional")
    tv.transforms._functional_video = _module("torchvision.transforms._functional_video", resized_crop=_Inert("resized_crop"))
    tv.transforms._transforms_video = _module("torchvision.transforms._transforms_video")

    if "ipdb" not in sys.modules:
        _module("ipdb", set_trace=lambda: None)
    if "ftfy" not in sys.modules:
        # class names are plain ASCII; fix_text is the identity for them
        _module("ftfy", fix_text=lambda s: s)
    if "pkg_resources" not in sys.modules:
        class _Version:
            def __init__(self, s):
                self.key = tuple(int(p) for p in str(s).split("+")[0].split(".")[:3] if p.isdigit())

            def __lt__(self, other):
                return self.key < other.key

        packaging = types.SimpleNamespace(version=types.SimpleNamespace(parse=_Version))
        _module("pkg_resources", packaging=packaging)
    # NOTE: decord is deliberately NOT stubbed — the model tree never
    # imports it, and a fake sys.modules entry would leak into the
    # framework's own optional-dependency probes in other tests.  oss2 is
    # stubbed (reference utils.checkpoint -> utils.bucket imports it) but
    # carries __parity_stub__ so our storage backend detection skips it.
    if "oss2" not in sys.modules:
        _module("oss2", Auth=_Inert("Auth"), Bucket=_Inert("Bucket"), __parity_stub__=True)
    if "fvcore" not in sys.modules:
        _module("fvcore")
        _module("fvcore.nn", FlopCountAnalysis=_Inert("FlopCountAnalysis"), ActivationCountAnalysis=_Inert("ActivationCountAnalysis"), flop_count=_Inert("flop_count"), activation_count=_Inert("activation_count"))


def _patch_cuda_to_cpu() -> None:
    """Make .cuda() a no-op so reference modules run on CPU."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self


_FEW_SHOT = None


def import_reference_few_shot():
    """Returns the reference ``models.base.few_shot`` module (cached)."""
    global _FEW_SHOT
    if _FEW_SHOT is not None:
        return _FEW_SHOT
    _install_stubs()
    _patch_cuda_to_cpu()
    if REFERENCE_ROOT not in sys.path:
        # after repo paths so our own packages win name clashes
        sys.path.append(REFERENCE_ROOT)
    import models.base.few_shot as few_shot  # noqa: E402

    _FEW_SHOT = few_shot
    return few_shot


class NS:
    """Minimal attribute namespace with reference hasattr semantics:
    a key is either set or absent (absence is load-bearing for the
    hasattr(cfg.TRAIN, ...) feature gates)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def make_reference_cfg(
    backbone_name: str,
    class_names_train,
    class_names_test,
    num_frames: int,
    way: int = 5,
    shot: int = 1,
    **train_flags,
):
    """cfg namespace accepted by reference CNN_OTAM_CLIPFSAR.__init__/forward."""
    train = NS(
        CLASS_NAME=list(class_names_train),
        WAY=way,
        SHOT=shot,
        DDP_GPU=1,
        **train_flags,
    )
    return NS(
        VIDEO=NS(HEAD=NS(BACKBONE_NAME=backbone_name)),
        TRAIN=train,
        TEST=NS(CLASS_NAME=list(class_names_test)),
        DATA=NS(NUM_INPUT_FRAMES=num_frames),
    )


def zero_dropout(module) -> None:
    """Set p=0 on every nn.Dropout so train-mode forward is deterministic."""
    import torch.nn as nn

    for m in module.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
