"""Import the *actual* reference implementation as a numeric oracle.

The reference at /root/reference is pure torch but imports omegaconf, kornia,
torchvision and (for the vendored SiLK tree) pytorch_lightning/skimage — none
of which exist in this environment. Everything the live surface actually
*calls* from those packages is tiny (DictConfig/OmegaConf.merge, a bilinear
resize, rgb_to_grayscale, a lightning base class), so we install ~120 lines
of faithful stubs into sys.modules and import the genuine reference modules
unmodified. Parity tests (tests/test_reference_parity.py) then compare this
framework's jax modules against the real reference code, module by module,
with weights ported both directions — the SURVEY §7.6 correctness gate.

Stub fidelity notes (each maps to the single call site that uses it):
- torchvision resize -> F.interpolate(mode="bilinear", align_corners=False):
  exactly what torchvision.transforms.functional.resize does on tensors with
  antialias disabled; the reference only ever *up*samples (descriptor_util
  upsample_descriptors), where antialias is a no-op anyway.
- OmegaConf.merge: recursive dict merge returning attribute-access dicts —
  the only omegaconf behavior lightglue.py:449 relies on.
- kornia.color.rgb_to_grayscale: ITU-R 601 weights, same as kornia.
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = "/root/reference"


class DictConfig(dict):
    """Attribute-access dict, recursively wrapping nested dicts."""

    def __init__(self, d=None, **kw):
        super().__init__()
        d = dict(d or {}, **kw)
        for k, v in d.items():
            self[k] = _wrap(v)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = _wrap(v)

    def get(self, k, default=None):
        return dict.get(self, k, default)


class ListConfig(list):
    pass


def _wrap(v):
    if isinstance(v, DictConfig):
        return v
    if isinstance(v, dict):
        return DictConfig(v)
    if isinstance(v, (list, tuple)):
        return type(v)(_wrap(x) for x in v)
    return v


def _deep_merge(dst: dict, src: dict) -> dict:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_merge(dst[k], v)
        else:
            dst[k] = _wrap(v)
    return dst


class OmegaConf:
    @staticmethod
    def create(d=None):
        return DictConfig(d or {})

    @staticmethod
    def merge(*cfgs):
        out = DictConfig()
        for c in cfgs:
            _deep_merge(out, dict(c))
        return out

    @staticmethod
    def to_container(cfg, resolve=True):
        def unwrap(v):
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, (list, tuple)):
                return [unwrap(x) for x in v]
            return v
        return unwrap(cfg)


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


_installed = False


def ensure() -> None:
    """Install dependency stubs + reference sys.path (idempotent)."""
    global _installed
    if _installed:
        return
    import torch
    import torch.nn.functional as F

    if "omegaconf" not in sys.modules:
        om = _module("omegaconf")
        om.DictConfig = DictConfig
        om.ListConfig = ListConfig
        om.OmegaConf = OmegaConf
        om.Node = object

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tvt = _module("torchvision.transforms")
        tvf = _module("torchvision.transforms.functional")
        tv.transforms = tvt
        tvt.functional = tvf

        class InterpolationMode:
            BILINEAR = "bilinear"
            NEAREST = "nearest"
            BICUBIC = "bicubic"

        def resize(img, size, interpolation=InterpolationMode.BILINEAR,
                   antialias=None):
            mode = getattr(interpolation, "value", interpolation)
            align = False if mode in ("bilinear", "bicubic") else None
            if isinstance(size, int):
                size = (size, size)
            return F.interpolate(img, size=tuple(int(s) for s in size),
                                 mode=mode, align_corners=align)

        tvf.InterpolationMode = InterpolationMode
        tvf.resize = resize

    if "kornia" not in sys.modules:
        ko = _module("kornia")
        kc = _module("kornia.color")
        kg = _module("kornia.geometry")
        kgt = _module("kornia.geometry.transform")
        ko.color = kc
        ko.geometry = kg
        kg.transform = kgt

        def rgb_to_grayscale(image: "torch.Tensor") -> "torch.Tensor":
            r, g, b = image.unbind(dim=-3)
            gray = 0.299 * r + 0.587 * g + 0.114 * b
            return gray.unsqueeze(-3)

        def k_resize(img, size, **kw):
            return sys.modules["torchvision.transforms.functional"].resize(
                img, size)

        kc.rgb_to_grayscale = rgb_to_grayscale
        kgt.resize = k_resize

    if "loguru" not in sys.modules:
        lo = _module("loguru")

        class _Logger:
            def __getattr__(self, name):
                def call(*a, **kw):
                    # tolerate decorator-style usage (logger.catch)
                    if len(a) == 1 and callable(a[0]) and not kw:
                        return a[0]
                    return self
                return call

        lo.logger = _Logger()
        lod = _module("loguru._defaults")
        lod.LOGURU_FORMAT = "{message}"
        lo._defaults = lod

    if "hydra" not in sys.modules:
        hy = _module("hydra")
        hyu = _module("hydra.utils")
        hy.utils = hyu

        def instantiate(cfg, *a, **kw):
            raise NotImplementedError(
                "hydra.utils.instantiate stub — not used by the live surface")

        hyu.instantiate = instantiate
        hyu.get_class = instantiate

    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning")

        class LightningModule(torch.nn.Module):
            pass

        pl.LightningModule = LightningModule
        plu = _module("pytorch_lightning.utilities")
        plc = _module("pytorch_lightning.utilities.cloud_io")
        pl.utilities = plu
        plu.cloud_io = plc
        plc.load = lambda path, map_location=None: torch.load(
            path, map_location=map_location, weights_only=False)

    if "skimage" not in sys.modules:
        sk = _module("skimage")
        ski = _module("skimage.io")
        sk.io = ski

        def imread(path):
            import cv2
            import numpy as np
            img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
            if img is None:
                raise FileNotFoundError(path)
            if img.ndim == 3:
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            return np.asarray(img)

        ski.imread = imread

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


def random_superpoint_state_dict(seed: int = 0):
    """Seeded random state dict with the exact SuperPointv1 layer shapes, used
    to monkeypatch torch.hub.load_state_dict_from_url (the reference
    unconditionally downloads at superpoint_extractor.py:316-317)."""
    import torch
    g = torch.Generator().manual_seed(seed)
    shapes = {
        "conv1a": (64, 1), "conv1b": (64, 64),
        "conv2a": (64, 64), "conv2b": (64, 64),
        "conv3a": (128, 64), "conv3b": (128, 128),
        "conv4a": (128, 128), "conv4b": (128, 128),
    }
    sd = {}
    # Kaiming-ish fan-in scaling: keeps activation variance alive through
    # the 8-conv relu trunk so random-weight detections are non-degenerate
    # (flat score maps tie at the top-k quantile and zero out detections).
    for name, (co, ci) in shapes.items():
        std = (2.0 / (ci * 9)) ** 0.5
        sd[f"{name}.weight"] = torch.randn(co, ci, 3, 3, generator=g) * std
        sd[f"{name}.bias"] = torch.randn(co, generator=g) * 0.05
    for name, (co, ci, k) in {
        "convPa": (256, 128, 3), "convPb": (65, 256, 1),
        "convDa": (256, 128, 3), "convDb": (256, 256, 1),
    }.items():
        std = (2.0 / (ci * k * k)) ** 0.5
        sd[f"{name}.weight"] = torch.randn(co, ci, k, k, generator=g) * std
        sd[f"{name}.bias"] = torch.randn(co, generator=g) * 0.05
    return sd
