"""Minimal torchvision stand-in so the reference `dataset.py` can be imported
as a parity oracle (torchvision isn't installed in this environment).

Implements just the transforms the reference `Backdoor` factory uses
(Grayscale/Resize/ToTensor/Lambda/Pad/RandomHorizontalFlip/Compose) with PIL +
torch semantics matching torchvision's defaults (bilinear+antialias resize).
"""

import sys
import types

import numpy as np
import torch
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class Lambda:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)


class Grayscale:
    def __init__(self, num_output_channels=1):
        self.n = num_output_channels

    def __call__(self, img):
        return img.convert("L")


class Resize:
    def __init__(self, size, **kwargs):
        self.size = size

    def __call__(self, img):
        if isinstance(self.size, int):
            w, h = img.size
            if w <= h:
                new = (self.size, max(1, round(h * self.size / w)))
            else:
                new = (max(1, round(w * self.size / h)), self.size)
        else:
            new = (self.size[1], self.size[0])
        return img.resize(new, Image.BILINEAR)


class ToTensor:
    def __call__(self, img):
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[None]
        else:
            arr = arr.transpose(2, 0, 1)
        return torch.from_numpy(arr.copy())


class Pad:
    def __init__(self, padding, fill=0):
        self.padding = padding  # [l, t, r, b]
        self.fill = fill

    def __call__(self, x):
        l, t, r, b = self.padding
        return torch.nn.functional.pad(x, (l, r, t, b), value=self.fill)


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, x):  # deterministic no-op for oracle use
        return x


def _unavailable_dataset(*args, **kwargs):
    raise RuntimeError("torchvision datasets unavailable offline")


class _IDXDigitDataset:
    """torchvision.datasets.MNIST-compatible reader over the raw IDX layout
    (`{root}/{folder}/raw/train-images-idx3-ubyte[.gz]`). download=True is a
    no-op when the files are already staged (offline environment)."""

    folder = None

    def __init__(self, root, train=True, download=False, transform=None):
        import os

        from baddiffusion_tpu.data.triggers import read_idx_images

        base = os.path.join(root, self.folder, "raw")
        name = "train-images-idx3-ubyte" if train else "t10k-images-idx3-ubyte"
        for fname in (name, name + ".gz"):
            path = os.path.join(base, fname)
            if os.path.exists(path):
                self.images = read_idx_images(path)
                break
        else:
            raise RuntimeError(f"no IDX files staged under {base}")
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        img = Image.fromarray(self.images[i], mode="L")
        if self.transform is not None:
            img = self.transform(img)
        return img, 0


class MNIST(_IDXDigitDataset):
    folder = "MNIST"


class FashionMNIST(_IDXDigitDataset):
    folder = "FashionMNIST"


def install():
    """Register fake torchvision modules in sys.modules."""
    import importlib.machinery

    tv = types.ModuleType("torchvision")
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
    tv.__version__ = "0.0.0-shim"
    transforms_mod = types.ModuleType("torchvision.transforms")
    for name, obj in [
        ("Compose", Compose), ("Lambda", Lambda), ("Grayscale", Grayscale),
        ("Resize", Resize), ("ToTensor", ToTensor), ("Pad", Pad),
        ("RandomHorizontalFlip", RandomHorizontalFlip),
        ("ToPILImage", _unavailable_dataset), ("CenterCrop", _unavailable_dataset),
    ]:
        setattr(transforms_mod, name, obj)
    datasets_mod = types.ModuleType("torchvision.datasets")
    datasets_mod.MNIST = MNIST
    datasets_mod.FashionMNIST = FashionMNIST
    for name in ("CIFAR10", "SVHN"):
        setattr(datasets_mod, name, _unavailable_dataset)
    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod.save_image = lambda *a, **k: None
    utils_mod.make_grid = lambda *a, **k: None
    tv.transforms = transforms_mod
    tv.datasets = datasets_mod
    tv.utils = utils_mod
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", transforms_mod)
    sys.modules.setdefault("torchvision.datasets", datasets_mod)
    sys.modules.setdefault("torchvision.utils", utils_mod)

    # reference util.py imports comet_ml (fully unused in the oracle paths)
    comet = types.ModuleType("comet_ml")
    comet.__spec__ = importlib.machinery.ModuleSpec("comet_ml", None)
    comet.Experiment = comet.ExistingExperiment = _unavailable_dataset
    sys.modules.setdefault("comet_ml", comet)
    # give every stub module a spec so importlib.util.find_spec probes
    # (e.g. diffusers' import machinery) don't explode
    for name, mod in [
        ("torchvision.transforms", transforms_mod),
        ("torchvision.datasets", datasets_mod),
        ("torchvision.utils", utils_mod),
    ]:
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
