"""Stage procedural HF datasets for offline full-path CLI runs.

The canonical recipes need hub datasets (cifar10, mnist, huggan/CelebA-HQ —
reference dataset.py:82-90) which are unreachable offline. This stages small
`datasets.Dataset`s with the REAL hub schemas (CIFAR10: ``img``+``label``;
MNIST: ``image``+``label`` grayscale; CELEBA-HQ: ``image``) under
``datasets/<NAME>`` via ``save_to_disk``, which `data/datasets._load_hf_dataset`
prefers over the hub. The full production loading path then executes —
load_from_disk → PIL decode pool → resize → uint8 NHWC — with zero egress;
only the pixel content is procedural.

Usage:  python examples/stage_fake_datasets.py [NAME ...] [--n N] [--root DIR]
        (default: all of CIFAR10, MNIST, CELEBA-HQ)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

from baddiffusion_tpu.data.datasets import _fake_images

# name -> (image column, native size, channels, has labels, default n)
SPECS = {
    "CIFAR10": ("img", 32, 3, True, 4096),
    "MNIST": ("image", 28, 1, True, 4096),
    "CELEBA-HQ": ("image", 256, 3, False, 256),
    # reference loads student/celebA (178x218 JPEGs) and resizes to 64
    # (dataset.py:86-87,111-112); staged at a non-64 size so the production
    # resize path really executes
    "CELEBA": ("image", 96, 3, False, 2048),
}


def stage(name: str, root: str, n: int | None = None, seed: int = 4242) -> str:
    os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
    import datasets as hfds

    col, size, channel, labeled, default_n = SPECS[name]
    n = n or default_n
    imgs = _fake_images(n, size=size, channel=channel, seed=seed)
    pils = [Image.fromarray(a[..., 0] if channel == 1 else a) for a in imgs]
    cols = {col: pils}
    feats = {col: hfds.Image()}
    if labeled:
        cols["label"] = list(np.random.RandomState(seed).randint(0, 10, size=n))
        feats["label"] = hfds.Value("int64")
    ds = hfds.Dataset.from_dict(cols, features=hfds.Features(feats))
    out = os.path.join(root, name)
    ds.save_to_disk(out)
    print(f"staged {n} procedural {size}px images ({col}{'+label' if labeled else ''}) -> {out}")
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    # no argparse `choices`: it validates the list default against the choice
    # set as a whole and rejects the documented zero-arg usage
    p.add_argument("names", nargs="*", default=[], metavar="{%s}" % ",".join(SPECS))
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--root", default="datasets")
    a = p.parse_args()
    unknown = [nm for nm in a.names if nm not in SPECS]
    if unknown:
        p.error(f"unknown dataset(s) {unknown}; choose from {list(SPECS)}")
    for nm in a.names or list(SPECS):
        stage(nm, a.root, a.n)
