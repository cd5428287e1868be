"""FID: jitted feature extraction + Fréchet distance on host.

Behavioral contract: reference `fid_score.py` — InceptionV3 pool3 (2048-d)
activations over two directories of PNGs (`get_activations`
fid_score.py:91-147), gaussian statistics, Fréchet distance with sqrtm
stabilization (`calculate_frechet_distance` :150-204), the `fid()` API (:266)
and a standalone CLI writing ``fid.log`` (:287-315).

TPU-native: the extractor runs as a jitted batch program on device; only the
2048-d activations stream back. sqrtm stays on host (scipy), as in the
reference.

Extractor resolution (offline-aware):
  1. If FID InceptionV3 weights are available (``BADDIFFUSION_FID_WEIGHTS`` or
     the pytorch_fid cache), use the flax InceptionV3 port — numbers comparable
     with pytorch-fid.
  2. Otherwise fall back to a fixed seeded random-projection CNN ("proxy
     FID") — deterministic and self-consistent for run-to-run comparison, NOT
     comparable with published FID values. A warning is printed once.
"""

from __future__ import annotations

import os
import sys
from functools import lru_cache
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from baddiffusion_tpu.utils.logging import Log

FID_WEIGHTS_ENV = "BADDIFFUSION_FID_WEIGHTS"
_DEFAULT_WEIGHT_PATHS = (
    os.path.expanduser("~/.cache/torch/hub/checkpoints/pt_inception-2015-12-05-6726825d.pth"),
    os.path.expanduser("~/.cache/baddiffusion_tpu/pt_inception-2015-12-05-6726825d.pth"),
)


def using_real_weights() -> bool:
    """True when the real FID InceptionV3 weights are staged — i.e. scores are
    comparable with pytorch-fid. False means the proxy extractor is live and
    callers must record scores under ``FID_proxy``, never bare ``FID``."""
    return _find_inception_weights() is not None


def _find_inception_weights() -> Optional[str]:
    cand = os.environ.get(FID_WEIGHTS_ENV)
    paths = ([cand] if cand else []) + list(_DEFAULT_WEIGHT_PATHS)
    for p in paths:
        if p and os.path.exists(p):
            return p
    return None


@lru_cache(maxsize=1)
def default_extractor() -> Tuple[Callable, int]:
    """Returns (extract_fn(images_nhwc_01) -> [B, D] f32, D)."""
    weights = _find_inception_weights()
    if weights is not None:
        from baddiffusion_tpu.models.inception import load_fid_inception

        model, params = load_fid_inception(weights)

        @jax.jit
        def extract(images):
            return model.apply({"params": params}, images)

        return extract, 2048
    Log.warning(
        "FID InceptionV3 weights not found (set $BADDIFFUSION_FID_WEIGHTS); "
        "using the deterministic proxy extractor — scores are self-consistent "
        "but NOT comparable with pytorch-fid numbers."
    )
    return _proxy_extractor(), 2048


def _proxy_extractor(dim: int = 2048, seed: int = 20230214) -> Callable:
    """A fixed random CNN: 4 stride-2 conv+relu stages then a random linear
    projection to ``dim``. Weights derive from a constant seed so scores are
    reproducible across processes/machines."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    convs = [
        jax.random.normal(ks[0], (3, 3, 3, 32), jnp.float32) * (2.0 / (9 * 3)) ** 0.5,
        jax.random.normal(ks[1], (3, 3, 32, 64), jnp.float32) * (2.0 / (9 * 32)) ** 0.5,
        jax.random.normal(ks[2], (3, 3, 64, 128), jnp.float32) * (2.0 / (9 * 64)) ** 0.5,
        jax.random.normal(ks[3], (3, 3, 128, 256), jnp.float32) * (2.0 / (9 * 128)) ** 0.5,
    ]
    proj = jax.random.normal(ks[4], (256 * 2, dim), jnp.float32) / (256 * 2) ** 0.5

    @jax.jit
    def extract(images):
        x = jnp.asarray(images, jnp.float32)
        if x.shape[-1] == 1:
            x = jnp.tile(x, (1, 1, 1, 3))
        x = x * 2.0 - 1.0
        for w in convs:
            # HIGHEST precision: proxy-FID scores must agree across backends
            x = jax.lax.conv_general_dilated(
                x, w, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            )
            x = jax.nn.relu(x)
        mean = jnp.mean(x, axis=(1, 2))
        mx = jnp.max(x, axis=(1, 2))
        feats = jnp.concatenate([mean, mx], axis=-1)
        return feats @ proj

    return extract


def get_activations(
    images_or_path: Union[str, np.ndarray],
    extractor: Optional[Callable] = None,
    batch_size: int = 256,
    resize_to: Optional[int] = None,
) -> np.ndarray:
    """[N, D] activations for a directory of images or an NHWC [0,1] array.

    Directory inputs decode ONE batch at a time (the reference streams via a
    DataLoader, fid_score.py:91-147): host RAM stays ~batch_size images
    regardless of directory size, instead of materializing e.g. a 50k-image
    FID set (~39 GB at 256px f32) up front."""
    if extractor is None:
        extractor, _ = default_extractor()

    if isinstance(images_or_path, str):
        from baddiffusion_tpu.utils.image import list_image_files, load_image_files

        files = list_image_files(images_or_path)
        if not files:
            raise FileNotFoundError(f"no images found under {images_or_path}")
        n = len(files)
        get_chunk = lambda i: load_image_files(files[i : i + batch_size], size=resize_to)
    else:
        images = np.asarray(images_or_path)
        n = len(images)
        get_chunk = lambda i: images[i : i + batch_size]

    outs = []
    for i in range(0, n, batch_size):
        chunk = get_chunk(i)
        pad = 0
        if len(chunk) < batch_size and i > 0:
            pad = batch_size - len(chunk)  # keep shapes static for the jit
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        act = np.asarray(extractor(jnp.asarray(chunk)))
        outs.append(act[: len(act) - pad] if pad else act)
    return np.concatenate(outs)


def compute_statistics(activations: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(activations, axis=0)
    sigma = np.cov(activations, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """d² = |μ1−μ2|² + Tr(Σ1+Σ2−2√(Σ1Σ2)) with the reference's sqrtm
    stabilization (fid_score.py:150-204)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        Log.warning(f"fid: singular product; adding {eps} to covariance diagonals")
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid(
    path: Sequence[Union[str, np.ndarray]],
    batch_size: int = 256,
    extractor: Optional[Callable] = None,
    num_workers: int = 0,
    device=None,
    dims: int = 2048,
) -> float:
    """FID between two directories (or arrays) of images — the reference
    `fid()` API surface (fid_score.py:266-285). ``device``/``num_workers``/
    ``dims`` accepted for call-site compatibility."""
    assert len(path) == 2, "fid() expects [path_real, path_generated]"
    acts = [get_activations(p, extractor=extractor, batch_size=batch_size) for p in path]
    stats = [compute_statistics(a) for a in acts]
    return frechet_distance(stats[0][0], stats[0][1], stats[1][0], stats[1][1])


def main(argv=None):
    """Standalone CLI: ``python -m baddiffusion_tpu.metrics.fid dir1 dir2``
    → prints FID and appends to fid.log (reference fid_score.py:287-315)."""
    import argparse

    parser = argparse.ArgumentParser(description="FID between two image dirs")
    parser.add_argument("path", nargs=2)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--log", type=str, default="fid.log")
    args = parser.parse_args(argv)
    value = fid(args.path, batch_size=args.batch_size)
    print(f"FID: {value}")
    with open(args.log, "a") as f:
        f.write(f"{args.path[0]} {args.path[1]} FID: {value}\n")
    return value


if __name__ == "__main__":
    main()
