"""Image utilities: range remap, grids, PNG save/load, result-dir enumeration.

Capability parity with reference `util.py:83-111` (normalize), `util.py:121-371`
(sample grids / animation) and `util.py:373-385` (path_gen). All host-side
numpy; device code never calls into here.
"""

from __future__ import annotations

import itertools
import os
from typing import Iterable, List, Sequence

import numpy as np


def normalize(x, vmin_in: float = None, vmax_in: float = None, vmin_out: float = 0.0, vmax_out: float = 1.0, eps: float = 1e-5):
    """Linear range remap of ``x`` from [vmin_in, vmax_in] to [vmin_out, vmax_out].

    Matches the semantics of reference util.py:83-111: missing input bounds are
    taken from the data itself.
    """
    if vmin_in is None:
        vmin_in = float(np.min(x))
    if vmax_in is None:
        vmax_in = float(np.max(x))
    if vmax_out is None:
        vmax_out = 1.0
    if vmin_out is None:
        vmin_out = 0.0
    scale = (vmax_out - vmin_out) / max(vmax_in - vmin_in, eps)
    return (x - vmin_in) * scale + vmin_out


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[0,1] float images (NHWC) -> uint8, matching reference model.py:499
    (``(imgs * 255).round().astype('uint8')``)."""
    return np.clip(np.round(np.asarray(images) * 255.0), 0, 255).astype(np.uint8)


def make_grid(images: np.ndarray, rows: int = None, cols: int = None, pad: int = 2, pad_value: float = 1.0) -> np.ndarray:
    """Tile a batch of NHWC float images into one grid image (like the 4x4 grids
    the reference writes from `sampling`, baddiffusion.py:384-404)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    if rows is None and cols is None:
        cols = int(np.ceil(np.sqrt(n)))
    if rows is None:
        rows = int(np.ceil(n / cols))
    if cols is None:
        cols = int(np.ceil(n / rows))
    grid = np.full(
        (rows * h + pad * (rows + 1), cols * w + pad * (cols + 1), c),
        pad_value,
        dtype=images.dtype,
    )
    for idx in range(min(n, rows * cols)):
        r, q = divmod(idx, cols)
        y = pad + r * (h + pad)
        x = pad + q * (w + pad)
        grid[y : y + h, x : x + w] = images[idx]
    return grid


def save_image(image: np.ndarray, path: str) -> None:
    """Save one [0,1] float HWC (or HW) image as PNG."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = to_uint8(image[None])[0]
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)


def save_image_grid(images: np.ndarray, path: str, rows: int = None, cols: int = None) -> None:
    save_image(make_grid(images, rows=rows, cols=cols), path)


def save_images(images: np.ndarray, file_dir: str, file_name: str = "", start_cnt: int = 0) -> None:
    """Stream-save a batch of [0,1] NHWC images as ``{file_name}{i}.png``
    (reference model.py:496-502 ``save_imgs``). Uses the threaded native PNG
    codec when available (baddiffusion_tpu/native), PIL otherwise."""
    os.makedirs(file_dir, exist_ok=True)
    arr = to_uint8(images)
    paths = [os.path.join(file_dir, f"{file_name}{start_cnt + i}.png") for i in range(arr.shape[0])]

    try:
        from baddiffusion_tpu.native import encode_png_batch

        if encode_png_batch(arr, paths):
            return
    except Exception:
        pass

    from PIL import Image

    flat = arr[..., 0] if arr.ndim == 4 and arr.shape[-1] == 1 else arr
    for i in range(flat.shape[0]):
        Image.fromarray(flat[i]).save(paths[i])


IMAGE_EXTENSIONS = {"bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp"}


def list_image_files(path: str) -> List[str]:
    files = []
    for name in sorted(os.listdir(path)):
        ext = name.rsplit(".", 1)[-1].lower()
        if ext in IMAGE_EXTENSIONS:
            files.append(os.path.join(path, name))
    return files


def load_image_dir(path: str, size: int = None) -> np.ndarray:
    """Read a directory of images back into one [0,1] float NHWC array
    (reference `ImagePathDataset` with parallel decode, dataset.py:663-696).
    Same-geometry PNG dirs decode through the threaded native codec."""
    files = list_image_files(path)
    if not files:
        raise FileNotFoundError(f"no images found under {path}")
    return load_image_files(files, size=size)


def load_image_files(files, size: int = None) -> np.ndarray:
    """Decode an explicit file list into one [0,1] float NHWC array — the
    batchable unit under ``load_image_dir``, used by streaming consumers
    (e.g. FID activations) that must not materialize a whole directory."""
    if size is None and all(f.endswith(".png") for f in files):
        try:
            from baddiffusion_tpu.native.pngio import decode_png_batch, png_header

            header = png_header(files[0])
            if header is not None:
                h, w, c = header
                c = 1 if c in (1, 2) else 3
                batch = decode_png_batch(files, h, w, c)
                if batch is not None:
                    return batch.astype(np.float32) / 255.0
        except Exception:
            pass

    from PIL import Image

    out = []
    for f in files:
        img = Image.open(f)
        if size is not None:
            img = img.resize((size, size))
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        out.append(arr)
    return np.stack(out)


def numpy_to_pil(images: np.ndarray):
    """[0,1] NHWC floats → list of PIL images (reference
    pipeline_utils.py:1372)."""
    from PIL import Image

    arr = to_uint8(images)
    if arr.ndim == 4 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    return [Image.fromarray(a) for a in arr]


def match_count(dir: str, pattern: str = "*.png") -> int:
    """Count files matching a glob under ``dir`` (working version of the
    reference's broken util.py:22-26)."""
    import glob as _glob

    return len(_glob.glob(os.path.join(dir, pattern)))


def path_gen(*fragment_lists: Sequence[str], sep: str = "_") -> List[str]:
    """Cartesian-product result-dir name enumerator for sweeps
    (reference util.py:373-385)."""
    return [sep.join(parts) for parts in itertools.product(*fragment_lists)]


def batchify(n: int, max_batch: int) -> List[int]:
    """Split ``n`` into chunks of at most ``max_batch`` (reference
    model.py:469-479 batch splitting)."""
    replica, residual = divmod(n, max_batch)
    return [max_batch] * replica + ([residual] if residual else [])
