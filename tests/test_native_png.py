"""Native PNG codec: roundtrip vs PIL, cross-decoding, fallback behavior."""

import os

import numpy as np
import pytest

from baddiffusion_tpu.native import native_available
from baddiffusion_tpu.native.pngio import decode_png_batch, encode_png_batch, png_header

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")


def test_roundtrip_rgb(tmp_path):
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, size=(8, 32, 32, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(8)]
    assert encode_png_batch(imgs, paths)
    assert png_header(paths[0]) == (32, 32, 3)
    back = decode_png_batch(paths, 32, 32, 3)
    np.testing.assert_array_equal(back, imgs)


def test_roundtrip_gray(tmp_path):
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 256, size=(4, 16, 16, 1), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(4)]
    assert encode_png_batch(imgs, paths)
    back = decode_png_batch(paths, 16, 16, 1)
    np.testing.assert_array_equal(back, imgs)


def test_pil_reads_native_output(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, size=(2, 24, 24, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(2)]
    assert encode_png_batch(imgs, paths)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), imgs[i])


def test_native_reads_pil_output(tmp_path):
    from PIL import Image

    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 256, size=(3, 20, 20, 3), dtype=np.uint8)
    paths = [str(tmp_path / f"{i}.png") for i in range(3)]
    for i, p in enumerate(paths):
        Image.fromarray(imgs[i]).save(p)  # PIL uses real scanline filters
    back = decode_png_batch(paths, 20, 20, 3)
    np.testing.assert_array_equal(back, imgs)


def test_save_load_integration(tmp_path):
    from baddiffusion_tpu.utils.image import load_image_dir, save_images

    rng = np.random.RandomState(4)
    imgs01 = rng.rand(6, 16, 16, 3).astype(np.float32)
    save_images(imgs01, str(tmp_path))
    assert sorted(os.listdir(tmp_path)) == sorted(f"{i}.png" for i in range(6))
    back = load_image_dir(str(tmp_path))
    np.testing.assert_allclose(back, np.round(imgs01 * 255) / 255.0, atol=1 / 255.0)


def test_decode_failure_reports(tmp_path):
    bad = str(tmp_path / "bad.png")
    with open(bad, "wb") as f:
        f.write(b"not a png")
    assert decode_png_batch([bad], 8, 8, 3) is None


def test_truncated_and_oversized_chunk_fail_cleanly(tmp_path):
    """A PNG truncated mid-chunk, or one whose chunk header declares a length
    past EOF, must return decode failure — not read past the heap buffer
    (the chunk loop validates declared lengths against the file size)."""
    import numpy as np

    from baddiffusion_tpu.native.pngio import encode_png_batch

    img = (np.arange(8 * 8 * 3, dtype=np.uint8).reshape(1, 8, 8, 3) % 255)
    good = str(tmp_path / "good.png")
    assert encode_png_batch(img, [good])
    raw = open(good, "rb").read()

    trunc = str(tmp_path / "trunc.png")
    with open(trunc, "wb") as f:  # cut mid-IDAT
        f.write(raw[: len(raw) // 2])
    assert decode_png_batch([trunc], 8, 8, 3) is None

    lie = str(tmp_path / "lie.png")
    big = bytearray(raw)
    # first chunk after the 8-byte signature is IHDR: inflate its declared
    # length to 0xFFFFFF00 while keeping the file short
    big[8:12] = (0xFFFFFF00).to_bytes(4, "big")
    with open(lie, "wb") as f:
        f.write(bytes(big))
    assert decode_png_batch([lie], 8, 8, 3) is None
