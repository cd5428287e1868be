"""Native (C++) runtime components, loaded via ctypes with Python fallbacks."""

from baddiffusion_tpu.native.pngio import (
    decode_png_batch,
    encode_png_batch,
    native_available,
)

__all__ = ["decode_png_batch", "encode_png_batch", "native_available"]
