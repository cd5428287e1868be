"""Helpers to load the reference's vendored torch diffusers for parity oracles.

The vendored library (diffusers 0.16.0.dev0) predates the installed
huggingface_hub/jax, so two small shims are needed before import. These tests
READ the reference implementation to generate numeric oracles — the framework
itself never imports it.
"""

import sys

_REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"


def import_reference_diffusers():
    import jax.random

    if not hasattr(jax.random, "KeyArray"):
        jax.random.KeyArray = jax.Array
    import huggingface_hub

    if not hasattr(huggingface_hub, "cached_download"):
        huggingface_hub.cached_download = huggingface_hub.hf_hub_download
    if _REFERENCE_DIFFUSERS not in sys.path:
        sys.path.insert(0, _REFERENCE_DIFFUSERS)
    import diffusers

    return diffusers
