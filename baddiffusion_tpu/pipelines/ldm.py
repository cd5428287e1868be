"""Unconditional latent-diffusion pipeline (VQ-VAE latents + UNet + DDIM).

Behavioral contract: the reference's modified
`pipelines/latent_diffusion_uncond/pipeline_latent_diffusion_uncond.py:39-137`:
constructor takes (vqvae, unet, scheduler, clip_sample=); `encode/decode`
latents helpers with optional scaling factor (:44-67); `__call__` with the
BadDiffusion hooks (init latents, save_every_step, per-step ±1 clamp when
clip_sample) and VQ decode at the end (:76-137). Used by the
LDM-CELEBA-HQ-256 alias.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from baddiffusion_tpu.pipelines.pipeline import MODEL_INDEX_NAME, PipelineOutput
from baddiffusion_tpu.pipelines.sampler import (
    cast_params,
    dtype_cache_key,
    ensure_on_device,
    mesh_sample_shardings,
    pad_batch_for_mesh,
    sample_loop,
    to_images,
    trim_padded,
)


class LDMPipeline:
    def __init__(self, vqvae, vqvae_params, unet, unet_params, scheduler, clip_sample: bool = False):
        self.vqvae = vqvae
        self.vqvae_params = vqvae_params
        self.unet = unet
        self.params = unet_params
        self.scheduler = scheduler
        self.clip_sample = clip_sample
        self.default_inference_steps = 50
        self.hf_class_name = "LDMPipeline"
        # optional UNet compute dtype override (--eval_dtype bf16); the VQ
        # decode stays in the params' dtype (one call per batch, negligible)
        self.compute_dtype = None
        # optional data-parallel sampling mesh (set by load_pipeline_for_eval,
        # same contract as DiffusionPipeline.mesh): the latent batch shards
        # over the 'data' axis, params replicate
        self.mesh = None
        self._jit_cache = {}

    # -- latent helpers (reference :44-67) --------------------------------------
    def encode(self, image: jnp.ndarray, scaling_factor: Optional[float] = None) -> jnp.ndarray:
        latents = self.vqvae.apply({"params": self.vqvae_params}, image, method=self.vqvae.encode)
        return latents * scaling_factor if scaling_factor is not None else latents

    def decode(self, latents: jnp.ndarray, scaling_factor: Optional[float] = None) -> jnp.ndarray:
        # NOTE reference quirk, preserved bit-for-bit: the reference divides
        # the decoded IMAGE by scaling_factor — not the latents before decode
        # (pipeline_latent_diffusion_uncond.py:54-62, `vae.decode(x).sample /
        # scaling_factor`). Round-tripping encode(sf)→decode(sf) therefore
        # does NOT invert; no reference caller ever passes scaling_factor.
        img = self.vqvae.apply({"params": self.vqvae_params}, latents, method=self.vqvae.decode)
        return img / scaling_factor if scaling_factor is not None else img

    def sample_shape(self, batch_size: int):
        """PIXEL-space init shape (the VQ's sample size), so the measure /
        sampling drivers can stamp the pixel-space trigger onto the init
        noise exactly like the non-latent pipelines (cli.run_measure,
        trainer.sample_grids). The reference's LDM pipeline only accepts
        latent-shaped ``init`` (pipeline_latent_diffusion_uncond.py:104-112),
        which makes its own `measure`/`sampling` paths shape-incoherent for
        LDM (trigger is dataset-sized, latents are 4x smaller) — the alias
        was never runnable end-to-end there. Here pixel-shaped init is
        encoded to latents by the VQ encoder inside ``__call__``;
        latent-shaped init keeps the reference contract verbatim."""
        cfg = self.vqvae.config
        return (batch_size, cfg.sample_size, cfg.sample_size, cfg.in_channels)

    def latent_shape(self, batch_size: int):
        cfg = self.unet.config
        return (batch_size, cfg.sample_size, cfg.sample_size, cfg.in_channels)

    def _encode_fn(self):
        if "_encode" not in self._jit_cache:
            vq = self.vqvae
            self._jit_cache["_encode"] = jax.jit(
                lambda p, x: vq.apply({"params": p}, x, method=vq.encode)
            )
        return self._jit_cache["_encode"]

    def _sample_fn(self, batch_size: int, num_inference_steps: int, capture_every):
        cast = self.compute_dtype
        # compute_dtype/mesh are mutable post-init → part of the cache key
        cache_key = (batch_size, num_inference_steps, capture_every,
                     dtype_cache_key(cast), self.mesh)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]
        scheduler = self.scheduler
        state = scheduler.set_timesteps(scheduler.create_state(), num_inference_steps)
        unet = self.unet
        if cast is not None and cast != unet.dtype:
            unet = type(self.unet)(self.unet.config, dtype=cast)

        def apply_fn(p, x, t):
            # scheduler math stays in the latent's dtype (f32)
            return unet.apply({"params": p}, x, t).astype(x.dtype)

        clip = 1.0 if self.clip_sample else None

        jit_kw = {} if self.mesh is None else {
            "in_shardings": mesh_sample_shardings(self.mesh, n_param_trees=2)
        }

        @partial(jax.jit, **jit_kw)
        def run(unet_params, vq_params, init, key):
            # cast once before the scan (see pipeline.py: guarantees bf16
            # weight streaming without relying on XLA loop-invariant hoisting)
            unet_params = cast_params(unet_params, cast)
            latents, movie = sample_loop(
                scheduler, state, apply_fn, unet_params, init, key, clip_each_step=clip,
                capture_every=capture_every,
            )
            image = self.vqvae.apply({"params": vq_params}, latents, method=self.vqvae.decode)
            frames = None
            if movie is not None:
                dec = lambda z: self.vqvae.apply({"params": vq_params}, z, method=self.vqvae.decode)
                frames = to_images(jax.vmap(dec)(movie))
            return to_images(image), frames

        self._jit_cache[cache_key] = run
        return run

    def __call__(
        self,
        batch_size: int = 1,
        key: Optional[jax.Array] = None,
        init: Optional[jnp.ndarray] = None,
        num_inference_steps: Optional[int] = None,
        save_every_step: bool = False,
        capture_every: Optional[int] = None,
        output_type: Optional[str] = "np",
        **kwargs,
    ) -> PipelineOutput:
        if key is None:
            key = jax.random.PRNGKey(0)
        n = num_inference_steps or self.default_inference_steps
        if save_every_step and capture_every is None:
            capture_every = max(1, n // 10)
        if not save_every_step:
            capture_every = None
        if init is None:
            # reference contract: no-init sampling draws LATENT noise directly
            # (pipeline_latent_diffusion_uncond.py:104-109)
            key, sub = jax.random.split(key)
            init = jax.random.normal(sub, self.latent_shape(batch_size), jnp.float32)
        else:
            init = jnp.asarray(init, jnp.float32)
            batch_size = init.shape[0]
            vq_size = self.vqvae.config.sample_size
            if init.shape[1] == vq_size and vq_size != self.unet.config.sample_size:
                # pixel-space init (noise + trigger from the eval drivers):
                # encode to latents — see sample_shape docstring
                init = self._encode_fn()(self.vqvae_params, init)
        # a sharded batch must divide the data axis: pad with copies of row 0
        # and trim after (same contract as DiffusionPipeline.__call__)
        init, pad = pad_batch_for_mesh(init, self.mesh)
        run = self._sample_fn(batch_size + pad, n, capture_every)
        self.params = ensure_on_device(self.params, self.mesh)
        self.vqvae_params = ensure_on_device(self.vqvae_params, self.mesh)
        images, movie = run(self.params, self.vqvae_params, init, key)
        images, movie = trim_padded(images, movie, batch_size)
        return PipelineOutput(images=images, movie=movie)

    # -- serialization -----------------------------------------------------------
    def save_pretrained(self, save_directory: str) -> None:
        from baddiffusion_tpu.io import flax_to_torch_state_dict, save_unet

        os.makedirs(save_directory, exist_ok=True)
        index = {
            "_class_name": "LDMPipeline",
            "_diffusers_version": "0.16.0.dev0",
            "unet": ["diffusers", "UNet2DModel"],
            "vqvae": ["diffusers", "VQModel"],
            "scheduler": ["diffusers", self.scheduler.hf_class_name],
        }
        with open(os.path.join(save_directory, MODEL_INDEX_NAME), "w") as f:
            json.dump(index, f, indent=2, sort_keys=True)
        save_unet(self.params, self.unet.config, os.path.join(save_directory, "unet"))
        self.scheduler.save_config(os.path.join(save_directory, "scheduler"))
        # vqvae subfolder (same tensor-name contract)
        vq_dir = os.path.join(save_directory, "vqvae")
        os.makedirs(vq_dir, exist_ok=True)
        payload = {"_class_name": "VQModel", "_diffusers_version": "0.16.0.dev0"}
        payload.update(
            {k: (list(v) if isinstance(v, tuple) else v) for k, v in dataclasses.asdict(self.vqvae.config).items()}
        )
        with open(os.path.join(vq_dir, "config.json"), "w") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
        from safetensors.numpy import save_file

        sd = flax_to_torch_state_dict(self.vqvae_params)
        sd = {k: np.ascontiguousarray(np.asarray(v, np.float32)) for k, v in sd.items()}
        save_file(sd, os.path.join(vq_dir, "diffusion_pytorch_model.safetensors"))

    @classmethod
    def from_pretrained(cls, path: str, clip_sample: bool = False, dtype=None) -> "LDMPipeline":
        from baddiffusion_tpu.io import load_torch_state_dict, load_unet, torch_to_flax_params
        from baddiffusion_tpu.models.vae import VQModel, VQModelConfig
        from baddiffusion_tpu.schedulers import load_scheduler

        unet, unet_params = load_unet(path, subfolder="unet", dtype=dtype)
        scheduler = load_scheduler(path, subfolder="scheduler")
        vq_config = VQModelConfig.load(path, subfolder="vqvae")
        vq_params = torch_to_flax_params(load_torch_state_dict(os.path.join(path, "vqvae")))
        vqvae = VQModel(vq_config, dtype=dtype or jnp.float32)
        return cls(vqvae, vq_params, unet, unet_params, scheduler, clip_sample=clip_sample)
