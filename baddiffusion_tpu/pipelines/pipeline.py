"""DiffusionPipeline-equivalent: model+scheduler bundle with HF-layout I/O.

Behavioral contract: reference `pipelines/pipeline_utils.py:475-780`
(register_modules / save_pretrained writing ``model_index.json`` + per-module
subfolders / from_pretrained) and the modified per-pipeline ``__call__``
surface (init=, save_every_step=, start_from=; SURVEY.md §2.2). The batched
drivers replace `model.py:469-529` (batch_sampling / batch_sampling_save).

TPU-first: __call__ compiles one lax.scan program per (batch, steps) shape and
reuses it across batches; images stream back to host once per batch.
"""

from __future__ import annotations

import dataclasses
import json
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from baddiffusion_tpu.io import load_unet, save_unet
from baddiffusion_tpu.pipelines.sampler import (
    cast_params,
    chain_prologue,
    chain_segment,
    dtype_cache_key,
    ensure_on_device,
    mesh_sample_shardings,
    movie_frames_init,
    pad_batch_for_mesh,
    sample_loop,
    sample_sde_ve,
    sde_ve_segment,
    to_images,
    trim_padded,
)
from baddiffusion_tpu.schedulers import load_scheduler
from baddiffusion_tpu.utils.image import batchify, save_images

MODEL_INDEX_NAME = "model_index.json"


@dataclasses.dataclass
class PipelineOutput:
    """Images in [0,1] NHWC; ``movie`` is the captured trajectory (the
    reference's ImagePipelineOutput.movie, pipeline_utils.py:110-124)."""

    images: np.ndarray
    movie: Optional[np.ndarray] = None


class DiffusionPipeline:
    """An (unet, params, scheduler) bundle driving the scan sampler."""

    def __init__(
        self,
        unet,
        params,
        scheduler,
        clip_each_step: Optional[float] = None,
        default_inference_steps: int = 1000,
        hf_class_name: str = "DDPMPipeline",
        compute_dtype=None,
        mesh=None,
    ):
        self.unet = unet
        self.params = params
        self.scheduler = scheduler
        self.clip_each_step = clip_each_step
        self.default_inference_steps = default_inference_steps
        self.hf_class_name = hf_class_name
        # Optional data-parallel sampling mesh: the batch shards over the
        # "data" axis while params replicate, so the 2048-image measure scales
        # over every chip instead of serializing on one (the reference's
        # DataParallel covers training only; its pipelines are single-GPU).
        # Samples are independent — no cross-batch collectives — so sharded
        # results match single-device results exactly.
        self.mesh = mesh
        # UNet compute precision for sampling. None keeps the model's own
        # dtype (reference parity: pipelines run the fp32 model, SURVEY §8.6).
        # bf16 roughly doubles sampling throughput on TPU: weights stream at
        # half the HBM bytes and the MXU runs at bf16 rate; the scheduler
        # update stays f32 either way.
        self.compute_dtype = compute_dtype
        # Optional cap on chain steps per XLA program invocation (see
        # _segment_fns): None runs the whole chain as one program (default);
        # an int N re-runs one compiled N-step segment with device-resident
        # carry — identical math, bounded program wall-time. CLI:
        # --sample_segment.
        self.segment_steps: Optional[int] = None
        self._jit_cache = {}

    # -- serialization (HF layout) ---------------------------------------------
    def save_pretrained(self, save_directory: str) -> None:
        os.makedirs(save_directory, exist_ok=True)
        index = {
            "_class_name": self.hf_class_name,
            "_diffusers_version": "0.16.0.dev0",
            "unet": ["diffusers", "UNet2DModel"],
            "scheduler": ["diffusers", self.scheduler.hf_class_name],
        }
        with open(os.path.join(save_directory, MODEL_INDEX_NAME), "w") as f:
            json.dump(index, f, indent=2, sort_keys=True)
        save_unet(self.params, self.unet.config, os.path.join(save_directory, "unet"))
        self.scheduler.save_config(os.path.join(save_directory, "scheduler"))

    @classmethod
    def from_pretrained(cls, path: str, dtype=None) -> "DiffusionPipeline":
        with open(os.path.join(path, MODEL_INDEX_NAME)) as f:
            index = json.load(f)
        unet, params = load_unet(path, subfolder="unet", dtype=dtype)
        scheduler = load_scheduler(path, subfolder="scheduler")
        return cls(unet, params, scheduler, hf_class_name=index.get("_class_name", "DDPMPipeline"))

    # -- pixel/latent API (identity for pixel-space pipelines; the uniform
    # encode/decode surface the reference adds, pipeline_ddpm.py:40-44) -------
    def encode(self, image, *args, **kwargs):
        return image

    def decode(self, latents, *args, **kwargs):
        return latents

    # -- sampling ---------------------------------------------------------------
    def _segment_fns(self, num_inference_steps: int, start_from: int, capture_every):
        """Jitted (prologue, segment-runner-factory) for segmented sampling.

        ``segment_steps`` bounds how many chain steps run per XLA program
        invocation: the carried (sample, scheduler-state, key, frames) pytree
        stays device-resident between invocations and the segment start index
        is a TRACED scalar, so one compiled program serves every full-length
        segment and the math is identical to the single-program scan (same
        per-step ops, same PRNG split sequence — tested). Use it when a
        single multi-minute program is operationally fragile (runtime/driver
        hiccups kill the whole chain; observed with 1000-step 256px sampling
        and SDE-VE's 2000-step chains over the device tunnel) — segmenting
        turns that into bounded-length programs with restartable state. No
        reference equivalent (its Python loop is per-step dispatch; this
        keeps scan fusion within each segment)."""
        cache_key = ("seg", num_inference_steps, start_from, capture_every,
                     dtype_cache_key(self.compute_dtype), self.mesh)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]

        scheduler = self.scheduler
        state0 = scheduler.set_timesteps(scheduler.create_state(), num_inference_steps)
        unet = self.unet
        if self.compute_dtype is not None and self.compute_dtype != unet.dtype:
            unet = type(self.unet)(self.unet.config, dtype=self.compute_dtype)
        cast = self.compute_dtype
        n = num_inference_steps
        is_sde_ve = scheduler.hf_class_name == "ScoreSdeVeScheduler"
        # SDE-VE's engine ignores start_from (same as the single-program path)
        chain_start = 0 if is_sde_ve else start_from
        n_steps = n - chain_start

        def apply_fn(p, x, t):
            return unet.apply({"params": p}, x, t).astype(x.dtype)

        prolog_kw = {} if self.mesh is None else {
            "in_shardings": mesh_sample_shardings(self.mesh, n_param_trees=0)
        }

        @partial(jax.jit, **prolog_kw)
        def prolog(init, key):
            frames = None
            if capture_every:
                frames = movie_frames_init(n_steps, capture_every, init.shape, init.dtype)
            if is_sde_ve:
                sample = init * jnp.asarray(scheduler.init_noise_sigma, init.dtype)
                # SDE-VE carries the running sample_mean (the returned image)
                return (sample, jnp.zeros_like(sample), state0), frames, key
            sample, st = chain_prologue(scheduler, state0, init)
            return (sample, st), frames, key

        seg_cache = {}

        def seg_run_for(seg_len: int):
            if seg_len in seg_cache:
                return seg_cache[seg_len]

            if is_sde_ve:

                @jax.jit
                def seg_run(params, carry, key, frames, seg_start):
                    params = cast_params(params, cast)
                    sample, last_mean, st = carry
                    sample, last_mean, st, key, frames = sde_ve_segment(
                        scheduler, apply_fn, params, sample, last_mean, st, key,
                        seg_start=seg_start, seg_len=seg_len, total_steps=n,
                        capture_every=capture_every, frames=frames,
                    )
                    return (sample, last_mean, st), key, frames

            else:

                @jax.jit
                def seg_run(params, carry, key, frames, seg_start):
                    params = cast_params(params, cast)
                    sample, st = carry
                    sample, st, key, frames = chain_segment(
                        scheduler, apply_fn, params, sample, st, key,
                        seg_start=seg_start, seg_len=seg_len, total_steps=n,
                        chain_start=chain_start, clip_each_step=self.clip_each_step,
                        capture_every=capture_every, frames=frames,
                    )
                    return (sample, st), key, frames

            seg_cache[seg_len] = seg_run
            return seg_run

        def epilog(carry, frames):
            if is_sde_ve:
                _sample, last_mean, _st = carry
                images = jnp.clip(last_mean, 0.0, 1.0)
                movie = None if frames is None else jnp.clip(frames, 0.0, 1.0)
            else:
                sample, _st = carry
                images = to_images(sample)
                movie = None if frames is None else to_images(frames)
            return images, movie

        self._jit_cache[cache_key] = (prolog, seg_run_for, epilog, chain_start)
        return self._jit_cache[cache_key]

    def _run_segmented(self, init, key, num_inference_steps: int, start_from: int, capture_every):
        prolog, seg_run_for, epilog, chain_start = self._segment_fns(
            num_inference_steps, start_from, capture_every
        )
        carry, frames, key = prolog(init, key)
        n = num_inference_steps
        seg = int(self.segment_steps)
        s = chain_start
        while s < n:
            length = min(seg, n - s)
            carry, key, frames = seg_run_for(length)(
                self.params, carry, key, frames, jnp.asarray(s, jnp.int32)
            )
            s += length
        return epilog(carry, frames)

    def _sample_fn(self, batch_size: int, num_inference_steps: int, start_from: int, capture_every):
        # compute_dtype/mesh are mutable (load_pipeline_for_eval flips them
        # post-init), so they must participate in the cache key or a later
        # change would silently reuse the program compiled for the old setting
        cache_key = (batch_size, num_inference_steps, start_from, capture_every,
                     dtype_cache_key(self.compute_dtype), self.mesh)
        if cache_key in self._jit_cache:
            return self._jit_cache[cache_key]

        scheduler = self.scheduler
        state = scheduler.set_timesteps(scheduler.create_state(), num_inference_steps)
        unet = self.unet
        if self.compute_dtype is not None and self.compute_dtype != unet.dtype:
            unet = type(self.unet)(self.unet.config, dtype=self.compute_dtype)
        cast = self.compute_dtype

        def apply_fn(p, x, t):
            # the scheduler update runs in the sample's dtype (f32) regardless
            return unet.apply({"params": p}, x, t).astype(x.dtype)

        is_sde_ve = scheduler.hf_class_name == "ScoreSdeVeScheduler"
        is_karras_ve = scheduler.hf_class_name == "KarrasVeScheduler"

        jit_kw = {} if self.mesh is None else {
            "in_shardings": mesh_sample_shardings(self.mesh, n_param_trees=1)
        }

        @partial(jax.jit, **jit_kw)
        def run(params, init, key):
            # cast the weights once before the scan so bf16 weight streaming
            # never depends on XLA hoisting the convert out of the loop body
            # (measured neutral on v5e — XLA does hoist it — but the guarantee
            # is free and portable)
            params = cast_params(params, cast)
            if is_karras_ve:
                # KarrasVe's step signature (sigma_hat/sigma_prev args) is
                # incompatible with the generic sample_loop; route to its own
                # scan engine rather than letting registry dispatch compute
                # garbage through the generic path
                from baddiffusion_tpu.schedulers.karras_ve import sample_karras_ve

                return sample_karras_ve(
                    scheduler, state, apply_fn, params, init, key, capture_every=capture_every
                )
            if is_sde_ve:
                sample, movie = sample_sde_ve(
                    scheduler, state, apply_fn, params, init, key, capture_every=capture_every
                )
                final = jnp.clip(sample, 0.0, 1.0)
                movie_imgs = None if movie is None else jnp.clip(movie, 0.0, 1.0)
            else:
                sample, movie = sample_loop(
                    scheduler,
                    state,
                    apply_fn,
                    params,
                    init,
                    key,
                    start_from=start_from,
                    clip_each_step=self.clip_each_step,
                    capture_every=capture_every,
                )
                final = to_images(sample)
                movie_imgs = None if movie is None else to_images(movie)
            return final, movie_imgs

        self._jit_cache[cache_key] = run
        return run

    def sample_shape(self, batch_size: int) -> Tuple[int, int, int, int]:
        cfg = self.unet.config
        size = cfg.sample_size or 32
        return (batch_size, size, size, cfg.in_channels)

    def __call__(
        self,
        batch_size: int = 1,
        key: Optional[jax.Array] = None,
        init: Optional[jnp.ndarray] = None,
        num_inference_steps: Optional[int] = None,
        save_every_step: bool = False,
        capture_every: Optional[int] = None,
        start_from: int = 0,
        output_type: Optional[str] = "np",
    ) -> PipelineOutput:
        """Reference pipeline __call__ surface (pipeline_ddpm.py:46-125):
        ``init`` replaces the random initial latent; ``save_every_step``
        captures the denoising trajectory (strided by ``capture_every``)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        n = num_inference_steps or self.default_inference_steps
        if save_every_step and capture_every is None:
            capture_every = max(1, n // 50)  # ~50 frames by default
        if not save_every_step:
            capture_every = None

        if init is None:
            key, sub = jax.random.split(key)
            init = jax.random.normal(sub, self.sample_shape(batch_size), jnp.float32)
        else:
            init = jnp.asarray(init, jnp.float32)
            batch_size = init.shape[0]

        # a sharded batch must divide the data axis: pad with copies of row 0
        # (constant-cost) and trim after — callers see exactly batch_size rows
        init, pad = pad_batch_for_mesh(init, self.mesh)

        # measured 15 -> 5 imgs/sec on v5e when params re-upload per chunk
        self.params = ensure_on_device(self.params, self.mesh)

        # KarrasVe stays single-program (its step consumes (sigma_hat,
        # sigma_prev) pairs via a dedicated engine; segmenting it would need
        # that engine's own carry — it is also the only chain never run at
        # production lengths). SDE-VE and the generic chain both segment.
        special = self.scheduler.hf_class_name == "KarrasVeScheduler"
        if self.segment_steps and not special and self.segment_steps < (n - start_from):
            images, movie = self._run_segmented(init, key, n, start_from, capture_every)
        else:
            run = self._sample_fn(batch_size + pad, n, start_from, capture_every)
            images, movie = run(self.params, init, key)
        images, movie = trim_padded(images, movie, batch_size)
        return PipelineOutput(images=images, movie=movie)


def batch_sampling(
    sample_n: int,
    pipeline: DiffusionPipeline,
    init: Optional[np.ndarray] = None,
    max_batch_n: int = 256,
    key: Optional[jax.Array] = None,
    **kwargs,
) -> np.ndarray:
    """Split into ≤max_batch_n chunks and concatenate (reference model.py:469-489)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    if init is None:
        sizes = batchify(sample_n, max_batch_n)
        chunks = [None] * len(sizes)
    else:
        sizes = batchify(init.shape[0], max_batch_n)
        chunks, ofs = [], 0
        for s in sizes:
            chunks.append(init[ofs : ofs + s])
            ofs += s
    outs = []
    for i, (s, chunk) in enumerate(zip(sizes, chunks)):
        out = pipeline(batch_size=s, key=jax.random.fold_in(key, i), init=chunk, **kwargs)
        outs.append(out.images)
    return np.concatenate(outs)


def batch_sampling_save(
    sample_n: int,
    pipeline: DiffusionPipeline,
    path: str,
    init: Optional[np.ndarray] = None,
    max_batch_n: int = 256,
    key: Optional[jax.Array] = None,
    shard_index: int = 0,
    shard_count: int = 1,
    **kwargs,
) -> None:
    """Stream-save PNGs with a running index (reference model.py:504-529).

    ``shard_index``/``shard_count`` split the work across cooperating callers
    (one per jax process on a pod): chunks are assigned round-robin by GLOBAL
    chunk index, and both the per-chunk PRNG key (``fold_in(key, i)``) and the
    PNG filename offset use that global index — so the union of all shards'
    outputs is byte-identical to a single-caller run, for any shard_count.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if init is None:
        sizes = batchify(sample_n, max_batch_n)
        chunks = [None] * len(sizes)
    else:
        sizes = batchify(init.shape[0], max_batch_n)
        chunks, ofs = [], 0
        for s in sizes:
            chunks.append(init[ofs : ofs + s])
            ofs += s
    # PNG encode+IO overlaps the next chunk's device compute: the sampler
    # dispatches asynchronously, so a single writer thread hides the ~seconds
    # of host-side encoding per 256-image chunk behind the TPU's work
    from concurrent.futures import ThreadPoolExecutor

    offsets = np.concatenate([[0], np.cumsum(sizes[:-1])]) if sizes else []
    with ThreadPoolExecutor(max_workers=1) as pool:
        pending = []
        for i, (s, chunk) in enumerate(zip(sizes, chunks)):
            if i % shard_count != shard_index:
                continue
            out = pipeline(batch_size=s, key=jax.random.fold_in(key, i), init=chunk, **kwargs)
            pending.append(pool.submit(save_images, out.images, path, start_cnt=int(offsets[i])))
            while len(pending) > 2:  # bound host memory to ~2 in-flight chunks
                pending.pop(0).result()
        for f in pending:
            f.result()
