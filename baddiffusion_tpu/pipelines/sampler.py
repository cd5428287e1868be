"""The sampling engine: reverse diffusion as a single jitted `lax.scan`.

TPU-native replacement for the reference's Python pipeline loops
(`pipelines/ddpm/pipeline_ddpm.py:46-125`, `pipelines/pndm/pipeline_pndm.py:55-122`,
`pipelines/score_sde_ve/pipeline_score_sde_ve.py:47-113`) including the four
BadDiffusion-added hooks (SURVEY.md §2.2):

  (a) ``init``       — start the chain from a caller-supplied latent
                       (how ``noise + trigger`` activates the backdoor)
  (b) ``clip_each_step`` — clamp x_t to ±range after every step (the
                       PNDMPipeline ``clip_sample`` wrapper behavior)
  (c) ``capture_every`` — trajectory ("movie") capture via scan stacking,
                       strided so HBM isn't blown at T=1000
  (d) ``start_from`` — skip the first k timesteps

The whole T-step chain compiles into ONE XLA program (UNet forward fused with
the scheduler update), so per-step Python/dispatch overhead is zero.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def chain_prologue(scheduler, state, init: jnp.ndarray):
    """Everything that happens ONCE before the reverse chain: init-noise
    scaling (reference pipeline_ddpm.py:98 / score_sde_ve.py:75-79) and the
    scheduler's begin-sampling hook. Returns ``(sample, state)``."""
    init_sigma = getattr(scheduler, "init_noise_sigma", 1.0)
    if callable(init_sigma):
        init_sigma = init_sigma(state)
    sample = init * jnp.asarray(init_sigma, init.dtype)
    if hasattr(scheduler, "begin_sampling"):
        state = scheduler.begin_sampling(state, sample)
    return sample, state


def make_step_once(scheduler, apply_fn: Callable, params, clip_each_step: Optional[float]):
    """One reverse-diffusion step as a (sample, state, key, i) transition —
    shared by the single-program chain and the segmented runner."""

    def step_once(sample, st, k, i):
        t = st.timesteps[i]
        k, sub = jax.random.split(k)
        model_in = scheduler.scale_model_input(st, sample, i)
        eps = apply_fn(params, model_in, jnp.broadcast_to(t, (sample.shape[0],)))
        st, sample, _x0 = scheduler.step(st, eps, i, sample, sub)
        if clip_each_step is not None:
            sample = jnp.clip(sample, -clip_each_step, clip_each_step)
        # (the reference's clip_defense knob lives in DDPMConfig.clip_defense —
        # applied inside DDPMScheduler.step — not here)
        return sample, st, k

    return step_once


def chain_segment(
    scheduler,
    apply_fn: Callable,
    params,
    sample: jnp.ndarray,
    state,
    key: jax.Array,
    seg_start,
    seg_len: int,
    total_steps: int,
    chain_start: int = 0,
    clip_each_step: Optional[float] = None,
    capture_every: Optional[int] = None,
    frames: Optional[jnp.ndarray] = None,
):
    """``seg_len`` chain steps starting at step index ``seg_start`` (may be a
    traced scalar, so ONE compiled program serves every full-length segment).
    ``total_steps``/``chain_start`` are the static bounds of the whole chain
    (frame-slot math and the final-frame guarantee need them). Carries
    (sample, scheduler state, key, frames) — all device-resident between
    segments, so splitting a chain across invocations is numerically
    IDENTICAL to the single-program scan (same per-step ops, same PRNG split
    sequence)."""
    step_once = make_step_once(scheduler, apply_fn, params, clip_each_step)
    indices = jnp.asarray(seg_start, jnp.int32) + jnp.arange(seg_len, dtype=jnp.int32)

    if capture_every:
        # strided trajectory capture with a bounded carried buffer: one frame
        # per `capture_every` steps, so T=1000 costs n_frames·batch, not T·batch.
        # The final step ALWAYS lands in the last slot (overwriting that slot's
        # strided frame when the last step isn't a stride multiple) so
        # movie[-1] is the returned image.
        def body(carry, i):
            sample, st, k, fr = carry
            sample, st, k = step_once(sample, st, k, i)
            off = i - chain_start
            slot = off // capture_every  # == n_frames-1 for the final step
            fr = jax.lax.cond(
                (off % capture_every == 0) | (i == total_steps - 1),
                lambda f: jax.lax.dynamic_update_index_in_dim(f, sample, slot, 0),
                lambda f: f,
                fr,
            )
            return (sample, st, k, fr), None

        (sample, state, key, frames), _ = jax.lax.scan(body, (sample, state, key, frames), indices)
        return sample, state, key, frames

    def body(carry, i):
        sample, st, k = carry
        return step_once(sample, st, k, i), None

    (sample, state, key), _ = jax.lax.scan(body, (sample, state, key), indices)
    return sample, state, key, None


def movie_frames_init(n_steps: int, capture_every: int, sample_shape, dtype) -> jnp.ndarray:
    """Zero frame buffer sized for a ``capture_every``-strided n_steps chain."""
    n_frames = -(-n_steps // capture_every)
    return jnp.zeros((n_frames,) + tuple(sample_shape), dtype)


def sample_loop(
    scheduler,
    state,
    apply_fn: Callable,
    params,
    init: jnp.ndarray,
    key: jax.Array,
    start_from: int = 0,
    clip_each_step: Optional[float] = None,
    capture_every: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Run the reverse chain from ``init``; returns (final_sample, movie).

    ``state`` must already carry inference timesteps (scheduler.set_timesteps).
    ``movie`` stacks every ``capture_every``-th intermediate (plus the final
    state is the last frame), or None. (One program; the pipeline's
    ``segment_steps`` mode runs the identical math as repeated
    ``chain_segment`` programs instead.)
    """
    n = int(state.timesteps.shape[0])
    n_steps = n - start_from
    sample, state = chain_prologue(scheduler, state, init)
    frames = None
    if capture_every:
        frames = movie_frames_init(n_steps, capture_every, init.shape, init.dtype)
    sample, state, key, frames = chain_segment(
        scheduler, apply_fn, params, sample, state, key,
        seg_start=start_from, seg_len=n_steps, total_steps=n, chain_start=start_from,
        clip_each_step=clip_each_step, capture_every=capture_every, frames=frames,
    )
    return sample, frames


def sde_ve_segment(
    scheduler,
    apply_fn: Callable,
    params,
    sample: jnp.ndarray,
    last_mean: jnp.ndarray,
    state,
    key: jax.Array,
    seg_start,
    seg_len: int,
    total_steps: int,
    capture_every: Optional[int] = None,
    frames: Optional[jnp.ndarray] = None,
):
    """``seg_len`` predictor-corrector steps from (possibly traced)
    ``seg_start`` — the SDE-VE analog of ``chain_segment``, with the carried
    (sample, last_mean, state, key, frames) staying device-resident between
    invocations (the returned image is the final step's sample_MEAN,
    reference pipeline_score_sde_ve.py:109-113)."""
    correct_steps = scheduler.config.correct_steps

    # the score model is conditioned on sigma_t, not t
    # (reference pipeline_score_sde_ve.py:85-96)
    def corrector(carry, _):
        sample, st, k, i = carry
        sigma_t = st.sigmas[i]
        k, sub = jax.random.split(k)
        score = apply_fn(params, sample, jnp.broadcast_to(sigma_t, (sample.shape[0],)))
        sample = scheduler.step_correct(st, score, sample, sub)
        return (sample, st, k, i), None

    def body(carry, i):
        sample, last_mean, st, k, frames = carry
        (sample, st, k, _), _ = jax.lax.scan(corrector, (sample, st, k, i), None, length=correct_steps)
        sigma_t = st.sigmas[i]
        k, sub = jax.random.split(k)
        score = apply_fn(params, sample, jnp.broadcast_to(sigma_t, (sample.shape[0],)))
        st, sample, sample_mean = scheduler.step_pred(st, score, i, sample, sub)
        if capture_every:
            # the reference's SDE-VE movie appends sample_MEAN per step
            # (pipeline_score_sde_ve.py:99-101), and its final image is the
            # last mean — capture the mean and force the final step into the
            # last slot so movie[-1] equals the returned image
            slot = i // capture_every
            frames = jax.lax.cond(
                (i % capture_every == 0) | (i == total_steps - 1),
                lambda f: jax.lax.dynamic_update_index_in_dim(f, sample_mean, slot, 0),
                lambda f: f,
                frames,
            )
        return (sample, sample_mean, st, k, frames), None

    indices = jnp.asarray(seg_start, jnp.int32) + jnp.arange(seg_len, dtype=jnp.int32)
    (sample, last_mean, state, key, frames), _ = jax.lax.scan(
        body, (sample, last_mean, state, key, frames), indices
    )
    return sample, last_mean, state, key, frames


def sample_sde_ve(
    scheduler,
    state,
    apply_fn: Callable,
    params,
    init: jnp.ndarray,
    key: jax.Array,
    capture_every: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Predictor-corrector loop for ScoreSdeVe (reference
    pipeline_score_sde_ve.py:75-113): per timestep run ``correct_steps``
    Langevin corrector steps then one predictor step. One XLA program; the
    pipeline's ``segment_steps`` mode runs the identical math as repeated
    ``sde_ve_segment`` programs."""
    n = int(state.timesteps.shape[0])
    sample = init * jnp.asarray(scheduler.init_noise_sigma, init.dtype)
    frames = None
    if capture_every:
        frames = movie_frames_init(n, capture_every, init.shape, init.dtype)
    _sample, last_mean, state, key, frames = sde_ve_segment(
        scheduler, apply_fn, params, sample, jnp.zeros_like(sample), state, key,
        seg_start=0, seg_len=n, total_steps=n,
        capture_every=capture_every, frames=frames,
    )
    # only the running mean is carried — no [T, B, ...] stacking
    # (HBM-bounded like sample_loop)
    return last_mean, frames


def to_images(sample: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] model space → [0,1] image space (reference pipeline epilogue
    ``(x/2+0.5).clamp(0,1)``, pipeline_ddpm.py:115)."""
    return jnp.clip(sample / 2.0 + 0.5, 0.0, 1.0)


def dtype_cache_key(cast) -> "str | None":
    """Stable cache-key component for a mutable compute-dtype override."""
    return jnp.dtype(cast).name if cast is not None else None


def cast_params(params, cast):
    """Cast floating param leaves to ``cast`` (no-op when cast is None)."""
    if cast is None:
        return params
    return jax.tree_util.tree_map(
        lambda a: a.astype(cast) if jnp.issubdtype(a.dtype, jnp.floating) else a, params
    )


def mesh_sample_shardings(mesh, n_param_trees: int):
    """``in_shardings`` for a jitted sampling fn taking ``n_param_trees``
    replicated param pytrees, then a batch sharded over the data axis, then a
    replicated PRNG key — the one mesh contract every pipeline shares."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return (rep,) * n_param_trees + (NamedSharding(mesh, P("data")), rep)


def pad_batch_for_mesh(init, mesh):
    """Pad ``init`` with copies of row 0 so its batch divides the mesh data
    axis (constant-cost broadcast); returns ``(padded_init, pad)``. Callers
    trim outputs back with ``trim_padded``."""
    pad = 0
    if mesh is not None:
        pad = (-init.shape[0]) % mesh.shape["data"]
        if pad:
            init = jnp.concatenate([init, jnp.broadcast_to(init[:1], (pad,) + init.shape[1:])])
    return init, pad


def trim_padded(images, movie, batch_size: int):
    """Drop mesh-padding rows and convert to host numpy (movie's batch is its
    second axis: [frames, batch, ...])."""
    import numpy as np

    images = np.asarray(images)[:batch_size]
    movie = None if movie is None else np.asarray(movie)[:, :batch_size]
    return images, movie


def ensure_on_device(params, mesh=None):
    """Upload a host-numpy param pytree once; device-resident trees pass
    through untouched (re-uploading ~450MB per sampling call dominates
    wall-clock over the TPU tunnel). With ``mesh``, params are committed to
    the replicated mesh layout so the jitted sampler never re-broadcasts them
    per call."""
    leaves = jax.tree_util.tree_leaves(params)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec())
        # EVERY leaf must already be in the replicated layout to skip the put:
        # a mixed tree (e.g. FSDP keeps small biases replicated but shards the
        # large kernels, and a bias can sort first) would otherwise pass a
        # first-leaf check and push the per-call all-gather into the jitted
        # sampler — the exact re-broadcast this pin exists to avoid.
        if leaves and all(
            isinstance(l, jax.Array) and l.sharding == sharding for l in leaves
        ):
            return params
        from baddiffusion_tpu.parallel.mesh import put_global

        return jax.tree_util.tree_map(lambda l: put_global(l, sharding), params)
    if leaves and not isinstance(leaves[0], jax.Array):
        return jax.device_put(params)
    return params
