"""Pallas ops: fused GroupNorm+SiLU correctness vs the jnp reference.

On the CPU test backend the dispatcher always takes the reference path; the
Pallas path itself is exercised on TPU (see ops/groupnorm.py for measured
numbers). Here we verify the reference math and the dispatch contract.
"""

import jax
import jax.numpy as jnp
import numpy as np

from baddiffusion_tpu.models.resnet import GroupNorm
from baddiffusion_tpu.ops import groupnorm_silu, groupnorm_silu_reference


def test_reference_matches_groupnorm_module():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 32).astype(np.float32))
    scale = jnp.asarray(rng.randn(32).astype(np.float32))
    bias = jnp.asarray(rng.randn(32).astype(np.float32))

    gn = GroupNorm(num_groups=8)
    params = {"scale": scale, "bias": bias}
    expected = jax.nn.silu(gn.apply({"params": params}, x))
    got = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_dispatch_cpu_fallback():
    # on CPU the dispatcher must use the reference path and produce identical values
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    a = groupnorm_silu(x, scale, bias, num_groups=8)
    b = groupnorm_silu_reference(x, scale, bias, num_groups=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_matches_reference():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 16).astype(np.float32))
    scale = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
    bias = jnp.asarray(rng.randn(16).astype(np.float32))

    ga = jax.grad(lambda a: groupnorm_silu(a, scale, bias, 4).sum())(x)
    gb = jax.grad(lambda a: groupnorm_silu_reference(a, scale, bias, 4).sum())(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_attention_reference_matches_module_math():
    import jax
    import jax.numpy as jnp

    from baddiffusion_tpu.ops import attention, attention_reference

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(2, 4, 64, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 4, 64, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 4, 64, 16).astype(np.float32))
    scale = 1.0 / 4.0
    # plain-softmax oracle
    scores = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) * scale
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    expected = np.einsum("bhqk,bhkd->bhqd", probs, np.asarray(v))
    np.testing.assert_allclose(np.asarray(attention_reference(q, k, v, scale)), expected, atol=1e-5)
    # dispatcher falls back to reference on CPU
    np.testing.assert_allclose(np.asarray(attention(q, k, v, scale)), expected, atol=1e-5)


def test_attention_grad_flows():
    import jax
    import jax.numpy as jnp

    from baddiffusion_tpu.ops import attention

    q = jnp.ones((1, 1, 8, 4)) * 0.1
    g = jax.grad(lambda a: attention(a, q, q, 0.5).sum())(q)
    assert np.isfinite(np.asarray(g)).all()


class TestFusedGroupNormSiLUKernel:
    """Direct Pallas-path correctness (interpret mode on CPU; the same code
    compiles on TPU). Covers the hand-written backward: dx, dscale, dbias."""

    def _data(self, b=4, h=16, w=16, c=128, seed=0, dtype=jnp.float32):
        import numpy as np

        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(b, h, w, c), dtype)
        scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        return x, scale, bias

    def test_forward_matches_reference(self):
        from jax.experimental.pallas import tpu as pltpu

        from baddiffusion_tpu.ops.groupnorm import fused_groupnorm_silu

        x, scale, bias = self._data()
        with pltpu.force_tpu_interpret_mode():
            got = fused_groupnorm_silu(x, scale, bias, 32)
        want = groupnorm_silu_reference(x, scale, bias, 32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_backward_matches_reference(self):
        from jax.experimental.pallas import tpu as pltpu

        from baddiffusion_tpu.ops.groupnorm import fused_groupnorm_silu

        x, scale, bias = self._data(seed=3)
        import numpy as np_

        ct = jnp.asarray(np_.random.RandomState(9).randn(*x.shape), jnp.float32)

        def loss_fused(x, s, b):
            return jnp.vdot(fused_groupnorm_silu(x, s, b, 32), ct)

        def loss_ref(x, s, b):
            return jnp.vdot(groupnorm_silu_reference(x, s, b, 32), ct)

        with pltpu.force_tpu_interpret_mode():
            gx, gs, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        rx, rs, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), atol=2e-3, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=2e-3, rtol=1e-4)

    def test_backward_bf16_and_multiblock(self):
        """bf16 activations + a grid with several batch blocks (accumulated
        dscale/dbias across sequential grid steps)."""
        from jax.experimental.pallas import tpu as pltpu

        from baddiffusion_tpu.ops.groupnorm import fused_groupnorm_silu

        # b=16 so the backward block picker (2 MiB budget, 512 KiB/row) finds
        # no fitting multiple-of-8 block and falls back to bb=8 -> grid=(2,):
        # the cross-block dscale/dbias accumulation genuinely executes (b=8
        # would collapse to a single full-batch block and never test it)
        x, scale, bias = self._data(b=16, h=32, w=32, c=128, seed=5, dtype=jnp.bfloat16)
        from baddiffusion_tpu.ops.groupnorm import _pick_block_batch

        assert _pick_block_batch(16, 32 * 32 * 128 * 4, budget=2 * 1024 * 1024) == 8

        def loss_fused(x, s, b):
            return jnp.sum(fused_groupnorm_silu(x, s, b, 32) ** 2)

        def loss_ref(x, s, b):
            return jnp.sum(groupnorm_silu_reference(x, s, b, 32) ** 2)

        with pltpu.force_tpu_interpret_mode():
            gx, gs, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
        rx, rs, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
        np.testing.assert_allclose(np.asarray(gx, np.float32), np.asarray(rx, np.float32), atol=0.05, rtol=0.05)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=0.02, atol=0.5)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=0.02, atol=0.5)
