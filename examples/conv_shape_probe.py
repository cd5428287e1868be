"""Standalone conv-shape probe for the 32px MXU-efficiency question.

The train-step attribution (examples/profile_attribution.py) shows two conv
populations at the SAME spatial/channel scale: ~124 TFLOP/s (fwd conv1 and
wgrad at 32x32, C_out=128) vs ~177 TFLOP/s (dgrad at 32x32, C_out=256).
This probe times each conv shape in isolation — fwd, and fwd+bwd — to find
whether the slow mapping is inherent to the shape (N=128 tile width) or an
artifact of the full-graph fusion context.

Timing discipline: N iterations run inside ONE compiled fori_loop with a
scalar data dependency between iterations (a tiny mean of the previous
output perturbs the next input). Independent repeated dispatches of an
identical (program, args) pair measure as impossibly fast through the axon
tunnel (>100% MXU "efficiency") — they are deduplicated somewhere below
jax, so wall-clock over a dependent chain is the only trustworthy form.

Run: python examples/conv_shape_probe.py
Prints one JSON line per case: {case, ms, tflops, eff_pct} (v5e peak 197).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/baddiffusion_tpu/jax")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK = 197e12  # v5e bf16
B = 128
ITERS = 50


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def chain(step_fn):
    """iters x step_fn with a scalar feedback so no two iterations are
    CSE-able, plus a per-call ``salt`` operand so no two INVOCATIONS carry
    identical (program, args) — the tunnel memoizes those too."""

    def run(x, k, salt):
        def body(_, carry):
            x_c, fb = carry
            out = step_fn(x_c + fb.astype(x_c.dtype), k)
            out0 = out[0] if isinstance(out, tuple) else out
            return x_c, jnp.mean(out0).astype(jnp.float32) * 1e-12
        _, fb = jax.lax.fori_loop(
            0, ITERS, body, (x + salt.astype(x.dtype), jnp.zeros((), jnp.float32))
        )
        return fb

    return jax.jit(run)


def time_chain(fn, x, k):
    float(fn(x, k, jnp.float32(0.0)))  # compile; host fetch = hard sync
    best = float("inf")
    for i in range(3):
        salt = jnp.float32(1e-6 * (i + 1))
        t0 = time.perf_counter()
        float(fn(x, k, salt))  # block_until_ready alone returned early here
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def run_case(name, hw, cin, cout, mode="fwd", epilogue=None):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, hw, hw, cin), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.01
    flops = 2.0 * B * hw * hw * 9 * cin * cout

    if mode == "fwd":
        if epilogue == "gnstats":
            def f(x, k):
                y = conv(x, k)
                y32 = y.astype(jnp.float32)
                g = y32.reshape(B, hw, hw, 32, cout // 32)
                mean = jnp.mean(g, axis=(1, 2, 4))
                meansq = jnp.mean(jnp.square(g), axis=(1, 2, 4))
                return y, mean, meansq
        else:
            f = conv
        n = 1.0
    else:  # fwd+bwd: one fwd conv + dgrad + wgrad = 3x flops
        def f(x, k):
            def loss(k, x):
                return jnp.sum(conv(x, k).astype(jnp.float32) ** 2) * 1e-12
            gk, gx = jax.grad(loss, argnums=(0, 1))(k, x)
            return gx
        n = 3.0

    dt = time_chain(chain(f), x, k)
    tf = flops * n / dt / 1e12
    print(json.dumps({
        "case": name, "ms": round(dt * 1e3, 3),
        "tflops": round(tf, 1), "eff_pct": round(100 * tf * 1e12 / PEAK, 1),
    }), flush=True)


def main():
    cases = [
        ("fwd 32x32 128->128", 32, 128, 128, "fwd", None),
        ("fwd 32x32 256->128", 32, 256, 128, "fwd", None),
        ("fwd 32x32 128->256", 32, 128, 256, "fwd", None),
        ("fwd 32x32 256->128 +gnstats", 32, 256, 128, "fwd", "gnstats"),
        ("fwd 16x16 256->256", 16, 256, 256, "fwd", None),
        ("fwd 16x16 512->512", 16, 512, 512, "fwd", None),
        ("fwd 8x8 512->512", 8, 512, 512, "fwd", None),
        ("fwd 4x4 512->512", 4, 512, 512, "fwd", None),
        ("fwdbwd 32x32 128->128", 32, 128, 128, "bwd", None),
        ("fwdbwd 32x32 256->128", 32, 256, 128, "bwd", None),
        ("fwdbwd 16x16 512->512", 16, 512, 512, "bwd", None),
    ]
    for c in cases:
        run_case(*c)


if __name__ == "__main__":
    main()
