"""Multi-host path (parallel/distributed.py — SURVEY §2.4/§5.8).

Two tiers:
  * single-process: host_shard_slice math + global_batch_from_host_shards on
    the 8-virtual-device mesh (process_count == 1: local rows == global batch);
  * integration: TWO real processes under jax.distributed over a local TCP
    coordinator, running shard assembly AND one full sharded train step
    (tests/multihost_worker.py).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestHostShardSlice:
    def test_explicit_processes(self):
        from baddiffusion_tpu.parallel.distributed import host_shard_slice

        slices = [host_shard_slice(12, process_index=i, process_count=3) for i in range(3)]
        assert slices == [slice(0, 4), slice(4, 8), slice(8, 12)]
        # slices tile the batch exactly
        idx = np.concatenate([np.arange(12)[s] for s in slices])
        np.testing.assert_array_equal(idx, np.arange(12))

    def test_current_process_defaults(self):
        import jax

        from baddiffusion_tpu.parallel.distributed import host_shard_slice

        per = 16 // jax.process_count()
        sl = host_shard_slice(16)
        assert sl == slice(jax.process_index() * per, (jax.process_index() + 1) * per)


class TestGlobalBatchSingleProcess:
    def test_matches_shard_batch(self):
        """process_count==1: the assembled global array equals a plain
        data-sharded device_put of the same rows."""
        import jax

        from baddiffusion_tpu.parallel import make_mesh
        from baddiffusion_tpu.parallel.distributed import global_batch_from_host_shards, host_shard_slice
        from baddiffusion_tpu.parallel.mesh import shard_batch

        if len(jax.devices()) < 2:
            pytest.skip("needs the virtual multi-device mesh")
        mesh = make_mesh()
        n = 2 * len(jax.devices())
        batch = {
            "image_u8": np.arange(n * 4 * 4 * 3, dtype=np.uint8).reshape(n, 4, 4, 3),
            "is_clean": (np.arange(n) % 2).astype(bool),
        }
        local = {k: v[host_shard_slice(n)] for k, v in batch.items()}
        ga = global_batch_from_host_shards(local, mesh)
        gb = shard_batch(batch, mesh)
        for k in batch:
            assert ga[k].shape == gb[k].shape
            assert ga[k].sharding == gb[k].sharding
            np.testing.assert_array_equal(np.asarray(ga[k]), np.asarray(gb[k]))


class TestAlignedStep:
    def test_signature_keys_on_aval_and_sharding(self):
        """The executable cache must key on each leaf's (aval, sharding), not
        sharding alone: an AOT executable hard-errors on aval changes that a
        plain jit call would absorb by recompiling (e.g. a ragged final
        batch), so a same-sharding different-shape call needs a NEW entry."""
        import jax
        import jax.numpy as jnp

        from baddiffusion_tpu.parallel.distributed import AlignedStep

        step = AlignedStep(jax.jit(lambda x: x * 2.0))
        a = jnp.arange(8, dtype=jnp.float32)
        np.testing.assert_array_equal(np.asarray(step(a)), np.asarray(a) * 2)
        assert len(step._compiled) == 1
        # steady state: same signature reuses the cached executable
        step(a + 1.0)
        assert len(step._compiled) == 1
        # ragged batch: same (replicated) sharding, different shape — must
        # compile a second executable and still produce the right answer
        b = jnp.arange(5, dtype=jnp.float32)
        assert b.sharding == a.sharding
        np.testing.assert_array_equal(np.asarray(step(b)), np.asarray(b) * 2)
        assert len(step._compiled) == 2
        # dtype is part of the aval too
        c = jnp.arange(8, dtype=jnp.bfloat16)
        step(c)
        assert len(step._compiled) == 3

    def test_non_array_leaves_and_donation(self):
        """numpy/scalar leaves sign as None; jit donation survives AOT."""
        import jax
        import jax.numpy as jnp

        from baddiffusion_tpu.parallel.distributed import AlignedStep

        step = AlignedStep(jax.jit(lambda s, k: s + k, donate_argnums=(0,)))
        s = jnp.ones((4,), jnp.float32)
        out = step(s, np.float32(3.0))
        np.testing.assert_array_equal(np.asarray(out), np.full((4,), 4.0, np.float32))
        assert len(step._compiled) == 1
        assert s.is_deleted()  # donated buffer was consumed
        # the donated-output array feeds the next call with the same signature
        out2 = step(out, np.float32(1.0))
        assert len(step._compiled) == 1
        np.testing.assert_array_equal(np.asarray(out2), np.full((4,), 5.0, np.float32))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(phase: str, layout: str, out_dir: str):
    """Run 2 worker processes through one phase; return their stdouts."""
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)  # worker sets its own
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(i), "2", str(port), phase, layout, out_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # generous bound: under pytest-xdist the host is oversubscribed
            # and the two workers' XLA compiles can take several minutes
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"multihost worker timed out (phase={phase}, layout={layout})")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} ({phase}/{layout}) failed:\n{out[-3000:]}"
    return outs


def _marker_losses(outs, marker: str):
    return [line.split()[1] for out in outs for line in out.splitlines() if line.startswith(marker)]


@pytest.mark.slow  # two real jax.distributed processes: gated tier
@pytest.mark.reference
class TestTwoProcessIntegration:
    @pytest.mark.parametrize("layout", ["replicated", "fsdp", "tp_fsdp"])
    def test_two_process_train_checkpoint_resume(self, layout, tmp_path):
        """jax.distributed over 2 real local processes: shard assembly, two
        full sharded backdoor train steps, a multi-process checkpoint (orbax
        sharded save + process-0 HF export), then BOTH processes are gone and
        a fresh pair restores INTO the same layout and continues — step-3
        loss and final params bitwise-equal to an uninterrupted 3-step run.

        layout=fsdp is the case the round-2 review called out: params + Adam
        moments are sharded so no single process can address the full state —
        a naive device_get checkpoint would crash outright. layout=tp_fsdp
        runs the composed 2-D (data × model) mesh with REAL cross-process
        data-axis subgroup collectives (TP grad all-reduce, FSDP
        reduce-scatter) — the sub-clique scenario warmup_mesh_collectives
        protects.
        """
        out_dir = str(tmp_path / f"run_{layout}")
        outs = _launch("train", layout, out_dir)
        ok = _marker_losses(outs, "MULTIHOST_OK")
        saved = _marker_losses(outs, "MULTIHOST_SAVED")
        assert len(ok) == 2 and ok[0] == ok[1], outs
        assert len(saved) == 2 and saved[0] == saved[1], outs
        # dual checkpoint format on disk (reference baddiffusion.py:558-570)
        assert os.path.isdir(os.path.join(out_dir, "ckpt"))
        assert os.path.exists(os.path.join(out_dir, "data.json"))
        assert os.path.exists(os.path.join(out_dir, "unet", "config.json"))

        outs = _launch("resume", layout, out_dir)
        resumed = _marker_losses(outs, "MULTIHOST_RESUME_OK")
        assert len(resumed) == 2 and resumed[0] == resumed[1], outs

    def test_two_process_cli_train_measure_sharded_eval(self, tmp_path):
        """The production cli.main() end-to-end in 2 processes: global-mesh
        training, multi-process checkpoint, then run_measure sharding the
        sample generation across BOTH processes (round-robin eval chunks into
        one shared dir), barrier, metrics + score.json on process 0 only."""
        import json

        out_dir = str(tmp_path / "cli_world")
        os.makedirs(out_dir, exist_ok=True)
        outs = _launch("cli", "replicated", out_dir)
        counts = _marker_losses(outs, "MULTIHOST_CLI_OK")
        assert sorted(counts) == ["-1", "6"], outs  # proc 0 saw all 6 PNGs

        run_dir = os.path.join(out_dir, "res_None_FAKE_ep1_c1.0_p0.25_BOX_8-CORNER")
        for branch in ("clean_noclip", "backdoor_noclip"):
            files = sorted(os.listdir(os.path.join(run_dir, "measure", branch)))
            assert files == [f"{i}.png" for i in range(6)], (branch, files)
        with open(os.path.join(run_dir, "score.json")) as f:
            sc = json.load(f)
        assert np.isfinite(sc["MSE_noclip"]) and np.isfinite(sc["SSIM_noclip"]), sc

    def test_two_process_anp_defense(self, tmp_path):
        """The production anp_cli.main() in 2 processes (VERDICT r3 item 5):
        the −clean-loss step's batch shards over the global mesh (AlignedStep
        + put_global placement), per-epoch eval gathers the perturbation tree
        and runs on process 0 only, score.json carries the ANP grammar."""
        import json

        out_dir = str(tmp_path / "anp_world")
        os.makedirs(out_dir, exist_ok=True)
        outs = _launch("anp", "replicated", out_dir)
        marks = _marker_losses(outs, "MULTIHOST_ANP_OK")
        assert len(marks) == 2 and "-1" in marks, outs
        mse = [m for m in marks if m != "-1"]
        assert len(mse) == 1 and np.isfinite(float(mse[0])), outs

        anp_dir = os.path.join(
            out_dir, "res_anp_2_lr0.0001_pb4.0_res_None_FAKE_ep1_c1.0_p0.25_BOX_8-CORNER"
        )
        with open(os.path.join(anp_dir, "score.json")) as f:
            sc = json.load(f)
        # per-epoch keys + best-tracking (reference anp_util.py:233-270)
        assert "MSE_ep1" in sc and "MSE_best" in sc and "SSIM_best" in sc, sc
        assert sc["MSE_best"] == min(v for k, v in sc.items() if k.startswith("MSE")), sc
