"""Full CLI body end-to-end on the CPU backend.

Drives `cli.main()` — the exact production entry point (reference
baddiffusion.py:651-679) — through train+measure and sampling with a tiny
scratch arch (BADDIFFUSION_TINY_ARCH=1 factory hook) on the 8-virtual-device
mesh, so run_train's mesh/FSDP branches, the trainer loop, checkpointing, and
run_measure's score.json path all execute in CI rather than only on hardware.
"""

import json
import os

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def tiny_arch(monkeypatch):
    monkeypatch.setenv("BADDIFFUSION_TINY_ARCH", "1")


def _train_args(tmp_path, extra=()):
    return [
        "--mode", "train+measure", "--dataset", "FAKE", "--batch", "64",
        "--epoch", "1", "--fake_size", "128", "--poison_rate", "0.25",
        "--trigger", "BOX_14", "--target", "CORNER",
        "--measure_sample_n", "8", "--eval_max_batch", "8",
        "--sampling_steps", "4", "--measure_steps", "6",
        "--save_image_epochs", "1", "--save_model_epochs", "1",
        "--result", str(tmp_path), "-o", *extra,
    ]


class TestCLIEndToEnd:
    def test_cli_smoke_train_measure(self, tmp_path, monkeypatch):
        """Fast default-tier pass through the production main(): one
        train+measure invocation at minimal sizes — artifact surface +
        score.json keys. The full roundtrip (sampling mode + resume) runs in
        the gated tier below."""
        monkeypatch.chdir(tmp_path)
        from baddiffusion_tpu import cli

        # batch 64 → grad-accum 2 → the loader's GLOBAL batch is 128, and
        # fake_size 128 yields exactly one train step; a smaller fake_size
        # would drop_last to ZERO steps and the artifacts below would come
        # from the finally-block checkpoint of the untrained init
        cli.main([
            "--mode", "train+measure", "--dataset", "FAKE", "--batch", "64",
            "--epoch", "1", "--fake_size", "128", "--poison_rate", "0.25",
            "--trigger", "BOX_14", "--target", "CORNER",
            "--measure_sample_n", "4", "--eval_max_batch", "4",
            "--sampling_steps", "2", "--measure_steps", "2",
            "--result", str(tmp_path), "-o",
        ])
        out = os.path.join(str(tmp_path), "res_None_FAKE_ep1_c1.0_p0.25_BOX_14-CORNER")
        for f in ("args.json", "config.json", "data.json", "model_index.json", "score.json"):
            assert os.path.exists(os.path.join(out, f)), f
        with open(os.path.join(out, "data.json")) as f:
            assert json.load(f)["step"] > 0, "smoke run executed zero train steps"
        with open(os.path.join(out, "score.json")) as f:
            sc = json.load(f)
        assert any(k.startswith("FID_proxy") for k in sc)

    def test_measure_reuse_decisions_snapshotted_before_sampling(self, tmp_path, monkeypatch):
        """run_measure(resample=False): the skip-if-dir-exists decisions must
        be snapshotted BEFORE any sampling starts — a racing peer creating the
        dirs mid-run (simulated by the first fake sampling call) must not make
        the second branch silently skip its shard."""
        monkeypatch.chdir(tmp_path)
        from baddiffusion_tpu import cli
        from baddiffusion_tpu.config import setup

        config = setup([
            "--mode", "train+measure", "--dataset", "FAKE", "--batch", "64",
            "--epoch", "1", "--fake_size", "128", "--poison_rate", "0.25",
            "--trigger", "BOX_14", "--target", "CORNER",
            "--measure_sample_n", "4", "--eval_max_batch", "4",
            "--result", str(tmp_path), "-o",
        ])
        dsl = cli.get_data_loader(config)

        calls = []

        def fake_sampling_save(sample_n, pipeline, path, **kw):
            calls.append(os.path.basename(path))
            base = os.path.join(config.output_dir, "measure")
            os.makedirs(os.path.join(base, "clean_noclip"), exist_ok=True)
            os.makedirs(os.path.join(base, "backdoor_noclip"), exist_ok=True)

        class FakePipe:
            def sample_shape(self, n):
                return (n, dsl.image_size, dsl.image_size, dsl.channel)

        monkeypatch.setattr(cli, "load_pipeline_for_eval", lambda c: FakePipe())
        monkeypatch.setattr(cli, "batch_sampling_save", fake_sampling_save)
        monkeypatch.setattr(cli, "fid_fn", lambda paths: 1.0)
        monkeypatch.setattr(cli, "load_image_dir", lambda p: np.zeros((4, 32, 32, 3), np.float32))
        monkeypatch.setattr(cli, "mse_fn", lambda a, b: 0.0)
        monkeypatch.setattr(cli, "ssim_fn", lambda a, b: 1.0)

        cli.run_measure(config, dsl=dsl, resample=False)
        assert calls == ["clean_noclip", "backdoor_noclip"]  # neither branch skipped

    @pytest.mark.slow
    def test_train_measure_sampling_roundtrip(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)  # measure/<DATASET> dump is cwd-relative
        from baddiffusion_tpu import cli

        cli.main(_train_args(tmp_path))
        out = os.path.join(str(tmp_path), "res_None_FAKE_ep1_c1.0_p0.25_BOX_14-CORNER")

        # artifact surface (reference layout)
        for f in ("args.json", "config.json", "measure.json", "data.json",
                  "model_index.json", "score.json"):
            assert os.path.exists(os.path.join(out, f)), f
        assert os.path.isdir(os.path.join(out, "unet"))
        assert os.path.isdir(os.path.join(out, "samples"))
        assert os.path.isdir(os.path.join(out, "backdoor_samples"))

        with open(os.path.join(out, "score.json")) as f:
            sc = json.load(f)
        # proxy extractor offline -> FID_proxy key, never bare FID
        assert any(k.startswith("FID_proxy") for k in sc)
        assert not any(k == "FID_noclip" or k == "FID" for k in sc)
        assert np.isfinite(sc["MSE_noclip"]) and np.isfinite(sc["SSIM_noclip"])

        # sampling mode reloads args.json from the run dir
        cli.main(["--mode", "sampling", "--ckpt", out])
        assert os.path.exists(os.path.join(out, "sampling.json"))

        # resume restores trainer state and re-runs the saved epoch (the
        # reference's start_epoch semantics): the cumulative step counter
        # advances past the original run's
        with open(os.path.join(out, "data.json")) as f:
            step_before = json.load(f)["step"]
        cli.main(["--mode", "resume", "--ckpt", out])
        with open(os.path.join(out, "data.json")) as f:
            data = json.load(f)
        assert data["step"] > step_before

    def test_fsdp_cli_branch_on_mesh(self, tmp_path, monkeypatch):
        """--param_sharding fsdp through the production run_train on the
        8-device virtual mesh."""
        monkeypatch.chdir(tmp_path)
        from baddiffusion_tpu import cli

        args = _train_args(tmp_path, ["--param_sharding", "fsdp", "--postfix", "fsdp"])
        args[1] = "train"  # mode position: ["--mode", "train", ...]
        cli.main(args)
        out = os.path.join(str(tmp_path), "res_None_FAKE_ep1_c1.0_p0.25_BOX_14-CORNER_fsdp")
        assert os.path.exists(os.path.join(out, "data.json"))
