"""Config/CLI layer: mode allow-lists, run-dir naming, LR/grad-accum policy,
json persistence, fclip semantics — against the reference's setup() contract
(baddiffusion.py:130-248)."""

import json
import os

import pytest

from baddiffusion_tpu.config import MODE_TRAIN, TrainingConfig, naming_fn, setup


def train_args(tmp_path, extra=()):
    return [
        "--mode", "train", "--dataset", "FAKE", "--batch", "128",
        "--poison_rate", "0.1", "--result", str(tmp_path), "-o", *extra,
    ]


class TestSetup:
    def test_run_dir_naming_and_artifacts(self, tmp_path):
        config = setup(train_args(tmp_path, ["--trigger", "BOX_14", "--target", "HAT", "--epoch", "50"]))
        assert os.path.basename(config.output_dir) == "res_None_FAKE_ep50_c1.0_p0.1_BOX_14-HAT"
        assert os.path.exists(os.path.join(config.output_dir, "args.json"))
        assert os.path.exists(os.path.join(config.output_dir, "config.json"))
        with open(os.path.join(config.output_dir, "config.json")) as f:
            persisted = json.load(f)
        assert persisted["poison_rate"] == 0.1

    def test_postfix_in_name(self, tmp_path):
        config = setup(train_args(tmp_path, ["--postfix", "xyz"]))
        assert config.output_dir.endswith("_xyz")

    def test_lr_policy_32px(self, tmp_path):
        # scratch (no ckpt): 2e-4; grad accum = 128//batch
        config = setup(train_args(tmp_path, ["--batch", "32", "--postfix", "a"]))
        assert config.learning_rate == pytest.approx(2e-4)
        assert config.gradient_accumulation_steps == 4

    def test_batch_divisibility_enforced(self, tmp_path):
        args = ["--mode", "train", "--dataset", "FAKE", "--batch", "48",
                "--poison_rate", "0.1", "--result", str(tmp_path), "-o"]
        with pytest.raises(ValueError, match="divisible"):
            setup(args)

    def test_default_batch_512_rejected(self, tmp_path):
        # the reference quirk (SURVEY §8.5): default --batch 512 always fails
        # the 32px policy (128 % 512 != 0 fires first, as in the reference)
        args = ["--mode", "train", "--dataset", "FAKE", "--poison_rate", "0.1",
                "--result", str(tmp_path), "-o"]
        with pytest.raises(ValueError, match="divisible"):
            setup(args)

    def test_fclip_semantics(self, tmp_path):
        config = setup(train_args(tmp_path, ["--fclip", "w", "--postfix", "c"]))
        assert config.clip is True
        config = setup(train_args(tmp_path, ["--fclip", "o", "--postfix", "d"]))
        assert config.clip is False

    def test_overwrite_protection(self, tmp_path):
        args = train_args(tmp_path, ["--postfix", "e"])
        setup(args)
        with pytest.raises(ValueError, match="overwrite"):
            setup([a for a in args if a != "-o"])

    def test_overwrite_check_is_primary_only(self, tmp_path, monkeypatch):
        """On a pod, peers must not race process 0's mkdir into a spurious
        'already been created': only process 0 makes the overwrite decision;
        peers just wait for the dir (already present here → proceed)."""
        import jax

        args = train_args(tmp_path, ["--postfix", "mp"])
        setup(args)  # process 0 creates the run dir
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        # same launch WITHOUT -o on a peer: no ValueError, dir already there
        config = setup([a for a in args if a != "-o"])
        assert os.path.isdir(config.output_dir)

    def test_peer_times_out_when_primary_refused(self, tmp_path, monkeypatch):
        """If process 0 refused the launch, the run dir never appears and a
        peer must exit with a pointer instead of hanging in a collective."""
        import time as _time

        import jax

        monkeypatch.setattr(jax, "process_index", lambda: 1)
        t = {"now": 0.0}
        monkeypatch.setattr(_time, "monotonic", lambda: t.__setitem__("now", t["now"] + 200) or t["now"])
        monkeypatch.setattr(_time, "sleep", lambda s: None)
        with pytest.raises(RuntimeError, match="never approved"):
            setup(train_args(tmp_path, ["--postfix", "mp2"]))

    def test_stale_dir_does_not_fool_peer_with_kv_store(self, tmp_path, monkeypatch):
        """A run dir left by a PRIOR run must not let a peer proceed while
        process 0 is exiting with the overwrite ValueError: with a
        jax.distributed coordination client, approval is a launch-scoped KV
        key, not the dir's existence."""
        import jax

        from baddiffusion_tpu import config as cfgmod

        class FakeKV:
            def __init__(self):
                self.store = {}

            def key_value_set(self, k, v):
                self.store[k] = v

            def blocking_key_value_get(self, k, timeout_ms):
                if k not in self.store:
                    raise TimeoutError(f"no key {k}")
                return self.store[k]

        kv = FakeKV()
        monkeypatch.setattr(cfgmod, "_distributed_kv_client", lambda: kv)

        args = train_args(tmp_path, ["--postfix", "kv"])
        setup(args)  # this launch's process 0: creates dir AND sets the key
        assert any("run_dir_ready" in k for k in kv.store)

        # a NEW launch (fresh coordinator → empty KV) onto the now-stale dir:
        kv.store.clear()
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        with pytest.raises(RuntimeError, match="never approved"):
            setup([a for a in args if a != "-o"])  # dir exists, but no approval

    def test_invalid_arg_for_mode(self, tmp_path):
        config = setup(train_args(tmp_path, ["--postfix", "f"]))
        with pytest.raises(NotImplementedError, match="isn't used in mode"):
            setup(["--mode", "sampling", "--ckpt", config.output_dir, "--epoch", "9"])

    def test_eval_modes_reload_args(self, tmp_path):
        config = setup(train_args(tmp_path, ["--trigger", "BOX_8", "--postfix", "g"]))
        reloaded = setup(["--mode", "sampling", "--ckpt", config.output_dir, "--fclip", "w"])
        assert reloaded.trigger == "BOX_8"  # from args.json
        assert reloaded.clip is True  # mode-allowed override
        assert reloaded.output_dir == config.output_dir
        assert os.path.exists(os.path.join(config.output_dir, "sampling.json"))

    def test_train_measure_writes_measure_json(self, tmp_path):
        args = train_args(tmp_path, ["--postfix", "h"])
        args[1] = "train+measure"
        config = setup(args)
        assert os.path.exists(os.path.join(config.output_dir, "measure.json"))

    def test_sample_ep_negative_means_none(self, tmp_path):
        config = setup(train_args(tmp_path, ["--postfix", "i"]))
        reloaded = setup(["--mode", "measure", "--ckpt", config.output_dir, "--sample_ep", "-1"])
        assert reloaded.sample_ep is None

    def test_remat_flag(self, tmp_path):
        """--remat is an extension flag accepted in every mode; default auto."""
        config = setup(train_args(tmp_path, ["--postfix", "r0"]))
        assert config.remat == "auto"
        config = setup(train_args(tmp_path, ["--postfix", "r1", "--remat", "off"]))
        assert config.remat == "off"
        config = setup(train_args(tmp_path, ["--postfix", "r2", "--remat", "on"]))
        assert config.remat == "on"

    def test_resume_keeps_scratch_learning_rate(self, tmp_path):
        """Resuming a scratch run must not flip its lr to the fine-tune
        default (the lr policy sees ckpt = the run dir, never None)."""
        config = setup(train_args(tmp_path, ["--postfix", "lr0"]))
        assert config.learning_rate == pytest.approx(2e-4)  # 32px scratch
        resumed = setup(["--mode", "resume", "--ckpt", config.output_dir])
        assert resumed.learning_rate == pytest.approx(2e-4)

    def test_lsun_dataset_accepted(self, tmp_path):
        """LSUN names are a TPU-build parser extension: the reference's parser
        excludes them (baddiffusion.py:58) but our loader serves them from
        staged save_to_disk dirs (data/datasets.py), so the CLI accepts them.
        256px policy applies (batch_256=64 grad-accum grammar)."""
        args = ["--mode", "train", "--dataset", "LSUN-CHURCH", "--batch", "16",
                "--poison_rate", "0.1", "--result", str(tmp_path), "-o"]
        config = setup(args)
        assert config.dataset == "LSUN-CHURCH"
        assert config.gradient_accumulation_steps == 4  # 64 // 16

    def test_param_sharding_flag(self, tmp_path):
        config = setup(train_args(tmp_path, ["--postfix", "ps0"]))
        assert config.param_sharding == "replicated"
        config = setup(train_args(tmp_path, ["--postfix", "ps1", "--param_sharding", "fsdp"]))
        assert config.param_sharding == "fsdp"


def test_sample_segment_accepted_in_every_mode(tmp_path):
    """--sample_segment is an extension flag (EXTRA_OPTS): valid in train
    AND in the args.json-reloading eval modes, landing in config."""
    config = setup(train_args(tmp_path, ["--sample_segment", "100", "--postfix", "ss"]))
    assert config.sample_segment == 100
    reloaded = setup(["--mode", "sampling", "--ckpt", config.output_dir,
                      "--sample_segment", "50"])
    assert reloaded.sample_segment == 50
