"""Run configuration: flags, per-mode merging, run-dir naming, persistence.

Behavioral contract: reference `baddiffusion.py:16-248`:
  - 5 modes (train/resume/sampling/measure/train+measure) with per-mode
    allow-lists; args not valid for a mode raise (baddiffusion.py:163-175)
  - resume/sampling/measure reload ``args.json`` from the ckpt dir then apply
    only the mode-allowed CLI overrides (:154-173)
  - run-dir ``res_{ckpt}_{ds}_ep{E}_c{clean}_p{poison}_{trigger}-{target}[_{postfix}]``
    (:130-134), overwrite protection (:223-225)
  - dataset-keyed LR/grad-accum policy: 32px → global batch 128, 256px → 64;
    ``grad_accum = global_batch // --batch`` with divisibility check (:195-217)
  - writes ``args.json`` + ``config.json`` (train), ``sampling.json`` /
    ``measure.json`` for those modes (:229-234)

The ``--gpu`` flag is accepted for CLI compatibility but maps to "visible
device selection" which on TPU is a no-op (documented, not silently ignored).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass
from typing import List, Optional

from baddiffusion_tpu.data.datasets import DatasetLoader
from baddiffusion_tpu.data.triggers import Backdoor
from baddiffusion_tpu.utils.logging import Log

MODE_TRAIN = "train"
MODE_RESUME = "resume"
MODE_SAMPLING = "sampling"
MODE_MEASURE = "measure"
MODE_TRAIN_MEASURE = "train+measure"
MODES = [MODE_TRAIN, MODE_RESUME, MODE_SAMPLING, MODE_MEASURE, MODE_TRAIN_MEASURE]

DEFAULT_PROJECT = "Default"
DEFAULT_BATCH = 512
DEFAULT_EVAL_MAX_BATCH = 256
DEFAULT_EPOCH = 50
DEFAULT_LEARNING_RATE_32 = 2e-4
DEFAULT_LEARNING_RATE_256 = 8e-5
DEFAULT_CLEAN_RATE = 1.0
DEFAULT_POISON_RATE = 0.007
DEFAULT_TRIGGER = Backdoor.TRIGGER_BOX_14
DEFAULT_TARGET = Backdoor.TARGET_CORNER

NOT_MODE_TRAIN_OPTS = ["sample_ep"]
NOT_MODE_TRAIN_MEASURE_OPTS = ["sample_ep"]
MODE_RESUME_OPTS = ["project", "mode", "gpu", "ckpt"]
MODE_SAMPLING_OPTS = ["project", "mode", "eval_max_batch", "gpu", "fclip", "ckpt", "sample_ep", "sched"]
MODE_MEASURE_OPTS = ["project", "mode", "eval_max_batch", "gpu", "fclip", "ckpt", "sample_ep", "sched"]
IGNORE_ARGS = ["overwrite", "is_save_all_model_epochs"]
EXTRA_OPTS = ["fake_size", "measure_sample_n", "measure_steps", "sampling_steps", "profile_steps", "split_method", "eval_dtype", "remat", "param_sharding", "model_parallel", "capture_every", "image_size", "async_ckpt", "sample_segment"]

SCHED_CHOICES = [
    "DDPM-SCHED", "DDIM-SCHED",
    "DPM_SOLVER_PP_O1-SCHED", "DPM_SOLVER_O1-SCHED",
    "DPM_SOLVER_PP_O2-SCHED", "DPM_SOLVER_O2-SCHED",
    "DPM_SOLVER_PP_O3-SCHED", "DPM_SOLVER_O3-SCHED",
    "UNIPC-SCHED", "PNDM-SCHED", "DEIS-SCHED", "HEUN-SCHED", "LMSD-SCHED",
    "SCORE-SDE-VE-SCHED",
]


@dataclass
class TrainingConfig:
    project: str = DEFAULT_PROJECT
    mode: str = MODE_TRAIN
    dataset: Optional[str] = None
    sched: Optional[str] = None
    batch: int = DEFAULT_BATCH
    epoch: int = DEFAULT_EPOCH
    eval_max_batch: int = DEFAULT_EVAL_MAX_BATCH
    learning_rate: Optional[float] = None
    clean_rate: float = DEFAULT_CLEAN_RATE
    poison_rate: float = DEFAULT_POISON_RATE
    trigger: str = DEFAULT_TRIGGER
    target: str = DEFAULT_TARGET
    dataset_load_mode: str = DatasetLoader.MODE_FIXED
    gpu: str = "0"
    ckpt: Optional[str] = None
    overwrite: bool = False
    postfix: str = ""
    fclip: str = "o"
    save_image_epochs: int = 20
    save_model_epochs: int = 5
    is_save_all_model_epochs: bool = False
    sample_ep: Optional[int] = None
    result: str = "."

    eval_sample_n: int = 16
    measure_sample_n: int = 2048
    batch_32: int = 128
    batch_256: int = 64
    gradient_accumulation_steps: int = 1
    learning_rate_32_scratch: float = 2e-4
    learning_rate_256_scratch: float = 2e-5
    lr_warmup_steps: int = 500
    # bf16 is the TPU-native mixed precision (the reference's 'fp16' + grad
    # scaler maps to bf16-compute/f32-params here; no loss scaling needed)
    mixed_precision: str = "bf16"
    seed: int = 0
    dataset_path: str = "datasets"
    ckpt_dir: str = "ckpt"
    data_ckpt_dir: str = "data.json"
    ep_model_dir: str = "epochs"

    # derived
    output_dir: Optional[str] = None
    clip: Optional[bool] = None

    # TPU-build extensions (optional flags; not in the reference surface)
    fake_size: int = 512  # FAKE dataset size (offline testing)
    split_method: str = "seeded"  # poison-split source: seeded numpy perm | "hf" train_test_split
    eval_dtype: str = "fp32"  # sampling/measure UNet compute: fp32 (reference parity) | bf16 (~2x faster)
    # UNet rematerialization in the train step: "auto" = only where activations
    # would not fit HBM (256px above micro-batch 16 on a 16 GiB v5e — measured:
    # no-remat fits through batch 16 with <=10 GiB temp and is +28% faster at
    # the canonical micro-batch 4; examples/mfu_analysis.py); "on"/"off" force.
    remat: str = "auto"
    # parameter layout on a multi-chip mesh: "replicated" (reference-parity
    # DP) or "fsdp" (ZeRO-3-style: params + Adam moments sharded over the
    # data axis, GSPMD all-gathers on use — the scale path for models whose
    # optimizer state exceeds one chip's HBM). Single chip: no effect.
    param_sharding: str = "replicated"
    # size of the tensor-parallel ``model`` mesh axis (1 = pure DP). With
    # N devices and model_parallel=m, the CLI builds a 2-D (data=N/m, model=m)
    # mesh: wide UNet kernels shard over ``model`` (sharding_rules.py) and
    # --param_sharding fsdp composes on the same mesh's data axis.
    model_parallel: int = 1
    sampling_steps: int = 1000  # inference steps for train-time sample grids
    # movie-frame stride for qualitative sampling: None = ~50 frames total;
    # 1 = the reference's every-step trajectory (pipeline_ddpm.py:103-113)
    capture_every: Optional[int] = None
    # override the dataset-keyed image size (the reference hardcodes
    # 32/64/256 per dataset, dataset.py:105-118; None keeps those defaults)
    image_size: Optional[int] = None
    # cap on sampling-chain steps per XLA program invocation (pipelines'
    # segment_steps): identical math as bounded-length programs with
    # device-resident carry, for environments where one multi-minute program
    # is operationally fragile. None = whole chain as one program.
    sample_segment: Optional[int] = None
    # inference steps for MEASURE sampling; None = each pipeline's default
    # (DDPM 1000, solver families 50 — reference measure never overrides)
    measure_steps: Optional[int] = None
    profile_steps: int = 0  # >0: write a jax.profiler trace of N train steps
    # overlap the orbax checkpoint disk write with training (single-process;
    # data.json is deferred until the commit completes, so a crash inside the
    # async window can only make resume conservative — checkpoint.py)
    async_ckpt: bool = False

    def save_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2, sort_keys=True, default=str)


def naming_fn(config: TrainingConfig) -> str:
    add_on = f"_{config.postfix}" if config.postfix else ""
    return (
        f"res_{config.ckpt}_{config.dataset}_ep{config.epoch}"
        f"_c{config.clean_rate}_p{config.poison_rate}"
        f"_{config.trigger}-{config.target}{add_on}"
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="baddiffusion_tpu — TPU-native BadDiffusion")
    parser.add_argument("--project", "-pj", type=str)
    parser.add_argument("--mode", "-m", required=True, type=str, choices=MODES)
    parser.add_argument(
        "--dataset", "-ds", type=str,
        # LSUN names are a TPU-build extension: the reference's parser (and
        # loader) exclude them (baddiffusion.py:58); here they load from
        # staged save_to_disk dirs (data/datasets.py)
        choices=[DatasetLoader.MNIST, DatasetLoader.CIFAR10, DatasetLoader.CELEBA,
                 DatasetLoader.CELEBA_HQ, DatasetLoader.LSUN_CHURCH,
                 DatasetLoader.LSUN_BEDROOM, DatasetLoader.FAKE],
    )
    parser.add_argument("--batch", "-b", type=int)
    parser.add_argument("--sched", "-sc", type=str, choices=SCHED_CHOICES)
    parser.add_argument("--eval_max_batch", "-eb", type=int)
    parser.add_argument("--epoch", "-e", type=int)
    parser.add_argument("--learning_rate", "-lr", type=float)
    parser.add_argument("--clean_rate", "-cr", type=float)
    parser.add_argument("--poison_rate", "-pr", type=float)
    parser.add_argument("--trigger", "-tr", type=str)
    parser.add_argument("--target", "-ta", type=str)
    parser.add_argument("--dataset_load_mode", "-dlm", type=str,
                        choices=[DatasetLoader.MODE_FIXED, DatasetLoader.MODE_FLEX])
    parser.add_argument("--gpu", "-g", type=str, help="device selection (no-op on TPU; kept for CLI parity)")
    parser.add_argument("--ckpt", "-c", type=str)
    parser.add_argument("--overwrite", "-o", action="store_true", default=None)
    parser.add_argument("--postfix", "-p", type=str)
    parser.add_argument("--fclip", "-fc", type=str, choices=["w", "o"])
    parser.add_argument("--save_image_epochs", "-sie", type=int)
    parser.add_argument("--save_model_epochs", "-sme", type=int)
    parser.add_argument("--is_save_all_model_epochs", "-isame", action="store_true", default=None)
    parser.add_argument("--sample_ep", "-se", type=int)
    parser.add_argument("--result", "-res", type=str)
    # TPU-build extension flags (accepted in every mode)
    parser.add_argument("--fake_size", type=int, help="FAKE dataset size (offline smoke runs)")
    parser.add_argument("--split_method", type=str, choices=["seeded", "hf"],
                        help="poison-split membership: seeded numpy perm (default) or HF train_test_split(seed)")
    parser.add_argument("--eval_dtype", type=str, choices=["fp32", "bf16"],
                        help="UNet compute dtype for sampling/measure (default fp32, reference parity)")
    parser.add_argument("--remat", type=str, choices=["auto", "on", "off"],
                        help="train-step rematerialization (default auto: only when activations exceed HBM)")
    parser.add_argument("--param_sharding", type=str, choices=["replicated", "fsdp"],
                        help="multi-chip parameter layout (fsdp = ZeRO-3-style sharded params+optimizer)")
    parser.add_argument("--model_parallel", type=int,
                        help="tensor-parallel axis size; N devices become a 2-D (data=N/m, model=m) mesh")
    parser.add_argument("--measure_sample_n", type=int, help="override eval sample count (default 2048)")
    parser.add_argument("--measure_steps", type=int, help="override measure-time inference steps (default: pipeline's)")
    parser.add_argument("--sampling_steps", type=int, help="inference steps for train-time sample grids")
    parser.add_argument("--capture_every", type=int,
                        help="movie-frame stride (1 = reference's every-step trajectory; default ~50 frames)")
    parser.add_argument("--image_size", type=int,
                        help="override the dataset-keyed image size (default: 32/64/256 per dataset)")
    parser.add_argument("--sample_segment", type=int,
                        help="max sampling-chain steps per XLA program invocation "
                        "(identical math; bounds program wall-time on fragile device links)")
    parser.add_argument("--profile_steps", type=int, help="write a jax.profiler trace of N train steps to <out>/profile")
    parser.add_argument("--async_ckpt", action="store_true", default=None,
                        help="overlap checkpoint disk writes with training (single-process)")
    return parser


def _distributed_kv_client():
    """The jax.distributed coordination-service KV client, or None outside a
    multi-process launch (or if the internal API moved)."""
    try:
        from jax._src import distributed

        return distributed.global_state.client
    except Exception:
        return None


def _run_dir_key(output_dir: str) -> str:
    return f"baddiffusion_tpu:run_dir_ready:{output_dir}"


def _signal_run_dir_ready(output_dir: str) -> None:
    """Process 0: tell peers THIS launch created/approved the run dir."""
    client = _distributed_kv_client()
    if client is not None:
        try:
            client.key_value_set(_run_dir_key(output_dir), "ok")
        except Exception:
            # the coordination service rejects double-sets (ALREADY_EXISTS);
            # a second setup() for the same run dir in one coordinator
            # session is still an approval, not an error
            pass


def _wait_run_dir_ready(output_dir: str, timeout_s: float = 300.0) -> None:
    """Peers: block until process 0 approves the run dir for THIS launch.

    Prefers the jax.distributed KV store: a key set by process 0 after its
    --overwrite decision is launch-scoped, so a stale dir left by a PRIOR run
    can't fool a peer into proceeding while process 0 is exiting with the
    "already been created" ValueError. Without a coordination client
    (single-controller tests), falls back to waiting for the dir itself —
    which only proves a dir exists, not that this launch approved it."""
    import jax

    err = RuntimeError(
        f"process {jax.process_index()}: run dir {output_dir} was never "
        "approved by process 0 — it likely refused the launch (see its log; "
        "e.g. the --overwrite check), or the run dir is not on a shared "
        "filesystem"
    )
    client = _distributed_kv_client()
    if client is not None:
        try:
            client.blocking_key_value_get(_run_dir_key(output_dir), int(timeout_s * 1000))
        except Exception as e:
            raise err from e
        return
    import time

    deadline = time.monotonic() + timeout_s
    while not os.path.isdir(output_dir):
        if time.monotonic() > deadline:
            raise err
        time.sleep(0.5)


def setup(argv: Optional[List[str]] = None) -> TrainingConfig:
    args = build_parser().parse_args(argv)
    config = TrainingConfig()

    if args.mode in (MODE_RESUME, MODE_SAMPLING, MODE_MEASURE):
        with open(os.path.join(args.ckpt, "args.json")) as f:
            args_data = json.load(f)
        for key, value in args_data.items():
            if value is not None and hasattr(config, key):
                setattr(config, key, value)
        config.output_dir = args.ckpt

    for key, value in vars(args).items():
        if args.mode == MODE_TRAIN and key not in NOT_MODE_TRAIN_OPTS and value is not None:
            setattr(config, key, value)
        elif args.mode == MODE_TRAIN_MEASURE and key not in NOT_MODE_TRAIN_MEASURE_OPTS and value is not None:
            setattr(config, key, value)
        elif args.mode == MODE_RESUME and key in MODE_RESUME_OPTS and value is not None:
            setattr(config, key, value)
        elif args.mode == MODE_SAMPLING and key in MODE_SAMPLING_OPTS and value is not None:
            setattr(config, key, value)
        elif args.mode == MODE_MEASURE and key in MODE_MEASURE_OPTS and value is not None:
            setattr(config, key, value)
        elif value is not None and key not in IGNORE_ARGS and key not in EXTRA_OPTS:
            raise NotImplementedError(f"Argument: {key}={value} isn't used in mode: {args.mode}")
    for key in EXTRA_OPTS:
        if getattr(args, key, None) is not None:
            setattr(config, key, getattr(args, key))

    if isinstance(config.sample_ep, int) and config.sample_ep < 0:
        config.sample_ep = None

    # fclip → clip (baddiffusion.py:187-193)
    config.clip = {"w": True, "o": False}.get(config.fclip)

    # dataset-keyed LR / grad-accum policy (baddiffusion.py:195-217)
    if config.dataset in (DatasetLoader.CIFAR10, DatasetLoader.MNIST, DatasetLoader.FAKE):
        global_batch = config.batch_32
        if config.learning_rate is None:
            config.learning_rate = (
                config.learning_rate_32_scratch if config.ckpt is None else DEFAULT_LEARNING_RATE_32
            )
    elif config.dataset in (DatasetLoader.CELEBA, DatasetLoader.CELEBA_HQ,
                            DatasetLoader.LSUN_CHURCH, DatasetLoader.LSUN_BEDROOM):
        global_batch = config.batch_256
        if config.learning_rate is None:
            config.learning_rate = (
                config.learning_rate_256_scratch if config.ckpt is None else DEFAULT_LEARNING_RATE_256
            )
    else:
        raise NotImplementedError(f"dataset {config.dataset!r}")
    if global_batch % config.batch != 0:
        raise ValueError(f"batch size {config.batch} should be divisible to {global_batch} for dataset {config.dataset}")
    if global_batch < config.batch:
        raise ValueError(f"batch size {config.batch} should be smaller or equal to {global_batch} for dataset {config.dataset}")
    config.gradient_accumulation_steps = int(global_batch // config.batch)

    # Resume must continue the ORIGINAL lr schedule. The policy above sees
    # config.ckpt = the run dir (never None), so resuming a scratch run would
    # silently flip its base lr to the fine-tune default (2e-5 -> 8e-5 at
    # 256px). The reference survives this because accelerate restores the
    # LambdaLR state (baddiffusion.py:336-342); we rebuild the schedule from
    # config, so restore the resolved lr persisted in the run's config.json.
    if args.mode == MODE_RESUME and args.learning_rate is None:
        cfg_path = os.path.join(args.ckpt, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                stored = json.load(f)
            if stored.get("learning_rate") is not None:
                config.learning_rate = float(stored["learning_rate"])

    if args.mode in (MODE_TRAIN, MODE_TRAIN_MEASURE):
        config.output_dir = os.path.join(config.result, naming_fn(config))

    Log.info(f"MODE: {config.mode}")
    # multi-process launches share one run dir: every process derives the
    # same config, but only process 0 writes the metadata files (identical
    # content — gating just avoids concurrent same-file writes on a pod)
    import jax

    is_primary = jax.process_index() == 0
    if config.mode in (MODE_TRAIN, MODE_TRAIN_MEASURE):
        if is_primary:
            # the overwrite decision is made exactly once, on process 0: if
            # peers also ran the isdir check they would race process 0's
            # mkdir and spuriously raise "already been created" on a pod
            if not config.overwrite and os.path.isdir(config.output_dir):
                raise ValueError(
                    f"Output directory: {config.output_dir} has already been created, "
                    "please set overwrite flag --overwrite or -o"
                )
            os.makedirs(config.output_dir, exist_ok=True)
            with open(os.path.join(config.output_dir, "args.json"), "w") as f:
                json.dump(vars(args), f, indent=2)
            config.save_json(os.path.join(config.output_dir, "config.json"))
            _signal_run_dir_ready(config.output_dir)
        else:
            _wait_run_dir_ready(config.output_dir)
    elif config.mode == MODE_SAMPLING and is_primary:
        config.save_json(os.path.join(config.output_dir, "sampling.json"))
    if config.mode in (MODE_MEASURE, MODE_TRAIN_MEASURE) and is_primary:
        # train+measure also records measure.json (baddiffusion.py:233-234)
        config.save_json(os.path.join(config.output_dir, "measure.json"))

    print(f"Argument Final: {dataclasses.asdict(config)}")
    return config
