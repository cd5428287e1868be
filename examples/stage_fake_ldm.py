"""Stage a procedurally-initialized LDM checkpoint in the CompVis layout.

The reference's `LDM-CELEBA-HQ-256` alias maps to `CompVis/ldm-celebahq-256`
(model.py:711) — a VQ-VAE + UNet + DDIM scheduler pipeline
(pipeline_latent_diffusion_uncond.py:39-43) that is egress-blocked offline.
This stages a small but structurally-real equivalent: the SAME module
layout (model_index.json `_class_name: LDMPipeline`, `vqvae/` + `unet/` +
`scheduler/` subfolders, torch-format weights), the same f=4 pixel→latent
geometry, seeded-random parameters. The CLI's sampling/measure modes then
drive the FULL LDM path end-to-end (factory LDM routing → VQ encode of the
pixel init → latent DDIM chain → VQ decode → metrics) with zero egress; only
the weights are procedural. A run dir (`args.json`) is written next to it so
`--mode sampling/measure --ckpt <dir>` reloads like any other run.

Geometry: 64px images (CELEBA's default size, dataset.py:111-112) → 16px
latents — the CompVis f=4 at quarter scale.

Usage:  python examples/stage_fake_ldm.py [--out DIR] [--dataset CELEBA]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def stage(out_dir: str, dataset: str = "CELEBA", image_size: int = 64, seed: int = 0) -> str:
    from baddiffusion_tpu.models import UNet2DConfig, UNet2DModel, VQModel, VQModelConfig
    from baddiffusion_tpu.pipelines.ldm import LDMPipeline
    from baddiffusion_tpu.schedulers import DDIMConfig, DDIMScheduler

    latent_size = image_size // 4  # CompVis ldm-celebahq-256 is f=4 (256->64)
    vq_cfg = VQModelConfig(
        sample_size=image_size,
        block_out_channels=(32, 64, 64),
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        layers_per_block=1,
        latent_channels=3,
        num_vq_embeddings=256,
        norm_num_groups=32,
    )
    unet_cfg = UNet2DConfig(
        sample_size=latent_size,
        in_channels=3,
        out_channels=3,
        layers_per_block=1,
        block_out_channels=(64, 128),
        down_block_types=("DownBlock2D", "AttnDownBlock2D"),
        up_block_types=("AttnUpBlock2D", "UpBlock2D"),
        norm_num_groups=32,
    )
    vq = VQModel(vq_cfg)
    vq_params = vq.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, image_size, image_size, 3))
    )["params"]
    unet = UNet2DModel(unet_cfg)
    unet_params = unet.init_params(jax.random.PRNGKey(seed + 1), sample_size=latent_size)
    # CompVis/ldm-celebahq-256 ships a DDIMScheduler (scheduler_config.json)
    sched = DDIMScheduler(DDIMConfig(beta_schedule="scaled_linear"))
    pipe = LDMPipeline(vq, vq_params, unet, unet_params, sched)
    os.makedirs(out_dir, exist_ok=True)
    pipe.save_pretrained(out_dir)

    # run-dir args.json so --mode sampling/measure --ckpt <dir> reloads
    # (config.setup reads it exactly like a trained run's)
    args_json = {
        "mode": "train",
        "dataset": dataset,
        "batch": 16,
        "epoch": 1,
        "ckpt": "LDM-SYNTH",
        "trigger": "BOX_14",
        "target": "CORNER",
        "poison_rate": 0.1,
        "overwrite": True,
        "image_size": image_size,
    }
    with open(os.path.join(out_dir, "args.json"), "w") as f:
        json.dump(args_json, f, indent=2)
    print(f"staged synthetic LDM ({image_size}px pixels, {latent_size}px latents) -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="res_LDM-SYNTH_CELEBA_ep1_c1.0_p0.1_BOX_14-CORNER")
    p.add_argument("--dataset", default="CELEBA")
    p.add_argument("--image_size", type=int, default=64)
    args = p.parse_args()
    stage(args.out, args.dataset, args.image_size)
