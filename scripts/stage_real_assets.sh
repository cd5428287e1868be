#!/usr/bin/env bash
# Stage the real-weights / real-data assets this framework's RUN_SLOW tier and
# absolute-FID path need. This environment has NO network egress, so these
# downloads must run wherever egress exists; afterwards every currently-gated
# test and the bare-`FID` score path activate with no code changes.
#
# Usage:
#   stage_real_assets.sh [ASSETS_DIR]            # download everything
#   stage_real_assets.sh --dry-run [ASSETS_DIR]  # validate an existing staging
#                                                # layout (no network needed)
#
# Reference contracts:
#   pytorch-fid InceptionV3 weights -> fid_score.py:53 (pt_inception-2015-12-05)
#   google/ddpm-* checkpoints       -> model.py:700-711 alias table
#   HF datasets                     -> dataset.py:82-90
set -euo pipefail

DRY_RUN=0
if [[ "${1:-}" == "--dry-run" ]]; then
  DRY_RUN=1
  shift
fi
ASSETS="${1:-$HOME/baddiffusion_assets}"

if [[ "$DRY_RUN" == "1" ]]; then
  # Layout self-check: verifies the staged tree has exactly the files the
  # gated code paths will look for. Exits nonzero listing anything missing.
  python - "$ASSETS" <<'EOF'
import os
import sys

root = sys.argv[1]
missing = []

def need(path, desc):
    if not os.path.exists(path):
        missing.append(f"  {path}  ({desc})")

need(os.path.join(root, "pt_inception-2015-12-05-6726825d.pth"),
     "FID weights -> export BADDIFFUSION_FID_WEIGHTS")
for repo in ("google--ddpm-cifar10-32", "google--ddpm-ema-celebahq-256"):
    d = os.path.join(root, "ckpts", repo)
    need(os.path.join(d, "model_index.json"), "HF pipeline index")
    need(os.path.join(d, "unet", "config.json"), "UNet config")
    ok_weights = any(
        os.path.exists(os.path.join(d, "unet", w))
        for w in ("diffusion_pytorch_model.bin", "diffusion_pytorch_model.safetensors")
    )
    if not ok_weights:
        missing.append(f"  {d}/unet/diffusion_pytorch_model.(bin|safetensors)  (UNet weights)")
    need(os.path.join(d, "scheduler", "scheduler_config.json"), "scheduler config")
for name in ("CIFAR10", "MNIST", "CELEBA-HQ", "CELEBA"):
    d = os.path.join(root, "datasets", name)
    if not (os.path.exists(os.path.join(d, "dataset_info.json"))
            or os.path.exists(os.path.join(d, "dataset_dict.json"))):
        missing.append(f"  {d}  (save_to_disk dataset dir)")
# LDM checkpoint (CompVis layout: vqvae/ + unet/ + scheduler/); the synthetic
# stand-in from examples/stage_fake_ldm.py has the identical layout, so the
# real weights drop in with no code changes (reference model.py:711 alias)
ldm = os.path.join(root, "ckpts", "CompVis--ldm-celebahq-256")
need(os.path.join(ldm, "model_index.json"), "LDM pipeline index")
need(os.path.join(ldm, "vqvae", "config.json"), "VQ-VAE config")
need(os.path.join(ldm, "unet", "config.json"), "LDM UNet config")
need(os.path.join(ldm, "scheduler", "scheduler_config.json"), "LDM scheduler config")
# optional staged-only datasets (data/datasets.py LSUN path)
for name in ("LSUN-CHURCH", "LSUN-BEDROOM"):
    d = os.path.join(root, "datasets", name)
    if os.path.isdir(d) and not (
        os.path.exists(os.path.join(d, "dataset_info.json"))
        or os.path.exists(os.path.join(d, "dataset_dict.json"))
    ):
        missing.append(f"  {d}  (present but not a save_to_disk dir)")

if missing:
    print("staging layout INCOMPLETE under", root)
    print("\n".join(missing))
    sys.exit(1)
print("staging layout OK under", root)
EOF
  exit $?
fi

mkdir -p "$ASSETS/ckpts" "$ASSETS/datasets"

# 1. FID InceptionV3 weights (pytorch-fid's port of the TF-FID network).
#    Enables: absolute FID parity (metrics/fid.py writes the bare `FID` key
#    instead of `FID_proxy`), tests/test_metrics.py real-weights tier.
curl -L -o "$ASSETS/pt_inception-2015-12-05-6726825d.pth" \
  https://github.com/mseitzer/pytorch-fid/releases/download/fid_weights/pt_inception-2015-12-05-6726825d.pth
export BADDIFFUSION_FID_WEIGHTS="$ASSETS/pt_inception-2015-12-05-6726825d.pth"

# 2. Hub checkpoints (HF layout: model_index.json + unet/ + scheduler/).
#    Enables: RUN_SLOW=1 tests/test_real_checkpoints.py (golden-slice parity,
#    diffusers/tests/pipelines/ddpm/test_ddpm.py:111-112) and --ckpt aliases.
for repo in google/ddpm-cifar10-32 google/ddpm-ema-celebahq-256 CompVis/ldm-celebahq-256; do
  dir="$ASSETS/ckpts/${repo/\//--}"
  python - "$repo" "$dir" <<'EOF'
import sys
from huggingface_hub import snapshot_download
snapshot_download(sys.argv[1], local_dir=sys.argv[2])
EOF
done
export BADDIFFUSION_CKPT_DIR="$ASSETS/ckpts"

# 3. Datasets, staged through save_to_disk (the loader prefers these dirs —
#    data/datasets.py:_load_hf_dataset; see examples/stage_fake_datasets.py
#    for the offline procedural stand-ins used when egress is unavailable).
#    LSUN-CHURCH/LSUN-BEDROOM are staged-only: save any image dataset as
#    {root}/datasets/LSUN-CHURCH the same way and the loader streams it via
#    the memmap decode cache at any size.
python - "$ASSETS/datasets" <<'EOF'
import sys
import datasets as hfds
root = sys.argv[1]
for name, hf in (("CIFAR10", "cifar10"), ("MNIST", "mnist"),
                 ("CELEBA-HQ", "huggan/CelebA-HQ"), ("CELEBA", "student/celebA")):
    ds = hfds.load_dataset(hf)
    ds.save_to_disk(f"{root}/{name}")
EOF

"$0" --dry-run "$ASSETS"

echo "Staged under $ASSETS. Run with:"
echo "  BADDIFFUSION_FID_WEIGHTS=$BADDIFFUSION_FID_WEIGHTS \\"
echo "  BADDIFFUSION_CKPT_DIR=$BADDIFFUSION_CKPT_DIR \\"
echo "  RUN_SLOW=1 python -m pytest tests/test_real_checkpoints.py tests/test_metrics.py"
echo "  # and point --dataset_path (or symlink ./datasets) at $ASSETS/datasets"
