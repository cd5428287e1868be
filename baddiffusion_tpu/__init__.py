"""baddiffusion_tpu — a TPU-native (JAX/XLA/Pallas/pjit) backdoor-diffusion framework.

A from-scratch re-design of the capabilities of IBM/BadDiffusion (CVPR 2023,
arXiv 2212.05400): poisoned-dataset construction, backdoored DDPM training with
the modified noise-prediction loss, a zoo of ODE/SDE samplers expressed as
`lax.scan` programs, FID/MSE/SSIM measurement, and the ANP backdoor defense —
all built TPU-first on a `jax.sharding.Mesh` with stateless pytree schedulers
and bf16-compute/f32-param mixed precision.

Reference behavior contracts are cited per-module as ``file:line`` into
``/root/reference`` (the original PyTorch implementation).
"""

__version__ = "0.1.0"

from baddiffusion_tpu.utils.logging import Log  # noqa: F401
