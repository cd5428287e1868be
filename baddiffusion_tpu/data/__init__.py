from baddiffusion_tpu.data.datasets import DatasetLoader
from baddiffusion_tpu.data.poison import poison_batch, poison_batch_host
from baddiffusion_tpu.data.prefetch import device_prefetch
from baddiffusion_tpu.data.triggers import Backdoor, trigger_mask

__all__ = [
    "DatasetLoader",
    "poison_batch",
    "poison_batch_host",
    "device_prefetch",
    "Backdoor",
    "trigger_mask",
]
