from baddiffusion_tpu.ops.attention import attention, attention_reference, fused_attention
from baddiffusion_tpu.ops.groupnorm import (
    fused_groupnorm_silu,
    groupnorm_silu,
    groupnorm_silu_reference,
)

__all__ = [
    "attention",
    "attention_reference",
    "fused_attention",
    "fused_groupnorm_silu",
    "groupnorm_silu",
    "groupnorm_silu_reference",
]
