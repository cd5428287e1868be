from baddiffusion_tpu.ops.groupnorm import (
    fused_groupnorm_silu,
    groupnorm_silu,
    groupnorm_silu_reference,
)

__all__ = ["fused_groupnorm_silu", "groupnorm_silu", "groupnorm_silu_reference"]
