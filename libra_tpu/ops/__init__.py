from libra_tpu.ops.norm import rms_norm
from libra_tpu.ops.rope import apply_rope, rope_cos_sin
from libra_tpu.ops.routed import routed_linear, routed_low_rank, select_by_flag

__all__ = [
    "rms_norm",
    "apply_rope",
    "rope_cos_sin",
    "routed_linear",
    "routed_low_rank",
    "select_by_flag",
]
