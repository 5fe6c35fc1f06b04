"""mfa_tpu — a TPU-native flash-attention / inference engine.

Brand-new JAX + Pallas framework with the capabilities of the CUDA reference
w4096/mini-flash-attention (three entry points re-exported below), extended
with quantized paged KV-caches, sharded multi-chip execution, and a
continuous-batching serving layer. See SURVEY.md for the blueprint.
"""

__version__ = "0.1.0"

from mfa_tpu.interface import (
    flash_attn_func,
    flash_attn_varlen_func,
    flash_attn_with_kvcache,
)

__all__ = [
    "flash_attn_func",
    "flash_attn_varlen_func",
    "flash_attn_with_kvcache",
    "__version__",
]
