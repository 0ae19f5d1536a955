"""TPU-native custom ops: Pallas kernels and hand-tuned lowerings."""

from .cosine_loss import fused_cosine_loss, l2_normalize
from .topk import exact_topk, exact_topk_payload

__all__ = [
    "fused_cosine_loss",
    "l2_normalize",
    "exact_topk",
    "exact_topk_payload",
]
