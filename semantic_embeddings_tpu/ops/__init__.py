"""Pallas TPU kernels for the framework's hot ops."""

from .cosine_loss import fused_cosine_loss, l2_normalize

__all__ = ["fused_cosine_loss", "l2_normalize"]
