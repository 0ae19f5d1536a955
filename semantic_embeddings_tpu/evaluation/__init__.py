"""Retrieval + classification evaluation (device-fused metric pipelines)."""

from .hierarchical import HPEvaluator, hierarchical_precision
from .retrieval import (
    evaluate_retrieval_features,
    pairwise_ranking_blocks,
    pairwise_retrieval,
)

__all__ = [
    "HPEvaluator",
    "hierarchical_precision",
    "pairwise_retrieval",
    "pairwise_ranking_blocks",
    "evaluate_retrieval_features",
]
