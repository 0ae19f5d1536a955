"""Class-taxonomy math: LCS / Wu-Palmer similarities as dense matrices."""

from .class_hierarchy import ClassHierarchy
from .vectorized import pairwise_matrices, semantic_distance_matrix

__all__ = ["ClassHierarchy", "pairwise_matrices", "semantic_distance_matrix"]
