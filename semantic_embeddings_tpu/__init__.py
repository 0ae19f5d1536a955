"""semantic_embeddings_tpu — a TPU-native semantic-embedding framework.

A from-scratch JAX / Flax / optax / Pallas re-design of the capabilities of
cvjena/semantic-embeddings (hierarchy-based image embeddings, WACV'19, and
cosine-loss small-data classification, WACV'20):

- ``hierarchy``   — class-taxonomy math (LCS, Wu-Palmer, hierarchical precision)
                    as dense pairwise matrices instead of per-pair recursion.
- ``embeddings``  — analytic class-embedding solvers (unit-sphere placement via
                    Cholesky, low-dim eigensolver, hypersphere intersection, MDS).
- ``data``        — dataset registry with host decode + on-device augmentation.
- ``models``      — Flax CNN zoo (Plain-11, CIFAR ResNets, WRN, PyramidNet,
                    DenseNet, ResNet-50 family) with named feature taps.
- ``train``       — cosine/correlation losses, Keras-exact SGD semantics,
                    SGDR/CLR schedules, checkpointing, the jitted train step.
- ``ops``         — Pallas TPU kernels for the hot paths (fused L2-norm + dot).
- ``parallel``    — device-mesh construction and sharding specs (data parallel
                    over ICI through XLA collectives).
- ``evaluation``  — sharded all-pairs retrieval + hierarchical precision / mAHP,
                    classification accuracy suites.
- ``cli``         — command-line entry points mirroring the reference scripts.
"""

__version__ = "0.1.0"
