"""Online serving runtime: dynamic micro-batching + HTTP frontend.

Beyond-parity subsystem (the reference ends at ``model.save('.h5')``,
``/root/reference/learn_image_embeddings.py:257-267``): serves the
StableHLO artifacts produced by ``export_model.py`` — or a checkpoint
directly — behind a bucketed dynamic batcher so concurrent requests share
MXU-efficient device calls.  See ``cli/serve_model.py`` for the CLI.
"""

from .client import ServingClient, ServingError
from .engine import BatchingEngine, EngineOverloaded, Future, default_buckets
from .server import Preprocessor, PreprocessError, ServingServer, make_handler

__all__ = [
    "BatchingEngine",
    "EngineOverloaded",
    "ServingClient",
    "ServingError",
    "Future",
    "default_buckets",
    "Preprocessor",
    "PreprocessError",
    "ServingServer",
    "make_handler",
]
