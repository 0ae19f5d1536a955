#!/usr/bin/env python3
"""Entry point: export a checkpoint as a reference-loadable Keras .h5
(see cli/export_keras_weights)."""

from semantic_embeddings_tpu.cli.export_keras_weights import main

if __name__ == "__main__":
    main()
