#!/usr/bin/env python3
"""Entry point: import reference Keras .h5 weights (see cli/import_keras_weights)."""

from semantic_embeddings_tpu.cli.import_keras_weights import main

if __name__ == "__main__":
    main()
