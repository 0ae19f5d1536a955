#!/usr/bin/env python3
"""Entry point: serve a trained model over HTTP with dynamic batching."""

from semantic_embeddings_tpu.cli.serve_model import main

if __name__ == "__main__":
    main()
