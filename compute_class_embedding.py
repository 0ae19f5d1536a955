#!/usr/bin/env python3
"""Entry point mirroring the reference's compute_class_embedding.py CLI."""

from semantic_embeddings_tpu.cli.compute_class_embedding import main

if __name__ == "__main__":
    main()
