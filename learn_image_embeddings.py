#!/usr/bin/env python3
"""Entry point mirroring the reference's learn_image_embeddings.py CLI."""

from semantic_embeddings_tpu.cli.learn_image_embeddings import main

if __name__ == "__main__":
    main()
