#!/usr/bin/env python3
"""Entry point mirroring the reference's learn_labelembedding.py CLI."""

from semantic_embeddings_tpu.cli.learn_labelembedding import main

if __name__ == "__main__":
    main()
