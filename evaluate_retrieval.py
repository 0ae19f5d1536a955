#!/usr/bin/env python3
"""Entry point mirroring the reference's evaluate_retrieval.py CLI."""

from semantic_embeddings_tpu.cli.evaluate_retrieval import main

if __name__ == "__main__":
    main()
