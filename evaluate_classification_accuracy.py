#!/usr/bin/env python3
"""Entry point mirroring the reference's evaluate_classification_accuracy.py CLI."""

from semantic_embeddings_tpu.cli.evaluate_classification_accuracy import main

if __name__ == "__main__":
    main()
