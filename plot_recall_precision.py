#!/usr/bin/env python3
"""Entry point mirroring the reference's plot_recall_precision.py CLI."""

from semantic_embeddings_tpu.cli.plot_recall_precision import main

if __name__ == "__main__":
    main()
