#!/usr/bin/env python3
"""Entry point mirroring the reference's plot_hierarchy.py CLI."""

from semantic_embeddings_tpu.cli.plot_hierarchy import main

if __name__ == "__main__":
    main()
