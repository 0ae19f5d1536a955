#!/usr/bin/env python3
"""Entry point for the unified taxonomy converter (see cli/encode_hierarchy)."""

from semantic_embeddings_tpu.cli.encode_hierarchy import main

if __name__ == "__main__":
    main()
