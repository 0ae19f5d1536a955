#!/usr/bin/env python3
"""Entry point: export a trained model as a StableHLO serving artifact."""

from semantic_embeddings_tpu.cli.export_model import main

if __name__ == "__main__":
    main()
