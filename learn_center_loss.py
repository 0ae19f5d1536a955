#!/usr/bin/env python3
"""Entry point mirroring the reference's learn_center_loss.py CLI."""

from semantic_embeddings_tpu.cli.learn_center_loss import main

if __name__ == "__main__":
    main()
