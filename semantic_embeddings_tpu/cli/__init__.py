"""Command-line entry points mirroring the reference's public scripts."""
