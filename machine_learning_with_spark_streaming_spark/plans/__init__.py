"""Declarative pipeline specs (the reference's JobConfig,
pipeline/lib.py:167-185, reborn as composable DataFrame transforms)."""
