"""Scalar expression toolkit (SURVEY.md §2.8) — all JVM-side column
expressions; no row-at-a-time Python in the hot path."""
