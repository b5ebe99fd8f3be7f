"""Scalar/vector function surface of the engine (SURVEY.md §2.7)."""
