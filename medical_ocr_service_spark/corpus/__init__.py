"""Deterministic synthetic corpus + pure-Python golden reference extractor."""
