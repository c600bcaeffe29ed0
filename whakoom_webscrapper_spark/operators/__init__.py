"""Distributed operators: dedup structures, politeness, similarity search."""
