"""Structured Streaming skins over the engine's batch semantics."""
