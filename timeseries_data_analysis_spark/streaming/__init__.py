"""Structured Streaming layer (60 s micro-batch serving loop) — built in M6."""
