"""Relational query suites built on the engine's operator library."""
