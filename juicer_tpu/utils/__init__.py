"""Shared utilities: logging, synthetic task generation."""
