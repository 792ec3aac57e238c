"""Deterministic synthetic sources: image codec + data generation."""
