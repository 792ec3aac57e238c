"""Crawler / indexer / ranker operators (SURVEY.md §2)."""
