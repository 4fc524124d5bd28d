"""Placeholder — filled in as operators land (SURVEY.md §2C)."""
