"""Declarative mapping compiler & statistics (SURVEY.md §2.2, §2.4)."""
