"""Relational + window operator library (SURVEY.md §2)."""
