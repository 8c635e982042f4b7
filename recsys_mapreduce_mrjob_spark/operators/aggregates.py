"""Placeholder — filled in as SURVEY.md §2.2 coverage widens."""
