"""Scalar/vector/text function library (SURVEY.md §2.8, §2.11 + extensions)."""
