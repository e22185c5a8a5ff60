"""Spark-side engine operators (SURVEY.md §2.2)."""
