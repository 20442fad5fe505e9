"""Scalar-function helpers with SAS semantics (SURVEY.md §2.8)."""
