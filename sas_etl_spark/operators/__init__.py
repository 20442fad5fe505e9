"""Reusable operators (SURVEY.md §2) — pure DataFrame-plan builders.

Each function takes and returns DataFrames/Columns; nothing here
executes a job. Catalyst sees the composed plan and optimizes across
operator boundaries (predicate pushdown, column pruning, join
selection) — see SURVEY.md §4.1.
"""
