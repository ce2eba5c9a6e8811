"""Scalar/vector function surface — the OTTL-statement analog (SURVEY.md §2.7)."""
