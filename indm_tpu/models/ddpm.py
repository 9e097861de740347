"""Placeholder: implemented in a later milestone (SURVEY.md §7.2 step 8)."""
