"""Logical-plan-level utilities: canonicalization for the semantic
query cache."""
