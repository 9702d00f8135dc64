"""Operator library: relational, window, scalar, dedup, similarity, text."""
