"""Placeholder — populated later this round."""

QUERIES = {}
ORACLE = {}
