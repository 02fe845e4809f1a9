"""Operator library: subset, aggregates, spatial joins, tiles, dedup, ANN."""
