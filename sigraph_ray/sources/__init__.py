"""Readers and deterministic synthetic-table generators."""
