"""Lineage manifest + resumable partitioned output."""
