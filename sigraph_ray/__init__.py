"""sigraph_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch batch reimplementation of the *semantics* of
hongsam14/sigraph (a FastAPI + Neo4j/OpenSearch behavioral-KG service)
as streaming ``ray.data.Dataset`` pipelines over Arrow batches.

Layout
------
- ``functions/`` — pure, vectorized per-batch kernels (parsers,
  normalizers, verb tables, text extraction, hashing). No Ray imports;
  unit-testable standalone.
- ``stages/``    — Ray Data stage builders: ``map_batches`` callables,
  actor-pool classes, groupby/shuffle compositions.
- ``sources/``   — readers + deterministic synthetic-table generators.
- ``pipelines/`` — end-to-end pipeline assemblies (pages → KG,
  provenance events → graph).
- ``state/``     — lineage manifest + resumable partitioned output.

Nothing in this package calls ``ray.init``; sessions are owned by the
caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
