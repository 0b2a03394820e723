"""Operators: the engine's query/operator surface.

- ``relational``  — the ArcadeDB-SQL-equivalent relational surface
  (scan/filter/project/join/agg/window/setops/json/scalars) as
  DataFrame plans (SURVEY.md §2.2 B1-B18).
- ``graph``       — graph expansion, motif, traversal, shortest path,
  degrees, connected components, PageRank (B5-B8, C6).
- ``dedup``       — exact + near-duplicate detection (C1, C2).
- ``similarity``  — embedding similarity search (C3).
- ``text``        — text analysis for LLM data pipelines (C4).
- ``multimodal``  — binary-column (image/audio/video) plumbing (C5).
"""
