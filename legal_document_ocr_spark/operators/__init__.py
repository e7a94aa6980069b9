"""Operator library — Catalyst-first implementations of the engine surface.

- ``textops``    — language-ID, quality scoring, token counting, document
  fingerprinting, SQL-safe field-extraction battery (SURVEY.md §2.3 K8-K14
  re-expressed as native expressions).
- ``dedup``      — exact (sha2 group), MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine near-dup (the web-scale rewrite of the reference's
  content-addressed cache, SURVEY.md §2.4 J2).
- ``similarity`` — brute-force cosine top-k + sign-LSH bucketed ANN over an
  embedding column.
- ``relational`` — the reference's query surface (listing / filter /
  pagination / point lookup, document_service.py:83-229) plus the
  aggregation/window/join operator battery from SURVEY.md §2.2-2.8.
- ``multimodal`` — opaque binary columns with typed metadata; decode /
  feature-extract plumbing over mapInPandas (decode kernels stubbed —
  image/audio libs absent in this environment).

Every function takes DataFrames in, DataFrame out — no collect, no
driver-side loops; oracle parity notes live next to each operator.
"""

from . import dedup, relational, similarity, textops  # noqa: F401
