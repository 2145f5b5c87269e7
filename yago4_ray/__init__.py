"""yago4_ray — a Ray-Data-native knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of yago-naga/yago4
(reference: /root/reference, Rust) expressed as ray.data.Dataset pipelines:

- statements ingest into a predicate-partitioned Parquet layout
  (replaces the reference's RocksDB (p,s,o) index,
  partitioned_statements.rs:19-21)
- triple extraction + entity linking from interleaved text+media documents
  (actor-pool map_batches stages)
- the YAGO 4 build plan (plan.rs:64-203): URI canonicalization, class
  taxonomy projection, SHACL-shape-driven fact extraction and cleaning,
  sameAs links, schema/shape emission
- large-scale training-data ops: dedup (exact/MinHash-LSH/SimHash),
  similarity search, text analysis, multimodal plumbing.

Terms are carried through every Dataset as canonical N-Triples lexical
strings (see yago4_ray.terms); all comparisons/joins/sorts are plain
string operations on Arrow columns.
"""

__version__ = "0.1.0"
