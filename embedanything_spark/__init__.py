"""embedanything_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the EmbedAnything ingest→chunk→tokenize→
index→top-k pipeline (reference: /root/reference, surveyed in SURVEY.md)
as an idiomatic Spark engine:

- input: transcripts table ``(conv_id, turn_idx, role, text, tool, ts)``
  (one turn = one document, the analogue of the reference's audio
  ``Segment`` stream, ``rust/src/file_processor/audio/audio_processor.rs:85-89``)
- build: vectorized tokenize (pandas UDF) → tf/df/doclen aggregations →
  doc-sharded, sorted, delta+varint-compressed posting-list segments →
  shuffle-merged global term dictionary
- query: exact Okapi BM25 (k1=1.2, b=0.75, Lucene idf) top-k with
  block-max WAND pruning, rank-identical to the in-repo numpy oracle.

Everything here is public-knowledge PySpark; no code is copied from the
reference (which is a Rust/candle native engine).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75

from embedanything_spark.analyzer import tokenize, tokenize_udf  # noqa: E402,F401
