"""sagan_spark — a PySpark-native rule-driven log/telemetry analytics engine.

A from-scratch reimplementation of the query semantics of the reference
engine (quadrantsec/sagan, a C multi-threaded Snort-rule-compatible log
correlation engine) as an idiomatic Spark parse -> enrich -> route ->
aggregate pipeline over tables of Common-Crawl-style pages / log events.

Architecture (Spark-first, NOT a port):
  - rules/      Sagan rule text -> RuleIR -> compiled Catalyst Columns
  - functions/  shared vectorized extraction (Parse_IP / Parse_Hash /
                JSON flatten) as built-in exprs + Arrow-batched pandas UDFs
  - pipeline/   batch engine: scan -> extract-once -> columnar rule
                fan-out -> stateful correlation -> per-sink routed writes
  - streaming/  Structured Streaming variant with watermarked state
  - ops/        large-scale training-data ops (dedup, ANN, text analysis)
  - data/       deterministic synthetic fixture generators (pages corpus)
"""

__version__ = "0.1.0"
