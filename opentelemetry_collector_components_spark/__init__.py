"""PySpark-native log/telemetry pipeline engine.

A brand-new parse -> enrich -> route -> aggregate engine with the
data-processing capabilities of elastic/opentelemetry-collector-components,
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, Arrow
pandas UDFs for the few genuinely custom kernels, Structured Streaming for
the stateful interval analog.

Subpackages
-----------
- ``sources``   : deterministic synthetic inputs (Common-Crawl-style pages,
                  dimension tables) and decoders (NDJSON/CSV/text analogs of
                  the collector's receivers / beatsencodingextension).
- ``functions`` : scalar/vector function surface (grok-style regex extraction,
                  URL parsing, text stats, hashing) — the OTTL analog.
- ``operators`` : pipeline stages (parse, enrich, route, aggregate, dedup,
                  similarity) as DataFrame -> DataFrame transforms.
- ``plans``     : declarative pipeline specs, per-sink writes, checkpoint /
                  lineage bookkeeping (resumable runs).
- ``streaming`` : Structured Streaming variants of the interval aggregation.
"""

__version__ = "0.1.0"
