"""geocoderpl_spark — a PySpark-native inverted-index + BM25 analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (GML22/GeocoderPL: batch index build + interactive top-k search),
re-expressed Spark-first:

- build  = tokenize (Arrow-vectorized) -> salted repartition by term hash
           -> SPIMI posting-list construction -> delta-gap+varint compressed,
           block-max-annotated Parquet segments
           (reference analog: xml_parsers.py:351,380-381 sector-string index)
- query  = broadcast term-dictionary gate -> partition-pruned posting load
           -> DAAT scoring with block-max WAND -> top-k -> docstats join
           (reference analog: geo_gui.py:161-202 autocomplete lifecycle)

No code is copied from the reference; citations in docstrings are
behavioral parity pointers only.
"""

__version__ = "0.1.0"
