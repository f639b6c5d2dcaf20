"""de4ml_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of jwills/de4ml, re-expressed Spark-first.

Modules
-------
contracts  : JSON-Schema <-> StructType conversion, validation rules as data
etl        : typed JSON parse, ``__``-flattening, Parquet I/O, schema evolution
profile    : one-pass column profiling -> rules -> violation metrics
streaming  : delayed-emission windowed join (streaming + batch twin)
operators  : ML-data extension tier (dedup, similarity, text, sessions)
queries    : the registered query catalog backing __spark_entry__.py
"""

__version__ = "0.1.0"
