from de4ml_spark.sources.synthetic import agrawal_frame

__all__ = ["agrawal_frame"]
