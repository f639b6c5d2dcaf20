from de4ml_spark.profile.battery import profile

__all__ = ["profile"]
