from pcompress_spark.functions import hashing

__all__ = ["hashing"]
