"""search_engine_spark — PySpark-native inverted-index + ranked-retrieval engine."""

__version__ = "0.1.0"
