from pyrope_spark.store.vector_store import VectorStore  # noqa: F401
