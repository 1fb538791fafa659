from pyrope_spark.sources.readers import (  # noqa: F401
    parse_vector_payload,
    read_fvecs,
    read_glove_txt,
    synthetic_vectors,
)
