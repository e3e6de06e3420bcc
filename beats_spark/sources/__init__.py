from beats_spark.sources.readers import (  # noqa: F401
    read_lines,
    read_ndjson,
    reader_chain,
)
