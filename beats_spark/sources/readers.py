"""Source readers — the filebeat reader chain, Spark-shaped.

The reference composes per-input reader chains (reference:
/root/reference/libbeat/reader/parser/parser.go:91-130): charset decode →
line split on a terminator → max-bytes limit → optional parsers (multiline,
ndjson, container, syslog) → include_message filter. Offsets per file feed
the registrar for resume (/root/reference/filebeat/input/filestream/
input.go:632-744).

Spark mapping: `spark.read.text` handles charset + line split natively
(lineSep/encoding options); file name + a per-file line number reproduce the
(source, offset) identity Beats tracks; everything downstream is the same
operators the rest of the engine uses (multiline_assemble, decode_json,
include/exclude_lines, truncate). Resume state is the engine's checkpoint
manifest — with Iceberg/Structured Streaming sources, snapshot/offset
tracking replaces all of this (see beats_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def read_lines(
    spark: SparkSession,
    path: str,
    encoding: str = "UTF-8",
    line_sep: str | None = None,
    max_bytes: int | None = None,
    flag_truncated: bool = True,
    dense_offsets: bool = True,
) -> DataFrame:
    """Charset-decoded line reader with per-file offsets.

    Columns: source (file path), offset, text. max_bytes caps line length
    like the limit reader (readfile/limit.go), flagging truncated lines.

    dense_offsets=True gives 0-based line numbers — but the row_number
    window coalesces EACH FILE into one task (fine for log-rotation-sized
    files, wrong for huge ones). dense_offsets=False is the scale path: the
    cursor is (split byte offset × 2^20 + row-within-split), shuffle-free
    and strictly ordered within a file — the same byte-cursor semantics
    Beats' registrar actually persists (filestream tracks byte offsets,
    input.go:686), just not dense.
    """
    r = spark.read.option("encoding", encoding)
    if line_sep:
        r = r.option("lineSep", line_sep)
    base = r.text(path).select(
        F.input_file_name().alias("source"),
        F.col("value").alias("text"),
    )
    if dense_offsets:
        df = base.withColumn(
            "offset",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.monotonically_increasing_id())
            ) - 1,
        )
    else:
        # monotonically_increasing_id = (partition_id << 33) + row-in-
        # partition; split partitions follow block order, so this is
        # strictly increasing within every file with ZERO shuffles
        df = base.withColumn("offset", F.monotonically_increasing_id())
    if max_bytes is not None:
        from beats_spark.operators.parse import add_flag

        if flag_truncated:
            df = add_flag(df, F.octet_length("text") > max_bytes, "truncated")
        df = df.withColumn("text", F.substring("text", 1, max_bytes))
    return df.select("source", "offset", "text", *(
        ["flags"] if "flags" in df.columns else []
    ))


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: str = "map<string,string>",
    encoding: str = "UTF-8",
    keys_under_root: bool = False,
) -> DataFrame:
    """NDJSON reader (readjson/json_config.go shape): one JSON doc per
    line → parsed column (or top-level columns with keys_under_root)."""
    lines = read_lines(spark, path, encoding=encoding)
    parsed = lines.withColumn("json", F.from_json("text", schema))
    if keys_under_root and schema != "map<string,string>":
        return parsed.select("source", "offset", "json.*")
    return parsed


def reader_chain(
    spark: SparkSession,
    path: str,
    encoding: str = "UTF-8",
    max_bytes: int | None = None,
    multiline: dict | None = None,
    ndjson_schema: str | None = None,
    include_message: list[str] | None = None,
    exclude_message: list[str] | None = None,
) -> DataFrame:
    """The full composed chain, mirroring parser.go ordering:
    decode → line → limit → multiline → ndjson → include_message."""
    df = read_lines(spark, path, encoding=encoding, max_bytes=max_bytes)
    if multiline:
        from beats_spark.operators.misc import multiline_assemble

        df = multiline_assemble(
            df,
            multiline["pattern"],
            negate=multiline.get("negate", False),
            match=multiline.get("match", "after"),
            file_col="source",
            offset_col="offset",
            line_col="text",
            max_lines=multiline.get("max_lines", 500),
        ).select(
            F.col("source"),
            F.col("first_line").alias("offset"),
            F.col("message").alias("text"),
        )
    if ndjson_schema:
        df = df.withColumn("json", F.from_json("text", ndjson_schema))
    if include_message:
        from beats_spark.operators.filter import include_lines

        df = include_lines(df, include_message, field="text")
    if exclude_message:
        from beats_spark.operators.filter import exclude_lines

        df = exclude_lines(df, exclude_message, field="text")
    return df
