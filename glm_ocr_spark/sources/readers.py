"""Sources: table/file readers + multi-source payload decode.

Reference mapping (SURVEY.md §2.1):
  S1 directory scan -> spark.read.table / parquet / binaryFile
  S2 multi-source decode (path, data: URI, raw base64, <|base64|> blob)
     -> decode_payload_col, a pure column expression (JVM-side), mirroring
     glmocr/utils/image_utils.py:93-143 / dataloader/page_loader.py:161-181
     with text payloads instead of PIL images.
  S3 PDF page explode -> transcripts are already one row per turn; for
     multi-doc payloads see posexplode in operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")

# The input_hint contract schema, enforced on schemaless formats (JSONL,
# CSV) so a malformed feed fails loudly at the scan instead of poisoning
# downstream types; on parquet/Iceberg the footer schema wins and the
# select() guarantees pruning.
TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

_SCHEMALESS_FORMATS = {"json", "csv"}


def read_transcripts(spark: SparkSession, path_or_table: str,
                     fmt: str = "parquet") -> DataFrame:
    """Read the transcripts input (input_hint schema). Accepts a table name
    (Iceberg/HMS catalog) or a path; only the contract columns are selected
    so downstream column pruning is guaranteed regardless of table width.
    JSONL/CSV feeds get the contract schema applied explicitly (no
    inference pass over the data — at 100 TB a schema-inference pre-scan
    doubles the read) with mode=FAILFAST so type drift surfaces at the
    scan."""
    if "/" in path_or_table:
        reader = spark.read.format(fmt)
        if fmt in _SCHEMALESS_FORMATS:
            reader = reader.schema(TRANSCRIPT_SCHEMA) \
                .option("mode", "FAILFAST")
            if fmt == "csv":
                # payload text is multi-line, so quoted newlines force
                # multiLine=true — which makes CSV files NON-SPLITTABLE
                # (one task per file). CSV also cannot represent '' vs
                # NULL distinctly (both read as NULL) — harmless here, the
                # extraction path treats them identically (pipeline.py:108)
                # CSV is the compat path; JSONL stays line-splittable and
                # parquet/Iceberg is the real input.
                reader = (reader.option("header", "true")
                          .option("multiLine", "true")
                          .option("escape", '"'))
        df = reader.load(path_or_table)
    else:
        df = spark.read.table(path_or_table)
    return df.select(*TRANSCRIPT_COLUMNS)


def decode_payload_col(src: Column) -> Column:
    """S2: normalize a multi-source payload column to plain text.

    Handles, like the reference's image source sniffing:
      - ``data:*;base64,<blob>``  -> base64-decode the blob
      - ``<|base64|><blob>``      -> base64-decode the blob
      - anything else             -> passthrough (already text)

    Pure `when`/`regexp`/`unbase64` chain — no UDF, fully codegen'd.
    """
    data_uri_blob = F.regexp_extract(src, r"^data:[^;]*;base64,(.*)$", 1)
    tagged_blob = F.regexp_extract(src, r"^<\|base64\|>(.*)$", 1)
    return (
        F.when(src.isNull(), F.lit(None))
        .when(src.startswith("data:") & (data_uri_blob != ""),
              F.decode(F.unbase64(data_uri_blob), "UTF-8"))
        .when(src.startswith("<|base64|>"),
              F.decode(F.unbase64(tagged_blob), "UTF-8"))
        .otherwise(src)
    )


def read_binary_documents(spark: SparkSession, path_glob: str) -> DataFrame:
    """S1 for raw files: binaryFile scan -> (media_id, payload, mime) rows
    compatible with operators.multimodal.extract_media_features."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.col("content").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("path"),
        F.col("length").alias("byte_len"),
    )
