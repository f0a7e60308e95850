from glm_ocr_spark.sources.readers import (  # noqa: F401
    decode_payload_col,
    read_binary_documents,
    read_transcripts,
)
