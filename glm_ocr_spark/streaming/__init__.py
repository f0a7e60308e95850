from glm_ocr_spark.streaming.stream import (  # noqa: F401
    conversation_progress_stream,
    extract_stream,
    stateful_conversation_tracker,
)
