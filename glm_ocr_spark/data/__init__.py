from glm_ocr_spark.data.gen import (  # noqa: F401
    gen_turn_payload,
    n_conversations,
    n_turns,
    transcripts_df,
)
