from glm_ocr_spark.plans.audit import (  # noqa: F401
    assert_no_exchange,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    wholestage_codegen_spans,
)
