from glm_ocr_spark.functions.text import (  # noqa: F401
    clean_punct_runs_col,
    enum_normalize_col,
    formula_wrap_col,
    map_label_col,
    title_format_col,
)
