"""Unit tests for the text-processing ops (T1-T8), mirroring the reference's
own unit-test coverage (/root/reference/glmocr/tests/test_unit.py:248-277)."""

from glm_ocr_spark.kernel.textproc import (
    clean_content,
    clean_formula_number,
    clean_repeated_content,
    find_consecutive_repeat,
    format_content,
    map_label,
)


class TestCleanContent:
    def test_tab_padding_stripped(self):
        assert clean_content("\\t\\thello\\t") == "hello"

    def test_dot_run_collapsed_to_three(self):
        assert clean_content("contents .......... 42") == "contents ... 42"

    def test_middot_run(self):
        assert clean_content("x ······ y") == "x ··· y"

    def test_underscore_run(self):
        assert clean_content("fill ______ in") == "fill ___ in"

    def test_escaped_underscore_run(self):
        assert clean_content(r"a \_\_\_\_\_ b") == r"a \_\_\_ b"

    def test_exactly_three_untouched(self):
        assert clean_content("a ... b") == "a ... b"

    def test_none_is_empty(self):
        assert clean_content(None) == ""

    def test_long_repeat_truncated(self):
        unit = "0123456789abc"
        s = "prefix " + unit * 200  # >= 2048 chars triggers the repeat scan
        out = clean_content(s)
        assert out == "prefix " + unit

    def test_short_repeat_not_scanned(self):
        s = "ab" * 20  # < 2048 chars: repeat removal not triggered
        assert clean_content(s) == s


class TestConsecutiveRepeat:
    def test_detects_and_keeps_one_unit(self):
        s = "HEADER0123456" * 12
        assert find_consecutive_repeat(s) == "HEADER0123456"

    def test_below_min_length_none(self):
        assert find_consecutive_repeat("short" * 3) is None

    def test_short_period_captured_by_min_unit(self):
        # a 2-char period is still matched as a 10-char unit repeated 10x
        assert find_consecutive_repeat("ab" * 50) == "ab" * 5


class TestLineRepeats:
    def test_consecutive_path_wins_on_identical_lines(self):
        # 12 identical lines form a consecutive repeat, caught by the
        # consecutive-repeat scan before the line-level counter
        line = "SAME LINE"
        content = "\n".join([line] * 12 + ["tail"])
        assert clean_repeated_content(content) == line + "\n"

    def test_line_majority_truncates(self):
        # short content (< min_len*min_repeats) skips the consecutive scan
        # and exercises the line-frequency path: truncate at the first line
        # of a 3-consecutive run
        line = "SAMELINE"  # 8 chars: 10 lines + tail stays under 100 chars
        content = "\n".join([line] * 10 + ["tail"])
        assert clean_repeated_content(content) == line

    def test_under_threshold_untouched(self):
        content = "\n".join(["a", "b", "c"])
        assert clean_repeated_content(content) == content


class TestFormulaNumber:
    def test_parens(self):
        assert clean_formula_number("(1)") == "1"

    def test_fullwidth(self):
        assert clean_formula_number("（2.1）") == "2.1"

    def test_bare(self):
        assert clean_formula_number(" 3 ") == "3"


class TestFormatContent:
    def test_doc_title(self):
        assert format_content("## Existing", "text", "doc_title") == "# Existing"

    def test_paragraph_title_dash(self):
        assert format_content("- Dashed", "text", "paragraph_title") == "## Dashed"

    def test_formula_dollar_rewrap(self):
        assert format_content("$$E=mc^2$$", "formula", "display_formula") == \
            "$$\nE=mc^2\n$$"

    def test_formula_bracket(self):
        assert format_content(r"\[x+y\]", "formula", "display_formula") == \
            "$$\nx+y\n$$"

    def test_formula_bare_wrapped(self):
        assert format_content("x+y", "formula", "display_formula") == "$$\nx+y\n$$"

    def test_bullet_normalize(self):
        assert format_content("·item", "text", "text") == "- item"
        assert format_content("* item", "text", "text") == "- item"

    def test_paren_enum(self):
        assert format_content("(1)item", "text", "text") == "(1) item"
        assert format_content("（a）item", "text", "text") == "(a) item"

    def test_dot_enum(self):
        assert format_content("1.item", "text", "text") == "1. item"
        assert format_content("b）item", "text", "text") == "b) item"

    def test_single_newline_doubled(self):
        assert format_content("a\nb", "text", "text") == "a\n\nb"
        assert format_content("a\n\nb", "text", "text") == "a\n\nb"

    def test_none_passthrough(self):
        assert format_content(None, "image", "image") is None


class TestMapLabel:
    def test_coarse_mapping(self):
        assert map_label("doc_title") == "text"
        assert map_label("display_formula") == "formula"
        assert map_label("chart") == "image"
        assert map_label("table") == "table"
        assert map_label("unknown_thing") == "unknown_thing"
