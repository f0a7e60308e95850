"""Concrete expectations ported from the reference's own unit suite
(/root/reference/glmocr/tests/test_unit.py), run through OUR pipeline:
exact bbox normalization values (:783-825), formatter behaviors (:258-277),
unicode JSON (:770-774)."""

import json

from glm_ocr_spark.kernel.extract import extract_turn, extract_turn_ocr_only
from glm_ocr_spark.kernel.textproc import clean_content


def _bbox_of(payload):
    r = extract_turn(payload)
    return json.loads(r["json"])[0][0]["bbox_2d"]


class TestBboxNormalization:
    """test_unit.py::TestNormaliseBbox cases through the full pipeline
    (page-size-aware 0-1000 normalization, layout_detector.py:288-292)."""

    def test_basic_normalisation(self):
        payload = ('<page w="2000" h="2000"/>'
                   '<block label="text" score="0.9" bbox="500,500,1000,1000" '
                   'order="1">x</block>')
        assert _bbox_of(payload) == [250, 250, 500, 500]

    def test_full_page(self):
        payload = ('<page w="2040" h="2640"/>'
                   '<block label="text" score="0.9" bbox="0,0,2040,2640" '
                   'order="1">x</block>')
        assert _bbox_of(payload) == [0, 0, 1000, 1000]

    def test_rounding_case(self):
        # reference expectation: [431,1762,1061,2189]@2040x2640
        #   -> [211, 667, 520, 829] (test_unit.py:801-803)
        payload = ('<page w="2040" h="2640"/>'
                   '<block label="text" score="0.9" bbox="431,1762,1061,2189" '
                   'order="1">x</block>')
        assert _bbox_of(payload) == [211, 667, 520, 829]


class TestFormatterParity:
    """test_unit.py::TestResultFormatter cases."""

    def test_format_ocr_result(self):
        r = extract_turn_ocr_only("Hello World")
        assert "Hello World" in r["json"]
        assert r["markdown"] == "Hello World"

    def test_clean_content_punct(self):
        cleaned = clean_content("Hello....World")
        assert "....." not in cleaned
        assert cleaned == "Hello...World"

    def test_unicode_preserved_in_json(self):
        r = extract_turn_ocr_only("中文测试")
        assert "中文测试" in r["json"]  # ensure_ascii=False semantics
        assert "\\u" not in r["json"]
