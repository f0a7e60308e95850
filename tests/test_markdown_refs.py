"""K2/T9: markdown image-ref extraction + rewrite, incl. end-to-end refs
produced by the extraction pipeline itself."""

from glm_ocr_spark.kernel.extract import extract_turn
from glm_ocr_spark.kernel.markdown_refs import (
    extract_image_refs,
    rewrite_image_refs,
)


def test_extract_refs():
    md = "before\n\n![](page=0,bbox=[1, 2, 3, 4])\n\nafter " \
         "![](page=2,bbox=[10,20,30,40])"
    refs = extract_image_refs(md)
    assert len(refs) == 2
    assert refs[0]["page"] == 0
    assert refs[0]["bbox"] == [1, 2, 3, 4]
    assert md[refs[0]["start"]:refs[0]["end"]] == "![](page=0,bbox=[1, 2, 3, 4])"
    assert refs[1]["bbox"] == [10, 20, 30, 40]


def test_empty_bbox_ref():
    refs = extract_image_refs("![](page=0,bbox=[])")
    assert refs[0]["bbox"] == []


def test_rewrite_refs():
    md = "x ![](page=0,bbox=[1, 2, 3, 4]) y"
    assert rewrite_image_refs(md) == "x ![](imgs/page0_1_2_3_4.png) y"


def test_no_refs_passthrough():
    assert rewrite_image_refs("plain text") == "plain text"
    assert extract_image_refs("") == []
    assert rewrite_image_refs(None) == ""


def test_pipeline_refs_roundtrip():
    # a payload with an image block produces a ref the extractor can parse
    payload = (
        '<block label="image" score="0.9" bbox="100,100,300,200" order="1">'
        '</block>\n'
        '<block label="text" score="0.9" bbox="50,300,950,400" order="2">'
        'caption text</block>'
    )
    r = extract_turn(payload)
    refs = extract_image_refs(r["markdown"])
    assert len(refs) == 1
    assert refs[0]["page"] == 0
    assert refs[0]["bbox"] == [100, 100, 300, 200]
    rewritten = rewrite_image_refs(r["markdown"])
    assert "imgs/page0_100_100_300_200.png" in rewritten
