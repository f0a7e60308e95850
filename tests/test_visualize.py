"""K3 layout-visualization sink tests: SVG rendering semantics (palette
assignment, font-color rule, clamping, edge-flip) and the file sink."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_render_svg_palette_and_badges():
    from glm_ocr_spark.operators.visualize import (
        COLORMAP,
        font_colormap,
        render_layout_svg,
    )

    regions = [
        {"label": "text", "score": 0.91, "bbox_2d": [10, 20, 400, 200]},
        {"label": "title", "score": 0.88, "bbox_2d": [10, 300, 400, 380]},
        {"label": "text", "score": 0.75, "bbox_2d": [10, 500, 400, 700]},
    ]
    svg = render_layout_svg(regions)
    # label->color: first-seen box index rule — 'text' gets palette[0],
    # 'title' palette[1]; the second 'text' box REUSES palette[0]
    c0 = f"rgb({COLORMAP[0][0]},{COLORMAP[0][1]},{COLORMAP[0][2]})"
    c1 = f"rgb({COLORMAP[1][0]},{COLORMAP[1][1]},{COLORMAP[1][2]})"
    assert svg.count(f'stroke="{c0}"') == 2
    assert svg.count(f'stroke="{c1}"') == 1
    # font color: index 0 is a light-text background, index 1 dark
    f0 = font_colormap(0)
    f1 = font_colormap(1)
    assert f"rgb({f0[0]},{f0[1]},{f0[2]})" in svg
    assert f"rgb({f1[0]},{f1[1]},{f1[2]})" in svg
    # badge text and reading-order numbers
    assert "text 0.91" in svg and "title 0.88" in svg
    assert '>1</text>' in svg and '>3</text>' in svg
    # page 1000 -> font 20, stroke 2 (reference ratios)
    assert 'font-size="20"' in svg and 'stroke-width="2"' in svg


def test_render_svg_clamps_and_edge_flip():
    from glm_ocr_spark.operators.visualize import render_layout_svg

    svg = render_layout_svg(
        [{"label": "t", "bbox_2d": [-50, -50, 1500, 990]}])
    # clamped to [0, 999]
    assert 'x="0" y="0" width="999"' in svg
    # box touches the right border -> order number flips inside
    assert 'x="977"' in svg  # int(999 - 20*1.1) = 977
    # deterministic: same input, same bytes
    assert svg == render_layout_svg(
        [{"label": "t", "bbox_2d": [-50, -50, 1500, 990]}])


def test_render_svg_escapes_markup():
    from glm_ocr_spark.operators.visualize import render_layout_svg

    svg = render_layout_svg(
        [{"label": "a<b>&c", "bbox_2d": [0, 0, 10, 10]}])
    assert "a&lt;b&gt;&amp;c" in svg and "<b>" not in svg


def test_with_layout_svg_and_sink(spark, tmp_path):
    from glm_ocr_spark.data.gen import transcripts_df
    from glm_ocr_spark.operators.visualize import (
        save_layout_svgs,
        with_layout_svg,
    )
    from glm_ocr_spark.pipeline import extract_transcripts

    out = extract_transcripts(
        transcripts_df(spark, 0.001).limit(40)).cache()
    svgs = with_layout_svg(out)
    rows = svgs.select("n_blocks", "layout_svg").collect()
    assert rows
    for r in rows:
        assert r["layout_svg"].startswith("<svg ")
        assert r["layout_svg"].endswith("</svg>")
    # the narrow-map contract: the render introduces no NEW Exchange
    # (the base plan has one from .limit(40)'s GlobalLimit)
    base_plan = out._jdf.queryExecution().executedPlan().toString()
    plan = svgs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == base_plan.count("Exchange")

    d = str(tmp_path / "viz")
    n = save_layout_svgs(out, d)
    files = list((tmp_path / "viz").glob("*.svg"))
    assert n == len(files) == out.count()
    body = files[0].read_text()
    assert body.startswith("<svg ") and body.endswith("</svg>")
