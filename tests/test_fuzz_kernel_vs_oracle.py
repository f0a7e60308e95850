"""Property-based fuzzing: for ANY payload, the vectorized kernel must match
the independent oracle byte-for-byte and never raise.

This goes beyond the deterministic generator's templates (which cover the
*intended* payload grammar): hypothesis builds adversarial block soups —
random attributes, broken geometry, nested/overlapping boxes, unicode,
stray markup — and the invariant is pure equality.
"""

from hypothesis import HealthCheck, given, settings, strategies as st

from glm_ocr_spark.config import ID2LABEL
from glm_ocr_spark.kernel.extract import extract_turn
from tests.oracle import oracle_extract_turn

FIELDS = ("extracted_text", "markdown", "json", "spans", "n_blocks")

LABELS = list(ID2LABEL.values()) + ["bogus_label", ""]

text_fragment = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_characters="<>\"",  # block structure chars handled separately
    ),
    max_size=60,
)

coord = st.one_of(
    st.integers(min_value=-200, max_value=1400),
    st.floats(min_value=-100, max_value=1200, allow_nan=False,
              allow_infinity=False),
)


@st.composite
def annotated_block(draw):
    label = draw(st.sampled_from(LABELS))
    score = draw(st.one_of(
        st.floats(min_value=-1, max_value=2, allow_nan=False,
                  allow_infinity=False),
        st.just("garbage"),
    ))
    n_coords = draw(st.integers(min_value=0, max_value=5))
    bbox = ",".join(str(draw(coord)) for _ in range(n_coords))
    order = draw(st.one_of(st.none(), st.integers(-5, 50), st.just("x")))
    content = draw(text_fragment)
    attrs = f'label="{label}" score="{score}" bbox="{bbox}"'
    if order is not None:
        attrs += f' order="{order}"'
    return f"<block {attrs}>{content}</block>"


@st.composite
def payload(draw):
    kind = draw(st.integers(0, 2))
    if kind == 0:  # annotated soup
        blocks = draw(st.lists(annotated_block(), max_size=8))
        page = draw(st.one_of(st.just(""), st.just('<page w="800" h="1200"/>')))
        return page + "\n".join(blocks)
    if kind == 1:  # plain-DOM soup
        tags = ["h1", "h2", "p", "table", "header", "footer", "nav", "pre"]
        parts = []
        for _ in range(draw(st.integers(0, 6))):
            t = draw(st.sampled_from(tags))
            parts.append(f"<{t}>{draw(text_fragment)}</{t}>")
            if draw(st.booleans()):
                parts.append(draw(text_fragment))
        return "\n\n".join(parts)
    # raw text incl. pathological repetition
    base = draw(text_fragment)
    reps = draw(st.integers(1, 300))
    return base * reps


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(payload())
def test_fuzz_equality(p):
    k = extract_turn(p)
    o = oracle_extract_turn(p, "")
    for f in FIELDS:
        assert k[f] == o[f], (f, p[:200])


def test_zero_area_boxes_regression():
    # found by deep fuzzing: zero-area boxes under the +1 IoU convention
    # divided by zero in the scalar paths (vectorized path yields NaN ->
    # suppressed); both paths now agree
    p = ('<block label="abstract" score="garbage" bbox="0,0,0,-1"></block>\n'
         '<block label="abstract" score="garbage" bbox="0,0,0,-1"></block>')
    k = extract_turn(p)
    o = oracle_extract_turn(p, "")
    for f in FIELDS:
        assert k[f] == o[f]


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_fuzz_arbitrary_text_never_raises(p):
    k = extract_turn(p)
    o = oracle_extract_turn(p, "")
    for f in FIELDS:
        assert k[f] == o[f], (f, p[:200])
