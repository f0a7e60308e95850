"""Frozen wordfreq snapshot (J2 hyphenation gate data).

Round-1 gap: the snapshot was a ~200-word hand list, so nearly every
legitimate hyphen merge outside those words silently failed. v2 is a
~22k-word table derived from public English prose + a curated everyday
core (tools/build_wordfreq_snapshot.py). These tests exercise merges on
common words OUTSIDE the old 200 and the kernel/oracle agreement.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from glm_ocr_spark.kernel.formatter import merge_text_blocks
from glm_ocr_spark.wordfreq_snapshot import zipf_frequency

# (fragment_before, fragment_after) -> merged word; all merged words are
# common English but absent from the v1 200-word table
MERGE_CASES = [
    ("under", "stand the problem first"),        # understand
    ("govern", "ment policy was published"),     # government
    ("beauti", "ful scenery all around"),        # beautiful
    ("news", "paper reports from yesterday"),    # newspaper
    ("won", "derful results were obtained"),     # wonderful
    ("neigh", "bours moved in last week"),       # neighbours
    ("restau", "rant opened near the station"),  # restaurant
    ("vege", "table soup for dinner"),           # vegetable
]

REJECT_CASES = [
    ("xq", "zzt qqq vvk"),          # not a word
    ("zzz", "qqqy unknownword"),    # not a word
]


def _blocks(a, b):
    return [
        {"index": 0, "label": "text", "content": f"start {a}-",
         "bbox_2d": [0, 0, 10, 10]},
        {"index": 1, "label": "text", "content": f"{b} end",
         "bbox_2d": [0, 10, 10, 20]},
    ]


def test_snapshot_size_and_gate():
    from glm_ocr_spark.wordfreq_snapshot import _load

    table = _load()
    assert len(table) > 20_000
    # the gate words the synthetic corpus relies on are still present
    for w in ["information", "examples", "processing", "distribution",
              "computation"]:
        assert zipf_frequency(w) >= 2.5, w


def test_common_word_merges_accepted():
    for a, b in MERGE_CASES:
        word = a + b.split()[0]
        assert zipf_frequency(word) >= 2.5, word
        out = merge_text_blocks(_blocks(a, b))
        assert len(out) == 1, (a, b)
        assert word in out[0]["content"], (a, b, out[0]["content"])


def test_non_words_rejected():
    for a, b in REJECT_CASES:
        word = a + b.split()[0]
        assert zipf_frequency(word) < 2.5, word
        out = merge_text_blocks(_blocks(a, b))
        assert len(out) == 2, (a, b)


def test_kernel_and_oracle_agree_on_new_words():
    """Both sides read the same frozen table — hyphen merges must be
    byte-identical through the full extract path."""
    from glm_ocr_spark.kernel.extract import extract_turn
    from tests.oracle import oracle_extract_turn

    for a, b in MERGE_CASES + REJECT_CASES:
        payload = (
            f'<block label="text" score="0.9" bbox="50,100,950,400" '
            f'order="1">some text {a}-</block>\n'
            f'<block label="text" score="0.9" bbox="50,420,950,700" '
            f'order="2">{b} more text.</block>'
        )
        k = extract_turn(payload)
        o = oracle_extract_turn(payload, "")
        assert k["extracted_text"] == o["extracted_text"], (a, b)
        assert k["json"] == o["json"], (a, b)
