"""Golden pairs + properties for the byte-exact clean_text port
(reference: pymu_tesseract_processor.py:150-154)."""

import re

from hypothesis import given
from hypothesis import strategies as st

from pdf_extractor_spark.core.textclean import clean_text, frame_region, frame_table

GOLDEN = [
    ("", ""),
    ("   ", ""),
    ("a\n\n\nb", "a\n\nb"),
    ("a\n \t \n\n \nb", "a\n\nb"),
    ("  hello \n  world  ", "hello\nworld"),
    ("a\tb\tc", "a b c"),
    ("\n\nfoo\n\n", "foo"),
    ("line1\nline2", "line1\nline2"),
    # collapse happens BEFORE per-line strip: interior whitespace-only lines
    # are collapsed by the regex, not stripped into empties
    ("x\n   \ny", "x\n\ny"),
    ("a \n\nb\n\n\n\nc", "a\n\nb\n\nc"),
]


def test_golden_pairs():
    for raw, want in GOLDEN:
        assert clean_text(raw) == want, raw


def _reference_clean(text: str) -> str:
    # independent transcription of the reference implementation
    text = re.sub(r"\n\s*\n+", "\n\n", text)
    text = "\n".join([line.strip() for line in text.splitlines()])
    text = text.replace("\t", " ")
    return text.strip()


@given(st.text(alphabet=" \t\nabcXYZ.,", max_size=300))
def test_matches_reference_semantics(s):
    assert clean_text(s) == _reference_clean(s)


@given(st.text(alphabet=" \t\nabcXYZ.,", max_size=300))
def test_idempotent(s):
    once = clean_text(s)
    assert clean_text(once) == once


def test_region_framing():
    assert frame_region("abc") == "\n\nabc\n\n"


def test_table_framing_list_repr():
    # row rendering uses the Python list repr, part of the output contract
    # (pymu_tesseract_processor.py:263-269)
    out = frame_table("Table", [["a", "b"], [None, "d"]])
    assert out == "\n\nTable:\n\n['a', 'b']\n\n[None, 'd']\n\n"
