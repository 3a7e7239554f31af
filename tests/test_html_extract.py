"""DOM text-density boilerplate stripping (the YOLO Non-Text masking
analogue, pymu_tesseract_processor.py:44-66)."""

from pdf_extractor_spark.core.html_extract import extract_main_text
from pdf_extractor_spark.core.textclean import clean_text


def _extract(html: str) -> str:
    return clean_text(extract_main_text(html))


def test_drops_structural_boilerplate():
    html = (
        "<html><body><nav><a href='/'>Home</a><a href='/x'>X</a></nav>"
        "<p>Main content paragraph one.</p>"
        "<footer>copyright</footer><script>var x=1;</script></body></html>"
    )
    assert _extract(html) == "Main content paragraph one."


def test_drops_link_dense_div_keeps_content():
    html = (
        "<body><div><a href='/a'>Buy now</a> <a href='/b'>Click here</a></div>"
        "<article><p>Real article text that should stay.</p>"
        "<p>Second paragraph stays too.</p></article></body>"
    )
    assert _extract(html) == "Real article text that should stay.\n\nSecond paragraph stays too."


def test_keeps_div_with_low_link_density():
    html = (
        "<body><div>Lots of genuine content here with just one "
        "<a href='/ref'>ref</a> inline and much more prose around it.</div></body>"
    )
    out = _extract(html)
    assert "genuine content" in out and "ref" in out


def test_headings_and_lists_blocked():
    html = "<body><h1>Title</h1><ul><li>one</li><li>two</li></ul></body>"
    assert _extract(html) == "Title\n\none\n\ntwo"


def test_misnested_tags_tolerated():
    html = "<body><p>alpha <b>beta</p> gamma</body>"
    out = _extract(html)
    assert "alpha" in out and "beta" in out
