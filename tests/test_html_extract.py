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


def test_fast_scanner_matches_stdlib_builder():
    """The regex DOM scanner must produce the same extraction output as the
    stdlib-HTMLParser reference builder — corpus spans, edge cases, and a
    seeded fuzz sweep over tag-soup fragments."""
    import random

    from pdf_extractor_spark.core import html_extract as H
    from pdf_extractor_spark.corpus import gen_documents

    def _run(build, html):
        root = build(html)
        H._measure(root)
        out = []
        H._render(root, out)
        return "".join(out)

    cases = [
        "<p>a &amp; b</p>", "<div><p>x</div></p>text", '<br/><BR><img src="y>z">',
        "<script>if (a<b && c>d) {}</script><p>keep</p>",
        "<style>p>a{color:red}</style><p>s</p>",
        "<!-- <p>no</p> --><p>yes</p>", "<!DOCTYPE html><?pi ?><p>d</p>",
        "<p>a < b and c > d</p>", '<a href="x?a=1&amp;b=2">L</a><p>m</p>',
        "<div class=\"a'b\" data-x='q\"r'>v</div>", "<p>unclosed",
        "plain text only", "", "<p></p>", "<p>entity &#65;&#x42; done</p>",
        "<div>a<script>x", "<p>t</p><script>",
    ]
    htmls = [
        s["text"] for r in gen_documents(100, seed=11) for s in r["spans"]
        if s["kind"] == "html"
    ]
    rng = random.Random(0)
    toks = ["<p>", "</p>", "<div>", "</div>", '<a href="/x">', "</a>", "word ",
            "&amp; ", "<br>", "<script>", "</script>", "<!-- c -->", "<span>",
            "</span>", "&#33; "]
    fuzz = ["".join(rng.choice(toks) for _ in range(rng.randrange(1, 30)))
            for _ in range(500)]
    for h in cases + htmls + fuzz:
        assert _run(H._scan_build, h) == _run(H._stdlib_build, h), h[:200]


def test_real_os_html_corpus_extracts_clean():
    """Robustness sweep over genuinely foreign HTML (OS-shipped package
    docs — texinfo, Sphinx, docbook output; none produced by this repo):
    every file must extract without an exception and substantial docs must
    yield substantial main text. Skipped where the docs tree is absent."""
    import glob
    import os

    import pytest

    from pdf_extractor_spark.core.html_extract import extract_main_text
    from pdf_extractor_spark.core.textclean import clean_text

    paths = [
        p
        for p in sorted(glob.glob("/usr/share/doc/**/*.html", recursive=True))
        if os.path.isfile(p)
    ][:150]
    if len(paths) < 10:
        pytest.skip("no OS html docs present")
    import re

    thin: list[str] = []
    for p in paths:
        raw = open(p, "rb").read().decode("utf-8", errors="replace")
        txt = clean_text(extract_main_text(raw))
        if len(raw) <= 20_000:
            continue
        # link-farm pages (API indexes, TOCs: most text inside <a>) are
        # EXPECTED to come back near-empty — dropping link-dense blocks IS
        # the boilerplate heuristic; only prose-dominated pages must yield
        link_chars = sum(
            len(m) for m in re.findall(r"<a [^>]*>(.*?)</a>", raw, re.S)
        )
        body_chars = len(re.sub(r"\s+", " ", re.sub(r"<[^>]+>", " ", raw)))
        if body_chars and link_chars / body_chars > 0.5:
            continue
        if len(txt) <= 500:
            thin.append(p)
    assert not thin, thin
