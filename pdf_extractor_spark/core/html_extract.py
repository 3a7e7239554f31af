"""HTML main-content extraction via DOM-node text-density heuristics.

Spark-first replacement for the reference's YOLO "Non-Text" region masking
(``app/processor/pymu_tesseract_processor.py:44-66``): instead of rasterizing
the page and whiting out detected non-content boxes, we parse the DOM with the
stdlib parser and drop boilerplate nodes by tag role and link density
(Arc90/jusText-style). Pure Python, deterministic, no third-party deps — runs
inside Arrow batches on executors and standalone as the test oracle.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Tags whose entire subtree is boilerplate (structural role).
_DROP_TAGS = frozenset(
    {"script", "style", "nav", "footer", "aside", "form", "noscript",
     "header", "iframe", "svg", "button"}
)
# Block-level tags: their text is separated by blank lines in the output.
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "body", "ul", "ol", "li",
     "table", "tr", "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre",
     "br", "hr", "td", "th"}
)
_VOID_TAGS = frozenset({"br", "hr", "img", "meta", "link", "input"})

# A container is boilerplate when most of its text is anchor text.
LINK_DENSITY_THRESHOLD = 0.5


class _Node:
    __slots__ = ("tag", "attrs", "children", "text_len", "link_len")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Node | str] = []
        self.text_len = 0
        self.link_len = 0


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs))
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(_Node(tag, dict(attrs)))

    def handle_endtag(self, tag):
        # pop to the matching open tag (tolerates misnesting)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def _measure(node: _Node, in_link: bool = False) -> tuple[int, int]:
    """Bottom-up (text_len, link_len) in stripped characters."""
    text_len = 0
    link_len = 0
    is_link = in_link or node.tag == "a"
    for child in node.children:
        if isinstance(child, str):
            n = len(child.strip())
            text_len += n
            if is_link:
                link_len += n
        else:
            t, l = _measure(child, is_link)
            text_len += t
            link_len += l
    node.text_len = text_len
    node.link_len = link_len
    return text_len, link_len


def _is_boilerplate(node: _Node) -> bool:
    if node.tag in _DROP_TAGS:
        return True
    # Link-dense containers (menus, ad blocks, related-links) are boilerplate:
    # the DOM analogue of a YOLO "Non-Text" box.
    if node.tag in ("div", "ul", "ol", "section", "table"):
        if node.text_len > 0 and node.link_len / node.text_len > LINK_DENSITY_THRESHOLD:
            return True
    return False


def _render(node: _Node, out: list[str]) -> None:
    for child in node.children:
        if isinstance(child, str):
            out.append(child)
        else:
            if _is_boilerplate(child):
                continue
            is_block = child.tag in _BLOCK_TAGS
            if is_block:
                out.append("\n\n")
            _render(child, out)
            if is_block:
                out.append("\n\n")


# ------------------------------------------------------------ fast DOM scan
#
# The stdlib HTMLParser is ~half the mixed-corpus kernel cost; this regex
# scanner builds the identical _Node tree (attrs are not used by the density
# heuristics, so they are not parsed) 2-3x faster. The stdlib builder stays
# as the differential-test reference and the runtime fallback.

import re as _re
from html import unescape as _unescape

_MARKUP_RE = _re.compile(
    r"<!--.*?(?:-->|$)"               # comment
    r"|<!\[CDATA\[.*?(?:\]\]>|$)"     # cdata section
    r"|<![^>]*>?"                      # doctype / declaration
    r"|<\?[^>]*>?"                     # processing instruction
    r"|</\s*([a-zA-Z][a-zA-Z0-9.\-]*)[^>]*>"                      # end tag
    r"|<([a-zA-Z][a-zA-Z0-9.\-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(/?)>",  # start
    _re.S,
)
_RAWTEXT_END = {
    "script": _re.compile(r"</\s*script", _re.I),
    "style": _re.compile(r"</\s*style", _re.I),
}


def _scan_build(html: str) -> _Node:
    """Regex tag scan -> same tree shape as _TreeBuilder (tags lowercased,
    misnesting tolerated, script/style content kept raw, charrefs unescaped
    in normal text only — mirroring HTMLParser's CDATA-mode behavior)."""
    root = _Node("#root", {})
    stack = [root]
    pos = 0
    n = len(html)
    while pos < n:
        m = _MARKUP_RE.search(html, pos)
        if m is None:
            text = html[pos:]
            if text:
                stack[-1].children.append(_unescape(text) if "&" in text else text)
            break
        if m.start() > pos:
            text = html[pos : m.start()]
            stack[-1].children.append(_unescape(text) if "&" in text else text)
        pos = m.end()
        end_tag, start_tag, _attrs, selfclose = m.group(1), m.group(2), m.group(3), m.group(4)
        if start_tag is not None:
            tag = start_tag.lower()
            node = _Node(tag, {})
            stack[-1].children.append(node)
            if selfclose or tag in _VOID_TAGS:
                continue
            raw_end = _RAWTEXT_END.get(tag)
            if raw_end is not None:
                # CDATA content element: raw text child until the close tag;
                # unterminated-at-EOF content is dropped (stdlib behavior)
                em = raw_end.search(html, pos)
                if em is None:
                    pos = n
                    continue
                if em.start() > pos:
                    node.children.append(html[pos : em.start()])  # no unescape
                close = html.find(">", em.start())
                pos = n if close == -1 else close + 1
                continue
            stack.append(node)
        elif end_tag is not None:
            tag = end_tag.lower()
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    del stack[i:]
                    break
    return root


def _stdlib_build(html: str) -> _Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


def extract_main_text(html: str) -> str:
    """Strip boilerplate, return the main content as raw text.

    The caller applies :func:`textclean.clean_text` afterwards, mirroring the
    reference's region-concat-then-clean pipeline
    (pymu_tesseract_processor.py:259-274).
    """
    try:
        root = _scan_build(html)
    except Exception:  # any scanner surprise -> stdlib fallback, same tree
        root = _stdlib_build(html)
    _measure(root)
    out: list[str] = []
    _render(root, out)
    return "".join(out)
