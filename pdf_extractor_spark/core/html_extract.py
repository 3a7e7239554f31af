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


def extract_main_text(html: str) -> str:
    """Strip boilerplate, return the main content as raw text.

    The caller applies :func:`textclean.clean_text` afterwards, mirroring the
    reference's region-concat-then-clean pipeline
    (pymu_tesseract_processor.py:259-274).
    """
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    _measure(builder.root)
    out: list[str] = []
    _render(builder.root, out)
    return "".join(out)
