"""Minimal DOM on top of stdlib ``html.parser`` (no bs4/lxml in container).

Implements exactly the query surface the reference uses through
BeautifulSoup (``lib/domain/taz.py``): find by tag, class-fragment matching,
attribute lookups, ancestor/sibling walks, and ``get_text(" ", strip=True)``
semantics. Document order is preserved via a global ``pos`` counter so the
selector-ladder ordering (taz.py:188-206) can be reproduced as data.

Performance layout: the builder keeps one flat document-order node list; a
subtree is the contiguous slice ``doc[idx : end]`` (``end`` fixed at the
closing tag), so ``find_all``/``find`` are linear scans over a list slice —
no recursive generators (profiled 3-5x faster on article-sized pages, which
is the crawl engine's hottest Python path).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "pos", "_doc", "_idx", "_end")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None", pos: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        self.pos = pos  # document order (1-based; 0 = root)
        self._doc: list[Node] = []
        self._idx = 0  # index into _doc (== pos - 1 for element nodes)
        self._end = 0  # exclusive end of this node's subtree in _doc

    # -- queries ----------------------------------------------------------
    def descendants(self):
        """Document-order descendants (self excluded) — flat slice scan."""
        return self._doc[self._idx + 1 : self._end] if self._doc else []

    def iter(self):
        """Depth-first document-order traversal (self included)."""
        yield self
        yield from self.descendants()

    def find_all(self, tag: str | tuple[str, ...] | None = None, **pred):
        tags = (tag,) if isinstance(tag, str) else tag
        out = []
        for n in self.descendants():
            if tags and n.tag not in tags:
                continue
            if not _match(n, pred):
                continue
            out.append(n)
        return out

    def find(self, tag=None, **pred):
        tags = (tag,) if isinstance(tag, str) else tag
        for n in self.descendants():
            if tags and n.tag not in tags:
                continue
            if _match(n, pred):
                return n
        return None

    def find_parent(self, tag: str):
        p = self.parent
        while p is not None:
            if p.tag == tag:
                return p
            p = p.parent
        return None

    def find_next_sibling(self, tag: str, **pred):
        if self.parent is None:
            return None
        sibs = [c for c in self.parent.children if isinstance(c, Node)]
        idx = sibs.index(self)
        for s in sibs[idx + 1 :]:
            if s.tag == tag and _match(s, pred):
                return s
        return None

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    def has_class_fragment(self, fragment: str) -> bool:
        """bs4-callable-equivalent: fragment substring-match against the raw
        class attribute (reference lambdas at taz.py:54-63,80-90 check
        ``fragment in c`` for string class values)."""
        c = self.attrs.get("class")
        return bool(c) and fragment in c

    def get_text(self, sep: str = " ", strip: bool = True) -> str:
        """bs4 get_text(sep, strip=True): strip each text node, drop empties,
        join with sep. Iterative (this is inside the per-anchor hot loop)."""
        parts: list[str] = []
        stack: list = [self]
        while stack:
            n = stack.pop()
            for c in reversed(n.children):
                if isinstance(c, str):
                    t = c.strip() if strip else c
                    if t:
                        parts.append(t)
                else:
                    stack.append(c)
        # parts were collected depth-first with reversed-push → already in
        # document order
        return sep.join(parts)


def _match(n: Node, pred: dict) -> bool:
    for k, v in pred.items():
        if k == "class_fragment":
            if not n.has_class_fragment(v):
                return False
        elif k == "attrs":
            for ak, av in v.items():
                if n.attrs.get(ak) != av:
                    return False
        elif k == "has_attr":
            if v not in n.attrs:
                return False
        else:
            raise TypeError(f"unknown predicate {k}")
    return True


class _Builder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.doc: list[Node] = []
        self.root = Node("[document]", {}, None, 0)
        self.root._doc = self.doc
        self.root._idx = -1
        self.stack = [self.root]

    def _new(self, tag, attrs) -> Node:
        node = Node(
            tag,
            {k: (v if v is not None else "") for k, v in attrs},
            self.stack[-1],
            len(self.doc) + 1,
        )
        node._doc = self.doc
        node._idx = len(self.doc)
        node._end = node._idx + 1  # leaf until closed
        self.doc.append(node)
        self.stack[-1].children.append(node)
        return node

    def handle_starttag(self, tag, attrs):
        node = self._new(tag, attrs)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._new(tag, attrs)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                for n in self.stack[i:]:
                    n._end = len(self.doc)
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)

    def finish(self) -> Node:
        for n in self.stack:
            n._end = len(self.doc)
        self.root._end = len(self.doc)
        return self.root


def parse_html_slow(html: str) -> Node:
    """Reference path: stdlib html.parser (tolerant, pure python)."""
    b = _Builder()
    b.feed(html or "")
    return b.finish()


# --- C-accelerated fast path -------------------------------------------------
# Well-formed pages (all fixtures + typical modern markup) parse ~5x faster
# through expat (xml.etree, C) after self-closing the HTML void elements.
# Any parse error falls back to the tolerant html.parser path; equivalence
# on representative pages is asserted by tests/test_extraction.py.

import re as _re

_VOID_RE = _re.compile(
    r"<(img|meta|br|hr|input|link|area|base|col|embed|param|source|track|wbr)"
    r"((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)\s*/?>",
    _re.IGNORECASE,
)
_DOCTYPE_RE = _re.compile(r"<!DOCTYPE[^>]*>", _re.IGNORECASE)
_AMP_RE = _re.compile(r"&(?!(?:[a-zA-Z]+|#[0-9]+|#x[0-9a-fA-F]+);)")


def _et_to_node(elem, parent: Node, doc: list[Node]) -> Node:
    node = Node(elem.tag.lower(), {k.lower(): v for k, v in elem.attrib.items()},
                parent, len(doc) + 1)
    node._doc = doc
    node._idx = len(doc)
    doc.append(node)
    if elem.text:
        node.children.append(elem.text)
    for child in elem:
        cn = _et_to_node(child, node, doc)
        node.children.append(cn)
        if child.tail:
            node.children.append(child.tail)
    node._end = len(doc)
    return node


def parse_html(html: str) -> Node:
    html = html or ""
    try:
        from xml.etree import ElementTree as ET

        prepared = _DOCTYPE_RE.sub("", html)
        prepared = _VOID_RE.sub(r"<\1\2/>", prepared)
        prepared = _AMP_RE.sub("&amp;", prepared)  # bare & → entity
        et_root = ET.fromstring(f"<__root__>{prepared}</__root__>")
    except Exception:
        return parse_html_slow(html)
    doc: list[Node] = []
    root = Node("[document]", {}, None, 0)
    root._doc = doc
    root._idx = -1
    if et_root.text:
        root.children.append(et_root.text)
    for child in et_root:
        cn = _et_to_node(child, root, doc)
        root.children.append(cn)
        if child.tail:
            root.children.append(child.tail)
    root._end = len(doc)
    return root
