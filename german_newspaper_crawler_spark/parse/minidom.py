"""Minimal DOM on top of stdlib ``html.parser`` (no bs4/lxml in container).

Implements exactly the query surface the reference uses through
BeautifulSoup (``lib/domain/taz.py``): find by tag, class-fragment matching,
attribute lookups, ancestor/sibling walks, and ``get_text(" ", strip=True)``
semantics. Document order is preserved via a global ``pos`` counter so the
selector-ladder ordering (taz.py:188-206) can be reproduced as data.
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "pos")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None", pos: int):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent
        self.pos = pos

    # -- queries ----------------------------------------------------------
    def iter(self):
        """Depth-first document-order traversal (self included)."""
        yield self
        for c in self.children:
            if isinstance(c, Node):
                yield from c.iter()

    def find_all(self, tag: str | tuple[str, ...] | None = None, **pred):
        tags = (tag,) if isinstance(tag, str) else tag
        out = []
        for n in self.iter():
            if n is self:
                continue
            if tags and n.tag not in tags:
                continue
            if not _match(n, pred):
                continue
            out.append(n)
        return out

    def find(self, tag=None, **pred):
        r = self.find_all(tag, **pred)
        return r[0] if r else None

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
        join with sep."""
        parts: list[str] = []

        def walk(n: Node):
            for c in n.children:
                if isinstance(c, str):
                    t = c.strip() if strip else c
                    if t:
                        parts.append(t)
                else:
                    walk(c)

        walk(self)
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
        self.root = Node("[document]", {}, None, 0)
        self.stack = [self.root]
        self.counter = 0

    def handle_starttag(self, tag, attrs):
        self.counter += 1
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1], self.counter)
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.counter += 1
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs}, self.stack[-1], self.counter)
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _Builder()
    b.feed(html or "")
    return b.root
