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
        ch = self.children
        if len(ch) == 1 and type(ch[0]) is str:  # leaf text — hottest shape
            return ch[0].strip() if strip else ch[0]
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


class EDoc:
    """Shared per-document state for the lazy ElementTree view with
    lazily-built position / parent maps. No per-node Python object is
    created at parse time — ``ENode`` wrappers materialize only for query
    HITS, so a 2000-node page pays ~zero conversion cost (the eager
    ``_et_to_node`` recursion this replaces was ~30% of the whole parse).
    The flat element list and the lowercase-tags flag are ALSO lazy: a
    metadata/body parse never touches ``pos``, so most documents allocate
    no per-node lists at all (per-doc allocation pressure is what caps
    multi-core scaling on one box)."""

    __slots__ = ("root_elem", "_elems", "all_lower", "_pos", "_parent")

    def __init__(self, et_root):
        self.root_elem = et_root
        self._elems = None
        # one allocation-free C-iter walk: str.islower() equals
        # `t == t.lower()` for any tag containing a letter (always, for
        # HTML) and builds no list/string; a plain attribute because every
        # find/find_all reads it (~27x per document)
        it = et_root.iter()
        next(it)  # skip the synthetic <__root__> wrapper
        self.all_lower = all(e.tag.islower() for e in it)
        self._pos = None
        self._parent = None

    @property
    def elems(self) -> list:
        if self._elems is None:
            elems = list(self.root_elem.iter())
            elems.pop(0)  # drop the synthetic <__root__> wrapper
            self._elems = elems
        return self._elems

    def pos_of(self, elem) -> int:
        if self._pos is None:
            self._pos = {id(e): i + 1 for i, e in enumerate(self.elems)}
        return self._pos.get(id(elem), 0)

    def parent_of(self, elem):
        if self._parent is None:
            pm = {}
            for p in self.root_elem.iter():
                for c in p:
                    pm[id(c)] = p
            self._parent = pm
        return self._parent.get(id(elem))


def _aget(elem, name: str):
    """Case-insensitive attribute get with a C-dict fast path (markup is
    overwhelmingly lowercase; the loop only runs on a miss)."""
    a = elem.attrib
    v = a.get(name)
    if v is None and a:
        for k in a:
            if k.lower() == name:
                return a[k]
    return v


def _ematch(elem, pred: dict) -> bool:
    for k, v in pred.items():
        if k == "class_fragment":
            c = _aget(elem, "class")
            if not c or v not in c:
                return False
        elif k == "attrs":
            for ak, av in v.items():
                if _aget(elem, ak) != av:
                    return False
        elif k == "has_attr":
            if _aget(elem, v) is None:
                return False
        else:
            raise TypeError(f"unknown predicate {k}")
    return True


class ENode:
    """Node-API-compatible lazy wrapper over an ElementTree Element."""

    __slots__ = ("e", "doc")

    def __init__(self, e, doc: EDoc):
        self.e = e
        self.doc = doc

    @property
    def tag(self) -> str:
        return self.e.tag.lower()

    @property
    def pos(self) -> int:
        return self.doc.pos_of(self.e)

    @property
    def attrs(self) -> dict:
        return {k.lower(): v for k, v in self.e.attrib.items()}

    @property
    def parent(self):
        p = self.doc.parent_of(self.e)
        if p is None or p is self.doc.root_elem:
            return None
        return ENode(p, self.doc)

    def _subtree(self, tag: str | None):
        """Pre-order subtree elements (self excluded), C-filtered by tag
        when the document is all-lowercase."""
        if tag and self.doc.all_lower:
            it = iter(self.e.iter(tag))
            if self.e.tag == tag:  # filtered iter includes self only on match
                next(it, None)
            return it
        it = iter(self.e.iter())
        next(it, None)  # unfiltered iter always starts with self
        return it

    def find_all(self, tag: str | tuple[str, ...] | None = None, **pred):
        tags = (tag,) if isinstance(tag, str) else tag
        single = tags[0] if tags and len(tags) == 1 else None
        need_tag_check = tags and (single is None or not self.doc.all_lower)
        doc = self.doc
        if not pred:  # hot shape: find_all("p") / ("figure") / ("a")
            if need_tag_check:
                return [ENode(c, doc) for c in self._subtree(single)
                        if c.tag.lower() in tags]
            return [ENode(c, doc) for c in self._subtree(single)]
        frag = pred.get("class_fragment") if len(pred) == 1 else None
        out = []
        for c in self._subtree(single):
            if need_tag_check and c.tag.lower() not in tags:
                continue
            if frag is not None:  # hot shape: class_fragment-only predicate
                cls = c.attrib.get("class")
                if cls is None and c.attrib:
                    cls = _aget(c, "class")
                if not cls or frag not in cls:
                    continue
            elif not _ematch(c, pred):
                continue
            out.append(ENode(c, doc))
        return out

    def find(self, tag=None, **pred):
        tags = (tag,) if isinstance(tag, str) else tag
        single = tags[0] if tags and len(tags) == 1 else None
        need_tag_check = tags and (single is None or not self.doc.all_lower)
        frag = pred.get("class_fragment") if len(pred) == 1 else None
        for c in self._subtree(single):
            if need_tag_check and c.tag.lower() not in tags:
                continue
            if frag is not None:
                cls = c.attrib.get("class")
                if cls is None and c.attrib:
                    cls = _aget(c, "class")
                if cls and frag in cls:
                    return ENode(c, self.doc)
            elif _ematch(c, pred):
                return ENode(c, self.doc)
        return None

    def find_parent(self, tag: str):
        p = self.doc.parent_of(self.e)
        while p is not None and p is not self.doc.root_elem:
            if p.tag.lower() == tag:
                return ENode(p, self.doc)
            p = self.doc.parent_of(p)
        return None

    def find_next_sibling(self, tag: str, **pred):
        p = self.doc.parent_of(self.e)
        if p is None:
            return None
        sibs = list(p)
        for i, s in enumerate(sibs):
            if s is self.e:
                for nxt in sibs[i + 1 :]:
                    if nxt.tag.lower() == tag and _ematch(nxt, pred):
                        return ENode(nxt, self.doc)
                return None
        return None

    def get(self, name: str, default=None):
        v = _aget(self.e, name)
        return default if v is None else v

    def has_class_fragment(self, fragment: str) -> bool:
        c = _aget(self.e, "class")
        return bool(c) and fragment in c

    def get_text(self, sep: str = " ", strip: bool = True) -> str:
        e = self.e
        if len(e) == 0:  # childless element — hottest shape (<p>text</p>)
            t = e.text or ""
            return t.strip() if strip else t
        # Element.itertext() walks text+tails in document order in C
        if strip:
            return sep.join(t for t in (s.strip() for s in self.e.itertext()) if t)
        return sep.join(t for t in self.e.itertext() if t)

    def iter(self):
        yield self
        for c in self._subtree(None):
            yield ENode(c, self.doc)

    def descendants(self):
        return [ENode(c, self.doc) for c in self._subtree(None)]


def parse_html(html: str) -> Node | ENode:
    html = html or ""
    try:
        from xml.etree import ElementTree as ET

        # each no-op .sub returns the ORIGINAL string (no copy); the cheap
        # substring guard skips the doctype regex scan on doctype-less docs
        prepared = _DOCTYPE_RE.sub("", html) if "<!" in html else html
        prepared = _VOID_RE.sub(r"<\1\2/>", prepared)
        prepared = _AMP_RE.sub("&amp;", prepared)  # bare & → entity
        # feed the wrapper tags separately — fromstring on an f-string
        # would copy the whole document one more time
        parser = ET.XMLParser()
        parser.feed("<__root__>")
        parser.feed(prepared)
        parser.feed("</__root__>")
        et_root = parser.close()
    except Exception:
        return parse_html_slow(html)
    return ENode(et_root, EDoc(et_root))
