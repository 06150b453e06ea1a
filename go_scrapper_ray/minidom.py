"""Minimal DOM + goquery/cascadia-equivalent CSS selector subset.

The reference extracts with colly/goquery over net/html
(``/root/reference/main.go:355-412,491-558,771-932``).  The sandbox has no
lxml/selectolax, so this module implements — from scratch, on stdlib
``html.parser`` — exactly the semantics those extractions rely on:

* net/html-style tree: entities decoded in text and attribute values, but NOT
  inside ``<script>``/``<style>`` (raw text elements) — matching
  ``html.parser.HTMLParser(convert_charrefs=True)``.
* goquery ``Selection.Text()``: concatenation of all descendant text nodes in
  document order, no normalization.
* colly ``ChildText``/``ChildTexts``/``ChildAttr`` trimming rules
  (TrimSpace on text; attr of FIRST match, trimmed).
* cascadia selector subset actually used by the reference: tag, ``.class``,
  ``[attr="value"]``, ``:contains(str)`` (case-insensitive substring of text
  content), descendant (space) and child (``>``) combinators.

This is the byte-parity-critical module (BASELINE.md correctness gate):
"byte-identical extracted text per url".
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
        "meta", "param", "source", "track", "wbr"}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order",
                 "_flat", "_cls")

    def __init__(self, tag: str, attrs=None, parent=None, order: int = -1):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []  # Node | str (text)
        self.parent = parent
        self.order = order
        self._flat = None  # cached descendant-element list (doc order);
        self._cls = None   # cached class-token list — trees are read-only
        #                    after parse, so both caches are safe

    # ---------------------------------------------------------------- texts
    def text(self) -> str:
        """goquery Selection.Text() of a single node: all text nodes, in order."""
        out: list[str] = []
        stack = [self]
        # iterative DFS preserving document order
        def walk(n: "Node"):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c)
                else:
                    walk(c)
        walk(self)
        return "".join(out)

    def attr(self, name: str):
        return self.attrs.get(name.lower())

    def iter_elements(self):
        """Descendant elements (excluding self), document order (cached —
        repeated selects over the same subtree are the extraction hot
        path)."""
        f = self._flat
        if f is None:
            f = []
            app = f.append
            stack = [iter(self.children)]
            while stack:
                for c in stack[-1]:
                    if type(c) is Node:
                        app(c)
                        stack.append(iter(c.children))
                        break
                else:
                    stack.pop()
            self._flat = f
        return f

    @property
    def cls(self) -> list:
        c = self._cls
        if c is None:
            c = self._cls = (self.attrs.get("class") or "").split()
        return c

    # ------------------------------------------------------------- selection
    def select(self, selector: str) -> list["Node"]:
        """goquery Find(): matching DESCENDANTS of this node, document order."""
        chain = _parse_selector(selector)
        if len(chain) == 1:
            simple = chain[0][1]
            m = simple.matches
            return [el for el in self.iter_elements() if m(el)]
        tag = chain[-1][1].tag  # inline prefilter: skip the call for
        if tag is not None:     # elements that can't match the last simple
            return [el for el in self.iter_elements()
                    if el.tag == tag and _match_chain(el, chain, scope=self)]
        return [el for el in self.iter_elements()
                if _match_chain(el, chain, scope=self)]

    def select_first(self, selector: str):
        chain = _parse_selector(selector)
        for el in self.iter_elements():
            if _match_chain(el, chain, scope=self):
                return el
        return None

    # --------------------------------------------------------- colly helpers
    def child_text(self, selector: str) -> str:
        """colly HTMLElement.ChildText: TrimSpace(Find(sel).Text()) where the
        selection Text() concatenates every matched element's text."""
        return "".join(el.text() for el in self.select(selector)).strip()

    def child_texts(self, selector: str) -> list[str]:
        """colly ChildTexts: per-element TrimSpace'd texts."""
        return [el.text().strip() for el in self.select(selector)]

    def child_attr(self, selector: str, name: str) -> str:
        """colly ChildAttr: attr of FIRST match, TrimSpace'd; '' if absent."""
        for el in self.select(selector):
            v = el.attr(name)
            if v is not None:
                return v.strip()
            return ""
        return ""

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<{self.tag} {self.attrs}>"


class _Parser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#document")
        self.stack = [self.root]
        self._order = 0

    def handle_starttag(self, tag, attrs):
        d = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        node = Node(tag, d, parent=self.stack[-1], order=self._order)
        self._order += 1
        self.stack[-1].children.append(node)
        if tag not in VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        d = {}
        for k, v in attrs:
            if k not in d:
                d[k] = v if v is not None else ""
        node = Node(tag, d, parent=self.stack[-1], order=self._order)
        self._order += 1
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        # pop to the matching open tag (tolerate stray end tags)
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(src: str | bytes) -> Node:
    if isinstance(src, bytes):
        src = src.decode("utf-8", errors="replace")
    p = _Parser()
    p.feed(src)
    p.close()
    return p.root


# ------------------------------------------------------------------ selectors

class _Simple:
    __slots__ = ("tag", "classes", "attrs", "contains")

    def __init__(self):
        self.tag = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str | None]] = []
        self.contains: list[str] = []

    def matches(self, n: Node) -> bool:
        if self.tag is not None and n.tag != self.tag:
            return False
        if self.classes:
            cls = n.cls
            for c in self.classes:
                if c not in cls:
                    return False
        for name, val in self.attrs:
            got = n.attrs.get(name)
            if got is None or (val is not None and got != val):
                return False
        for sub in self.contains:
            if sub.lower() not in n.text().lower():
                return False
        return True


def _parse_simple(tok: str) -> _Simple:
    s = _Simple()
    i, n = 0, len(tok)
    # leading tag name
    j = i
    while j < n and (tok[j].isalnum() or tok[j] in "-_"):
        j += 1
    if j > i:
        s.tag = tok[i:j].lower()
        i = j
    while i < n:
        ch = tok[i]
        if ch == ".":
            j = i + 1
            while j < n and tok[j] not in ".[:#":
                j += 1
            s.classes.append(tok[i + 1:j])
            i = j
        elif ch == "[":
            j = tok.index("]", i)
            body = tok[i + 1:j]
            if "=" in body:
                name, val = body.split("=", 1)
                val = val.strip("\"'")
                s.attrs.append((name.lower(), val))
            else:
                s.attrs.append((body.lower(), None))
            i = j + 1
        elif ch == ":":
            # :contains(...)
            assert tok[i:i + 10] == ":contains(", f"unsupported pseudo in {tok!r}"
            j = tok.index(")", i)
            s.contains.append(tok[i + 10:j].strip("\"'"))
            i = j + 1
        else:
            raise ValueError(f"unsupported selector token {tok!r}")
    return s


from functools import lru_cache


@lru_cache(maxsize=256)
def _parse_selector(selector: str) -> list[tuple[str, _Simple]]:
    """Returns [(combinator, simple), ...]; combinator of first is ''.

    Supported: descendant (space), child ('>').  Cached: extraction calls
    select() with the same handful of selectors per-element (measured 13k
    parses per 200 pages before caching).
    """
    # tokenize, keeping '>' separate — but not inside [...] or (...)
    toks: list[str] = []
    buf = []
    depth = 0
    for ch in selector:
        if ch in "[(":
            depth += 1
            buf.append(ch)
        elif ch in "])":
            depth -= 1
            buf.append(ch)
        elif depth == 0 and (ch.isspace() or ch == ">"):
            if buf:
                toks.append("".join(buf))
                buf = []
            if ch == ">":
                toks.append(">")
        else:
            buf.append(ch)
    if buf:
        toks.append("".join(buf))

    chain: list[tuple[str, _Simple]] = []
    comb = ""
    for t in toks:
        if t == ">":
            comb = ">"
        else:
            chain.append((comb, _parse_simple(t)))
            comb = " "
    return chain


def _match_chain(el: Node, chain: list[tuple[str, _Simple]], scope: Node) -> bool:
    """goquery Find semantics: the candidate element is already restricted to
    descendants of `scope`, but the selector itself is matched against the
    WHOLE document tree — ancestor combinators may climb above the scope node
    (matching goquery's findWithMatcher, which filters document-wide cascadia
    matches to descendants of the selection).

    Iterative (no per-call closure): child combinators and the final
    descendant hop are loops; only a descendant combinator in the MIDDLE of
    a chain (which needs ancestor backtracking) recurses."""
    if not chain[-1][1].matches(el):
        return False
    return _match_rest(el, chain, len(chain) - 1)


def _match_rest(node: Node, chain, idx: int) -> bool:
    """``node`` matches chain[idx]; check the remaining prefix upward."""
    while idx > 0:
        comb = chain[idx][0]
        idx -= 1
        simple = chain[idx][1]
        parent = node.parent
        if comb == ">":
            if parent is None or not simple.matches(parent):
                return False
            node = parent
            continue
        if idx == 0:  # leading simple: any ancestor suffices
            while parent is not None:
                if simple.matches(parent):
                    return True
                parent = parent.parent
            return False
        while parent is not None:  # middle descendant hop: backtrack
            if simple.matches(parent) and _match_rest(parent, chain, idx):
                return True
            parent = parent.parent
        return False
    return True
