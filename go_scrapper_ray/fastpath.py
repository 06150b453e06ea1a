"""Scanner fast paths for the extraction hot loop.

The reference's extractions (``/root/reference/main.go:355-412,491-558,
771-932``) touch only a handful of structural islands per page: ``<script>``
and ``<meta>`` bodies (SERP + profile), ``<h3>`` texts (non-rec landing) and
the ``div.not-recommended-reviews`` subtree (non-rec pages).  Real pages are
dominated by chrome the selectors never match (the bench fixtures model this
with ~18 KB of filler DOM per page), so building the full minidom tree is
>90 % wasted allocation — the measured scaling killer at 32-wide concurrency
(BASELINE.md: allocation-heavy parse drops ~1.65x per-core throughput).

``scan()`` walks tags with C-level ``str.find`` and a strict tag grammar,
collecting ONLY those islands; text outside them is skipped without a single
Python-object allocation.  Byte parity with the full parse is preserved by
construction where the grammar holds, and by FALLBACK where it doesn't: any
comment, malformed tag, or improper nesting inside a captured fragment
returns None and the caller uses ``minidom.parse_html`` as before.  The
parity suite runs every fixture page through both paths
(tests/test_fastpath.py)."""

from __future__ import annotations

import re
from html import unescape

from .minidom import VOID, Node, _Parser

# strict tag grammar: lowercase/uppercase names, whitespace-separated
# attributes with optional double-quoted values (no '<' or '>' inside).
# Anything outside this grammar -> scan failure -> minidom fallback.
_NAME_RE = re.compile(r"[a-zA-Z][a-zA-Z0-9-]*")
_ATTR_RE = re.compile(
    r'\s+([a-zA-Z][a-zA-Z0-9_:.-]*)\s*(?:=\s*"([^"<>]*)")?')


class _ScanFail(Exception):
    pass


class FastpathMiss(Exception):
    """Selector not answerable from the scan — caller must full-parse."""


def _parse_fragment(frag: str) -> Node:
    """minidom parse of a captured fragment (same parser => same entity and
    tolerance semantics as the full-document parse)."""
    p = _Parser()
    p.feed(frag)
    p.close()
    return p.root


# one-regex tokenizer for captured fragments.  Valid ONLY on text the
# scanner already validated (proper nesting, no comments/CDATA, strict attr
# grammar) — anything else must go through _parse_fragment.
_TOK_RE = re.compile(
    r'<(/?)([a-zA-Z][a-zA-Z0-9-]*)((?:[^<>"]|"[^"<>]*")*?)(/?)>')


def fragment_tree(frag: str) -> Node:
    """Node tree of a scanner-validated fragment — semantics identical to
    ``_parse_fragment`` on this restricted grammar (entity decode in text
    and attr values, first-attr-wins, VOID tags, pop-to-matching-open), at
    regex-tokenizer speed.  Falls back to the HTMLParser build if the
    tokenizer's view of the fragment is incomplete (defense in depth; the
    scanner's guards should make that unreachable)."""
    root = Node("#document")
    stack = [root]
    pos = 0
    for m in _TOK_RE.finditer(frag):
        s = m.start()
        if s > pos:
            text = frag[pos:s]
            if "<" in text:  # markup the tokenizer skipped — be safe
                return _parse_fragment(frag)
            if "&" in text:
                text = unescape(text)
            stack[-1].children.append(text)
        elif s < pos:  # overlapping/odd tokenization — be safe
            return _parse_fragment(frag)
        pos = m.end()
        closing, name, span, selfclose = m.groups()
        name = name.lower()
        if closing:
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == name:
                    del stack[i:]
                    break
            continue
        try:
            attrs = _span_info(span)[0]  # memoized; treated as read-only
        except _ScanFail:  # e.g. unquoted attr values — HTMLParser-only
            return _parse_fragment(frag)
        node = Node(name, attrs, parent=stack[-1])
        stack[-1].children.append(node)
        if not selfclose and name not in VOID:
            stack.append(node)
    if pos < len(frag):
        text = frag[pos:]
        if "<" in text:
            return _parse_fragment(frag)  # unconsumed markup
        if "&" in text:
            text = unescape(text)
        stack[-1].children.append(text)
    return root


# --------------------------------------------- nonrec one-pass item walk

# The not-recommended page costs ~half the crawl's extract core-seconds
# (30k pages x ~2.8 ms: fragment_tree built a Node per element, then
# extract_nonrec_page ran ~10 selector queries per <li> over it).  This
# walk answers EXACTLY the selector patterns extract_nonrec_page uses
# (reference main.go:830-932) from one _TOK_RE pass over the
# scanner-verified region fragment — no Node allocation, no selector
# engine.  Equivalence is asserted against the tree+selector path on the
# fixture corpus, generated items, and fuzz in tests/test_fastpath.py;
# any structure the walk can't prove equivalent raises FastpathMiss and
# the caller falls back to fragment_tree + extract_nonrec_page.


def _new_nr_item() -> dict:
    return {"a_href": None, "a_buf": [], "p_buf": [], "q_buf": [],
            "rid": None, "stars": None, "photo": None, "comments_buf": [],
            "reply_date_buf": [], "reply_author_buf": [],
            "reply_text_buf": [], "prev": []}


def _finish_nr_item(it: dict) -> dict:
    return {
        "a_href": it["a_href"] or "",
        "a_text": "".join(it["a_buf"]).strip(),
        "p_text": "".join(it["p_buf"]).strip(),
        "q_text": "".join(it["q_buf"]).strip(),
        "rid": it["rid"] or "",
        "stars": it["stars"] or "",
        "photo": it["photo"] or "",
        "comments": "".join(it["comments_buf"]).strip(),
        "reply_date": "".join(it["reply_date_buf"]).strip(),
        "reply_author": "".join(it["reply_author_buf"]).strip(),
        "reply_text": "".join(it["reply_text_buf"]).strip(),
        "prev": [{"q1": "".join(p["q1_buf"]).strip(),
                  "q2": p["q2"] or "",
                  "q4": "".join(p["q4_buf"]).strip(),
                  "q5": "".join(p["q5_buf"])}  # elem.text(): NOT stripped
                 for p in it["prev"]],
    }


def _chain2(stack, t1, c1, t2, c2) -> bool:
    """Some i<j with stack[i] matching (t1,.c1) and stack[j] matching
    (t2,.c2) — greedy-first is complete for a 2-subsequence."""
    seen1 = False
    for t, cl in stack:
        if seen1:
            if (t2 is None or t == t2) and c2 in cl:
                return True
        elif (t1 is None or t == t1) and c1 in cl:
            seen1 = True
    return False


# attr spans repeat massively across pages (class="review-content", ...);
# memoizing (attrs, classes) per span string turns the per-element attr
# parse into a dict hit for the whole worker lifetime.  Entries are
# treated as READ-ONLY by all users.  Spans that fail _attrs_of are not
# cached (they raise each time — rare, and callers fall back).
_SPAN_MEMO: dict[str, tuple[dict, frozenset]] = {}

# classes that can influence any nonrec selector pattern — elements with
# none of these (and tag != p/li/div-previous) skip the predicate block
_NR_HOT = frozenset((
    "user-display-name", "rating-qualifier", "review--with-sidebar",
    "i-stars", "photo-box-img", "bullet-after", "js-content-toggleable",
    "previous-review"))


def _span_info(span: str) -> tuple[dict, frozenset]:
    r = _SPAN_MEMO.get(span)
    if r is None:
        attrs = _attrs_of(span) if span.strip() else {}
        r = (attrs, frozenset((attrs.get("class") or "").split()))
        if len(_SPAN_MEMO) > 200_000:
            _SPAN_MEMO.clear()
        _SPAN_MEMO[span] = r
    return r


def nonrec_items(frag: str, region_class: str = "not-recommended-reviews"):
    """List of per-<li> raw field captures (child_text/child_attr parity)
    for ``div.<region_class> > ul.reviews > li``; see block comment above.
    Raises FastpathMiss whenever the tokenizer would fall back or the
    structure needs the general engine (nested items / nested
    previous-review / nested same-pattern matches)."""
    items: list[dict] = []
    stack: list[tuple[str, frozenset]] = []
    # active concat-text captures: [buf, min_len, key]; a capture is live
    # while len(stack) >= min_len.  key guards against nested same-pattern
    # matches (join-of-matches ordering differs there -> fall back).
    active: list[list] = []
    cur: dict | None = None
    cur_len = -1           # stack len with the <li> on top
    prev_open: dict | None = None
    pos = 0

    def _reg(buf: list, min_len: int, key: str):
        for c in active:
            if c[2] == key:
                raise FastpathMiss("nested same-pattern match")
        active.append([buf, min_len, key])

    for m in _TOK_RE.finditer(frag):
        s = m.start()
        if s > pos:
            text = frag[pos:s]
            if "<" in text:
                raise FastpathMiss("markup the tokenizer skipped")
            if active:
                if "&" in text:
                    text = unescape(text)
                for c in active:
                    c[0].append(text)
        elif s < pos:
            raise FastpathMiss("overlapping tokens")
        pos = m.end()
        closing, name, span, selfclose = m.groups()
        name = name.lower()
        if closing:
            # STRICT nesting required: this walk doubles as the capture
            # verifier (scan(verify_region=False) skips _verify_capture),
            # and strict nesting is exactly the property under which the
            # captured extent provably equals the per-tag walk's.  A stray
            # or crossing end tag -> miss -> caller full-parses.
            if not stack or stack[-1][0] != name:
                raise FastpathMiss("improper nesting")
            stack.pop()
            nl = len(stack)
            if active:
                active = [c for c in active if c[1] <= nl]
            if prev_open is not None and nl < prev_open["_len"]:
                prev_open = None
            if cur is not None and nl < cur_len:
                items.append(_finish_nr_item(cur))
                cur = None
                prev_open = None
            continue
        if name == "script" or name == "style" or name == "html":
            raise FastpathMiss("cdata/html inside capture")
        try:
            attrs, cls = _span_info(span)
        except _ScanFail:
            raise FastpathMiss("attr grammar")
        is_void = bool(selfclose) or name in VOID

        if (name == "li" and len(stack) >= 2
                and stack[-1][0] == "ul" and "reviews" in stack[-1][1]
                and stack[-2][0] == "div" and region_class in stack[-2][1]):
            if cur is not None:
                raise FastpathMiss("nested li item")
            cur = _new_nr_item()
            if is_void:
                items.append(_finish_nr_item(cur))
                cur = None
                continue
            stack.append((name, cls))
            cur_len = len(stack)
            continue

        if cur is not None and (name == "p" or name == "strong"
                                or not cls.isdisjoint(_NR_HOT)):
            ml = len(stack) + 1  # capture min_len if this element pushes
            if "user-display-name" in cls and _anc(stack, "div",
                                                   "review-sidebar"):
                if cur["a_href"] is None:
                    v = attrs.get("href")
                    cur["a_href"] = v.strip() if v is not None else ""
                    cur["a_href"] = cur["a_href"] or ""
                if not is_void:
                    _reg(cur["a_buf"], ml, "a")
            if name == "p" and _chain2(stack, "div", "review-wrapper",
                                       "div", "review-content"):
                if not is_void:
                    _reg(cur["p_buf"], ml, "p")
            if "rating-qualifier" in cls:
                if _chain2(stack, "div", "review-wrapper",
                           "div", "review-content") and not is_void:
                    _reg(cur["q_buf"], ml, "q")
                if prev_open is not None and not is_void:
                    _reg(prev_open["q1_buf"], ml, "q1")
            if name == "div" and "review--with-sidebar" in cls \
                    and cur["rid"] is None:
                v = attrs.get("data-review-id")
                cur["rid"] = v.strip() if v is not None else ""
            if "i-stars" in cls and _anc(stack, None, "biz-rating"):
                v = attrs.get("class")
                sv = v.strip() if v is not None else ""
                if cur["stars"] is None:
                    cur["stars"] = sv
                if prev_open is not None and prev_open["q2"] is None:
                    prev_open["q2"] = sv
            if name == "img" and "photo-box-img" in cls \
                    and cur["photo"] is None \
                    and _chain2(stack, "ul", "photo-box-grid",
                                "div", "photo-box"):
                v = attrs.get("data-async-src")
                cur["photo"] = v.strip() if v is not None else ""
            if name == "span" and "bullet-after" in cls and not is_void:
                if _chain2(stack, "div", "review-wrapper",
                           "div", "biz-owner-reply"):
                    _reg(cur["comments_buf"], ml, "cm")
                if _anc(stack, "div", "biz-owner-reply"):
                    _reg(cur["reply_date_buf"], ml, "rd")
            if name == "strong" and not is_void \
                    and _anc(stack, "div", "biz-owner-reply-header"):
                _reg(cur["reply_author_buf"], ml, "ra")
            if name == "span" and "js-content-toggleable" in cls \
                    and not is_void:
                if "hidden" in cls:
                    _reg(cur["reply_text_buf"], ml, "rt")
                if prev_open is not None and _anc(stack, "span",
                                                  "js-expandable-comment"):
                    _reg(prev_open["q4_buf"], ml, "q4")
            if name == "div" and "previous-review" in cls:
                if prev_open is not None:
                    raise FastpathMiss("nested previous-review")
                if not is_void:
                    prev_open = {"q1_buf": [], "q2": None, "q4_buf": [],
                                 "q5_buf": [], "_len": ml}
                    cur["prev"].append(prev_open)
                    _reg(prev_open["q5_buf"], ml, "q5")
                else:
                    cur["prev"].append({"q1_buf": [], "q2": None,
                                        "q4_buf": [], "q5_buf": []})

        if not is_void:
            stack.append((name, cls))

    if pos < len(frag):
        text = frag[pos:]
        if "<" in text:
            raise FastpathMiss("unconsumed markup")
        if active:
            if "&" in text:
                text = unescape(text)
            for c in active:
                c[0].append(text)
    if stack:  # unbalanced fragment: extent unproven -> full parse
        raise FastpathMiss("unclosed tag in capture")
    return items


def _anc(stack, tag, c) -> bool:
    for t, cl in stack:
        if (tag is None or t == tag) and c in cl:
            return True
    return False


class FastDoc:
    """Answers exactly the selector patterns the extraction kernels use,
    from a single scan — raises FastpathMiss on anything else."""

    __slots__ = ("scripts", "metas", "_h3_frags", "_h3_texts", "_complete")

    def __init__(self, scripts, metas, h3_frags, complete=True):
        self.scripts = scripts      # [(attrs, raw_body)]
        self.metas = metas          # [attrs]
        self._h3_frags = h3_frags   # raw inner HTML per h3, document order
        self._h3_texts = None
        # False when a region capture swallowed part of the document: the
        # island lists may then be missing in-region members, so selector
        # access must fall back to the full parse (caught by the fuzz
        # suite: an <h3> inside the region div)
        self._complete = complete

    def _require_complete(self):
        if not self._complete:
            raise FastpathMiss("islands incomplete (region capture)")

    # -- selector answers (minidom-equivalent for these patterns) ----------
    def _script_texts(self, pred):
        return [b for a, b in self.scripts if pred(a, b)]

    def h3_texts(self) -> list[str]:
        if self._h3_texts is None:
            out = []
            for f in self._h3_frags:
                t = fragment_tree(f)
                out.append(t.text())
                # nested h3s live inside the outer capture; document order
                # is outer-first then descendants (fuzz-found case)
                out.extend(e.text() for e in t.select("h3"))
            self._h3_texts = out
        return self._h3_texts

    def child_texts(self, selector: str) -> list[str]:
        self._require_complete()
        if selector == "h3":
            return [t.strip() for t in self.h3_texts()]
        if selector.startswith("script:contains(") and selector.endswith(")"):
            sub = selector[len("script:contains("):-1].strip("\"'").lower()
            return [b.strip() for a, b in self.scripts if sub in b.lower()]
        m = re.fullmatch(r'script\[type="([^"]*)"\]', selector)
        if m:
            typ = m.group(1)
            return [b.strip() for a, b in self.scripts
                    if a.get("type") == typ]
        raise FastpathMiss(selector)

    def child_text(self, selector: str) -> str:
        self._require_complete()
        m = re.fullmatch(r'script\[type="([^"]*)"\]', selector)
        if m:
            typ = m.group(1)
            return "".join(b for a, b in self.scripts
                           if a.get("type") == typ).strip()
        raise FastpathMiss(selector)

    def child_attr(self, selector: str, name: str) -> str:
        self._require_complete()
        m = re.fullmatch(r'meta\[name="([^"]*)"\]', selector)
        if m:
            want = m.group(1)
            for a in self.metas:
                if a.get("name") == want:
                    v = a.get(name)
                    # colly ChildAttr: FIRST match only; '' if attr absent
                    return v.strip() if v is not None else ""
            return ""
        raise FastpathMiss((selector, name))


def _attrs_of(span: str) -> dict:
    """Parse an attribute span; raise on grammar violations.  Mirrors
    HTMLParser: lowercased names, first occurrence wins, entity refs
    decoded in values."""
    d: dict = {}
    j, end = 0, len(span)
    while j < end:
        m = _ATTR_RE.match(span, j, end)
        if m is None:
            rest = span[j:end].strip().rstrip("/")
            if rest:
                raise _ScanFail(span[j:end])
            break
        k = m.group(1).lower()
        v = m.group(2)
        if v is None:
            v = ""
        elif "&" in v:
            v = unescape(v)
        if k not in d:
            d[k] = v
        j = m.end()
    return d


def scan(html: str | bytes, region_class: str | None = None,
         verify_region: bool = True):
    """Returns (FastDoc, region_fragment) or (None, None) when the page
    needs the full parse.

    Two tiers, strictly fallback-chained: ``_scan_fast`` jumps directly
    between the island tags with C-level regex searches (no per-tag Python
    for the filler DOM that dominates real pages); any construct whose
    tokenization it cannot prove equivalent to the per-tag walk raises and
    ``_scan`` — the vetted per-tag scanner — runs instead; if that also
    fails the caller full-parses with minidom.  The fuzz suite asserts
    fast==slow on every input where both succeed (test_fastpath.py).

    region_class: when set, also capture the subtree of the unique
    ``<div class="... region_class ...">`` (the non-rec reviews container);
    ambiguity (0 or 2+ matches) or improper nesting inside any captured
    fragment falls back.

    ``verify_region=False`` skips the region fragment's _verify_capture
    (strict-nesting proof): ONLY for consumers that re-walk the fragment
    with their own strict verification (``nonrec_items``) and full-parse
    on any surprise — the captured extent is then proven by the consumer,
    not here."""
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    try:
        return _scan_fast(html, region_class, verify_region)
    except _ScanFail:
        pass
    try:
        return _scan(html, region_class)
    except _ScanFail:
        return None, None


# ---------------------------------------------------------- island-jump tier

# global disqualifiers (one C-level search each).  Any hit means naive
# find()-based tag boundaries might differ from HTMLParser tokenization
# (or, for comments, that _scan would fail anyway) — fall back.
_BAD_SPAN_LT = re.compile(r"<[a-zA-Z][^>]*<")     # '<' inside a naive span
_BAD_QUOT_GT = re.compile(r'=\s*"[^">]*>')        # '>' inside a quoted value
_BAD_DECL_LT = re.compile(r"<[!?][^>]*<")         # '<' inside a decl/PI span
_ISLAND_RE = re.compile(r"<(script|style|meta|h3|html)(?![a-zA-Z0-9-])")
_H3_TAG_RE = re.compile(r"</?h3(?![a-zA-Z0-9-])")
_DIV_TAG_RE = re.compile(r"</?div(?![a-zA-Z0-9-])")
_FIRST_TAG_RE = re.compile(r"<[a-zA-Z]")


def _verify_capture(frag: str, region_class: str | None = None,
                    forbid_meta: bool = False):
    """Prove the per-tag walk (_scan) would give a capture exactly this
    extent: strict nesting (every end tag matches the top of the local
    stack), no comments/decls/CDATA/html inside, stack empty at the end.
    Any unmatched end tag is conservatively a failure (it might pop an
    element OUTSIDE the fragment, changing the extent).  For h3 fragments
    (``forbid_meta``/``region_class`` set) a meta or region-class div
    inside would be invisible to the selectors — also a failure."""
    stack: list[str] = []
    find = frag.find
    n = len(frag)
    i = 0
    while True:
        lt = find("<", i)
        if lt < 0:
            break
        c = frag[lt + 1] if lt + 1 < n else ""
        if c == "!" or c == "?":
            raise _ScanFail("decl inside capture")
        if c == "/":
            m = _NAME_RE.match(frag, lt + 2)
            if m is None:
                raise _ScanFail("bad endtag in capture")
            name = m.group(0).lower()
            gt = find(">", m.end())
            if gt < 0:
                raise _ScanFail("unterminated endtag in capture")
            if not stack or stack[-1] != name:
                raise _ScanFail("improper nesting in capture")
            stack.pop()
            i = gt + 1
            continue
        m = _NAME_RE.match(frag, lt + 1)
        if m is None:
            i = lt + 1  # literal '<' in text — same skip as _scan
            continue
        name = m.group(0).lower()
        gt = find(">", m.end())
        if gt < 0:
            raise _ScanFail("unterminated tag in capture")
        if name == "html":
            raise _ScanFail("html inside capture")
        if name == "script" or name == "style":
            raise _ScanFail("cdata inside capture")
        if forbid_meta and name == "meta":
            raise _ScanFail("meta inside h3 capture")
        span = frag[m.end():gt]
        if (region_class is not None and name == "div"
                and region_class in span
                and region_class
                in (_attrs_of(span).get("class") or "").split()):
            raise _ScanFail("region inside h3 capture")
        if not span.rstrip().endswith("/") and name not in VOID:
            stack.append(name)
        i = gt + 1
    if stack:
        raise _ScanFail("unclosed tag in capture")


def _match_close(lowered: str, start: int, tag_re: re.Pattern,
                 html: str) -> int:
    """Position of the end tag that closes the element opened just before
    ``start``, counting nested same-name opens (self-closed ones don't
    push).  Returns the index of its '<'."""
    depth = 1
    pos = start
    while True:
        m = tag_re.search(lowered, pos)
        if m is None:
            raise _ScanFail("unterminated capture")
        if lowered[m.start() + 1] == "/":
            depth -= 1
            if depth == 0:
                return m.start()
        else:
            gt = html.find(">", m.end())
            if gt < 0:
                raise _ScanFail("unterminated tag")
            if not html[m.end():gt].rstrip().endswith("/"):
                depth += 1
        pos = m.end()


def _scan_fast(html: str, region_class: str | None,
               verify_region: bool = True):
    """Island-jump scan: locate only the tags the extraction needs (script/
    style CDATA, meta, h3, the region div, the html scope) with C-level
    regex searches, and prove — or fall back — that the per-tag walk would
    produce the same islands.  ~10x less per-page Python than _scan on
    filler-dominated pages (the per-tag loop visited every <p>/<div> of
    chrome; this visits none)."""
    n = len(html)
    if (_BAD_SPAN_LT.search(html) or _BAD_QUOT_GT.search(html)
            or _BAD_DECL_LT.search(html) or "<!--" in html):
        raise _ScanFail("needs per-tag walk")
    lowered = html.lower()

    # html scope: the FIRST real tag must be <html ...> (then it is the
    # stack bottom and only </html> can end the scope); exactly one <html>
    m = _FIRST_TAG_RE.search(lowered)
    if m is None or not lowered.startswith("<html", m.start()) \
            or _NAME_RE.match(lowered, m.start() + 1).group(0) != "html":
        raise _ScanFail("html not first tag")
    hstart = m.start()
    hgt = html.find(">", hstart)
    if hgt < 0:
        raise _ScanFail("unterminated html tag")
    if html[hstart + 1:hgt].rstrip().endswith("/"):
        raise _ScanFail("self-closed html")
    if lowered.find("<html", hgt) >= 0:
        raise _ScanFail("multiple html elements")
    hend = lowered.find("</html", hgt)
    if hend < 0:
        hend = n  # never closed: scope runs to EOF (same as the walk)

    scripts: list = []
    metas: list = []
    h3_frags: list = []
    # sequential island sweep inside the html scope.  A single ordered
    # pass mirrors _scan exactly: islands inside script/style CDATA are
    # consumed with it, islands inside an h3 capture belong to the
    # fragment.  Filler chrome (every <p>/<div>/<span> of it) is never
    # visited — that's the whole point of this tier.
    cdata_iv: list = []  # [start, end) spans the walk treats as text
    h3_iv: list = []
    pos = hgt + 1
    while True:
        m = _ISLAND_RE.search(lowered, pos, hend)
        if m is None:
            break
        name = m.group(1)
        gt = html.find(">", m.end())
        if gt < 0:
            break  # truncated tag at EOF: the walk just stops collecting
        span = html[m.end():gt]
        selfclose = span.rstrip().endswith("/")
        if name == "meta":
            metas.append(_attrs_of(span))
            pos = gt + 1
            continue
        if name == "script" or name == "style":
            if selfclose:
                if name == "script":
                    scripts.append((_attrs_of(span), ""))
                pos = gt + 1
                continue
            close = lowered.find(f"</{name}", gt + 1)
            if close < 0:
                raise _ScanFail("unterminated cdata")
            if name == "script":
                scripts.append((_attrs_of(span), html[gt + 1:close]))
            cgt = html.find(">", close)
            if cgt < 0:
                break
            if gt < hend <= cgt:  # the '</html' we keyed the scope on was
                # CDATA text, not a tag — the walk would keep the scope open
                hend = lowered.find("</html", cgt + 1)
                if hend < 0:
                    hend = n
            cdata_iv.append((gt + 1, close))
            pos = cgt + 1
            continue
        if name == "html":
            raise _ScanFail("multiple html elements")
        # h3
        if selfclose:
            h3_frags.append("")
            pos = gt + 1
            continue
        close = _match_close(lowered, gt + 1, _H3_TAG_RE, html)
        frag = html[gt + 1:close]
        _verify_capture(frag, region_class, forbid_meta=True)
        h3_frags.append(frag)
        cgt = html.find(">", close)
        if cgt < 0:
            raise _ScanFail("unterminated capture")
        h3_iv.append((gt + 1, close))
        pos = cgt + 1

    region = None
    region_seen = 0
    if region_class is not None:
        region, region_seen = _find_region(html, lowered, region_class,
                                           hgt + 1, hend, cdata_iv, h3_iv,
                                           verify_region)
    return FastDoc(scripts, metas, h3_frags,
                   complete=(region_seen == 0)), region


def _find_region(html: str, lowered: str, region_class: str,
                 lo: int, hi: int, cdata_iv: list, h3_iv: list,
                 verify: bool = True):
    """Locate the unique region container by direct search for the CLASS
    STRING (the filler's divs are never visited): each occurrence inside a
    ``<div`` tag span is a candidate; occurrences in CDATA are script text
    (skipped), inside an h3 capture the walk declines (invisible to the
    region selector), nested inside an accepted region are swallowed by
    it.  Extent and interior are proven exactly as the walk would."""
    region = None
    region_seen = 0
    region_end = -1
    p = lowered.find(region_class, lo, hi)
    while p >= 0:
        if any(s <= p < e for s, e in cdata_iv):
            p = lowered.find(region_class, p + 1, hi)
            continue
        if any(s <= p < e for s, e in h3_iv):
            raise _ScanFail("region inside h3 capture")
        if p < region_end:  # inside the accepted region: swallowed
            p = lowered.find(region_class, p + 1, hi)
            continue
        lt = lowered.rfind("<", 0, p)
        nxt = lowered[lt + 4:lt + 5]
        if (lt < 0 or not lowered.startswith("<div", lt)
                or nxt.isalnum() or nxt == "-"):
            p = lowered.find(region_class, p + 1, hi)
            continue  # class string in text or on a non-div: not a region
        tag_gt = html.find(">", lt)
        if tag_gt < 0 or tag_gt < p:  # string is in text after the tag
            p = lowered.find(region_class, p + 1, hi)
            continue
        span = html[lt + 4:tag_gt]
        if region_class not in (_attrs_of(span).get("class") or "").split():
            p = lowered.find(region_class, p + 1, hi)
            continue
        if span.rstrip().endswith("/"):
            raise _ScanFail("self-closed region")
        region_seen += 1
        if region_seen > 1:
            raise _ScanFail("ambiguous region")
        close = _match_close(lowered, tag_gt + 1, _DIV_TAG_RE, html)
        if any(s < close and e > tag_gt + 1 for s, e in cdata_iv):
            raise _ScanFail("cdata inside capture")
        if verify:
            _verify_capture(html[tag_gt + 1:close])
        cgt = html.find(">", close)
        if cgt < 0:
            raise _ScanFail("unterminated capture")
        region = html[lt:cgt + 1]
        region_end = cgt + 1
        p = lowered.find(region_class, p + 1, hi)
    return region, region_seen


def _scan(html: str, region_class: str | None):
    n = len(html)
    find = html.find
    lowered: str | None = None
    scripts: list = []
    metas: list = []
    h3_frags: list = []
    # open-tag name stack; captures pin a stack depth and an html offset
    stack: list[str] = []
    h3_start = h3_depth = -1
    rg_start = rg_depth = -1
    region: str | None = None
    region_seen = 0
    # captures only inside the FIRST <html> element — the extraction roots
    # at select_first("html"), so islands outside it must not be collected
    saw_html = False
    in_html = False

    i = 0
    while True:
        lt = find("<", i)
        if lt < 0:
            break
        c = html[lt + 1] if lt + 1 < n else ""
        if c == "!" or c == "?":
            # comments/doctype interact with captures in ways the scanner
            # doesn't model — only tolerate them OUTSIDE any capture
            if h3_start >= 0 or rg_start >= 0 or html.startswith("<!--", lt):
                raise _ScanFail("markup-decl")
            gt = find(">", lt)
            if gt < 0:
                break
            i = gt + 1
            continue
        if c == "/":
            m = _NAME_RE.match(html, lt + 2)
            if m is None:
                raise _ScanFail("bad endtag")
            name = m.group(0).lower()
            gt = find(">", m.end())
            if gt < 0:
                break
            # HTMLParser pops to the nearest matching open (stray end tags
            # are ignored); a pop that crosses a capture boundary would
            # change the capture's extent -> fallback
            if name in stack:
                idx = len(stack) - 1 - stack[::-1].index(name)
                # the capture's own tag sits at depth-1; popping strictly
                # below it would change the capture's extent
                if h3_start >= 0 and idx < h3_depth - 1:
                    raise _ScanFail("pop crosses h3")
                if rg_start >= 0 and idx < rg_depth - 1:
                    raise _ScanFail("pop crosses region")
                if (h3_start >= 0 or rg_start >= 0) and idx != len(stack) - 1:
                    raise _ScanFail("improper nesting in capture")
                if in_html and "html" in stack[idx:]:
                    in_html = False
                del stack[idx:]
                if h3_start >= 0 and len(stack) < h3_depth:
                    h3_frags.append(html[h3_start:lt])
                    h3_start = -1
                if rg_start >= 0 and len(stack) < rg_depth:
                    region = html[rg_start:gt + 1]
                    rg_start = -1
            i = gt + 1
            continue
        m = _NAME_RE.match(html, lt + 1)
        if m is None:
            # literal '<' in text: harmless outside captures, parity-risky
            # inside (HTMLParser emits it as text; our fragment re-parse
            # does the same, so it IS safe — but only in fragments we keep)
            i = lt + 1
            continue
        name = m.group(0).lower()
        gt = find(">", m.end())
        if gt < 0:
            break
        span = html[m.end():gt]
        # cheap safety gate (C-level): a '<' in the span or unbalanced
        # quotes means the real tag end may differ from this '>' (quoted
        # '>' in an attribute value) — the one case where this scanner and
        # HTMLParser could tokenize differently.  Full attr parsing runs
        # only for tags whose attributes matter.
        if "<" in span or span.count('"') % 2:
            raise _ScanFail("suspicious tag span")
        selfclose = span.rstrip().endswith("/")

        if name == "meta":
            if h3_start >= 0:
                # a meta inside an h3 capture would be invisible to the
                # meta selectors (the region capture case is covered by
                # complete=False) — full-parse instead
                raise _ScanFail("meta inside h3 capture")
            if in_html and rg_start < 0:
                metas.append(_attrs_of(span))
            i = gt + 1
            continue
        if selfclose:
            # HTMLParser's handle_startendtag: element created, nothing
            # pushed, and script/style do NOT enter CDATA mode
            if in_html and h3_start < 0 and rg_start < 0:
                if name == "script":
                    scripts.append((_attrs_of(span), ""))
                elif name == "h3":
                    h3_frags.append("")
                elif (region_class is not None and name == "div"
                      and region_class in span
                      and region_class
                      in (_attrs_of(span).get("class") or "").split()):
                    raise _ScanFail("self-closed region")
            i = gt + 1
            continue
        if name == "script" or name == "style":
            # CDATA content: runs to the next matching end tag
            # (case-insensitive, like HTMLParser's interesting_cdata)
            if lowered is None:
                lowered = html.lower()
            close = lowered.find(f"</{name}", gt + 1)
            if close < 0:
                raise _ScanFail("unterminated cdata")
            if name == "script" and in_html and rg_start < 0 and h3_start < 0:
                scripts.append((_attrs_of(span), html[gt + 1:close]))
            elif h3_start >= 0 or rg_start >= 0:
                raise _ScanFail("cdata inside capture")
            cgt = find(">", close)
            if cgt < 0:
                break
            i = cgt + 1
            continue
        if name in VOID:
            i = gt + 1
            continue
        stack.append(name)
        if name == "html":
            if saw_html:
                raise _ScanFail("multiple html elements")
            saw_html = True
            in_html = True
        elif in_html and name == "h3" and h3_start < 0 and rg_start < 0:
            h3_start = gt + 1
            h3_depth = len(stack)
        elif (region_class is not None and name == "div"
              and h3_start >= 0 and region_class in span
              and region_class
              in (_attrs_of(span).get("class") or "").split()):
            # region container inside an h3 capture would be invisible to
            # the region selector — full-parse instead
            raise _ScanFail("region inside h3 capture")
        elif (region_class is not None and name == "div" and in_html
              and rg_start < 0 and h3_start < 0 and region_class in span
              and region_class
              in (_attrs_of(span).get("class") or "").split()):
            region_seen += 1
            if region_seen > 1:
                raise _ScanFail("ambiguous region")
            rg_start = lt
            rg_depth = len(stack)
        i = gt + 1

    if h3_start >= 0 or rg_start >= 0:
        raise _ScanFail("unterminated capture")
    if not saw_html:
        raise _ScanFail("no html element")
    if region_class is not None and region_seen == 0:
        region = None
    return FastDoc(scripts, metas, h3_frags,
                   complete=(region_seen == 0)), region
