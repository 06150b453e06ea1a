"""Fast-path scanner equivalence: for every fixture page (bare and
filler-padded bench variants), the island scanner must produce EXACTLY the
same extraction results as the full minidom parse — or decline (fall back).

This is the safety net for the extraction hot-loop optimization
(go_scrapper_ray/fastpath.py): the scanner may refuse any page, but it must
never disagree with the parser on one it accepts."""

from __future__ import annotations

import json
import os
from pathlib import Path

import pyarrow.parquet as pq
import pytest

from go_scrapper_ray import extract
from go_scrapper_ray.fastpath import scan
from go_scrapper_ray.minidom import parse_html

NONREC = "not-recommended-reviews"


def _minidom_root(html):
    return parse_html(html).select_first("html")


def _profile_both(html):
    fd, _ = scan(html)
    if fd is None:
        return None
    return (extract.extract_profile(fd),
            extract.extract_profile(_minidom_root(html)))


def _corpus_pages(tmp_path, scale, env=None):
    from fixtures.gen import generate_corpus
    old = {}
    for k, v in (env or {}).items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        out = tmp_path / f"corpus_{scale}"
        generate_corpus(str(out), scale=scale, seed=42)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    t = pq.read_table(str(out / "pages.parquet"), columns=["url", "html"])
    return list(zip(t["url"].to_pylist(), t["html"].to_pylist()))


@pytest.mark.parametrize("scale,env", [
    ("med", {}),
    ("bench", {"GSR_BENCH_BUSINESSES": "30", "GSR_FILLER_PARAS": "40"}),
])
def test_fastpath_equivalence_on_fixture_corpus(tmp_path, scale, env):
    pages = _corpus_pages(tmp_path, scale, env)
    assert pages
    n_fast = 0
    for url, html in pages:
        if "review_feed" in url:
            continue  # JSON pages never parse HTML
        root = _minidom_root(html)
        # island surfaces: the engine scans WITHOUT a region for these
        fd, _ = scan(html)
        if fd is not None:
            n_fast += 1
            if root is None:
                pytest.fail(f"fastpath accepted page without html root: {url}")
            assert extract.extract_profile(fd) == extract.extract_profile(root), url
            assert (extract.extract_serp_candidates(fd)
                    == extract.extract_serp_candidates(root)), url
            assert (extract.extract_nonrec_landing(fd)
                    == extract.extract_nonrec_landing(root)), url
        # non-rec review extraction via the captured region
        fd, region = scan(html, region_class=NONREC)
        if fd is None:
            continue
        full = extract.extract_nonrec_page(root)
        if region is None:
            assert full == [], url
        else:
            from go_scrapper_ray.fastpath import fragment_tree
            assert extract.extract_nonrec_page(fragment_tree(region)) == full, url
        # the one-pass item walk (the engine's actual nonrec path)
        assert _nonrec_of(html) == full, url
    # the generator's pages are all within the strict grammar
    assert n_fast > 0


def _nonrec_of(html):
    """Mirror of ExtractStage._nonrec_of (scan -> nonrec_items -> assembly
    with full-parse fallback), without actor state."""
    from go_scrapper_ray.fastpath import FastpathMiss, nonrec_items
    fd, region = scan(html, region_class=NONREC, verify_region=False)
    if fd is not None and region is not None:
        try:
            return extract.extract_nonrec_from_items(nonrec_items(region))
        except FastpathMiss:
            pass
    elif fd is not None:
        return []
    return extract.extract_nonrec_page(_minidom_root(html))


HTML = "<html><body>{}</body></html>"


def test_fastpath_script_meta_islands():
    h = HTML.format('<meta name="yelp-biz-id" content=" b-1\nx ">'
                    '<script type="application/ld+json">{"reviewCount":7}'
                    "</script><script>var business_id=[1,2]</script>")
    fd, _ = scan(h)
    root = _minidom_root(h)
    assert fd.child_attr('meta[name="yelp-biz-id"]', "content") == \
        root.child_attr('meta[name="yelp-biz-id"]', "content")
    assert fd.child_text('script[type="application/ld+json"]') == \
        root.child_text('script[type="application/ld+json"]')
    assert fd.child_texts("script:contains(business_id)") == \
        root.child_texts("script:contains(business_id)")


def test_fastpath_h3_entities_and_nesting():
    h = HTML.format("<h3>5 reviews &amp; <b>more</b> not recommended</h3>"
                    "<h3>  spaced  </h3>")
    fd, _ = scan(h)
    root = _minidom_root(h)
    assert fd.child_texts("h3") == root.child_texts("h3")


def test_fastpath_declines_comments():
    assert scan(HTML.format("<!-- c --><h3>x</h3>"))[0] is None


def test_fastpath_declines_quoted_gt_in_attr():
    assert scan(HTML.format('<div title="a>b"><h3>x</h3></div>'))[0] is None


def test_fastpath_declines_missing_html_root():
    assert scan("<body><h3>x</h3></body>")[0] is None


def test_fastpath_declines_improper_nesting_in_capture():
    # </ul> would pop the inner div in HTMLParser; scanner must decline
    h = HTML.format('<div class="not-recommended-reviews">'
                    "<ul><div></ul></div>")
    fd, region = scan(h, region_class=NONREC)
    assert fd is None and region is None


def test_fastpath_uppercase_script_close():
    h = HTML.format('<script type="application/json">{"a":1}</SCRIPT>')
    fd, _ = scan(h)
    root = _minidom_root(h)
    assert fd.child_texts('script[type="application/json"]') == \
        root.child_texts('script[type="application/json"]')


def test_fastpath_stray_end_tag_outside_capture_ok():
    h = "<html><body></span><h3>t</h3></body></html>"
    fd, _ = scan(h)
    root = _minidom_root(h)
    assert fd.child_texts("h3") == root.child_texts("h3")


def test_fastpath_region_matches_full_parse_on_generated_lis():
    import random
    from fixtures.gen import _nonrec_li
    rng = random.Random(7)
    lis = "".join(_nonrec_li(rng, f"nr-{i:03d}") for i in range(30))
    h = HTML.format('<div class="page-chrome"><span>noise</span></div>'
                    f'<div class="not-recommended-reviews">'
                    f'<ul class="reviews">{lis}</ul></div>')
    fd, region = scan(h, region_class=NONREC)
    assert fd is not None and region is not None
    from go_scrapper_ray.fastpath import fragment_tree
    assert (extract.extract_nonrec_page(fragment_tree(region))
            == extract.extract_nonrec_page(_minidom_root(h)))
    assert _nonrec_of(h) == extract.extract_nonrec_page(_minidom_root(h))
    # fragment_tree must agree with the HTMLParser build on the fragment
    def flat(n):
        return [(e.tag, sorted(e.attrs.items()), e.text())
                for e in n.iter_elements()]
    assert flat(fragment_tree(region)) == flat(parse_html(region))


# ------------------------------------------------------------- fuzz (hypothesis)

try:
    from hypothesis import given, settings, strategies as st

    _tag = st.sampled_from(["div", "span", "p", "h3", "b", "ul", "li"])
    _word = st.text(alphabet="ab &<>é \"'", min_size=0, max_size=8)

    @st.composite
    def _frag(draw, depth=0):
        n = draw(st.integers(0, 3 if depth < 2 else 0))
        parts = []
        for _ in range(n):
            if draw(st.booleans()) and depth < 2:
                t = draw(_tag)
                attrs = ""
                if draw(st.booleans()):
                    attrs = f' class="{draw(st.sampled_from(["x", "y z", "not-recommended-reviews"]))}"'
                parts.append(f"<{t}{attrs}>{draw(_frag(depth + 1))}</{t}>")
            else:
                parts.append(draw(_word))
        return "".join(parts)

    @given(_frag())
    @settings(max_examples=300, deadline=None)
    def test_fastpath_fuzz_equivalence(frag):
        """Random (possibly entity-laden) well-nested markup: wherever the
        scanner ACCEPTS a page, its h3 texts and captured region must agree
        with the full minidom parse; declining is always allowed."""
        html = f"<html><body>{frag}</body></html>"
        root = _minidom_root(html)
        fd, region = scan(html, region_class=NONREC)
        if fd is None:
            return  # declined -> engine falls back; nothing to check
        from go_scrapper_ray.fastpath import FastpathMiss
        try:
            got_h3 = fd.child_texts("h3")
        except FastpathMiss:
            got_h3 = None  # incomplete (region swallowed islands) -> fallback
        if got_h3 is not None:
            assert got_h3 == root.child_texts("h3")
        want = root.select(f"div.{NONREC}")
        if region is not None:
            from go_scrapper_ray.fastpath import fragment_tree
            got_lis = fragment_tree(region).select("li")
            # compare the region subtree's text against the full parse
            assert want, "region captured but selector finds none"
            assert fragment_tree(region).text() == want[0].text()
    _nr_cls = st.sampled_from([
        "x", "reviews", "not-recommended-reviews",
        "review review--with-sidebar", "review-sidebar",
        "user-display-name", "review-wrapper", "review-content",
        "rating-qualifier", "biz-rating", "i-stars regular-3",
        "previous-review", "biz-owner-reply", "biz-owner-reply-header",
        "bullet-after", "js-content-toggleable hidden",
        "js-content-toggleable", "js-expandable-comment",
        "photo-box-grid", "photo-box", "photo-box-img"])
    _nr_tag = st.sampled_from(["div", "span", "p", "ul", "li", "a",
                               "strong", "img", "b"])
    _nr_word = st.sampled_from([" 1/2/2020 ", "hello", "a &amp; b", "",
                                "x\ny", " <", "Comment from O."])

    @st.composite
    def _nr_frag(draw, depth=0):
        n = draw(st.integers(0, 3 if depth < 3 else 0))
        parts = []
        for _ in range(n):
            if draw(st.booleans()) and depth < 3:
                t = draw(_nr_tag)
                attrs = f' class="{draw(_nr_cls)}"'
                if draw(st.booleans()):
                    a = draw(st.sampled_from(
                        ['href="/user_details?\'userid=u-1"',
                         'data-review-id="r-9"', 'data-async-src="p.jpg"',
                         'href=""']))
                    attrs += " " + a
                if t == "img":
                    parts.append(f"<{t}{attrs}>")
                else:
                    parts.append(f"<{t}{attrs}>{draw(_nr_frag(depth + 1))}</{t}>")
            else:
                parts.append(draw(_nr_word))
        return "".join(parts)

    @given(_nr_frag())
    @settings(max_examples=400, deadline=None)
    def test_nonrec_itemwalk_fuzz(frag):
        """The engine's nonrec path (scan -> nonrec_items -> assembly,
        with full-parse fallback) must agree with the full minidom parse
        on RESULT OR EXCEPTION for any markup built from the nonrec
        selector vocabulary."""
        html = f"<html><body>{frag}</body></html>"

        def outcome(fn):
            try:
                return ("ok", fn())
            except Exception as e:
                return ("err", type(e).__name__, str(e))

        want = outcome(lambda: extract.extract_nonrec_page(_minidom_root(html)))
        got = outcome(lambda: _nonrec_of(html))
        assert got == want
except ImportError:  # pragma: no cover
    pass


# ------------------------------------------- island-jump tier differentials

_ADVERSARIAL = [
    # </html inside script CDATA must not truncate the scope
    ('<html><script>var a = "</html>";</script>'
     '<meta name="m" content="after-cdata-close"><h3>keep</h3></html>'),
    # island lookalikes inside CDATA are script text, not tags
    ('<html><script type="application/json">{"x": "<h3>no</h3>'
     '<meta name=\'fake\'>"}</script><h3>real</h3></html>'),
    # islands after </html> are out of scope
    ('<html><h3>in</h3></html><h3>out</h3>'
     '<meta name="late" content="x">'),
    # meta/script inside an h3 capture belong to the fragment
    ('<html><h3>t <b>x</b><meta name="inner" content="1"></h3>'
     '<meta name="outer" content="2"></html>'),
    # nested h3s: one outer fragment (inner stays inside it)
    ('<html><h3>a<h3>b</h3>c</h3><h3>d</h3></html>'),
    # region div: h3 + meta inside are swallowed (complete=False)
    ('<html><h3>before</h3><div class="not-recommended-reviews">'
     '<ul><li>r1</li></ul><h3>inside</h3></div></html>'),
    # self-closed script and style noise
    ('<html><script src="x"/><style>.a{color:red}</style>'
     '<script type="t">body</script></html>'),
    # literal < in text and stray end tags the walk tolerates
    ('<html><p>a < b</p></span><h3>ok</h3></html>'),
    # bogus end tag grammar outside captures (walk fails, fast may accept;
    # both must match minidom on the islands)
    ('<html></123><h3>still</h3></html>'),
    # unterminated capture at EOF must decline, not mis-capture
    ('<html><h3>never closed'),
    # uppercase tag names
    ('<HTML><SCRIPT TYPE="t">B</SCRIPT><H3>Up</H3></HTML>'),
]


@pytest.mark.parametrize("html", _ADVERSARIAL)
def test_fastpath_adversarial_vs_minidom(html):
    """scan() (fast tier first, per-tag walk fallback) must agree with the
    full parse on every island-observable output — or decline."""
    from go_scrapper_ray.fastpath import FastpathMiss

    fd, region = scan(html, region_class=NONREC)
    root = _minidom_root(html)
    if fd is None:
        return  # declined -> engine full-parses; nothing to check
    try:
        assert fd.child_texts("h3") == root.child_texts("h3")
    except FastpathMiss:
        pass
    try:
        assert fd.child_text('script[type="t"]') == \
            root.child_text('script[type="t"]')
    except FastpathMiss:
        pass
    for name in ("m", "inner", "outer", "late"):
        try:
            assert fd.child_attr(f'meta[name="{name}"]', "content") == \
                root.child_attr(f'meta[name="{name}"]', "content"), name
        except FastpathMiss:
            break
    if region is not None:
        from go_scrapper_ray.fastpath import fragment_tree
        want = root.select(f"div.{NONREC}")
        assert want and fragment_tree(region).text() == want[0].text()
