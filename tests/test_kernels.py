"""Unit tests for the pure parity kernels (urlkit / gojson / dates / minidom /
extract).  Vectors hand-checked against Go semantics where parity-critical
(SURVEY.md §5 item 1-2)."""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import given, strategies as st

from go_scrapper_ray import dates, extract, gojson, minidom, urlkit

# ------------------------------------------------------------------- urlkit


def test_canonicalize_basic():
    assert urlkit.canonicalize("HTTP://WWW.Example.COM:80/a/b?b=2&a=1#frag") == \
        "http://www.example.com/a/b?a=1&b=2"
    assert urlkit.canonicalize("https://example.com:443/x") == "https://example.com/x"
    assert urlkit.canonicalize("https://example.com:8443/x") == "https://example.com:8443/x"
    assert urlkit.canonicalize("example.com/path") == "https://example.com/path"
    assert urlkit.canonicalize("ftp://h/x") == "https://h/x"
    assert urlkit.canonicalize("https://h.example./x") == "https://h.example/x"


def test_canonicalize_idempotent_examples():
    for u in [
        "https://www.yelp.com/biz/slug-1?a=1&b=2",
        "http://host:8080/p?z=9&z=1&a",
        "https://h/p#f",
        "HOST.com/UP/case?Q=V",
    ]:
        c = urlkit.canonicalize(u)
        assert urlkit.canonicalize(c) == c


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=50))
def test_canonicalize_never_raises_and_idempotent(s):
    url = "https://h.com/" + s.replace("#", "")
    c = urlkit.canonicalize(url)
    assert urlkit.canonicalize(c) == c


def test_canonicalize_seed_reference_parity():
    # main.go:273-291: host forcing only for yelp URLs; search?/adredir? reject
    assert urlkit.canonicalize_seed("https://m.yelp.com/biz/x\n") == \
        ("https://www.yelp.com/biz/x", False)
    # Go url.Parse treats scheme-less input as PATH (host empty → forced)
    assert urlkit.canonicalize_seed("yelp.com/biz/x") == \
        ("https://www.yelp.com/yelp.com/biz/x", False)
    assert urlkit.canonicalize_seed("ftp://www.yelp.com/biz/x") == \
        ("https://www.yelp.com/biz/x", False)
    assert urlkit.canonicalize_seed("https://www.yelp.com/search?find_desc=a")[1] is True
    assert urlkit.canonicalize_seed("https://www.yelp.com/adredir?u=x")[1] is True
    # non-yelp URL untouched (reference only canonicalizes if "yelp." present)
    assert urlkit.canonicalize_seed("https://other.example/biz") == \
        ("https://other.example/biz", False)


def test_url_hash_stable():
    h = urlkit.url_hash64("https://www.yelp.com/biz/x")
    assert h == urlkit.url_hash64("https://www.yelp.com/biz/x")
    assert 0 <= h < 2**64
    assert urlkit.url_hash64("a") != urlkit.url_hash64("b")
    # host_hash uses a different keying than url_hash
    assert urlkit.host_hash64("a") != urlkit.url_hash64("a")


# ------------------------------------------------------------------- gojson


def test_go_json_string_escaping():
    # Go json with EscapeHTML(false): short escapes for \n \r \t " \;
    # \b/\f/other controls as \u00xx; <>& literal
    assert gojson.go_json_string('a<b>&"c') == '"a<b>&\\"c"'
    assert gojson.go_json_string("x\ny\tz\r") == '"x\\ny\\tz\\r"'
    assert gojson.go_json_string("\x08\x0c\x00") == '"\\u0008\\u000c\\u0000"'
    assert gojson.go_json_string("café") == '"café"'  # non-ASCII raw
    assert gojson.go_json_string(" ") == '"\\u2028"'


def test_review_hash_branches():
    # Branch 1: id-only (main.go:1014-1016)
    expect = hashlib.md5(b'["rid"]').hexdigest()
    assert gojson.review_hash("", "", "rid", []) == expect
    # Branch 2: first reply has text (main.go:1017-1021)
    expect = hashlib.md5(b'["t","a","r1"]').hexdigest()
    assert gojson.review_hash("t", "a", "rid", ["r1", "r2"]) == expect
    # Branch 3: text+author (main.go:1022-1026)
    expect = hashlib.md5(b'["t<>&","a"]').hexdigest()
    assert gojson.review_hash("t<>&", "a", "", []) == expect
    # Empty first reply text -> branch 3 (hasResponses checks reply0.Text != "")
    expect = hashlib.md5(b'["t","a"]').hexdigest()
    assert gojson.review_hash("t", "a", "rid", [""]) == expect
    # No text/author/responses and no id -> branch 3 with empties
    expect = hashlib.md5(b'["",""]').hexdigest()
    assert gojson.review_hash("", "", "", []) == expect


def test_record_to_jsonl_omitempty():
    rec = {"text": "dGV4dA==", "review_hash": "h", "photos": [], "rating": 0,
           "not_recommended": False, "posted_at": 0, "parent_id": ""}
    # all zero values dropped; review_hash always present (no omitempty)
    assert gojson.record_to_jsonl(rec) == '{"text":"dGV4dA==","review_hash":"h"}' 


def test_record_to_jsonl_field_order():
    rec = {"parent_id": "p", "author_name": "QQ==", "text": "dA==",
           "source_date": "1/2/2020", "review_id": "r", "author_id": "u",
           "photos": ["ph1", "ph2"], "not_recommended": True, "rating": 4,
           "scraped_at": 100, "posted_at": 200,
           "responses": [{"author_name": "bw==", "text": "cg==", "posted_at": "1/3/2020"}],
           "review_hash": "hh"}
    line = gojson.record_to_jsonl(rec)
    assert line == (
        '{"parent_id":"p","author_name":"QQ==","text":"dA==","source_date":"1/2/2020",'
        '"review_id":"r","author_id":"u","photos":["ph1","ph2"],"not_recommended":true,'
        '"rating":4,"scraped_at":100,"posted_at":200,'
        '"responses":[{"author_name":"bw==","text":"cg==","posted_at":"1/3/2020"}],'
        '"review_hash":"hh"}')


def test_encode_record_b64():
    rec = {"text": "hi", "author_name": "an",
           "responses": [{"author_name": "o", "text": "r", "posted_at": "d"}]}
    out = gojson.encode_record_b64(rec)
    assert out["text"] == "aGk=" and out["author_name"] == "YW4="
    assert out["responses"][0]["text"] == "cg==" and out["responses"][0]["author_name"] == "bw=="
    # replies with empty first text NOT encoded (hasResponses gate main.go:1071)
    rec2 = {"text": "", "responses": [{"author_name": "o", "text": "", "posted_at": "d"}]}
    out2 = gojson.encode_record_b64(rec2)
    assert out2["responses"][0]["author_name"] == "o"
    assert out2["text"] == ""


# -------------------------------------------------------------------- dates


def test_parse_mdy():
    assert dates.parse_mdy("1/2/2006") == 1136160000
    assert dates.parse_mdy("01/02/2006") == 1136160000  # Go layout accepts padded
    assert dates.parse_mdy("11/22/2015") == 1448150400
    assert dates.parse_mdy("13/1/2015") is None
    assert dates.parse_mdy("1/2/06") is None
    assert dates.parse_mdy("") is None
    assert dates.parse_mdy_or_zero("junk") == dates.GO_ZERO_UNIX


# ------------------------------------------------------------------ minidom


HTML = """<html><body>
<div class="a"><p id="p1">one <b>two</b></p></div>
<div class="a b"><span class="x">s1</span><span class="x y">s2</span></div>
<ul class="reviews"><li>L1</li><li>L2</li></ul>
<div class="outer"><ul class="reviews"><li>N1</li></ul></div>
<script type="application/json">{"k":"v &amp; w"}</script>
<p>ent: &amp; &lt; &gt; &#39;</p>
</body></html>"""


def test_text_concatenation():
    root = minidom.parse_html(HTML)
    p = root.select("p")[0]
    assert p.text() == "one two"


def test_entities_decoded_in_text_but_not_script():
    root = minidom.parse_html(HTML)
    # net/html decodes entities in normal text...
    assert root.select("body > p")[-1].text() == "ent: & < > '"
    # ...but script content is raw text (no entity decoding)
    assert root.select("script")[0].text() == '{"k":"v &amp; w"}'


def test_child_combinator_and_classes():
    root = minidom.parse_html(HTML)
    body = root.select("body")[0]
    assert len(body.select("ul.reviews > li")) == 3
    assert len(body.select("div.outer ul.reviews > li")) == 1
    assert [n.text() for n in body.select("div.a span.x")] == ["s1", "s2"]
    assert [n.text() for n in body.select("span.x.y")] == ["s2"]


def test_child_attr_first_match_trimmed():
    root = minidom.parse_html('<div><a href=" u1 ">x</a><a href="u2">y</a></div>')
    d = root.select("div")[0]
    assert d.child_attr("a", "href") == "u1"
    assert d.child_attr("a", "missing") == ""
    assert d.child_attr("em", "href") == ""


def test_contains_selector():
    root = minidom.parse_html("<div><script>var business_id=1;</script><script>other</script></div>")
    assert len(root.select("script:contains(business_id)")) == 1
    # cascadia :contains is case-insensitive
    assert len(root.select("script:contains(BUSINESS_ID)")) == 1


def test_find_excludes_self():
    root = minidom.parse_html('<div class="q"><div class="q">inner</div></div>')
    outer = root.select("div.q")[0]
    assert len(outer.select("div.q")) == 1  # only the inner one


# ------------------------------------------------------------------ extract


def test_extract_serp_and_match():
    script = ('{"legacyProps":{"searchAppProps":{"hovercardData":'
              '{"h1":{"name":"Biz One","addressLines":["1 Main St","Town"],'
              '"businessUrl":"/biz/one","numReviews":10,"isAd":false},'
              '"h2":{"name":"Ad Biz","addressLines":["2 St"],"businessUrl":"/biz/ad",'
              '"numReviews":5,"isAd":true}}}}')
    html_src = f'<html><body><script type="application/json">{script}</script></body></html>'
    root = minidom.parse_html(html_src).select("html")[0]
    cands = extract.extract_serp_candidates(root)
    # regex "hovercardData":{(.*?)}} is non-greedy: captures through first }}
    # => only h1 parsed; ad filtering applies within parsed set
    assert len(cands) == 1
    assert cands[0]["name"] == "Biz One"
    assert cands[0]["text"] == "1 Main St Town"
    assert cands[0]["url"] == "/biz/one"
    w = extract.match_winner("Biz One", "1 Main St, Town, ST 11111", cands)
    assert w == 0


def test_extract_profile_meta_and_fallback():
    html_src = ('<html><head><meta name="yelp-biz-id" content="abc\nx"></head>'
                '<body><script type="application/ld+json">'
                '{"aggregateRating":{"ratingValue":4.5,"reviewCount":23},"reviewCount":23}'
                '</script></body></html>')
    root = minidom.parse_html(html_src).select("html")[0]
    p = extract.extract_profile(root)
    assert p["business_id"] == "abc"
    assert p["score"] == 4.5 and p["total_reviews"] == 23
    assert p["review_count"] == 23

    # fallback path: no meta tag; script regex "business_id":([^],].)+ matches
    # char-PAIRS (first char not ]/,) so a comma is only included when it lands
    # at an even offset — the fixture format "business_id":["xy","<id>"] does;
    # then split(",")[1] and strip quotes/] yields the id (main.go:498-506)
    html2 = ('<html><body><script>{"gaConfig":{"business_id":["xy","biz-fb-1"],"p":1}}'
             '</script></body></html>')
    root2 = minidom.parse_html(html2).select("html")[0]
    p2 = extract.extract_profile(root2)
    assert p2["business_id"] == "biz-fb-1"


def test_extract_review_feed_nested():
    feed = {
        "reviews": [
            {"id": "R1", "userId": "U1", "rating": 5, "localizedDate": "1/2/2020",
             "comment": {"text": "Great &amp; good"},
             "user": {"markupDisplayName": "A&amp;B"},
             "photos": [{"src": "s1"}, {"src": "s2"}],
             "businessOwnerReplies": [
                 {"owner": {"displayName": "Own"}, "comment": "Thanks &lt;3",
                  "localizedDate": "1/3/2020"}],
             "previousReviews": [
                 {"id": "R0", "userId": "U1", "rating": 3, "localizedDate": "12/1/2019",
                  "comment": {"text": "Old"}, "user": {"markupDisplayName": "AB"},
                  "photos": [], "businessOwnerReplies": []}]},
        ]
    }
    import json
    recs = extract.extract_review_feed(json.dumps(feed))
    assert len(recs) == 2
    # previous first (emission order main.go:704-738)
    assert recs[0]["review_id"] == "R0" and recs[0]["parent_id"] == "R1"
    assert recs[1]["review_id"] == "R1" and recs[1]["parent_id"] == ""
    assert recs[1]["text"] == "Great & good"          # html.unescape
    assert recs[1]["author_name"] == "A&amp;B"  # author_name NOT unescaped (main.go:686)
    assert recs[1]["responses"][0]["text"] == "Thanks <3"
    assert recs[1]["photos"] == ["s1", "s2"]
    assert recs[1]["posted_at"] == 1577923200


def test_extract_nonrec_landing():
    h = ('<html><body><h3>Other</h3><h3>12 reviews that are not currently recommended'
         '</h3></body></html>')
    root = minidom.parse_html(h).select("html")[0]
    assert extract.extract_nonrec_landing(root) == {"count": 12, "no_reviews": False}
    h0 = '<html><body><h3>0 reviews that are not currently recommended</h3></body></html>'
    root0 = minidom.parse_html(h0).select("html")[0]
    assert extract.extract_nonrec_landing(root0)["no_reviews"] is True


NONREC_LI = """
<li>
 <div class="review review--with-sidebar" data-review-id="NR1">
  <div class="review-sidebar">
    <a class="user-display-name" href="/q?'userid=U77">Pat P.</a>
  </div>
  <div class="review-wrapper">
   <div class="review-content">
     <div class="biz-rating"><div class="i-stars regular-2" title=""></div>
       <span class="rating-qualifier"> 3/4/2019 </span></div>
     <p>Bad &amp; sad</p>
   </div>
   <div class="biz-owner-reply">
     <div class="biz-owner-reply-header"><strong>Comment from Owner O.</strong></div>
     <span class="bullet-after">4/5/2019</span>
     <span class="js-content-toggleable hidden">We are sorry</span>
   </div>
   <div class="previous-review">
     <div class="biz-rating"><div class="i-stars regular-1"></div>
       <span class="rating-qualifier"> 2/3/2018 </span></div>
     <span class="js-expandable-comment"><span class="js-content-toggleable">Prev text</span></span>
   </div>
  </div>
 </div>
</li>"""


def test_extract_nonrec_page():
    h = ('<html><body><div class="not-recommended-reviews"><ul class="reviews">'
         + NONREC_LI + '</ul></div></body></html>')
    root = minidom.parse_html(h).select("html")[0]
    recs = extract.extract_nonrec_page(root)
    assert len(recs) == 2
    prev, main_rec = recs
    assert main_rec["review_id"] == "NR1"
    assert main_rec["author_id"] == "'userid=U77"     # full-match quirk main.go:841
    assert main_rec["author_name"] == "Pat P."
    assert main_rec["text"] == "Bad & sad"
    assert main_rec["rating"] == 2
    assert main_rec["source_date"] == "3/4/2019"
    assert main_rec["not_recommended"] is True
    assert main_rec["responses"] == [{"author_name": "Owner O.",
                                      "text": "We are sorry", "posted_at": "4/5/2019"}]
    assert prev["parent_id"] == "NR1"
    assert prev["author_id"] == "'userid=U77" and prev["author_name"] == "Pat P."
    assert prev["text"] == "Prev text"
    assert prev["rating"] == 1 and prev["source_date"] == "2/3/2018"


def test_nonrec_fallback_heuristic():
    # previous-review without the expandable span: falls back to last line of
    # TrimRight(elem.Text(), "\t \n") (main.go:908-913)
    li = """<li><div class="review--with-sidebar" data-review-id="NR2">
  <div class="review-sidebar"><a class="user-display-name" href="/q?'userid=U1">A</a></div>
  <div class="review-wrapper"><div class="review-content">
     <div class="biz-rating"><div class="i-stars regular-3"></div>
       <span class="rating-qualifier"> 1/1/2019 </span></div><p>t</p></div>
   <div class="previous-review">
     <div class="biz-rating"><div class="i-stars regular-5"></div>
       <span class="rating-qualifier"> 5/6/2017 </span></div>
fallback previous line
  </div></div></div></li>"""
    h = ('<html><body><div class="not-recommended-reviews"><ul class="reviews">'
         + li + '</ul></div></body></html>')
    root = minidom.parse_html(h).select("html")[0]
    recs = extract.extract_nonrec_page(root)
    prev = recs[0]
    assert prev["text"] == "fallback previous line"


def test_fanout_builders():
    feeds, nonrec = extract.profile_fanout("biz1", 25, "https://www.yelp.com/biz/slug",
                                           first_page_only=False, incremental=False)
    assert feeds == [
        "https://www.yelp.com/biz/biz1/review_feed?rl=en&sort_by=date_desc&start=0",
        "https://www.yelp.com/biz/biz1/review_feed?rl=en&sort_by=date_desc&start=10",
        "https://www.yelp.com/biz/biz1/review_feed?rl=en&sort_by=date_desc&start=20",
    ]
    assert nonrec == "https://www.yelp.com/not_recommended_reviews/biz1"
    feeds_fp, _ = extract.profile_fanout("biz1", 25, "u", True, False)
    assert len(feeds_fp) == 1
    feeds_inc, _ = extract.profile_fanout("biz1", 999, "u", False, True)
    assert len(feeds_inc) == 5  # first 50-window, pages of 10
    nn = extract.nonrec_fanout("https://x/not_recommended_reviews/b", 15, False, False)
    assert nn == ["https://x/not_recommended_reviews/b?not_recommended_start=0",
                  "https://x/not_recommended_reviews/b?not_recommended_start=10"]


def test_search_url_quirk_order():
    # main.go:427: street + " " + state + " " + city + " " + zip
    u = extract.search_url("Café One", "1 Main St", "Springfield", "IL", "62701")
    assert u == ("https://www.yelp.com/search?find_desc=Caf%C3%A9+One"
                 "&find_loc=1+Main+St+IL+Springfield+62701")


def test_render_record_fused_equivalence():
    """Fused render_record must be byte-identical to the unfused
    finalize_record_identity -> encode_record_b64 -> record_to_jsonl chain
    across the quirk space: empty/non-empty fields, b64 vs raw replies
    (first-reply-text branch), control chars, unicode, omitempty zeros."""
    import itertools
    import random
    from go_scrapper_ray.gojson import (encode_record_b64, record_to_jsonl,
                                        render_record)
    from go_scrapper_ray.extract import finalize_record_identity

    rng = random.Random(7)
    texts = ["", "plain", 'quo"te\\\n\ttab', "café  line",
             "\x00\x1fctl", "<b>&amp;</b>"]
    names = ["", "Ann", 'O"Brien ']
    ids = ["", "rev-1"]
    reply_sets = [
        [],
        [{"author_name": "own", "text": "", "posted_at": "1/2/2020"}],
        [{"author_name": "own", "text": "re\nply", "posted_at": "1/2/2020"},
         {"author_name": "", "text": "", "posted_at": ""}],
        [{"author_name": "", "text": "first", "posted_at": "3/4/2021"}],
    ]
    cases = list(itertools.product(texts, names, ids, reply_sets))
    rng.shuffle(cases)
    for text, name, rid, replies in cases[:160]:
        rec = {"parent_id": rng.choice(["", "p1"]),
               "review_id": rid, "author_id": rng.choice(["", "u9"]),
               "author_name": name, "text": text,
               "rating": rng.choice([0, 5]),
               "source_date": rng.choice(["", "1/2/2020"]),
               "photos": rng.choice([[], ["http://x/a.jpg", 'we"ird']]),
               "not_recommended": rng.choice([False, True]),
               "posted_at": rng.choice([0, 1577923200]),
               "responses": [dict(r) for r in replies]}
        scraped_at = rng.choice([0, 1700000000])
        ref = dict(finalize_record_identity(rec))
        ref["scraped_at"] = scraped_at
        want = record_to_jsonl(encode_record_b64(ref))
        rh, got = render_record(rec, scraped_at)
        assert rh == ref["review_hash"]
        assert got == want, (rec, scraped_at)
