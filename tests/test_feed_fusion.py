"""Fused feed-path parity: ``extract.render_review_feed`` must be
byte-identical to the unfused ``extract_review_feed`` → ``render_record``
chain on every fixture feed page AND on adversarial fuzz inputs.

This guards the feed hot-loop fusion (the intermediate record dicts were
~35% of the feed-page core-seconds; reference semantics main.go:671-744 +
1009-1077 + utils.go:25-40).
"""

from __future__ import annotations

import json
import random

import pytest

from go_scrapper_ray import extract
from go_scrapper_ray.gojson import render_record

SCRAPED_AT = 1_700_000_123


def _unfused(body):
    recs = extract.extract_review_feed(body)
    out = []
    for r in recs:
        rh, line = render_record(r, SCRAPED_AT)
        out.append((r["posted_at"], rh, line))
    return out


def _assert_parity(body):
    assert extract.render_review_feed(body, SCRAPED_AT) == _unfused(body)


def test_fixture_feed_pages(tmp_path):
    from fixtures.gen import BusinessSpec
    rng = random.Random(99)
    n_pages = 0
    for i in range(12):
        biz = BusinessSpec(i, "https://www.yelp.com", rng,
                           rng.randrange(0, 60), rng.randrange(0, 20))
        for url, bodytext in biz.pages():
            if "review_feed" not in url:
                continue
            _assert_parity(bodytext)
            n_pages += 1
    assert n_pages > 10


def test_empty_and_missing_fields():
    _assert_parity(json.dumps({"reviews": []}))
    _assert_parity(json.dumps({}))
    # review with only an id (identity branch 1: [review_id])
    _assert_parity(json.dumps({"reviews": [
        {"id": "r1", "localizedDate": "1/2/2020"}]}))
    # empty id too (branch 3 with empty strings)
    _assert_parity(json.dumps({"reviews": [{"localizedDate": "1/2/2020"}]}))


def test_replies_and_previous():
    body = json.dumps({"reviews": [{
        "id": "r1", "userId": "u1", "localizedDate": "3/4/2021",
        "rating": 4,
        "user": {"markupDisplayName": "Ann <b>&amp;</b>"},
        "comment": {"text": "café &amp; bar\nline2\ttab \"q\" \\"},
        "photos": [{"src": "http://x/1.jpg"}, {}],
        "businessOwnerReplies": [
            {"owner": {"displayName": "Own&er"},
             "comment": "thanks &lt;3", "localizedDate": "3/5/2021"},
            {"comment": "", "localizedDate": ""},
        ],
        "previousReviews": [
            {"id": "p1", "userId": "u2", "localizedDate": "1/1/2019",
             "rating": 0, "comment": {"text": ""},
             "user": {}, "photos": [],
             "businessOwnerReplies": [
                 {"owner": {"displayName": "O2"}, "comment": None}]},
        ],
    }]})
    _assert_parity(body)


def test_reply_first_empty_text_branch():
    # first reply text empty -> replies NOT b64-encoded (encodeFielsToB64)
    body = json.dumps({"reviews": [{
        "id": "r9", "localizedDate": "6/7/2022",
        "comment": {"text": "hello"},
        "businessOwnerReplies": [
            {"owner": {"displayName": "A"}, "comment": "",
             "localizedDate": "6/8/2022"},
            {"owner": {"displayName": "B"}, "comment": "late",
             "localizedDate": "6/9/2022"},
        ],
    }]})
    _assert_parity(body)


def test_unparseable_date_raises_same():
    bad_parent = json.dumps({"reviews": [
        {"id": "r1", "localizedDate": "not a date",
         "previousReviews": [{"id": "p", "localizedDate": "also bad"}]}]})
    with pytest.raises(ValueError) as e1:
        extract.extract_review_feed(bad_parent)
    with pytest.raises(ValueError) as e2:
        extract.render_review_feed(bad_parent, SCRAPED_AT)
    assert str(e1.value) == str(e2.value)  # parent checked first, both paths

    bad_prev = json.dumps({"reviews": [
        {"id": "r1", "localizedDate": "1/2/2020",
         "previousReviews": [{"id": "p", "localizedDate": "nope"}]}]})
    with pytest.raises(ValueError) as e1:
        extract.extract_review_feed(bad_prev)
    with pytest.raises(ValueError) as e2:
        extract.render_review_feed(bad_prev, SCRAPED_AT)
    assert str(e1.value) == str(e2.value)


# ------------------------------------------------------------- fuzz
try:
    from hypothesis import given, settings, strategies as st

    _texts = st.text(
        alphabet=st.characters(min_codepoint=0, max_codepoint=0x2100),
        max_size=40)
    _dates = st.builds(lambda m, d, y: f"{m}/{d}/{y}",
                       st.integers(1, 12), st.integers(1, 28),
                       st.integers(1990, 2030))

    _reply = st.fixed_dictionaries({}, optional={
        "owner": st.one_of(st.none(), st.fixed_dictionaries(
            {}, optional={"displayName": st.one_of(st.none(), _texts)})),
        "comment": st.one_of(st.none(), _texts),
        "localizedDate": st.one_of(st.none(), _dates, st.just("")),
    })

    def _review(with_prev):
        opt = {
            "id": st.one_of(st.none(), _texts),
            "userId": st.one_of(st.none(), _texts),
            "rating": st.one_of(st.none(), st.integers(0, 5)),
            "user": st.one_of(st.none(), st.fixed_dictionaries(
                {}, optional={"markupDisplayName": st.one_of(st.none(),
                                                             _texts)})),
            "comment": st.one_of(st.none(), st.fixed_dictionaries(
                {}, optional={"text": st.one_of(st.none(), _texts)})),
            "photos": st.lists(st.fixed_dictionaries(
                {}, optional={"src": _texts}), max_size=3),
            "businessOwnerReplies": st.one_of(
                st.none(), st.lists(_reply, max_size=3)),
        }
        if with_prev:
            opt["previousReviews"] = st.one_of(
                st.none(), st.lists(_review(False), max_size=2))
        return st.fixed_dictionaries({"localizedDate": _dates},
                                     optional=opt)

    @settings(max_examples=150, deadline=None)
    @given(st.lists(_review(True), max_size=4))
    def test_feed_fusion_fuzz(reviews):
        _assert_parity(json.dumps({"reviews": reviews}))

except ImportError:  # pragma: no cover
    pass
