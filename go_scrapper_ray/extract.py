"""Per-page-species extraction kernels (pure, deterministic).

These functions reimplement — from the reference's observable behavior, not
its code — the colly/goquery extraction callbacks of
``/root/reference/main.go``:

* SERP hovercard candidates      — main.go:364-412   (M4/M5)
* profile page (biz id, histogram, review count) — main.go:493-558 (M6-M8)
* review-feed JSON → records     — main.go:671-744   (M9)
* not-recommended landing count  — main.go:774-792   (M10)
* not-recommended HTML reviews   — main.go:836-932   (M11)
* link builders                  — main.go:427-430,546,570-575,584-594,650,805-813 (M16)

They are shared by the distributed engine (inside ``map_batches`` stages) and
by the serial test oracle (``tests/oracle.py``), so distributed-vs-serial
parity is parity of orchestration, while Go-parity of the kernels themselves
is pinned by hand-checked fixture vectors (tests/test_extract.py).

Known reference quirks reproduced faithfully:
* ``author_id`` keeps the ``'userid=`` prefix (FindStringSubmatch[0],
  main.go:840-841).
* previous-review photos use ChildText (not ChildAttr) on the img selector —
  practically always empty (main.go:903).
* previous reviews inherit the OUTER review's author_id/author_name
  (main.go:916-917).
* the empty-selector fallback heuristic for previous-review text
  (main.go:908-913).
* hovercard addressLines formatting via Go ``%v`` + substring-to-first-"]"
  (main.go:387-388).

One deliberate deviation: Go map iteration order is randomized, so the
reference emits SERP candidates in nondeterministic order (main.go:373); we
use JSON object order (a valid linearization) for reproducibility.
"""

from __future__ import annotations

import html as _html
import json
import re
from urllib.parse import quote_plus, urljoin

from .dates import parse_mdy
from .gojson import render_review, review_hash

RE_HOVERCARD = re.compile(r'"hovercardData":{(.*?)}}')
RE_BUSINESS_ID = re.compile(r'"business_id":([^],].)+')
RE_BIZ_CLEAN = re.compile(r'"|]')
RE_REVIEW_COUNT = re.compile(r'"reviewCount":(\d*)')
RE_DIGITS = re.compile(r"(\d+)")
RE_USERID = re.compile(r"'userid=(.*)")
RE_STARS = re.compile(r"regular-\s*(\d+)")


# --------------------------------------------------------------------- Flow 2

def extract_serp_candidates(root) -> list[dict]:
    """SERP hovercard extraction (main.go:364-412). ``root`` is a minidom
    node for the <html> element (colly OnHTML("html")). Returns non-ad
    candidates: {name, text, url, review_count}."""
    out: list[dict] = []
    for v in root.child_texts('script[type="application/json"]'):
        if "hovercardData" not in v or "addressLines" not in v:
            continue
        m = RE_HOVERCARD.search(v)
        if not m:
            continue
        data = "{" + m.group(0) + "}"
        try:
            parsed = json.loads(data)
        except json.JSONDecodeError:
            continue  # reference would CheckError→exit; engine skips + flags
        for value in parsed["hovercardData"].values():
            is_ad = True
            name = ""
            string_address = ""
            business_url = ""
            num_reviews = 0.0
            for kk, vv in value.items():
                if kk == "name":
                    name = vv
                elif kk == "addressLines":
                    # Go: fmt.Sprintf("%v", []interface{...}) → "[a b c]" then
                    # [1:Index("]")] (main.go:387-388)
                    s = "[" + " ".join(str(x) for x in vv) + "]"
                    string_address = s[1:s.index("]")]
                elif kk == "businessUrl":
                    business_url = vv
                elif kk == "numReviews":
                    num_reviews = float(vv)
                elif kk == "isAd":
                    is_ad = bool(vv)
            if is_ad is False:
                out.append({"name": name, "text": string_address,
                            "url": business_url, "review_count": num_reviews})
    return out


def match_winner(target_name: str, target_text: str, candidates: list[dict]) -> int:
    """Deterministic inlined replacement for the external match service
    (main.go:434-468; README.md:23-32 Flask stub).  Winner = candidate with
    the highest token-Jaccard similarity of (name+address) vs the target;
    ties broken by higher review_count, then lowest index."""
    t_tokens = set((target_name + " " + target_text).lower().split())
    best = (-1.0, -1.0, 0)
    winner = 0
    for i, c in enumerate(candidates):
        c_tokens = set((c["name"] + " " + c["text"]).lower().split())
        union = t_tokens | c_tokens
        jac = (len(t_tokens & c_tokens) / len(union)) if union else 0.0
        key = (jac, c["review_count"], -i)
        if key > best:
            best = key
            winner = i
    return winner


def search_url(business_name: str, street: str, city: str, state: str, zip_: str,
               site_base: str = "https://www.yelp.com") -> str:
    """main.go:427-430 — note the street,state,city,zip order quirk."""
    address = street + " " + state + " " + city + " " + zip_
    return (site_base + "/search?find_desc=" + quote_plus(business_name)
            + "&find_loc=" + quote_plus(address))


def target_text(street: str, city: str, state: str, zip_: str) -> str:
    """main.go:361 target address formatting (different order than search)."""
    return street + ", " + city + ", " + state + " " + zip_


# --------------------------------------------------------------------- Flow 1

def extract_profile(root) -> dict:
    """Profile page extraction (main.go:493-558): business_id (meta tag then
    script-regex fallback), histogram JSON-LD, reviewCount.

    Returns {business_id, score, total_reviews, review_count(None if absent),
    histogram_found}.
    """
    business_id = ""
    content = root.child_attr('meta[name="yelp-biz-id"]', "content")
    if len(content) > 0:
        business_id = content.split("\n")[0]
    if len(business_id) == 0:
        texts = root.child_texts("script:contains(business_id)")
        if texts:
            m = RE_BUSINESS_ID.search(texts[0])
            if m and "," in m.group(0):
                match_group = m.group(0).split(",")[1]
                business_id = RE_BIZ_CLEAN.sub("", match_group)

    score = 0.0
    total_reviews = 0
    histogram_found = False
    agg_texts = root.child_texts("script:contains(aggregateRating)")
    if agg_texts:
        try:
            data = json.loads(agg_texts[0])
            agg = data.get("aggregateRating", {}) if isinstance(data, dict) else {}
            score = float(agg.get("ratingValue", 0.0))
            total_reviews = int(agg.get("reviewCount", 0))
            histogram_found = True
        except (json.JSONDecodeError, TypeError, ValueError):
            pass

    review_count = None
    json_str = root.child_text('script[type="application/ld+json"]')
    m = RE_REVIEW_COUNT.search(json_str)
    if m and m.group(1) != "":
        review_count = int(m.group(1))

    return {"business_id": business_id, "score": score,
            "total_reviews": total_reviews, "review_count": review_count,
            "histogram_found": histogram_found}


def review_feed_url(business_id: str, site_base: str = "https://www.yelp.com") -> str:
    """main.go:546 — the reference hardcodes the site; the rebuild makes the
    base configurable so the same machinery runs multi-host corpora."""
    return site_base + "/biz/" + business_id + "/review_feed?rl=en&sort_by=date_desc"


def profile_fanout(business_id: str, review_count, page_url: str,
                   first_page_only: bool, incremental: bool,
                   site_base: str = "https://www.yelp.com") -> tuple[list[str], str]:
    """Link expansion from a profile page (main.go:546,563-594).

    Returns (review_feed_urls, nonrec_landing_url). ``review_count`` None
    (no ld+json match) → no feed pages (the reference silently skips the whole
    normal-review branch, main.go:552).  Incremental mode fetches the first
    50-review window; first_page_only just page 0.
    """
    feed_urls: list[str] = []
    if review_count is not None:
        base = review_feed_url(business_id, site_base)
        if incremental:
            starts = range(0, 50, 10)
        elif first_page_only:
            starts = range(0, 1, 10)  # just 0
        else:
            starts = range(0, review_count, 10)
        feed_urls = [base + "&start=" + str(i) for i in starts]
    nonrec = urljoin(page_url, "/not_recommended_reviews/" + business_id)
    return feed_urls, nonrec


def _owner_replies(raw_replies) -> list[dict]:
    out = []
    for obj in raw_replies or []:
        out.append({
            "author_name": (obj.get("owner") or {}).get("displayName", ""),
            "text": _html.unescape(obj.get("comment", "") or ""),
            "posted_at": obj.get("localizedDate", "") or "",
        })
    return out


def extract_review_feed(body: bytes | str) -> list[dict]:
    """Review-feed JSON → flat records, previous-reviews first (main.go:671-744).

    Returns records in EMISSION order (the order safeReviewAdd is called):
    for each review: [*previous..., review].  Raises ValueError on bad JSON
    or unparseable dates (the reference CheckError→os.Exit path).
    """
    if isinstance(body, bytes):
        body = body.decode("utf-8")
    data = json.loads(body)
    records: list[dict] = []
    for obj in data.get("reviews") or []:
        posted_at = parse_mdy(obj.get("localizedDate", "") or "")
        if posted_at is None:
            raise ValueError(f"unparseable date {obj.get('localizedDate')!r}")
        photos = [p.get("src", "") for p in (obj.get("photos") or [])]
        review = {
            "parent_id": "",
            "review_id": obj.get("id", "") or "",
            "author_id": obj.get("userId", "") or "",
            "author_name": (obj.get("user") or {}).get("markupDisplayName", "") or "",
            "text": _html.unescape((obj.get("comment") or {}).get("text", "") or ""),
            "rating": int(obj.get("rating", 0) or 0),
            "source_date": obj.get("localizedDate", "") or "",
            "photos": photos,
            "not_recommended": False,
            "posted_at": posted_at,
            "responses": _owner_replies(obj.get("businessOwnerReplies")),
        }
        for pre in obj.get("previousReviews") or []:
            pre_posted = parse_mdy(pre.get("localizedDate", "") or "")
            if pre_posted is None:
                raise ValueError(f"unparseable date {pre.get('localizedDate')!r}")
            records.append({
                "parent_id": obj.get("id", "") or "",
                "review_id": pre.get("id", "") or "",
                "author_id": pre.get("userId", "") or "",
                "author_name": (pre.get("user") or {}).get("markupDisplayName", "") or "",
                "text": _html.unescape((pre.get("comment") or {}).get("text", "") or ""),
                "rating": int(pre.get("rating", 0) or 0),
                "source_date": pre.get("localizedDate", "") or "",
                "photos": [p.get("src", "") for p in (pre.get("photos") or [])],
                "not_recommended": False,
                "posted_at": pre_posted,
                "responses": _owner_replies(pre.get("businessOwnerReplies")),
            })
        records.append(review)
    return records


def _reply_tuples(raw) -> list:
    """``_owner_replies`` as (author_name, text, posted_at) tuples — the
    fused feed path needs no dicts."""
    return [((obj.get("owner") or {}).get("displayName", ""),
             _html.unescape(obj.get("comment", "") or ""),
             obj.get("localizedDate", "") or "")
            for obj in raw or []]


def render_review_feed(body: bytes | str,
                       scraped_at: int) -> list[tuple[int, str, str]]:
    """Fused feed extract + record render (M9 + M14/M15 + S6 in one pass).

    Byte-identical to ``[render_record(r, scraped_at) for r in
    extract_review_feed(body)]`` — parity-tested in
    tests/test_feed_fusion.py — without building the intermediate record
    dicts (they were ~35% of the feed-page core-seconds).  Returns
    ``[(posted_at, review_hash, jsonl_line)]`` in emission order
    (previous reviews before their parent, main.go:671-744); raises
    ValueError on bad JSON / unparseable dates with the parent's date
    checked before its previousReviews', exactly like the unfused path.
    """
    if isinstance(body, bytes):
        body = body.decode("utf-8")
    out = []
    unescape = _html.unescape
    for obj in json.loads(body).get("reviews") or []:
        sd = obj.get("localizedDate", "") or ""
        posted_at = parse_mdy(sd)
        if posted_at is None:
            raise ValueError(f"unparseable date {obj.get('localizedDate')!r}")
        parent_rid = obj.get("id", "") or ""
        for pre in obj.get("previousReviews") or []:
            psd = pre.get("localizedDate", "") or ""
            pre_posted = parse_mdy(psd)
            if pre_posted is None:
                raise ValueError(
                    f"unparseable date {pre.get('localizedDate')!r}")
            out.append((pre_posted,) + render_review(
                parent_rid,
                pre.get("id", "") or "",
                pre.get("userId", "") or "",
                (pre.get("user") or {}).get("markupDisplayName", "") or "",
                unescape((pre.get("comment") or {}).get("text", "") or ""),
                psd,
                [p.get("src", "") for p in (pre.get("photos") or [])],
                int(pre.get("rating", 0) or 0),
                scraped_at, pre_posted,
                _reply_tuples(pre.get("businessOwnerReplies"))))
        out.append((posted_at,) + render_review(
            "",
            parent_rid,
            obj.get("userId", "") or "",
            (obj.get("user") or {}).get("markupDisplayName", "") or "",
            unescape((obj.get("comment") or {}).get("text", "") or ""),
            sd,
            [p.get("src", "") for p in (obj.get("photos") or [])],
            int(obj.get("rating", 0) or 0),
            scraped_at, posted_at,
            _reply_tuples(obj.get("businessOwnerReplies"))))
    return out


def extract_nonrec_landing(root) -> dict:
    """Not-recommended landing page (main.go:774-792): scan h3s containing
    "recommended" for a digit count.  Returns {count, no_reviews}."""
    count = None
    for v in root.child_texts("h3"):
        if "recommended" in v:
            m = RE_DIGITS.search(v)
            if m:
                c = int(m.group(1))
                count = c
                if c == 0:
                    return {"count": 0, "no_reviews": True}
    return {"count": count, "no_reviews": False}


def nonrec_fanout(landing_url: str, count: int, first_page_only: bool,
                  incremental: bool) -> list[str]:
    """main.go:798-813: pagination from the landing URL as fetched."""
    if incremental:
        starts = range(0, 50, 10)
    elif first_page_only:
        starts = range(0, 1, 10)
    else:
        starts = range(0, count, 10)
    return [landing_url + "?not_recommended_start=" + str(i) for i in starts]


def extract_nonrec_page(root) -> list[dict]:
    """Not-recommended review HTML extraction (main.go:830-932).

    ``root`` is the <html> element node. Records in emission order
    (previous reviews before their parent, document order of <li>s).
    Raises on missing date/stars like the reference's panic paths.
    """
    records: list[dict] = []
    for li in root.select("div.not-recommended-reviews > ul.reviews > li"):
        author_id = ""
        author_id_string = li.child_attr("div.review-sidebar .user-display-name", "href")
        if author_id_string != "":
            m = RE_USERID.search(author_id_string)
            # FindStringSubmatch(...)[0] — the FULL match incl. 'userid= prefix
            author_id = m.group(0)

        author_name = li.child_text("div.review-sidebar .user-display-name")
        text = li.child_text("div.review-wrapper div.review-content p")

        date_fields = li.child_text("div.review-wrapper div.review-content .rating-qualifier").split()
        source_date = date_fields[0]

        review_id = li.child_attr("div.review--with-sidebar", "data-review-id")

        stars = RE_STARS.search(li.child_attr(".biz-rating .i-stars", "class"))
        rating = int(stars.group(1))

        photos: list[str] = []
        photo = li.child_attr("ul.photo-box-grid div.photo-box img.photo-box-img", "data-async-src")
        if photo != "":
            photos.append(photo)

        posted_at = parse_mdy(source_date)
        if posted_at is None:
            raise ValueError(f"unparseable date {source_date!r}")

        review = {
            "parent_id": "",
            "review_id": review_id,
            "author_id": author_id,
            "author_name": author_name,
            "text": _html.unescape(text),
            "rating": rating,
            "source_date": source_date,
            "not_recommended": True,
            "photos": photos,
            "posted_at": posted_at,
            "responses": [],
        }

        comments = li.child_text("div.review-wrapper div.biz-owner-reply span.bullet-after")
        if comments != "":
            reply_date = li.child_text("div.biz-owner-reply span.bullet-after")
            review["responses"] = [{
                "author_name": li.child_text("div.biz-owner-reply-header strong").replace("Comment from ", ""),
                "text": _html.unescape(li.child_text("span.js-content-toggleable.hidden")),
                "posted_at": reply_date,
            }]

        previous_records = []
        for elem in li.select("div.previous-review"):
            pdate_fields = elem.child_text(".rating-qualifier").split()
            p_source_date = pdate_fields[0]
            p_posted = parse_mdy(p_source_date)
            if p_posted is None:
                raise ValueError(f"unparseable date {p_source_date!r}")
            p_stars = RE_STARS.search(elem.child_attr(".biz-rating .i-stars", "class"))
            p_rating = int(p_stars.group(1))
            p_photos: list[str] = []
            # quirk: ChildText (not ChildAttr) — main.go:903
            p_photo = elem.child_text("ul.photo-box-grid div.photo-box img.photo-box-img")
            if p_photo != "":
                p_photos.append(p_photo)
            p_text = elem.child_text("span.js-expandable-comment span.js-content-toggleable")
            if p_text == "" and len(elem.text()) > 1:
                last_text = elem.text().rstrip("\t \n")
                parts = last_text.split("\n")  # SplitAfter's last piece
                p_text = parts[-1].strip()
            previous_records.append({
                "parent_id": review_id,
                "review_id": "",
                "author_id": author_id,       # outer's — main.go:916
                "author_name": author_name,   # outer's — main.go:917
                "text": _html.unescape(p_text),
                "rating": p_rating,
                "source_date": p_source_date,
                "not_recommended": True,
                "photos": p_photos,
                "posted_at": p_posted,
                "responses": [],
            })
        records.extend(previous_records)
        records.append(review)
    return records


def extract_nonrec_from_items(items: list[dict]) -> list[dict]:
    """extract_nonrec_page twin over ``fastpath.nonrec_items`` captures —
    the same field-to-record assembly (main.go:830-932), byte-for-byte,
    including the panic-parity exception paths (missing date -> IndexError
    on split, missing stars -> AttributeError, unparseable date ->
    ValueError).  Equivalence with the tree+selector path is asserted in
    tests/test_fastpath.py."""
    records: list[dict] = []
    for it in items:
        author_id = ""
        author_id_string = it["a_href"]
        if author_id_string != "":
            m = RE_USERID.search(author_id_string)
            author_id = m.group(0)
        author_name = it["a_text"]
        text = it["p_text"]
        date_fields = it["q_text"].split()
        source_date = date_fields[0]
        review_id = it["rid"]
        stars = RE_STARS.search(it["stars"])
        rating = int(stars.group(1))
        photos: list[str] = []
        if it["photo"] != "":
            photos.append(it["photo"])
        posted_at = parse_mdy(source_date)
        if posted_at is None:
            raise ValueError(f"unparseable date {source_date!r}")
        review = {
            "parent_id": "",
            "review_id": review_id,
            "author_id": author_id,
            "author_name": author_name,
            "text": _html.unescape(text),
            "rating": rating,
            "source_date": source_date,
            "not_recommended": True,
            "photos": photos,
            "posted_at": posted_at,
            "responses": [],
        }
        if it["comments"] != "":
            review["responses"] = [{
                "author_name": it["reply_author"].replace("Comment from ", ""),
                "text": _html.unescape(it["reply_text"]),
                "posted_at": it["reply_date"],
            }]
        previous_records = []
        for p in it["prev"]:
            pdate_fields = p["q1"].split()
            p_source_date = pdate_fields[0]
            p_posted = parse_mdy(p_source_date)
            if p_posted is None:
                raise ValueError(f"unparseable date {p_source_date!r}")
            p_stars = RE_STARS.search(p["q2"])
            p_rating = int(p_stars.group(1))
            p_text = p["q4"]
            if p_text == "" and len(p["q5"]) > 1:
                last_text = p["q5"].rstrip("\t \n")
                parts = last_text.split("\n")
                p_text = parts[-1].strip()
            previous_records.append({
                "parent_id": review_id,
                "review_id": "",
                "author_id": author_id,
                "author_name": author_name,
                "text": _html.unescape(p_text),
                "rating": p_rating,
                "source_date": p_source_date,
                "not_recommended": True,
                "photos": [],  # ChildText on a void img is always ''
                "posted_at": p_posted,
                "responses": [],
            })
        records.extend(previous_records)
        records.append(review)
    return records


def finalize_record_identity(rec: dict) -> dict:
    """Attach review_hash (applyHashKey parity, main.go:1009-1036). Runs on
    RAW (pre-base64) text fields, as in safeReviewAdd (main.go:986)."""
    rec = dict(rec)
    rec["review_hash"] = review_hash(
        rec.get("text", ""), rec.get("author_name", ""), rec.get("review_id", ""),
        [r.get("text", "") for r in rec.get("responses", [])],
    )
    return rec
