"""Deterministic synthetic web-corpus generator (FIXTURES.md schemas).

Produces the Parquet tables the crawl engine runs against — the "web":

  pages        (url, warc_ts, html, text, lang)     # BASELINE.json input_hint
  page_status  (url, status, fail_times)
  robots       (host, robots_txt)
  seeds        (seed_id, url, business_name, addr_*, first_page_only,
                last_review_hashes)
  crawl_config.json

Page bodies mirror the reference's selectors (see /root/reference/main.go:
SERP hovercards :364-412, profile :493-558, review_feed JSON :671-744,
not-recommended HTML :830-932) so extraction parity is meaningful.
Everything is seeded (default 42); NO external data.

Scales:
  small — the 10 seed scenarios (unit/golden parity tests)
  med   — scenarios + extra businesses incl. one hot host (skew)
  bench — ~1e5+ pages for the two-parallelism throughput run
"""

from __future__ import annotations

import json
import os
import random
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from go_scrapper_ray import urlkit  # noqa: E402
from go_scrapper_ray.config import CrawlConfig  # noqa: E402

WORDS = ("fish chips great terrible lovely awful staff food wait clean tasty "
         "fresh cold warm friendly rude slow quick cozy loud quiet pricey cheap "
         "amazing mediocre").split()
ENTITY_SNIPPETS = ["&amp; more", "&lt;3", "5 &gt; 4", "&amp;amp; again",
                   "café &#39;special&#39;", "B&amp;B"]


def _txt(rng: random.Random, lo=4, hi=18, entities=True) -> str:
    n = rng.randint(lo, hi)
    words = [rng.choice(WORDS) for _ in range(n)]
    if entities and rng.random() < 0.4:
        words.insert(rng.randrange(len(words)), rng.choice(ENTITY_SNIPPETS))
    return " ".join(words)


def _date(rng: random.Random) -> str:
    # Non-zero-padded M/D/YYYY like Yelp's localizedDate (main.go:676)
    return f"{rng.randint(1, 12)}/{rng.randint(1, 28)}/{rng.randint(2015, 2023)}"


def _mk_review(rng: random.Random, rid: str, with_prev: bool) -> dict:
    """One wire-format review (Reviews/Review structs, main.go:54-101)."""
    kind = rng.random()
    if kind < 0.08:
        # hash branch 1: no text, no author, id only (main.go:1014-1016)
        r = {"comment": {"text": ""}, "rating": rng.randint(1, 5),
             "photos": [], "userId": f"u-{rid}", "id": rid,
             "localizedDate": _date(rng), "user": {"markupDisplayName": ""},
             "businessOwnerReplies": [], "previousReviews": []}
        return r
    r = {
        "comment": {"text": _txt(rng)},
        "rating": rng.randint(0, 5),  # rating 0 exercises omitempty
        "photos": [{"src": f"https://pic.example/{rid}-{i}.jpg"}
                   for i in range(rng.randint(0, 2))],
        "userId": f"u-{rid}",
        "id": rid,
        "localizedDate": _date(rng),
        "user": {"markupDisplayName": _txt(rng, 1, 2, entities=rng.random() < 0.3)},
        "businessOwnerReplies": [],
        "previousReviews": [],
    }
    if rng.random() < 0.3:
        r["businessOwnerReplies"] = [{
            "owner": {"displayName": _txt(rng, 1, 2, entities=False)},
            "comment": _txt(rng) if rng.random() < 0.9 else "",
            "localizedDate": _date(rng)}]
    if with_prev and rng.random() < 0.35:
        prid = rid + "-prev"
        r["previousReviews"] = [{
            "comment": {"text": _txt(rng)},
            "user": {"markupDisplayName": r["user"]["markupDisplayName"]},
            "photos": [{"src": f"https://pic.example/{prid}.jpg"}] if rng.random() < 0.3 else [],
            "userId": r["userId"], "id": prid, "rating": rng.randint(1, 5),
            "localizedDate": _date(rng),
            "businessOwnerReplies": [{
                "owner": {"displayName": "Owner"}, "comment": _txt(rng, 2, 6),
                "localizedDate": _date(rng)}] if rng.random() < 0.3 else [],
        }]
    return r


_FILLER_WORDS = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed "
                 "do eiusmod tempor incididunt ut labore et dolore magna "
                 "aliqua enim minim veniam quis nostrud").split()


def _filler_dom(rng: random.Random, n_paras: int) -> str:
    """Realistic page bulk: Common-Crawl-style pages are 50-100KB of DOM,
    not the 2KB of the bare fixtures.  The filler sits in containers no
    extraction selector matches, so extracted output is unchanged while
    parse cost (the dominant real-world per-page cost) becomes realistic.
    Enabled for bench-scale corpora via GSR_FILLER_PARAS (default 120)."""
    if n_paras <= 0:
        return ""
    paras = []
    for i in range(n_paras):
        words = " ".join(rng.choice(_FILLER_WORDS) for _ in range(18))
        paras.append(f'<div class="page-chrome c{i % 7}"><span>{words}</span>'
                     f'<a href="#s{i}">{i}</a></div>')
    return f'<div id="site-chrome">{"".join(paras)}</div>'


def _profile_html(bizid: str, review_count: int, variant: str, score: float,
                  filler: str = "") -> str:
    """variant ∈ meta|fallback|missing (M6 paths, main.go:493-522)."""
    ld = json.dumps({"aggregateRating": {"ratingValue": score,
                                         "reviewCount": review_count}},
                    separators=(",", ":"))  # compact: regex needs no-space colon
    head = ""
    body_scripts = f'<script type="application/ld+json">{ld}</script>'
    if variant == "meta":
        head = f'<meta name="yelp-biz-id" content="{bizid}\nrest">'
    elif variant == "fallback":
        # pair-parity format so the Go regex captures through the comma
        # (see tests/test_kernels.py::test_extract_profile_meta_and_fallback)
        body_scripts += f'<script>{{"gaConfig":{{"business_id":["xy","{bizid}"],"p":1}}}}</script>'
    return (f"<html><head>{head}</head><body><h1>Biz {bizid}</h1>"
            f"{filler}{body_scripts}</body></html>")


def _nonrec_landing_html(count: int, filler: str = "") -> str:
    return (f"<html><body>{filler}<h3>About the business</h3>"
            f"<h3>{count} reviews that are not currently recommended</h3>"
            f"</body></html>")


def _nonrec_li(rng: random.Random, rid: str) -> str:
    author = _txt(rng, 1, 2, entities=rng.random() < 0.3)
    text = _txt(rng)
    date = _date(rng)
    rating = rng.randint(1, 5)
    photo = (f'<ul class="photo-box-grid"><li><div class="photo-box">'
             f'<img class="photo-box-img" data-async-src="https://pic.example/{rid}.jpg">'
             f"</div></li></ul>") if rng.random() < 0.3 else ""
    reply = ""
    if rng.random() < 0.35:
        reply = (f'<div class="biz-owner-reply">'
                 f'<div class="biz-owner-reply-header"><strong>Comment from Owner R.</strong></div>'
                 f'<span class="bullet-after">{_date(rng)}</span>'
                 f'<span class="js-content-toggleable hidden">{_txt(rng, 2, 8)}</span></div>')
    prev = ""
    if rng.random() < 0.3:
        pdate = _date(rng)
        prating = rng.randint(1, 5)
        if rng.random() < 0.5:
            ptext = f'<span class="js-expandable-comment"><span class="js-content-toggleable">{_txt(rng)}</span></span>'
        else:
            # triggers the fallback heuristic (main.go:908-913): text is the
            # last line of the trimmed element text
            ptext = f"\n{_txt(rng, 3, 8)}"
        prev = (f'<div class="previous-review">'
                f'<div class="biz-rating"><div class="i-stars regular-{prating}"></div>'
                f'<span class="rating-qualifier"> {pdate} </span></div>{ptext}\n</div>')
    return (f'<li><div class="review review--with-sidebar" data-review-id="{rid}">'
            f'<div class="review-sidebar"><a class="user-display-name" '
            f"href=\"/user_details?'userid=u-{rid}\">{author}</a></div>"
            f'<div class="review-wrapper"><div class="review-content">'
            f'<div class="biz-rating"><div class="i-stars regular-{rating}"></div>'
            f'<span class="rating-qualifier"> {date} </span></div>'
            f"<p>{text}</p></div>{photo}{reply}{prev}</div></div></li>")


def _serp_html(candidates: list[dict]) -> str:
    hover = {f"loc{i}": c for i, c in enumerate(candidates)}
    blob = json.dumps({"legacyProps": {"searchAppProps":
                                       {"hovercardData": hover}}},
                      separators=(",", ":"))
    return (f'<html><body><script type="application/json">{blob}</script>'
            f"</body></html>")


class BusinessSpec:
    def __init__(self, idx: int, site_base: str, rng: random.Random,
                 n_reviews: int, n_nonrec: int, variant: str = "meta",
                 with_prev: bool = True, score: float = 4.5,
                 window_pad: bool = False, feed_base: str | None = None):
        # feed_base: where review_feed pages live.  The ENGINE builds feed
        # URLs from the crawl config's site_base (reference parity,
        # main.go:546 hardcodes the site), so multi-host businesses must
        # still write their feeds under that base or every feed fetch 404s.
        self.feed_base = feed_base or site_base
        self.n_filler = 0  # paragraphs of DOM filler per html page (bench)
        self._filler_rng = random.Random(idx * 7919 + 13)
        # window_pad: incremental-mode businesses need EMPTY pages covering the
        # 50-review window overshoot (real review_feed returns {"reviews":[]}
        # past the end; main.go:615-643 walks whole windows)
        self.window_pad = window_pad
        self.idx = idx
        self.site_base = site_base
        self.bizid = f"biz-{idx:04d}"
        self.slug = f"place-{idx:04d}"
        self.profile_url = f"{site_base}/biz/{self.slug}"
        self.variant = variant
        self.score = score
        self.n_nonrec = n_nonrec
        # reviews sorted date-desc like sort_by=date_desc feeds
        self.reviews = [_mk_review(rng, f"r{idx:04d}-{i:04d}", with_prev)
                        for i in range(n_reviews)]
        from go_scrapper_ray.dates import parse_mdy
        self.reviews.sort(key=lambda r: (-parse_mdy(r["localizedDate"]),
                                         r["id"]))
        self.nonrec_lis = [_nonrec_li(rng, f"nr{idx:04d}-{i:04d}")
                           for i in range(n_nonrec)]

    @property
    def n_reviews(self):
        return len(self.reviews)

    def feed_url(self, start: int) -> str:
        return (f"{self.feed_base}/biz/{self.bizid}/review_feed"
                f"?rl=en&sort_by=date_desc&start={start}")

    def nonrec_landing_url(self) -> str:
        return f"{self.site_base}/not_recommended_reviews/{self.bizid}"

    def _filler(self) -> str:
        return _filler_dom(self._filler_rng, self.n_filler)

    def pages(self) -> list[tuple[str, str]]:
        """[(url, html), ...] for every page of this business."""
        out = [(self.profile_url,
                _profile_html(self.bizid, self.n_reviews, self.variant,
                              self.score, filler=self._filler()))]
        feed_hi = self.n_reviews
        nonrec_hi = self.n_nonrec
        if self.window_pad:
            feed_hi = max(((self.n_reviews + 49) // 50) * 50, 50)
            nonrec_hi = max(((self.n_nonrec + 49) // 50) * 50, 50)
        for start in range(0, feed_hi, 10):
            doc = {"reviews": self.reviews[start:start + 10]}
            if self.n_filler:
                doc["pageProps"] = [  # unknown keys; parse-cost realism
                    " ".join(self._filler_rng.choice(_FILLER_WORDS)
                             for _ in range(18))
                    for _ in range(self.n_filler // 4)]
            body = json.dumps(doc, separators=(",", ":"))
            out.append((self.feed_url(start), body))
        out.append((self.nonrec_landing_url(),
                    _nonrec_landing_html(self.n_nonrec,
                                         filler=self._filler())))
        for start in range(0, nonrec_hi, 10):
            lis = "".join(self.nonrec_lis[start:start + 10])
            html = (f'<html><body>{self._filler()}'
                    f'<div class="not-recommended-reviews">'
                    f'<ul class="reviews">{lis}</ul></div></body></html>')
            out.append((f"{self.nonrec_landing_url()}?not_recommended_start={start}", html))
        return out


def generate_corpus(out_dir: str, scale: str = "small", seed: int = 42) -> dict:
    """Write the corpus tables; returns a manifest dict (also JSON-dumped)."""
    rng = random.Random(seed)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    site = "https://www.yelp.com"

    specs: list[BusinessSpec] = []
    seeds: list[dict] = []
    status_rows: list[tuple[str, int, int]] = []

    def add_seed(**kw):
        base = {"seed_id": len(seeds), "url": "", "business_name": "",
                "addr_street": "", "addr_city": "", "addr_state": "",
                "addr_zip": "", "first_page_only": 0, "last_review_hashes": []}
        base.update(kw)
        seeds.append(base)

    # --- scenario businesses (always present) --------------------------------
    b_direct = BusinessSpec(0, site, rng, 25, 12)
    add_seed(url=b_direct.profile_url)

    b_messy = BusinessSpec(1, site, rng, 14, 5)
    # messy seed URL: off-host + trailing newline (canonicalize_seed forces it
    # to https://www.yelp.com/biz/place-0001, main.go:273-291)
    add_seed(url="https://m.yelp.com/biz/place-0001\n")

    b_search = BusinessSpec(2, site, rng, 18, 7)
    add_seed(business_name="Fish & Chips Palace", addr_street="12 Main St",
             addr_city="Springfield", addr_state="IL", addr_zip="62701")

    b_incr = BusinessSpec(3, site, rng, 80, 30, window_pad=True)
    # watermark = identity hash of the first record emitted from feed page
    # start=60 (second 50-review window) → first check misses, second matches
    from go_scrapper_ray.extract import extract_review_feed, finalize_record_identity
    wm_page = json.dumps({"reviews": b_incr.reviews[60:70]}, separators=(",", ":"))
    wm_rec = finalize_record_identity(extract_review_feed(wm_page)[0])
    add_seed(url=b_incr.profile_url,
             last_review_hashes=[wm_rec["review_hash"], "00" * 16])

    b_fp = BusinessSpec(4, site, rng, 33, 11)
    add_seed(url=b_fp.profile_url, first_page_only=1)

    add_seed(url=site + "/search?find_desc=rejected")  # NO_BUSINESS_PAGE

    b_zero = BusinessSpec(6, site, rng, 0, 0)
    add_seed(url=b_zero.profile_url)  # NO_REVIEWS

    b_fmt = BusinessSpec(7, site, rng, 5, 2, variant="missing")
    add_seed(url=b_fmt.profile_url)  # PAGE_FORMAT_CHANGE after retries

    b_404 = BusinessSpec(8, site, rng, 5, 2)
    add_seed(url=b_404.profile_url)  # profile 404 → NO_SEARCH_RESULTS
    status_rows.append((b_404.profile_url, 404, 0))

    b_flaky = BusinessSpec(9, site, rng, 22, 8, variant="fallback")
    add_seed(url=b_flaky.profile_url)
    # one feed page fails twice then succeeds (retry ledger, main.go:1079-1099)
    status_rows.append((b_flaky.feed_url(10), 200, 2))
    # one nonrec page times out permanently (status 0)
    status_rows.append((f"{b_flaky.nonrec_landing_url()}?not_recommended_start=0", 0, 0))

    specs = [b_direct, b_messy, b_search, b_incr, b_fp, b_zero, b_fmt, b_404, b_flaky]

    # SERP page for the search seed: 3 candidates (one ad) + decoys
    serp_url = None
    from go_scrapper_ray.extract import search_url
    serp_url = search_url("Fish & Chips Palace", "12 Main St", "Springfield",
                          "IL", "62701", site)
    serp_html = _serp_html([
        {"name": "Fish & Chips Palace", "addressLines": ["12 Main St", "Springfield"],
         "businessUrl": "/biz/place-0002", "numReviews": 18, "isAd": False},
        {"name": "Fishy Ads Inc", "addressLines": ["1 Ad Way"],
         "businessUrl": "/biz/ad-place", "numReviews": 999, "isAd": True},
        {"name": "Chips R Us", "addressLines": ["99 Other Rd", "Springfield"],
         "businessUrl": "/biz/chips-r-us", "numReviews": 4, "isAd": False},
    ])

    # --- extra businesses for med/bench --------------------------------------
    if scale in ("med", "bench"):
        n_extra = 50 if scale == "med" else int(os.environ.get("GSR_BENCH_BUSINESSES", "1200"))
        hot_every = 3  # every 3rd business on the hot host (skew)
        for k in range(n_extra):
            host = "www.hot.example" if k % hot_every == 0 else f"www.h{k % 97:03d}.example"
            base = f"https://{host}"
            nrev = rng.randint(20, 60) if scale == "med" else rng.randint(30, 80)
            nnon = rng.randint(0, 15)
            sp = BusinessSpec(100 + k, base, rng, nrev, nnon,
                              variant="meta", with_prev=(scale == "med"),
                              feed_base=site)
            if scale == "bench":
                sp.n_filler = int(os.environ.get("GSR_FILLER_PARAS", "120"))
            specs.append(sp)
            add_seed(url=sp.profile_url)

    # --- write pages ----------------------------------------------------------
    urls, htmls, texts, langs, ts = [], [], [], [], []
    t0 = 1672531200_000_000  # 2023-01-01 UTC in µs

    def add_page(url: str, html: str, lang: str = "en"):
        cu = urlkit.canonicalize(url)
        assert cu == url, f"fixture URL not canonical: {url!r} -> {cu!r}"
        urls.append(url)
        htmls.append(html.encode("utf-8"))
        texts.append(html[:160])
        langs.append(lang)
        ts.append(t0 + len(urls) * 1_000_000)

    for sp in specs:
        for url, html in sp.pages():
            add_page(url, html)
    add_page(serp_url, serp_html)
    # off-domain page (domain predicate exercise) + a non-English page
    add_page("https://other.example/offsite", "<html><body>off</body></html>", "de")

    pages = pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })
    pq.write_table(pages, out / "pages.parquet")

    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in status_rows], pa.string()),
        "status": pa.array([r[1] for r in status_rows], pa.int32()),
        "fail_times": pa.array([r[2] for r in status_rows], pa.int32()),
    }), out / "page_status.parquet")

    pq.write_table(pa.table({
        "host": pa.array(["www.yelp.com"], pa.string()),
        "robots_txt": pa.array(
            ["User-agent: *\nDisallow: /not_recommended_reviews/\n"], pa.string()),
    }), out / "robots.parquet")

    pq.write_table(pa.table({
        "seed_id": pa.array([s["seed_id"] for s in seeds], pa.int64()),
        "url": pa.array([s["url"] for s in seeds], pa.string()),
        "business_name": pa.array([s["business_name"] for s in seeds], pa.string()),
        "addr_street": pa.array([s["addr_street"] for s in seeds], pa.string()),
        "addr_city": pa.array([s["addr_city"] for s in seeds], pa.string()),
        "addr_state": pa.array([s["addr_state"] for s in seeds], pa.string()),
        "addr_zip": pa.array([s["addr_zip"] for s in seeds], pa.string()),
        "first_page_only": pa.array([s["first_page_only"] for s in seeds], pa.int32()),
        "last_review_hashes": pa.array([s["last_review_hashes"] for s in seeds],
                                       pa.list_(pa.string())),
    }), out / "seeds.parquet")

    cfg = CrawlConfig(site_base=site,
                      allowed_hosts=None if scale in ("med", "bench") else ("yelp.com", "www.yelp.com"))
    (out / "crawl_config.json").write_text(cfg.to_json())

    manifest = {
        "scale": scale, "seed": seed, "n_pages": len(urls),
        "n_seeds": len(seeds), "n_businesses": len(specs),
        "incremental_seed_id": 3,
        "scenario": {
            "direct": 0, "messy": 1, "search": 2, "incremental": 3,
            "first_page_only": 4, "reject": 5, "zero_reviews": 6,
            "format_change": 7, "profile_404": 8, "flaky": 9,
        },
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    return manifest


def set_incremental_hashes(out_dir: str, seed_id: int, hashes: list[str]):
    """Second pass: plant watermark hashes on a seed (the oracle computes the
    hash of the record at the target depth, then tests regenerate)."""
    out = Path(out_dir)
    t = pq.read_table(out / "seeds.parquet")
    col = t["last_review_hashes"].to_pylist()
    ids = t["seed_id"].to_pylist()
    col[ids.index(seed_id)] = hashes
    t = t.set_column(t.schema.get_field_index("last_review_hashes"),
                     "last_review_hashes", pa.array(col, pa.list_(pa.string())))
    pq.write_table(t, out / "seeds.parquet")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--scale", default="small", choices=["small", "med", "bench"])
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    m = generate_corpus(args.out_dir, args.scale, args.seed)
    print(json.dumps(m))
