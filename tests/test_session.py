"""T3/T7 session-state unit tests (cookie jar quirk + deterministic UA)."""

from go_scrapper_ray.state.session import (CookieJar, FetchSession, UARotator,
                                           USER_AGENT_STRINGS)


def test_ua_table_matches_reference_shape():
    # collyfunc.go:17-46 — 28 entries incl. the accidental split strings
    assert len(USER_AGENT_STRINGS) == 28
    assert USER_AGENT_STRINGS[8] == "Chrome/41.0.2227.1 Safari/537.36"


def test_ua_rotation_deterministic_and_layout_invariant():
    r1, r2 = UARotator(seed=7), UARotator(seed=7)
    seq = [r1.for_ordinal(i) for i in range(50)]
    assert seq == [r2.for_ordinal(i) for i in range(50)]
    assert len(set(seq)) > 3  # actually rotates
    assert UARotator(seed=8).for_ordinal(0) != seq[0] or \
        UARotator(seed=8).for_ordinal(1) != seq[1]


def test_cookiejar_reference_quirk_last_response_wins():
    jar = CookieJar(last_response_wins=True)
    jar.capture("a.example", {"sid": "1"})
    # the reference replays the LAST response's cookies on EVERY host
    assert jar.for_request("b.example") == {"sid": "1"}
    jar.capture("b.example", {"tok": "x"})
    assert jar.for_request("a.example") == {"tok": "x"}  # replaced wholesale


def test_cookiejar_per_host_mode():
    jar = CookieJar(last_response_wins=False)
    jar.capture("a.example", {"sid": "1"})
    jar.capture("b.example", {"tok": "x"})
    jar.capture("a.example", {"lang": "en"})
    assert jar.for_request("a.example") == {"sid": "1", "lang": "en"}
    assert jar.for_request("b.example") == {"tok": "x"}
    assert jar.for_request("c.example") == {}


def test_fetch_session_headers():
    s = FetchSession(seed=42)
    h = s.request_headers("a.example", 0)
    assert h["X-Crawlera-Profile"] == "desktop"
    assert h["User-Agent"] in USER_AGENT_STRINGS
    assert "Cookie" not in h
    s.jar.capture("a.example", {"sid": "9"})
    assert s.request_headers("a.example", 1)["Cookie"] == "sid=9"


def test_parse_proxy_getfromproxy_parity():
    from go_scrapper_ray.state.session import parse_proxy

    # collyfunc.go:50-63: split on "@", [0]=key, [1]=host:port
    assert parse_proxy("KEY123@proxy.example:8010", "url") == \
        "http://proxy.example:8010"
    assert parse_proxy("KEY123@proxy.example:8010", "key") == "KEY123"
    # unknown key → "" (the switch's zero value)
    assert parse_proxy("KEY123@h:1", "nope") == ""
    # multi-@ quirk: Split[1] is the MIDDLE chunk only
    assert parse_proxy("k@h1:1@h2:2", "url") == "http://h1:1"
    # no "@" → reference panics (index out of range) → ValueError
    import pytest as _pytest
    with _pytest.raises(ValueError):
        parse_proxy("noatsign", "url")


def test_fetch_session_persona_transport_and_auth():
    import base64

    from go_scrapper_ray.config import Persona
    from go_scrapper_ray.state.session import FetchSession

    p = Persona(proxy="SECRET@proxy.example:8010",
                other_proxies=("k2@p2:1",),
                additional_cookies={"sid": "x"})
    s = FetchSession(seed=1, persona=p)
    t = s.transport()
    # collyfunc.go:70-92: proxy URL + InsecureSkipVerify + colly timeouts
    assert t["proxy_url"] == "http://proxy.example:8010"
    assert t["tls_insecure_skip_verify"] is True
    assert (t["expect_continue_timeout_s"], t["response_header_timeout_s"],
            t["request_timeout_s"]) == (4, 10, 200)
    h = s.request_headers("www.yelp.com", 0)
    # collyfunc.go:93-94: Basic base64(ACCESSKEY), alongside the fixed set
    assert h["Proxy-Authorization"] == \
        "Basic " + base64.b64encode(b"SECRET").decode()
    assert h["X-Crawlera-Profile"] == "desktop"
    # additional_cookies is declared-but-never-read in the reference:
    # stored, NOT applied to requests
    assert "Cookie" not in h

    # no persona → no proxy header, null transport proxy
    s0 = FetchSession(seed=1)
    assert "Proxy-Authorization" not in s0.request_headers("h", 0)
    assert s0.transport()["proxy_url"] is None


def test_persona_from_spider_mapping():
    from go_scrapper_ray.config import Persona

    d = {"persona": {"proxy": "k@h:1", "other_proxies": ["a@b:2"],
                     "additional_cookies": {"c": 1}}}
    p = Persona.from_spider(d)
    assert p.proxy == "k@h:1" and p.other_proxies == ("a@b:2",)
    assert p.additional_cookies == {"c": 1}
    assert Persona.from_spider({}) is None
    assert Persona.from_spider({"persona": None}) is None
