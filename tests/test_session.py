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
