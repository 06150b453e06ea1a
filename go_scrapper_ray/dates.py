"""Go ``time.Parse("1/2/2006", ...)`` compatible date parsing.

Reference sites: main.go:676,691,705,722,862,874,896,923 (M/D/YYYY, Go accepts
both zero-padded and non-padded fields) and the silent-error re-parse inside
``safeReviewAdd`` (main.go:988-991) where a parse failure yields Go's zero
``time.Time`` — whose ``.Unix()`` is -62135596800 — which sorts LAST in the
descending-by-date insertion sort (main.go:984-1007).
"""

from __future__ import annotations

import datetime as _dt
from functools import lru_cache

GO_ZERO_UNIX = -62135596800  # time.Time{}.Unix(): Jan 1, year 1, UTC

_EPOCH_ORD = _dt.date(1970, 1, 1).toordinal()  # 719163


@lru_cache(maxsize=1 << 16)
def parse_mdy(s: str) -> int | None:
    """Parse M/D/YYYY (padded or not) to unix seconds UTC; None on failure.

    Mirrors Go's layout "1/2/2006": month/day may be 1 or 2 digits, year must
    be 4 digits; no leading/trailing garbage allowed.

    Midnight-UTC timestamps are pure day arithmetic (toordinal), skipping
    datetime's tz path, and the function is memoized per process: review
    dates cluster heavily (a feed page repeats a handful of dates), and the
    4 µs/call parse was ~4% of the extract-wave profile at 259k calls.
    """
    parts = s.split("/")
    if len(parts) != 3:
        return None
    m, d, y = parts
    if not (m.isdigit() and d.isdigit() and y.isdigit()):
        return None
    if not (1 <= len(m) <= 2 and 1 <= len(d) <= 2 and len(y) == 4):
        return None
    try:
        o = _dt.date(int(y), int(m), int(d)).toordinal()
    except ValueError:
        return None
    return (o - _EPOCH_ORD) * 86400


def parse_mdy_or_zero(s: str) -> int:
    """safeReviewAdd semantics: failures become Go zero time (sorts last desc)."""
    v = parse_mdy(s)
    return GO_ZERO_UNIX if v is None else v
