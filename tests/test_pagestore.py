"""Page-store edge case: a URL present in page_status.parquet but absent
from pages.parquet must resolve to its RECORDED status (e.g. 0/timeout or
503), not 404 — parity with the oracle's _effective_status
(tests/oracle.py)."""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from go_scrapper_ray.sources import pagestore
from go_scrapper_ray.urlkit import url_hash_batch

URL_OK = "https://www.yelp.com/biz/ok"
URL_TIMEOUT = "https://www.yelp.com/biz/timeout"   # status-only, status 0
URL_GONE = "https://www.yelp.com/biz/gone"         # status-only, status 503
URL_ABSENT = "https://www.yelp.com/biz/nowhere"    # in neither table


def test_status_only_urls_resolve_to_recorded_status(ray_session, tmp_path):
    pq.write_table(pa.table({
        "url": pa.array([URL_OK], pa.string()),
        "html": pa.array([b"<html>ok</html>"], pa.binary()),
    }), tmp_path / "pages.parquet")
    pq.write_table(pa.table({
        "url": pa.array([URL_OK, URL_TIMEOUT, URL_GONE], pa.string()),
        "status": pa.array([200, 0, 503], pa.int32()),
        "fail_times": pa.array([0, 0, 0], pa.int32()),
    }), tmp_path / "page_status.parquet")

    nb = 4
    store = str(tmp_path / "store")
    n = pagestore.build_page_store(str(tmp_path / "pages.parquet"),
                                   str(tmp_path / "page_status.parquet"),
                                   store, num_buckets=nb)
    assert n == 3  # page row + the two status-only rows

    urls = [URL_OK, URL_TIMEOUT, URL_GONE, URL_ABSENT]
    hashes = url_hash_batch(urls)
    rows = sorted(zip(urls, hashes), key=lambda r: r[1] % nb)
    batch = pa.table({
        "canon": pa.array([u for u, _ in rows], pa.string()),
        "url_hash": pa.array([h for _, h in rows], pa.uint64()),
        "bucket": pa.array([h % nb for _, h in rows], pa.int32()),
        "attempt": pa.array([1] * len(rows), pa.int32()),  # first attempt = 1
    })
    out = pagestore.fetch_batch_store(batch, store, nb)
    got = dict(zip(out["canon"].to_pylist(), out["status"].to_pylist()))
    assert got[URL_OK] == 200
    assert got[URL_TIMEOUT] == 0, "recorded timeout status, not 404"
    assert got[URL_GONE] == 503, "recorded error status, not 404"
    assert got[URL_ABSENT] == 404
