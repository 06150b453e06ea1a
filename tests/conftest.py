"""Session-scoped Ray init (one cluster for the whole pytest run)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def fixture_corpus(tmp_path_factory):
    """Small deterministic synthetic web corpus (seed=42) for crawl tests."""
    from fixtures.gen import generate_corpus

    out = tmp_path_factory.mktemp("corpus")
    manifest = generate_corpus(str(out), scale="small", seed=42)
    return str(out), manifest
