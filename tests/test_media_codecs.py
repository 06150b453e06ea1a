"""Real media codecs (round-5: the previously-stubbed decode step made
real for in-sandbox-decodable formats): binary P5 PGM and PCM16 RIFF/WAVE
round-trips, strict-parser error paths, and the actor-pool decode stage's
feature math."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from go_scrapper_ray.pipelines.multimodal import (RealDecodeStage,  # noqa: E402
                                                  _pgm_decode, _pgm_encode,
                                                  _wav_decode, _wav_encode)


def test_pgm_roundtrip():
    pix = np.arange(12, dtype=np.int64) % 256
    payload = _pgm_encode(4, 3, pix)
    w, h, out = _pgm_decode(payload)
    assert (w, h) == (4, 3)
    assert np.array_equal(out.astype(np.int64), pix)


@pytest.mark.parametrize("bad", [
    b"P6\n2 2\n255\n" + b"\0" * 12,       # wrong magic for this parser
    b"P5\n2 2\n255\n\0\0\0",              # truncated pixel data
    b"P5\n2 2\n65535\n" + b"\0" * 4,      # unsupported maxval
    b"P5\nx y\n255\n\0\0\0\0",            # non-numeric dims
    b"garbage",
])
def test_pgm_malformed_raises(bad):
    with pytest.raises(ValueError):
        _pgm_decode(bad)


def test_wav_roundtrip():
    sm = (np.arange(100, dtype=np.int64) * 123) % 65536 - 32768
    payload = _wav_encode(sm)
    out = _wav_decode(payload)
    assert np.array_equal(out.astype(np.int64), sm)


@pytest.mark.parametrize("bad", [
    b"RIFX....WAVE",                       # wrong magic
    b"RIFF\x04\x00\x00\x00WAVE",           # no data chunk
])
def test_wav_malformed_raises(bad):
    with pytest.raises(ValueError):
        _wav_decode(bad)


def test_wav_nonpcm_raises():
    import struct
    fmt = struct.pack("<HHIIHH", 3, 1, 1000, 2000, 2, 16)  # IEEE float
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    with pytest.raises(ValueError):
        _wav_decode(payload)


def test_decode_stage_features_exact():
    pix = np.array([1, 2, 3, 250], dtype=np.int64)
    sm = np.array([-3, 7], dtype=np.int64)
    t = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "kind": pa.array(["image", "audio", "video"]),
        "payload": pa.array([_pgm_encode(2, 2, pix), _wav_encode(sm),
                             b"opaque"], pa.binary()),
        "width": pa.array([2, 0, 0], pa.int32()),
        "height": pa.array([2, 0, 0], pa.int32()),
        "duration_ms": pa.array([0, 2, 5], pa.int32()),
    })
    out = RealDecodeStage()(t)
    rows = {r["media_id"]: r for r in out.to_pylist()}
    assert set(rows) == {0, 1}  # video skipped (documented stub)
    assert rows[0]["n_units"] == 4
    assert rows[0]["unit_sum"] == int(pix.sum())
    assert rows[0]["unit_sqsum"] == int((pix * pix).sum())
    assert rows[1]["n_units"] == 2
    assert rows[1]["unit_sum"] == 4
    assert rows[1]["unit_sqsum"] == 58


def test_decode_stage_dim_mismatch_raises():
    pix = np.zeros(4, dtype=np.int64)
    t = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "kind": pa.array(["image"]),
        "payload": pa.array([_pgm_encode(2, 2, pix)], pa.binary()),
        "width": pa.array([3], pa.int32()),   # metadata disagrees
        "height": pa.array([2], pa.int32()),
        "duration_ms": pa.array([0], pa.int32()),
    })
    with pytest.raises(ValueError):
        RealDecodeStage()(t)
