"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

The sandbox has no image/audio codecs, so the DECODE step is stubbed two
ways (clearly marked):
  * ``decode="strict"``  → raises NotImplementedError (the real-codec path);
  * ``decode="fake"``    → a deterministic fake decoder (byte histogram as
    "pixels") so the Ray-side plumbing — schema, batch sizing, actor
    signature, output layout — is real and tested end-to-end.

Batch sizes are SMALL (64) because payload rows are fat — the knob that
keeps batch × concurrency inside a worker's heap with binary columns."""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("width", pa.int32()),            # typed metadata travels beside payload
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media(sf_dir: str) -> rd.Dataset:
    """Deterministic fake media table derived from ``documents`` (no external
    data): payload = the utf-8 bytes of the text, kind cycles by doc_id."""

    def kernel(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        kinds = ["image", "audio", "video"]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pa.array([s.encode("utf-8") for s in texts], pa.binary()),
            "width": pa.array([64 + (i % 8) * 16 for i in ids], pa.int32()),
            "height": pa.array([64 + (i % 5) * 16 for i in ids], pa.int32()),
            "duration_ms": pa.array([(i % 30) * 1000 for i in ids], pa.int32()),
        }, schema=MEDIA_SCHEMA)

    return rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow")


class DecodeStage:
    """Actor-pool stage: decoder state initialized once per actor.

    STUB: real codecs are not in this container.  ``strict`` raises
    NotImplementedError; ``fake`` produces a deterministic 16-bin byte
    histogram standing in for decoded pixels/samples."""

    def __init__(self, decode: str = "fake"):
        if decode not in ("fake", "strict"):
            raise ValueError(decode)
        self.decode = decode

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.decode == "strict":
            raise NotImplementedError(
                "media codecs unavailable in this environment; "
                "use decode='fake' for the deterministic stand-in")
        feats, sums = [], []
        for payload in t["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=16).astype(np.int64)
            feats.append(hist.tolist())
            sums.append(int(arr.sum()))
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "payload_len": pa.array([len(p) for p in t["payload"].to_pylist()],
                                    pa.int64()),
            "byte_sum": pa.array(sums, pa.int64()),
            "hist16": pa.array(feats, pa.list_(pa.int64())),
        })


class ResizeStage:
    """Fake 'resize': rescales the histogram feature to a target 8-bin layout
    (stands in for image resize / audio resample; shows a second chained
    actor stage over the decoded features).  Bins land as WIDE int64
    columns f0..f{bins-1} — scalar columns hash cleanly in the driver's
    value-compare and keep the DuckDB twin expressible; the list-typed
    feature shape is still exercised by the hist16 column BETWEEN the
    stages."""

    def __init__(self, bins: int = 8):
        self.bins = bins

    def __call__(self, t: pa.Table) -> pa.Table:
        H = np.array(t["hist16"].to_pylist(), dtype=np.int64)
        F = (H.reshape(len(t), self.bins, -1).sum(axis=2)
             if len(t) else np.zeros((0, self.bins), np.int64))
        t = t.drop_columns(["hist16"])
        for j in range(self.bins):
            t = t.append_column(f"f{j}", pa.array(F[:, j], pa.int64()))
        return t


def media_features(sf_dir: str, decode: str = "fake",
                   concurrency: int = 4) -> rd.Dataset:
    """The multimodal pipeline: synth table → decode (actor pool, small
    batches) → resize (actor pool) → typed feature rows."""
    # autoscaling pools (min 1 actor): fixed pools summing to >= cluster CPUs
    # would starve the upstream read task and deadlock on small clusters
    return (synth_media(sf_dir)
            .map_batches(DecodeStage, fn_constructor_kwargs={"decode": decode},
                         batch_format="pyarrow", batch_size=64,
                         concurrency=(1, concurrency), num_cpus=1)
            .map_batches(ResizeStage, batch_format="pyarrow", batch_size=256,
                         concurrency=(1, 2), num_cpus=1))


def frame_sample(sf_dir: str, every_ms: int = 5000) -> rd.Dataset:
    """Fake frame sampler for 'video' rows: one output row per sampled frame
    offset (flat_map-style expansion inside map_batches).  The stand-in
    frame hash is md5 over payload-bytes + b"_<offset-decimal>" — on these
    utf-8 payloads that equals DuckDB ``md5(text || '_' || off)``, so the
    expansion + hash has an exact SQL twin."""

    def kernel(t: pa.Table) -> pa.Table:
        mids, offs, fhash = [], [], []
        for mid, kind, payload, dur in zip(
                t["media_id"].to_pylist(), t["kind"].to_pylist(),
                t["payload"].to_pylist(), t["duration_ms"].to_pylist()):
            if kind != "video" or dur <= 0:
                continue
            for off in range(0, dur, every_ms):
                mids.append(mid)
                offs.append(off)
                fhash.append(hashlib.md5(
                    payload + b"_%d" % off).hexdigest())
        return pa.table({"media_id": pa.array(mids, pa.int64()),
                         "frame_off_ms": pa.array(offs, pa.int32()),
                         "frame_hash": pa.array(fhash, pa.string())})

    return synth_media(sf_dir).map_batches(kernel, batch_format="pyarrow",
                                           batch_size=64)
