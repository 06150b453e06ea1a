"""FrontierShard — one shard of the URL frontier + per-host politeness queues.

Sharding key: ``host_hash % num_frontier_shards`` — politeness state for one
host must live in exactly one place (SURVEY.md §4.2: "politeness for a hot
host must stay on ONE logical queue").  Each shard holds:

* per-host pending min-heaps keyed ``(priority, depth, parent_seq, emit_idx,
  attempt)`` — the canonical deterministic order (flow.py docstring);
* per-host politeness clocks ``(k, last_virtual_ts)`` advanced with the
  seeded deterministic gap (collyfunc.go:115-119 Delay+RandomDelay parity,
  virtualized);
* a per-host robots cache (north rule; reference ignores robots).

``release()`` drains due entries in deterministic order and stamps virtual
fetch timestamps; the driver assigns global ``seq`` after merging shards.
Checkpoint/restore write the heap contents + clocks to Parquet so a killed
crawl resumes mid-frontier (north rule resumability)."""

from __future__ import annotations

import heapq
import json

import ray

import pyarrow as pa
import pyarrow.parquet as pq

from ..flow import politeness_gap_ms
from ..urlkit import host_of, url_hash64 as _url_hash64
from .robots import RobotsRules

FIELDS = ("seed_id", "url", "canon", "kind", "depth", "parent_seq",
          "emit_idx", "attempt", "priority")


def _order_key(e: dict) -> tuple:
    return (e["seed_id"], e["depth"], e["parent_seq"], e["emit_idx"],
            e["attempt"])


RELEASE_SCHEMA = pa.schema([
    ("seed_id", pa.int64()), ("url", pa.string()), ("canon", pa.string()),
    ("url_hash", pa.uint64()), ("host", pa.string()),
    ("kind", pa.string()), ("depth", pa.int32()),
    ("parent_seq", pa.int64()), ("emit_idx", pa.int32()),
    ("attempt", pa.int32()), ("virtual_ts_ms", pa.int64()),
])


@ray.remote(num_cpus=0)
class FrontierShard:
    def __init__(self, shard_id: int, cfg_dict: dict,
                 robots_path: str | None = None):
        self.shard_id = shard_id
        self.cfg = cfg_dict  # delay_ms, jitter_ms, jitter_seed, ignore_robots,
        #                      max_per_host_per_round (0 = unbounded)
        self.heaps: dict[str, list] = {}
        self.host_k: dict[str, int] = {}
        self.host_ts: dict[str, int] = {}
        self.robots: dict[str, RobotsRules] = {}
        self.robots_blocked = 0
        self._push_n = 0  # heap tiebreak so dicts are never compared
        if robots_path and not cfg_dict.get("ignore_robots", True):
            t = pq.read_table(robots_path)
            self.robots = {h: RobotsRules.parse(s) for h, s in
                           zip(t["host"].to_pylist(),
                               t["robots_txt"].to_pylist())}

    def push(self, entries: list[dict]) -> int:
        """Batched push of frontier entries (already seen-filtered).  Robots
        check happens here — the per-host cache lives with the host's queue."""
        n = 0
        check_robots = not self.cfg.get("ignore_robots", True)
        heaps = self.heaps
        for e in entries:
            host = e.get("host") or host_of(e["canon"])
            if check_robots:
                rules = self.robots.get(host)
                if rules is not None and not rules.allowed(e["canon"]):
                    self.robots_blocked += 1
                    continue
            self._push_n += 1
            heapq.heappush(heaps.setdefault(host, []),
                           (_order_key(e), self._push_n, e))
            n += 1
        return n

    def push_table(self, t: pa.Table) -> int:
        """Columnar push of kernel-emitted link rows (already seen-filtered
        and robots/host-filtered in the extract kernel).  The row→dict
        conversion runs HERE, on the shard actor — the driver only routes
        sub-tables, so its per-link Python cost is zero."""
        entries = []
        for sid, url, canon, uh, host, kind, depth, pseq, eidx in zip(
                t["seed_id"].to_pylist(), t["l_url"].to_pylist(),
                t["l_canon"].to_pylist(), t["l_hash"].to_pylist(),
                t["l_host"].to_pylist(), t["l_kind"].to_pylist(),
                t["l_depth"].to_pylist(), t["page_seq"].to_pylist(),
                t["emit_idx"].to_pylist()):
            entries.append({"seed_id": sid, "url": url, "canon": canon,
                            "url_hash": uh, "kind": kind, "depth": depth,
                            "parent_seq": pseq, "emit_idx": eidx,
                            "attempt": 1, "priority": 0, "host": host})
        return self.push(entries)

    def release(self) -> pa.Table:
        """Drain due entries for this round, deterministic order, politeness
        timestamps stamped.  Returns a COLUMNAR Arrow table — the per-entry
        Python (heap pops, clock stamping, row→column) runs on the shard
        actor, never the driver.  With max_per_host_per_round set, a hot
        host keeps the remainder queued for later rounds (politeness
        backpressure — replaces colly's Parallelism cap, collyfunc.go:179)."""
        cap = self.cfg.get("max_per_host_per_round", 0)
        cols = {f.name: [] for f in RELEASE_SCHEMA}
        for host in sorted(self.heaps):
            heap = self.heaps[host]
            n = len(heap) if cap <= 0 else min(cap, len(heap))
            for _ in range(n):
                _, _, e = heapq.heappop(heap)
                k = self.host_k.get(host, 0)
                gap = politeness_gap_ms(self.cfg["jitter_seed"],
                                        self.cfg["delay_ms"],
                                        self.cfg["jitter_ms"], host, k)
                ts = self.host_ts.get(host, 0) + gap
                self.host_k[host] = k + 1
                self.host_ts[host] = ts
                cols["seed_id"].append(e["seed_id"])
                cols["url"].append(e["url"])
                cols["canon"].append(e["canon"])
                cols["url_hash"].append(
                    e.get("url_hash") if e.get("url_hash") is not None
                    else _url_hash64(e["canon"]))
                cols["host"].append(host)
                cols["kind"].append(e["kind"])
                cols["depth"].append(e["depth"])
                cols["parent_seq"].append(e["parent_seq"])
                cols["emit_idx"].append(e["emit_idx"])
                cols["attempt"].append(e["attempt"])
                cols["virtual_ts_ms"].append(ts)
            if not heap:
                del self.heaps[host]
        return pa.table(cols, schema=RELEASE_SCHEMA)

    def pending(self) -> int:
        return sum(len(h) for h in self.heaps.values())

    def cancel_seed(self, seed_id: int) -> int:
        """Drop a seed's queued URLs (incremental stop-on-match)."""
        dropped = 0
        for host in list(self.heaps):
            keep = [(k, c, e) for k, c, e in self.heaps[host] if e["seed_id"] != seed_id]
            dropped += len(self.heaps[host]) - len(keep)
            if keep:
                heapq.heapify(keep)
                self.heaps[host] = keep
            else:
                del self.heaps[host]
        return dropped

    # ------------------------------------------------------------ checkpoint
    def checkpoint(self, path: str) -> int:
        rows = []
        for host, heap in self.heaps.items():
            for _, _, e in heap:
                rows.append(e)
        t = pa.table({
            "entry": pa.array([json.dumps(e) for e in rows], pa.string()),
            "host": pa.array([host_of(e["canon"]) for e in rows], pa.string()),
        })
        pq.write_table(t, path)
        clocks = {"host_k": self.host_k, "host_ts": self.host_ts}
        with open(path + ".clocks.json", "w") as f:
            json.dump(clocks, f)
        return len(rows)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        self.heaps = {}
        n = 0
        for s in t["entry"].to_pylist():
            e = json.loads(s)
            host = host_of(e["canon"])
            self._push_n += 1
            heapq.heappush(self.heaps.setdefault(host, []),
                           (_order_key(e), self._push_n, e))
            n += 1
        with open(path + ".clocks.json") as f:
            clocks = json.load(f)
        self.host_k = clocks["host_k"]
        self.host_ts = clocks["host_ts"]
        return n
