"""SeenShard — one shard of the engine-level URL-seen set.

Sharding key: ``url_hash % num_seen_shards`` (membership is per-URL so it
shards by URL hash; politeness shards by host — two different keys, see
SURVEY.md §4.2).  Each shard fronts an exact dict (source of truth, feeds the
``seen_set`` golden output) with a cuckoo filter fast path: a "definitely not
seen" filter answer skips the dict probe — the path that matters at 10^10
URLs where the exact set is disk-resident.

The reference has no global seen set (colly keeps one per collector,
SURVEY.md T4); the north rule adds it.  Retries bypass the check
(colly Request.Retry() bypasses the visited set, main.go:337 etc.)."""

from __future__ import annotations

import ray

import pyarrow as pa
import pyarrow.parquet as pq

from .cuckoo import CuckooFilter


@ray.remote(num_cpus=0)
class SeenShard:
    """num_cpus=0: bookkeeping actors must never reserve task CPUs — they are
    latency-bound (dict probes), not compute-bound, and a pool of them would
    otherwise starve the map_batches stages on small clusters."""
    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.exact: dict[int, str] = {}
        self.filter = CuckooFilter(capacity)
        self._backlog: list[int] = []       # hashes awaiting filter insert
        self._pending: list[pa.Table] = []  # link candidates this round
        self._frontier: list = []           # frontier shard handles

    def _filter_add(self, h: int) -> None:
        """DEFERRED insert into the cuckoo fast path: the filter is a probe
        accelerator for the 10^10-scale disk-resident exact set — nothing
        in the in-memory path ever probes it, but its per-item Python
        insert (~25 us) sat on the round-end resolve critical path (0.3 to
        0.5 s per 24k-link round with every task core idle).  Hashes queue
        here and ``_filter_flush`` runs before any point the filter could
        be consulted (checkpoint/restore boundaries today; any future
        probe path MUST flush first)."""
        self._backlog.append(h)

    def _filter_flush(self) -> None:
        """Drain queued inserts; on over-full failure (which can also evict
        a resident victim fingerprint) rebuild at 2x from the exact keys so
        filter negatives stay trustworthy."""
        bl = self._backlog
        if not bl:
            return
        self._backlog = []
        for h in bl:
            if not self.filter.add(h):
                nf = CuckooFilter(max(1 << 16, len(self.exact) * 4))
                for k in self.exact:
                    nf.add(k)
                self.filter = nf

    def add_if_new(self, hashes: list[int], canons: list[str]) -> list[bool]:
        """Batched check-and-insert; True = new (caller may schedule).

        The exact dict is AUTHORITATIVE; the filter is a pure fast path
        (a filter hit short-circuits to the dict probe; a filter miss still
        falls through to the dict, so eviction/false-negatives can never
        resurrect a seen URL as new)."""
        out = []
        exact = self.exact
        for h, c in zip(hashes, canons):
            if h in exact:
                out.append(False)
                continue
            exact[h] = c
            self._filter_add(h)
            out.append(True)
        return out

    def contains(self, hashes: list[int]) -> list[bool]:
        return [h in self.exact for h in hashes]

    def warm(self, t: pa.Table) -> int:
        """Arg-deserialization warmup: the FIRST Arrow-table argument an
        actor process receives pays Ray's lazy serialization-handler setup
        (~0.6 s measured on this box) — on the intake/resolve critical path
        if not pre-paid here.  Called fire-and-forget at engine init so the
        cost overlaps actor spawn + corpus reads."""
        return t.num_rows

    # ------------------------------------------- shard-to-shard link routing
    # Extract tasks submit their link rows directly (partitioned on
    # l_hash % num_seen_shards); at round end the driver triggers resolve(),
    # which picks the canonically-first candidate per hash, inserts it, and
    # pushes the kept rows straight to the frontier shards — the driver
    # never touches a link row.  Determinism: winner per hash = min
    # (page_seq, emit_idx), exactly the order the old driver-side sorted
    # routing produced; (page_seq, emit_idx) pairs are unique per link so
    # arrival order is irrelevant.

    def set_frontier(self, handles: list) -> None:
        self._frontier = handles

    def submit(self, t: pa.Table) -> int:
        self._pending.append(t)
        return t.num_rows

    def resolve(self, num_fetch_buckets: int = 0, build_edges: bool = True):
        """Returns (edge_table | None, candidate_seed_ids, kept_buckets):
        edges for the KEPT links (src canon rides on the link rows), seed
        ids for ALL candidates (window-growth gating counts attempted
        pushes, kept or not — parity with the old driver path), and — only
        when ``num_fetch_buckets`` is non-zero — the page-store buckets the
        kept URLs hash into (unused since the mmap store; kept for
        inspection/tests)."""
        import numpy as np
        import pyarrow.compute as pc

        if not self._pending:
            return None, [], []
        t = pa.concat_tables(self._pending)
        self._pending = []
        order = pc.sort_indices(t, sort_keys=[("page_seq", "ascending"),
                                              ("emit_idx", "ascending")])
        t = t.take(order)
        cand_seeds = pc.unique(t["seed_id"]).to_pylist()
        exact = self.exact
        # vectorized winner pick: rows are canonically sorted, so the first
        # occurrence of each hash IS the deterministic winner; only winner
        # rows' canons ever materialize to Python
        hashes = t["l_hash"].to_numpy(zero_copy_only=False)
        _, first_idx = np.unique(hashes, return_index=True)
        new_pos = sorted(int(i) for i in first_idx
                         if int(hashes[i]) not in exact)
        if not new_pos:
            return None, cand_seeds, []
        kept = t.take(pa.array(new_pos, pa.int64()))
        for h, c in zip(kept["l_hash"].to_pylist(),
                        kept["l_canon"].to_pylist()):
            exact[h] = c
            self._filter_add(h)
        hh = kept["l_hosthash"].to_numpy(zero_copy_only=False)
        fshard = hh % len(self._frontier)
        futs = [self._frontier[int(s)].push_table.remote(
                    kept.take(pa.array(np.flatnonzero(fshard == s))))
                for s in np.unique(fshard)]
        ray.get(futs)
        # build_edges=False on the intake wave: seed entries produce no
        # edge rows, so shipping a seeds-sized edge table back to the
        # driver (which discards it) is pure serial cost
        edges = None
        if build_edges:
            edges = pa.table({
                "src": kept["l_src"].combine_chunks(),
                "dst": kept["l_canon"].combine_chunks(),
                "rel": kept["l_rel"].combine_chunks()})
        buckets = []
        if num_fetch_buckets:
            buckets = np.unique(
                kept["l_hash"].to_numpy(zero_copy_only=False)
                % num_fetch_buckets).tolist()
        return edges, cand_seeds, buckets

    def dump(self) -> list[tuple[int, str]]:
        return sorted(self.exact.items())

    def size(self) -> int:
        return len(self.exact)

    # ------------------------------------------------------------ checkpoint
    def checkpoint(self, path: str) -> int:
        self._filter_flush()
        t = pa.table({
            "url_hash": pa.array(list(self.exact.keys()), pa.uint64()),
            "canon_url": pa.array(list(self.exact.values()), pa.string()),
        })
        pq.write_table(t, path)
        return len(self.exact)

    def restore(self, path: str) -> int:
        t = pq.read_table(path)
        self.exact = dict(zip(t["url_hash"].to_pylist(),
                              t["canon_url"].to_pylist()))
        self._backlog = []
        self.filter = CuckooFilter(max(1 << 16, len(self.exact) * 2))
        for h in self.exact:
            self.filter.add(h)
        return len(self.exact)
