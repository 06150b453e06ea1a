"""Shared ray.data ``Dataset.join`` aggregator sizing.

Every native hash join in this engine shuffles ID-SIZED rows (doc ids,
band hashes, 64-bit codes) — never document payloads — so the join
aggregators are bookkeeping actors, not compute stages.  Ray's default
aggregator sizing reserves ``min(1, (cluster_cpus/2)/num_partitions) *
ceil(num_partitions/num_aggregators)`` CPUs per aggregator, i.e. ~0.5
CPU x 5 aggregators on a 4-CPU cluster.  Those long-lived actor
reservations sit OUTSIDE the streaming executor's budget, so a pipeline
that also holds an actor-pool stage (1 CPU) can wedge: 3.5/4 CPUs pinned
by actors, every remaining 1-CPU shuffle/map task pending forever
(observed as a hard deadlock of ``clean_corpus`` under the 4-CPU pytest
fixture: ``ray status`` showed 4.0/4.0 CPU used, 8+ tasks demanding 1
CPU, zero progress for 15+ min).

Fix: explicit tiny CPU reservation per aggregator, SCALED to the live
cluster.  A fixed 0.125 still wedged the 4-CPU pytest fixture once a
pipeline held 16 aggregators (2.0 CPUs) plus an actor-pool stage and one
running task — 4.0/4.0 reserved, every queued 1-CPU shuffle task pending
forever (observed 2026-08-19: ``ray status`` 4.0/4.0 CPU, ``{'CPU':1}: 9+
pending``, zero progress).  The reservation now assumes the worst case of
16 aggregators per join and caps their AGGREGATE footprint at ~1/8 of the
cluster: per-aggregator ``clamp(total_cpus/128, 0.01, 0.125)`` — 0.125 at
32 CPUs (unchanged), 0.03 at 4 CPUs (16 aggregators = 0.5 CPU, leaving
the executor room to drain).  Aggregators still get scheduled (SPREAD
keeps them distributed on a real cluster) but can no longer starve
task-pool stages on small clusters.  We deliberately drop Ray's default
per-aggregator ``memory`` reservation: it is derived from
``target_max_block_size * num_partitions``, a gross over-estimate for
id-sized join inputs.  A join that DOES move payload-sized rows should
pass ``memory=`` explicitly via this helper.
"""

from __future__ import annotations

from typing import Any, Optional


def join_agg_args(memory: Optional[int] = None) -> dict[str, Any]:
    """``aggregator_ray_remote_args`` for id-sized hash joins."""
    try:
        import ray
        total = ray.cluster_resources().get("CPU", 32.0) \
            if ray.is_initialized() else 32.0
    except Exception:  # pragma: no cover
        total = 32.0
    cpu = min(0.125, max(0.01, total / 128.0))
    args: dict[str, Any] = {"num_cpus": cpu,
                            "scheduling_strategy": "SPREAD"}
    if memory is not None:
        args["memory"] = memory
    return args
