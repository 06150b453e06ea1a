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

Fix: explicit tiny CPU reservation per aggregator.  Aggregators still
get scheduled (SPREAD keeps them distributed on a real cluster) but can
no longer starve task-pool stages on small clusters.  We deliberately
drop Ray's default per-aggregator ``memory`` reservation: it is derived
from ``target_max_block_size * num_partitions``, a gross over-estimate
for id-sized join inputs.  A join that DOES move payload-sized rows
should pass ``memory=`` explicitly via this helper.
"""

from __future__ import annotations

from typing import Any, Optional


def join_agg_args(memory: Optional[int] = None) -> dict[str, Any]:
    """``aggregator_ray_remote_args`` for id-sized hash joins."""
    args: dict[str, Any] = {"num_cpus": 0.125,
                            "scheduling_strategy": "SPREAD"}
    if memory is not None:
        args["memory"] = memory
    return args
