"""Join partition sizing.

Ray 2.49's hash-join operator allocates one aggregator actor per partition
up front; asking for more partitions than the cluster has CPU slots
deadlocks the pipeline on small clusters (observed: a 2-row left-outer join
with num_partitions=8 hangs forever under ray.init(num_cpus=4)). Size the
partition count to the cluster, capped at the scale target.
"""

from __future__ import annotations

import ray


def join_partitions(target: int = 64) -> int:
    """min(target, cluster CPUs), at least 2."""
    cpus = 4.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 4.0)
    return max(2, min(target, int(cpus)))
