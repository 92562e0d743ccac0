"""Seen-filter stage: map_batches tasks fanning out to the sharded
seen-set actors (state/seen.py).

Ray Data actor pools don't key-route batches, so the stage carries the
shard HANDLES and routes slices by ``host_hash % n_shards`` itself
(SURVEY.md §7.5 hard part #2).  Correctness requires the caller to
have wave-deduped by url_sha1 first — then each digest reaches its
shard exactly once per wave and the result is interleaving-invariant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..state.seen import ShardedSeenSet


class SeenFilterStage:
    def __init__(self, seen: ShardedSeenSet):
        self.seen = seen

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        digests = np.stack(
            [np.frombuffer(b, dtype=np.uint8) for b in batch["url_sha1"].to_pylist()]
        )
        host_hash = batch["host_hash"].to_numpy(zero_copy_only=False)
        new_mask = self.seen.check_and_add(digests, host_hash)
        return batch.filter(pa.array(new_mask))
