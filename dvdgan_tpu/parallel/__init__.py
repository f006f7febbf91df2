"""Parallelism: mesh construction, sharding helpers, shard_map'd DP train
step with gradient psum + cross-replica BN — SURVEY.md §2.16, §5.8."""

from dvdgan_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, TIME_AXIS, batch_sharding, local_batch_rows, make_mesh,
    make_parallel_train_step, replicate_state, replicated, shard_batch,
    shard_batch_chunk, shard_batch_chunk_local, shard_batch_local)
from dvdgan_tpu.parallel.time_shard import (  # noqa: F401
    dt_apply_time_sharded, make_sharded_dt)
