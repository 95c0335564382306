from rvt_tpu.parallel.mesh import (DP_AXIS, batch_sharding, make_mesh,
                                   replicate_tree, replicated,
                                   shard_batch_arrays, shard_states)
