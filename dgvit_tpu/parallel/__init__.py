from dgvit_tpu.parallel.shard import (shard_sac_state, shard_batch,
                                      sharded_learn, shardmap_learn)
