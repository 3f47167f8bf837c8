from rla4mor_tpu.parallel.mesh import make_mesh, dof_sharding, replicated
from rla4mor_tpu.parallel.sharded_sketch import (
    flat_shard_rows,
    gaussian_block,
    gaussian_sketch_blocked,
    gaussian_sketch_sharded,
    srht_blocked,
    srht_sketch_sharded,
    srht_sketch_sharded_flat,
)
from rla4mor_tpu.parallel.driver import (
    GreedyState,
    init_state,
    make_sharded_greedy_step,
    state_to_rom,
)
from rla4mor_tpu.parallel.embeddings import (
    ShardedGaussianEmbedding,
    ShardedSrhtEmbedding,
)

__all__ = [
    "make_mesh", "dof_sharding", "replicated", "flat_shard_rows",
    "gaussian_block", "gaussian_sketch_blocked", "gaussian_sketch_sharded",
    "srht_blocked", "srht_sketch_sharded", "srht_sketch_sharded_flat",
    "GreedyState", "init_state", "make_sharded_greedy_step",
    "state_to_rom",
    "ShardedGaussianEmbedding", "ShardedSrhtEmbedding",
]
