from ladi_vton_tpu.parallel.sharding import (
    data_parallel_sampler,
    eval_shard_batch,
    make_mesh,
    MeshSpec,
)
