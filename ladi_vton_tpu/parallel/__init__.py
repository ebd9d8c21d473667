from ladi_vton_tpu.parallel.sharding import (
    data_parallel_sampler,
    eval_shard_batch,
    make_mesh,
    MeshSpec,
)
from ladi_vton_tpu.parallel.tp import (
    tensor_parallel_sampler,
    tp_attention_mesh,
    tp_attention_scope,
    tp_jit_step,
    tp_place,
    tp_shardings,
    tp_train_state,
    unet_tp_specs,
)
