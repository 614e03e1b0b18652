from videovector_tpu.parallel.mesh import make_mesh  # noqa: F401
from videovector_tpu.parallel.train import make_train_step, make_eval_step  # noqa: F401
from videovector_tpu.parallel.multihost import (  # noqa: F401
    HostShardedSource, global_batch_from_device_shards,
    global_batch_from_local, host_shard_range,
)
from videovector_tpu.parallel.pipeline import make_pp_loss_fn  # noqa: F401
