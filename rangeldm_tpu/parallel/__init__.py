from rangeldm_tpu.parallel.mesh import (  # noqa: F401
    data_sharding, make_mesh, replicate, replicated, shard_batch,
)
from rangeldm_tpu.parallel.spatial import (  # noqa: F401
    halo_exchange_w, sharded_circular_conv2d, spatial_sharding,
)
