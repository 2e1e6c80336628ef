from emcid_tpu.parallel.mesh import (
    get_mesh,
    shard_batch,
    replicate,
    pad_to_multiple,
)
