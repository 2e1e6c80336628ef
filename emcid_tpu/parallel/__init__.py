from emcid_tpu.parallel.mesh import (
    default_mesh,
    get_mesh,
    multi_slice_mesh,
    shard_batch,
    replicate,
    pad_to_multiple,
)
