"""Worker for tests/test_multiprocess.py: one of two cooperating processes
exercising the DCN outer mesh axis (parallel/mesh.py multi_slice_mesh) on
the CPU backend — the covariance accumulate and an eval-metric psum both
cross the process boundary via XLA collectives (Gloo on CPU; DCN on a real
multi-slice TPU).

Invoked as: python tests/multiprocess_worker.py {process_id} {port} {out_json}
"""

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(process_id: int, port: int, out_json: str) -> None:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=2, process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    from emcid_tpu.engine.layer_stats import layer_stats_text_encoder
    from emcid_tpu.models.loader import build_tiny_pipeline
    from emcid_tpu.parallel import default_mesh, replicate, shard_batch

    assert jax.device_count() == 8 and jax.local_device_count() == 4
    mesh = default_mesh()
    # multi-process runtime → hierarchical mesh with the dcn outer axis
    assert mesh is not None and mesh.axis_names == ("dcn", "data"), mesh
    assert mesh.devices.shape == (2, 4)

    # identical seeds → identical tiny models in both processes
    comps = build_tiny_pipeline(seed=0, words=["cat", "dog"])
    captions = [f"a photo number {i} of a cat" for i in range(32)]
    layer_name = "text_model.encoder.layers.1.mlp.fc2"

    # covariance sweep through the PRODUCT path, batch sharded over the
    # 2-process mesh; the a^T a accumulate all-reduces across processes
    stat = layer_stats_text_encoder(
        comps.text_encoder, comps.text_params, comps.tokenizer, layer_name,
        captions=captions, force_recompute=True, batch_size=16, mesh=mesh)
    mom2 = np.asarray(stat.mom2.moment())

    # reference value: same sweep, no mesh, local single device
    stat0 = layer_stats_text_encoder(
        comps.text_encoder, comps.text_params, comps.tokenizer, layer_name,
        captions=captions, force_recompute=True, batch_size=16, mesh=None)
    mom2_local = np.asarray(stat0.mom2.moment())

    # eval-metric psum across processes: mean of a per-item score array
    # sharded over the full mesh (the shape of every eval aggregation)
    scores = np.arange(16, dtype=np.float32)
    garr = shard_batch(jnp.asarray(scores), mesh)
    mean = float(np.asarray(jax.jit(jnp.mean)(garr)))

    out = dict(
        process_id=process_id,
        mesh_axes=list(mesh.axis_names),
        mom2_max_err=float(np.abs(mom2 - mom2_local).max()),
        mom2_count=int(stat.mom2.count),
        local_count=int(stat0.mom2.count),
        psum_mean=mean,
    )
    with open(out_json, "w") as f:
        json.dump(out, f)
    print(f"[{process_id}] OK {out}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3])
