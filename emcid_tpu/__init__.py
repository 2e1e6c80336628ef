"""emcid_tpu — TPU-native framework for closed-form massive concept editing
of text-to-image diffusion models (EMCID method, rebuilt for JAX/XLA/Pallas).

The reference implementation (SilentView/EMCID, PyTorch/diffusers) is a
two-stage editor:

  Stage 1: per concept, optimize a target hidden representation ("z") for the
           last-subject-token at chosen text-encoder layers, using a
           noise-prediction self-distillation objective.
  Stage 2: insert all concepts at once with a MEMIT-style multi-layer
           closed-form least-squares update  W += R @ adj_K^T  where
           adj_K = solve(lam*C + K K^T, K)  and  C = E[k k^T]  is a cached
           second-moment over a large caption corpus.

This package re-designs that pipeline TPU-first:

  * models are pure-functional Flax modules with *activation taps* replacing
    torch forward hooks (capture AND injection are explicit function I/O);
  * Stage 1 is one jit'd optimization step vmapped across concepts;
  * the covariance sweep is a jit'd streaming accumulate sharded over a mesh;
  * the closed-form solves are batched linear algebra (CPU f64 for parity,
    TPU f32 + iterative refinement for speed);
  * evaluation image generation is seeded, batched diffusion sampling
    sharded with jax.sharding over all available devices.

Public file formats (hparams JSON, instruction JSON, stats .npz, summary
JSON) are kept compatible with the reference so cached artifacts and
configs carry over. See SURVEY.md at the repo root for the layer map.
"""

__version__ = "0.1.0"

from emcid_tpu.runtime import setup_compilation_cache as _setup_cache

_setup_cache()

from emcid_tpu.hparams import (
    EMCIDHyperParams,
    EMCIDXLHyperParams,
    UNetEMCIDHyperParams,
)
