"""Closed-form MEMIT-style solve: ``adj_k = (lam*C + K K^T)^-1 K``.

The reference computes this per layer in torch float64 on GPU
(emcid_main.py:1040-1048).  TPUs emulate f64 slowly, so two backends exist
behind one API:

* ``method="f64"`` — exact float64 on host numpy (matrices are at most
  in_dim², e.g. 3072² ≈ 38 MB; negligible).  Used for parity validation.
* ``method="f32_ir"`` — on-device float32 Cholesky + fixed-count iterative
  refinement.  ``A = lam*C + K K^T`` is SPD by construction (C is a second
  moment, lam > 0), so Cholesky is stable; 2 refinement steps recover ~f64
  residual norms at f32 storage.  This keeps the whole multi-layer insert a
  single XLA program.

Scaling knobs (reference emcid_main.py:1025-1048): the ``edit_weight`` alpha
rescales ``C *= (1-alpha)/0.5`` and ``K, R *= sqrt(alpha/0.5)`` before the
solve; this is applied by the caller (engine/emcid.py) so this op stays a
pure linear-algebra primitive.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import numpy as np


def _solve_f64_host(C: np.ndarray, K: np.ndarray, lam: float) -> np.ndarray:
    import scipy.linalg

    A = lam * C.astype(np.float64) + K.astype(np.float64) @ K.astype(np.float64).T
    return scipy.linalg.solve(A, K.astype(np.float64), assume_a="pos")


@partial(jax.jit, static_argnames=("refine_steps",))
def _solve_f32_ir(C: jnp.ndarray, K: jnp.ndarray, lam: jnp.ndarray,
                  refine_steps: int = 2) -> jnp.ndarray:
    # Precision pin: TPU's DEFAULT f32 matmul is one bf16-rounded MXU pass
    # (~0.4% relative — measured on-chip, PERF.md round 4 prof_gn2), which
    # would both perturb A and cap the iterative refinement at bf16 level
    # (the residual K - A@x would itself be bf16-noisy).  CPU is exact
    # either way, so the f64-parity tests cannot see this.
    with jax.default_matmul_precision("highest"):
        C = C.astype(jnp.float32)
        K = K.astype(jnp.float32)
        A = lam * C + jnp.dot(K, K.T, preferred_element_type=jnp.float32)
        L = jsl.cholesky(A, lower=True)
        x = jsl.cho_solve((L, True), K)
        for _ in range(refine_steps):
            r = K - A @ x
            x = x + jsl.cho_solve((L, True), r)
        return x


def solve_adj_k(C, K, lam: float, method: str = "f32_ir",
                refine_steps: int = 2):
    """Solve ``(lam*C + K K^T) adj_k = K``.

    Args:
        C: (in_dim, in_dim) second-moment matrix.
        K: (in_dim, n) key matrix (already edit_weight-scaled by caller).
        lam: mom2_update_weight.
        method: "f32_ir" (on-device) or "f64" (host, parity).
    Returns:
        adj_k: (in_dim, n), dtype f32 for "f32_ir", f64 for "f64".
    """
    if method == "f64":
        return _solve_f64_host(np.asarray(C), np.asarray(K), float(lam))
    if method == "f32_ir":
        return _solve_f32_ir(jnp.asarray(C), jnp.asarray(K),
                             jnp.float32(lam), refine_steps=refine_steps)
    raise ValueError(f"unknown solve method {method!r}")


def upd_matrix_match_shape(matrix: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
    """Orient/reshape an update matrix to a weight's shape
    (reference emcid_main.py:2279-2298): transpose if needed; 2D→4D reshape
    for conv kernels edited as matrices."""
    if tuple(matrix.shape) == tuple(shape):
        return matrix
    if tuple(matrix.T.shape) == tuple(shape):
        return matrix.T
    if matrix.ndim == 2 and len(shape) == 4:
        h, w = shape[2:]
        return matrix.reshape(shape[0], shape[1], h, w)
    raise ValueError(
        f"EMCID update matrix shape {tuple(matrix.shape)} does not match "
        f"weight shape {tuple(shape)}"
    )
