"""Attention kernels: chunked-scan and pallas-flash parity vs naive einsum,
gradients, and the dispatch rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emcid_tpu.ops.attention import (
    _flash_forward,
    attention,
    mha_chunked,
)


def _naive(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _qkv(rng, B=2, N=256, M=None, H=2, D=40, dtype=np.float32):
    M = M or N
    q = rng.randn(B, N, H, D).astype(dtype)
    k = rng.randn(B, M, H, D).astype(dtype)
    v = rng.randn(B, M, H, D).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_chunked_matches_naive(rng):
    q, k, v = _qkv(rng)
    scale = 40**-0.5
    out = mha_chunked(q, k, v, scale, block_q=64)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_naive(q, k, v, scale)), atol=2e-5
    )


def test_chunked_unaligned_n(rng):
    q, k, v = _qkv(rng, N=200, M=200)
    scale = 40**-0.5
    out = mha_chunked(q, k, v, scale, block_q=64)
    assert out.shape == (2, 200, 2, 40)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_naive(q, k, v, scale)), atol=2e-5
    )


def test_chunked_grads_match_naive(rng):
    q, k, v = _qkv(rng, B=1, N=128, H=1, D=16)
    scale = 0.25

    def loss_chunked(q, k, v):
        return jnp.sum(mha_chunked(q, k, v, scale, block_q=32) ** 2)

    def loss_naive(q, k, v):
        return jnp.sum(_naive(q, k, v, scale) ** 2)

    g1 = jax.grad(loss_chunked, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_flash_kernel_interpret_matches_naive(rng):
    """Pallas kernel in interpreter mode (CPU) vs naive."""
    q, k, v = _qkv(rng, B=1, N=256, M=256, H=2, D=40)
    scale = 40**-0.5
    out = _flash_forward(q, k, v, scale, block_q=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_naive(q, k, v, scale)), atol=2e-5
    )


def test_flash_kernel_cross_attention_shape(rng):
    """M != N (cross-attn shape) through the kernel."""
    q, k, v = _qkv(rng, B=1, N=256, M=77, H=2, D=40)
    scale = 40**-0.5
    out = _flash_forward(q, k, v, scale, block_q=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_naive(q, k, v, scale)), atol=2e-5
    )


def test_dispatch_short_and_long(rng, monkeypatch):
    # short sequences → einsum path; long on CPU → chunked. Both must agree
    # with naive.
    q, k, v = _qkv(rng, N=64, M=64)
    scale = 40**-0.5
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, scale)),
        np.asarray(_naive(q, k, v, scale)), atol=2e-5,
    )
    q, k, v = _qkv(rng, N=2048, M=2048, H=1, D=16)
    scale = 0.25
    np.testing.assert_allclose(
        np.asarray(attention(q, k, v, scale)),
        np.asarray(_naive(q, k, v, scale)), atol=2e-5,
    )


@pytest.mark.slow
def test_unet_still_correct_after_kernel_swap(rng):
    """UNet forward unchanged (within tolerance) vs a pre-swap einsum
    reference computed by forcing the einsum path."""
    import os

    from emcid_tpu.models.configs import tiny_unet
    from emcid_tpu.models.unet import UNet2DCondition

    model = UNet2DCondition(tiny_unet())
    params = model.init_params(jax.random.PRNGKey(0), context_len=8)
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    ctx = jnp.asarray(rng.randn(1, 8, 32).astype(np.float32))
    out = model.apply({"params": params}, x, jnp.asarray([5]), ctx).sample
    os.environ["EMCID_TPU_NO_FLASH"] = "1"
    try:
        out2 = model.apply({"params": params}, x, jnp.asarray([5]), ctx).sample
    finally:
        del os.environ["EMCID_TPU_NO_FLASH"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


# ---------------------------------------------------------------------------
# flash v2 (online softmax, transposed layouts, pallas backward)
# ---------------------------------------------------------------------------

from emcid_tpu.ops.flash_v2 import flash_attention_v2


def _ein(q, k, v, scale):
    s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@pytest.mark.parametrize("shape", [
    (2, 512, 2, 40),    # SD level-0 head dim
    (1, 256, 2, 80),
    (2, 300, 1, 40),    # N not a block multiple
])
def test_flash_v2_forward(shape, rng):
    B, N, H, D = shape
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    out = flash_attention_v2(q, k, v, D**-0.5, True)
    ref = _ein(q, k, v, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_v2_cross_attention(rng):
    """M=77 context tokens (padded+masked K block)."""
    B, N, M, H, D = 1, 512, 77, 2, 40
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, M, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, M, H, D), jnp.float32)
    out = flash_attention_v2(q, k, v, D**-0.5, True)
    ref = _ein(q, k, v, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_flash_v2_grads(rng):
    B, N, H, D = 1, 384, 2, 40
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    w = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)

    f2 = lambda q, k, v: jnp.sum(flash_attention_v2(q, k, v, D**-0.5, True) * w)
    fr = lambda q, k, v: jnp.sum(_ein(q, k, v, D**-0.5) * w)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g2, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"d{name}")


def test_flash_v2_grads_cross(rng):
    B, N, M, H, D = 1, 256, 77, 2, 40
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, M, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, M, H, D), jnp.float32)
    f2 = lambda q, k, v: jnp.sum(flash_attention_v2(q, k, v, D**-0.5, True) ** 2)
    fr = lambda q, k, v: jnp.sum(_ein(q, k, v, D**-0.5) ** 2)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(fr, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g2, gr, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"d{name}")


def test_flash_v2_block_choice_padding_aware():
    """Default BQ/BK minimize padded work at non-power-of-two N/M.

    The swept power-of-two defaults must be reproduced exactly; the
    train_res grids (384 px -> 2304 tokens) must tile without padding
    instead of padding 2304 -> 4096; and exact-but-tiny blocks are
    rejected (512 floor) in favor of slightly-padded large blocks.
    """
    from emcid_tpu.ops.flash_v2 import _blocks

    # swept power-of-two shapes: unchanged
    assert _blocks(4096, 4096, 40) == (2048, 1024)
    assert _blocks(4096, 4096, 40, bwd=True) == (1024, 1024)
    assert _blocks(1024, 77, 40) == (1024, 128)
    assert _blocks(4096, 4096, 512) == (1024, 1024)  # VAE decoder head
    assert _blocks(256, 256, 40) == (256, 256)

    # train_res 384: 48^2 = 2304 = 2*1152 = 3*768 — exact tiling
    assert _blocks(2304, 2304, 40) == (1152, 768)
    assert _blocks(2304, 2304, 40, bwd=True) == (768, 768)
    assert _blocks(2304, 77, 40) == (1152, 128)

    # 1600 (320 px): 13*128 tiles exactly but is below the 512 floor;
    # picks 896 (7.7% padding) on the k axis instead
    assert _blocks(1600, 1600, 40) == (1664, 896)


def test_flash_v2_forward_train_res_shape(rng):
    """Numerics at the 2304-token train_res shape (non-pow2 blocks)."""
    B, N, H, D = 1, 2304, 1, 40
    q = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, N, H, D), jnp.float32)
    out = flash_attention_v2(q, k, v, D**-0.5, True)
    ref = _ein(q, k, v, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
