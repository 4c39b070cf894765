"""Fused Pallas ChannelNorm(+GELU) vs the jnp oracle.

The kernel must match the oracle's forward AND gradients (custom VJP)
including: non-128-multiple channel counts (the decoder's 387-channel
maps), row counts that need tile padding, and both activation modes.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nerf_qa_tpu.ops.pallas.channelnorm import channel_norm_act


def _oracle(x, scale, bias, gelu, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mean).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    if gelu:
        y = jax.nn.gelu(y, approximate=True)
    return y.astype(x.dtype)


@pytest.mark.parametrize("gelu", [False, True])
@pytest.mark.parametrize("shape,c", [((2, 8, 8), 387), ((5, 7, 9), 448),
                                     ((300,), 64)])
def test_forward_parity(gelu, shape, c):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape + (c,)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1.0, 0.2, c).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, c).astype(np.float32))
    got = channel_norm_act(x, scale, bias, gelu=gelu, interpret=True)
    want = _oracle(x, scale, bias, gelu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("gelu", [False, True])
def test_grad_parity(gelu):
    rng = np.random.default_rng(1)
    c = 387
    x = jnp.asarray(rng.normal(size=(3, 5, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(1.0, 0.2, c).astype(np.float32))
    bias = jnp.asarray(rng.normal(0.0, 0.2, c).astype(np.float32))
    cot = jnp.asarray(rng.normal(size=(3, 5, c)).astype(np.float32))

    def loss_fused(x, s, b):
        return jnp.sum(
            channel_norm_act(x, s, b, gelu=gelu, interpret=True) * cot)

    def loss_oracle(x, s, b):
        return jnp.sum(_oracle(x, s, b, gelu) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, scale, bias)
    for gf, go, name in zip(g_fused, g_oracle, ("dx", "dscale", "dbias")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(go), atol=2e-4, rtol=2e-4,
            err_msg=name)


def test_bf16_input_fp32_stats():
    """bf16 activations: the kernel's fp32 statistics must match the
    oracle's (which also upcasts), not a bf16-accumulated norm."""
    rng = np.random.default_rng(2)
    c = 128
    x = jnp.asarray(rng.normal(100.0, 1.0, (4, 6, c)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    scale = jnp.ones(c, jnp.float32)
    bias = jnp.zeros(c, jnp.float32)
    got = channel_norm_act(xb, scale, bias, gelu=False, interpret=True)
    want = _oracle(xb, scale, bias, False)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.05)
