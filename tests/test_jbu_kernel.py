"""Fused Pallas JBU filter vs the lax.scan oracle formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_qa_tpu.models.nr.featup import JBU
from nerf_qa_tpu.ops.pallas.jbu import jbu_filter


def _spatial(d, sigma):
    offs = np.linspace(-1.0, 1.0, d, dtype=np.float32)
    sq = offs[:, None] ** 2 + offs[None, :] ** 2
    return np.exp(-sq.reshape(-1) / (2.0 * sigma**2))


def _oracle(hr, proj, spatial, temp, r):
    """Direct dense formulation of the JBU filter math."""
    n, h, w, c = hr.shape
    d = 2 * r + 1
    pad = ((0, 0), (r, r), (r, r), (0, 0))
    hr_p = np.pad(hr, pad, mode="reflect")
    pj_p = np.pad(proj, pad, mode="reflect")
    logits = np.stack(
        [
            (pj_p[:, dy:dy + h, dx:dx + w] * proj).sum(-1)
            for dy in range(d)
            for dx in range(d)
        ],
        axis=-1,
    )
    e = np.exp(temp * logits - (temp * logits).max(-1, keepdims=True))
    wgt = e / e.sum(-1, keepdims=True) * spatial
    wgt = wgt / np.maximum(wgt.sum(-1, keepdims=True), 1e-7)
    out = np.zeros((n, h, w, c), np.float32)
    for p in range(d * d):
        dy, dx = divmod(p, d)
        out += hr_p[:, dy:dy + h, dx:dx + w] * wgt[..., p:p + 1]
    return out


@pytest.mark.parametrize("shape", [(2, 16, 16, 64), (1, 32, 48, 128)])
def test_fused_matches_dense_oracle(shape):
    r = 3
    rng = np.random.default_rng(0)
    n, h, w, c = shape
    hr = rng.normal(size=shape).astype(np.float32)
    proj = rng.normal(size=(n, h, w, 32)).astype(np.float32) * 0.3
    spatial = _spatial(2 * r + 1, sigma=1.0)
    temp = 2.0
    want = _oracle(hr, proj, spatial, temp, r)
    got = np.asarray(
        jbu_filter(jnp.asarray(hr), jnp.asarray(proj),
                   jnp.asarray(spatial), temp, radius=r)
    )
    # kernel inputs are bf16: tolerance covers the cast
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_fused_rejects_unaligned():
    with pytest.raises(ValueError):
        jbu_filter(jnp.zeros((1, 12, 16, 8)), jnp.zeros((1, 12, 16, 4)),
                   jnp.zeros((49,)), 1.0)


def test_jbu_module_fused_matches_scan():
    """The module's fused path equals its scan path with shared params."""
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(1, 8, 8, 48)).astype(np.float32))
    guide = jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32))
    mod_scan = JBU(dim=48, fused=False)
    params = mod_scan.init(jax.random.PRNGKey(0), src, guide)
    want = mod_scan.apply(params, src, guide)
    got = JBU(dim=48, fused=True).apply(params, src, guide)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)
