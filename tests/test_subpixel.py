"""ops/subpixel: the sub-pixel 2x transposed conv must be numerically
interchangeable with nn.ConvTranspose(k3, s2, padding=((1,2),(1,2))) —
same param tree, same outputs — since checkpoints and the torch importer
are defined against the latter."""
import numpy as np
import pytest

import jax.numpy as jnp
from flax import linen as nn

from nerf_qa_tpu.models.nr.layers import ConvTransposeLayer
from nerf_qa_tpu.ops.subpixel import conv_transpose_2x_subpixel


@pytest.mark.parametrize("shape,cout", [((2, 4, 5, 3), 2),
                                        ((1, 7, 9, 5), 4),
                                        ((1, 16, 16, 8), 8)])
def test_function_parity_vs_flax(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.2,
                               (3, 3, shape[-1], cout)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.2, (cout,)).astype(np.float32))
    mod = nn.ConvTranspose(cout, (3, 3), strides=(2, 2),
                           padding=((1, 2), (1, 2)))
    want = mod.apply({"params": {"kernel": k, "bias": b}}, x)
    got = conv_transpose_2x_subpixel(x, k, b)
    assert got.shape == want.shape == (shape[0], 2 * shape[1],
                                       2 * shape[2], cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)


def test_bf16_grad_through_subpixel_ct():
    """bf16 operands must stay differentiable: the first build requested
    fp32 output storage from the conv, whose transpose rule then paired
    an fp32 cotangent with the bf16 kernel and raised (found by the
    on-TPU bf16 train-step A/B — training with the sub-pixel default and
    --decoder-dtype bfloat16 was broken, forward-only paths were not)."""
    import jax

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 6, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.2, (3, 3, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.2, (3,)).astype(np.float32))

    def loss(kernel, bias, dtype):
        y = conv_transpose_2x_subpixel(
            x.astype(dtype), kernel.astype(dtype), bias
        )
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g_bf16 = jax.grad(loss)(k, b, jnp.bfloat16)  # raised TypeError before
    g_f32 = jax.grad(loss)(k, b, jnp.float32)
    assert g_bf16.dtype == k.dtype
    np.testing.assert_allclose(np.asarray(g_bf16), np.asarray(g_f32),
                               rtol=0.1, atol=0.5)


def test_layer_param_tree_and_outputs_interchangeable(monkeypatch):
    """ConvTransposeLayer under either lowering: identical param tree
    (checkpoint compatibility) and identical outputs given the same
    params."""
    import jax

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 6)).astype(np.float32))
    layer = ConvTransposeLayer(4, norm_type="channel")

    monkeypatch.setenv("NERF_QA_TPU_SUBPIXEL_CT", "0")
    vars_ref = layer.init(jax.random.PRNGKey(0), x)
    out_ref = layer.apply(vars_ref, x)

    monkeypatch.setenv("NERF_QA_TPU_SUBPIXEL_CT", "1")
    vars_sub = layer.init(jax.random.PRNGKey(0), x)
    ref_tree = jax.tree_util.tree_structure(vars_ref)
    sub_tree = jax.tree_util.tree_structure(vars_sub)
    assert ref_tree == sub_tree
    out_sub = layer.apply(vars_ref, x)  # reference-initialized params
    np.testing.assert_allclose(np.asarray(out_sub), np.asarray(out_ref),
                               atol=1e-5)
