"""DINOv2 checkpoint converter: structural compatibility with ViTS14.

The fake checkpoint uses the REAL hub tensor layout: ``dinov2_vits14_reg``
ships ``pos_embed`` of shape (1, 1 + 37*37, 384) — a 37x37 patch grid from
518² training resolution — which the converter must bicubically resample
to the model's grid (16x16 at 224²).
"""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_qa_tpu.compat.torch_vit import convert_dinov2_vit, interpolate_pos_embed
from nerf_qa_tpu.models.nr.vit import ViTS14

# real dinov2_vits14_reg pos_embed patch grid (518 / 14 = 37)
REAL_GRID = 37


def _fake_dinov2_state(depth=2, dim=384, patch=14, registers=4,
                       ckpt_grid=REAL_GRID):
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.normal(0, 0.02, shape).astype(np.float32)

    state = {
        "patch_embed.proj.weight": t(dim, 3, patch, patch),
        "patch_embed.proj.bias": t(dim),
        "cls_token": t(1, 1, dim),
        "register_tokens": t(1, registers, dim),
        "pos_embed": t(1, 1 + ckpt_grid * ckpt_grid, dim),
        "norm.weight": t(dim),
        "norm.bias": t(dim),
    }
    for i in range(depth):
        b = f"blocks.{i}"
        state.update({
            f"{b}.norm1.weight": t(dim), f"{b}.norm1.bias": t(dim),
            f"{b}.attn.qkv.weight": t(dim * 3, dim),
            f"{b}.attn.qkv.bias": t(dim * 3),
            f"{b}.attn.proj.weight": t(dim, dim),
            f"{b}.attn.proj.bias": t(dim),
            f"{b}.ls1.gamma": t(dim),
            f"{b}.norm2.weight": t(dim), f"{b}.norm2.bias": t(dim),
            f"{b}.mlp.fc1.weight": t(dim * 4, dim),
            f"{b}.mlp.fc1.bias": t(dim * 4),
            f"{b}.mlp.fc2.weight": t(dim, dim * 4),
            f"{b}.mlp.fc2.bias": t(dim),
            f"{b}.ls2.gamma": t(dim),
        })
    return state


def test_converted_params_load_and_run():
    depth = 2
    state = _fake_dinov2_state(depth=depth)
    params = convert_dinov2_vit(state, depth=depth)
    vit = ViTS14(depth=depth)
    x = jnp.asarray(np.random.default_rng(1).random((1, 224, 224, 3),
                                                    dtype=np.float32))
    # structural check: converted tree must exactly match the module's
    # initialized tree (same names, same shapes)
    ref = vit.init(jax.random.PRNGKey(0), x)["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes
    out = vit.apply({"params": params}, x)
    assert out["x_norm_patchtokens"].shape == (1, 256, 384)
    assert np.isfinite(np.asarray(out["x_norm_patchtokens"])).all()


def test_pos_embed_interpolation_matches_dinov2_convention():
    """interpolate_pos_embed must equal DINOv2's interpolate_pos_encoding:
    bicubic with scale_factor=(16+0.1)/37, antialias off."""
    import torch

    rng = np.random.default_rng(3)
    pos = rng.normal(0, 0.02, (1, REAL_GRID * REAL_GRID, 384)).astype(
        np.float32
    )
    got = interpolate_pos_embed(pos, 16)
    assert got.shape == (1, 256, 384)

    t = torch.from_numpy(pos.reshape(1, REAL_GRID, REAL_GRID, 384)).permute(
        0, 3, 1, 2
    )
    want = torch.nn.functional.interpolate(
        t, scale_factor=(16.1 / REAL_GRID,) * 2, mode="bicubic",
        antialias=False,
    ).permute(0, 2, 3, 1).reshape(1, 256, 384).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_pos_embed_same_grid_passthrough():
    pos = np.random.default_rng(4).normal(size=(1, 256, 8)).astype(np.float32)
    np.testing.assert_array_equal(interpolate_pos_embed(pos, 16), pos)


def test_qkv_transpose_semantics():
    """torch Linear(y = x W^T + b) == flax Dense with kernel = W.T."""
    import torch

    rng = np.random.default_rng(2)
    w = rng.normal(size=(8, 4)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    x = rng.normal(size=(3, 4)).astype(np.float32)
    torch_out = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b)
    ).numpy()
    flax_out = x @ w.T + b
    np.testing.assert_allclose(torch_out, flax_out, rtol=1e-5, atol=1e-6)
