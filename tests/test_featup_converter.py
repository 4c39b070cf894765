"""FeatUp JBU: resampler parity with torch + checkpoint converter
structural compatibility, using the REAL FeatUp tensor layout
(``upsampler.upN.range_proj.0/.3`` convs, scalar ``range_temp`` /
``sigma_spatial``, ``fixup_proj.1`` conv)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_qa_tpu.compat.torch_featup import convert_featup_jbu
from nerf_qa_tpu.models.nr.featup import JBU, JBUStack
from nerf_qa_tpu.ops.resize import adaptive_avg_pool, resize_bicubic

DIM = 64  # small feat_dim for test speed (real dinov2 is 384)


def _fake_featup_upsampler_state(dim=DIM, key_dim=32, guidance_dim=3,
                                 prefix="upsampler."):
    rng = np.random.default_rng(0)

    def t(*shape):
        if not shape:
            return np.float32(rng.normal(0, 0.5))
        return rng.normal(0, 0.1, shape).astype(np.float32)

    state = {}
    for i in range(1, 5):
        u = f"{prefix}up{i}"
        state.update({
            f"{u}.range_temp": t(),
            f"{u}.sigma_spatial": np.float32(1.0 + abs(t())),
            f"{u}.range_proj.0.weight": t(key_dim, guidance_dim, 1, 1),
            f"{u}.range_proj.0.bias": t(key_dim),
            f"{u}.range_proj.3.weight": t(key_dim, key_dim, 1, 1),
            f"{u}.range_proj.3.bias": t(key_dim),
        })
    state[f"{prefix}fixup_proj.1.weight"] = t(dim, dim, 1, 1)
    state[f"{prefix}fixup_proj.1.bias"] = t(dim)
    return state


def test_bicubic_matches_torch():
    import torch

    x = np.random.default_rng(1).random((2, 16, 16, 5), dtype=np.float32)
    got = np.asarray(resize_bicubic(jnp.asarray(x), 32, 32))
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=(32, 32),
        mode="bicubic", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_adaptive_avg_pool_matches_torch():
    import torch

    x = np.random.default_rng(2).random((2, 224, 224, 3), dtype=np.float32)
    for out in (32, 64, 256):  # divisor, non-divisor, upsample
        got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out, out))
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), (out, out)
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"out={out}")


def test_converted_params_load_and_run():
    state = _fake_featup_upsampler_state()
    params = convert_featup_jbu(state)
    stack = JBUStack(dim=DIM)
    feats = jnp.asarray(
        np.random.default_rng(3).random((1, 8, 8, DIM), dtype=np.float32)
    )
    image = jnp.asarray(
        np.random.default_rng(4).random((1, 112, 112, 3), dtype=np.float32)
    )
    ref = stack.init(jax.random.PRNGKey(0), feats, image)["params"]
    ref_shapes = jax.tree_util.tree_map(lambda a: a.shape, ref)
    got_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params)
    assert jax.tree_util.tree_structure(ref_shapes) == \
        jax.tree_util.tree_structure(got_shapes)
    assert ref_shapes == got_shapes
    levels = stack.apply({"params": params}, feats, image)
    assert len(levels) == 6
    sizes = [lv.shape[1] for lv in levels]
    assert sizes == [8, 16, 32, 64, 128, 128]
    for lv in levels:
        assert np.isfinite(np.asarray(lv)).all()


def test_converter_accepts_unprefixed_keys():
    state = _fake_featup_upsampler_state(prefix="")
    params = convert_featup_jbu(state)
    assert set(params) == {"up1", "up2", "up3", "up4", "fixup_proj"}


def test_jbu_uniform_guidance_reduces_to_spatial_gaussian():
    """With constant guidance the range kernel is uniform, so JBU must act
    as a fixed spatial Gaussian filter of the bicubic upsample: output
    equals filtering with the normalized spatial kernel."""
    rng = np.random.default_rng(5)
    src = rng.random((1, 8, 8, 4), dtype=np.float32)
    guide = np.ones((1, 16, 16, 3), np.float32) * 0.5
    jbu = JBU(dim=4)
    params = jbu.init(jax.random.PRNGKey(0), jnp.asarray(src),
                      jnp.asarray(guide))["params"]
    out = np.asarray(
        jbu.apply({"params": params}, jnp.asarray(src), jnp.asarray(guide))
    )

    # hand-rolled: normalized spatial Gaussian over the 7x7 neighborhood
    hr = np.asarray(resize_bicubic(jnp.asarray(src), 16, 16))
    r, d = 3, 7
    offs = np.linspace(-1, 1, d, dtype=np.float32)
    sq = offs[:, None] ** 2 + offs[None, :] ** 2
    sigma = float(params["sigma_spatial"])
    k = np.exp(-sq / (2 * sigma**2))
    k = k / k.sum()
    pad = np.pad(hr, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    want = np.zeros_like(hr)
    for dy in range(d):
        for dx in range(d):
            want += k[dy, dx] * pad[:, dy:dy + 16, dx:dx + 16]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
