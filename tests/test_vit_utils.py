"""ViT position-embedding resize vs torch.nn.functional.interpolate."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from visualcla_tpu.models.clip_vit import _torch_bicubic_1d, extend_position_embedding


def test_bicubic_matrix_matches_torch_interpolate():
    rng = np.random.default_rng(0)
    g = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    t = torch.nn.functional.interpolate(
        torch.from_numpy(g), size=(24, 24), mode="bicubic"
    ).numpy()
    M = np.asarray(_torch_bicubic_1d(16, 24))
    ours = np.einsum("oi,bcij->bcoj", M, g)
    ours = np.einsum("oj,bcij->bcio", M, ours)
    np.testing.assert_allclose(ours, t, atol=2e-5)


def test_extend_position_embedding_shapes_and_cls():
    rng = np.random.default_rng(1)
    H = 8
    pe = rng.standard_normal((17, H)).astype(np.float32)  # 4x4 grid + CLS
    params = {"position_embedding": jnp.asarray(pe), "other": jnp.zeros(3)}
    out = extend_position_embedding(params, patch_size=14, after=14 * 8)
    assert out["position_embedding"].shape == (8 * 8 + 1, H)
    np.testing.assert_array_equal(np.asarray(out["position_embedding"][0]), pe[0])
    # identity resize returns (numerically) the same grid
    same = extend_position_embedding(params, patch_size=14, after=14 * 4)
    np.testing.assert_allclose(
        np.asarray(same["position_embedding"]), pe, atol=1e-5
    )
