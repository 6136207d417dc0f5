"""Qwen-VL multimodal rope: 3D position construction + frequency sectioning."""

import jax.numpy as jnp
import numpy as np

from xtuner_tpu.module.rope import build_mrope_positions, mrope_cos_sin, rope_cos_sin


def test_text_only_mrope_equals_1d_rope():
    """With identical t/h/w positions (pure text), mrope == standard rope."""
    pos1d = np.arange(16, dtype=np.int32)[None]
    pos3d = jnp.asarray(np.stack([pos1d, pos1d, pos1d]))
    cos_m, sin_m = mrope_cos_sin(pos3d, 64, 10000.0, (8, 12, 12))
    cos_r, sin_r = rope_cos_sin(jnp.asarray(pos1d), 64, 10000.0)
    np.testing.assert_allclose(np.asarray(cos_m), np.asarray(cos_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin_m), np.asarray(sin_r), rtol=1e-6)


def test_build_positions_image_grid():
    # [text, text, img(1x4x4 grid, merge 2 -> 1x2x2=4 tokens), text]
    l = 7
    ids = np.zeros(l, np.int32)
    mask = np.zeros(l, bool)
    mask[2:6] = True
    pos = build_mrope_positions(ids, mask, np.asarray([[1, 4, 4]]), spatial_merge=2)
    # text 0,1 -> positions 0,1 in all axes
    np.testing.assert_array_equal(pos[:, 0], [0, 0, 0])
    np.testing.assert_array_equal(pos[:, 1], [1, 1, 1])
    # image tokens start at cursor=2: h/w vary over the 2x2 grid, t constant
    np.testing.assert_array_equal(pos[0, 2:6], [2, 2, 2, 2])
    np.testing.assert_array_equal(pos[1, 2:6], [2, 2, 3, 3])
    np.testing.assert_array_equal(pos[2, 2:6], [2, 3, 2, 3])
    # trailing text resumes after max grid extent (cursor 2 + max(1,2,2)=2 -> 4)
    np.testing.assert_array_equal(pos[:, 6], [4, 4, 4])
