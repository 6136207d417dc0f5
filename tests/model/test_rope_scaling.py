"""RoPE scaling variants vs the HF rope-init functions (the reference
delegates to transformers ROPE_INIT_FUNCTIONS — rope.py:319-338)."""

import math
import types

import numpy as np

from xtuner_tpu.module.rope import RopeScalingConfig, compute_inv_freq_and_scale


def _hf_longrope(head_dim, theta, short, long, max_pos, orig):
    from transformers.modeling_rope_utils import _compute_longrope_parameters

    cfg = types.SimpleNamespace(
        rope_theta=theta,
        head_dim=head_dim,
        hidden_size=head_dim * 4,
        num_attention_heads=4,
        max_position_embeddings=max_pos,
        original_max_position_embeddings=orig,
        rope_scaling={"short_factor": short, "long_factor": long},
    )
    inv, att = _compute_longrope_parameters(cfg, "cpu", seq_len=max_pos)
    return np.asarray(inv), att


def test_longrope_matches_hf():
    head_dim, theta = 32, 10000.0
    rng = np.random.default_rng(0)
    short = (1.0 + rng.random(head_dim // 2)).tolist()
    long = (2.0 + rng.random(head_dim // 2)).tolist()
    max_pos, orig = 131072, 4096

    hf_inv, hf_att = _hf_longrope(head_dim, theta, short, long, max_pos, orig)
    ours_inv, ours_att = compute_inv_freq_and_scale(
        head_dim, theta,
        RopeScalingConfig(rope_type="longrope", short_factor=short, long_factor=long,
                          original_max_position_embeddings=orig),
        max_position_embeddings=max_pos,
    )
    np.testing.assert_allclose(np.asarray(ours_inv), hf_inv, rtol=1e-6)
    assert math.isclose(ours_att, hf_att, rel_tol=1e-6)


def test_longrope_short_branch():
    """At/below the pretrained window the short factors apply, scaling 1.0."""
    head_dim, theta = 32, 10000.0
    short = [2.0] * (head_dim // 2)
    long = [8.0] * (head_dim // 2)
    base, _ = compute_inv_freq_and_scale(head_dim, theta, None)
    inv, att = compute_inv_freq_and_scale(
        head_dim, theta,
        RopeScalingConfig(rope_type="longrope", short_factor=short, long_factor=long,
                          original_max_position_embeddings=4096),
        max_position_embeddings=4096,
    )
    np.testing.assert_allclose(np.asarray(inv), np.asarray(base) / 2.0, rtol=1e-6)
    assert att == 1.0
