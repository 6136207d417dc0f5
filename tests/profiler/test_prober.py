"""Prober: tensor taps fire only when active, record stats, detect NaNs."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.profiler.prober import Prober, probe


def test_probe_noop_when_inactive():
    x = jnp.ones((4,))
    assert probe("anything", x) is x


def test_prober_records_moe_points(tmp_path):
    cfg = MoEConfig(
        vocab_size=64, num_hidden_layers=1, hidden_size=16, intermediate_size=32,
        moe_intermediate_size=16, n_routed_experts=4, num_experts_per_tok=2,
        attention=MHAConfig(num_attention_heads=2, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    ids = np.random.default_rng(0).integers(1, 64, (1, 16)).astype(np.int32)
    ctx = SequenceContext.from_input_ids(ids)

    with Prober(tmp_path, points=["after_moe_gate", "after_combine"],
                save_arrays=False) as p:
        model.forward(params, ctx, compute_dtype=jnp.float32)
        jax.effects_barrier()
    stats = p.summary()
    assert "after_moe_gate" in stats
    assert "after_combine" in stats
    assert not stats["after_moe_gate"]["has_nan"]
    assert stats["after_moe_gate"]["shape"] == [16, 4]
