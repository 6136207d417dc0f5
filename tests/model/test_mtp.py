"""MTP: shifted targets within documents, loss contributes, grads flow."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.moe import MoEConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.mtp import shift_for_mtp
from xtuner_tpu.module.params import init_params


def test_shift_for_mtp_respects_doc_boundaries():
    ids = jnp.asarray([[1, 2, 3, 4, 5, 0]])
    seg = jnp.asarray([[1, 1, 1, 2, 2, 0]])
    out = np.asarray(shift_for_mtp(ids, seg, fill=-1))
    # within doc 1: t0->2, t1->3; t2 is doc1's last -> -1 (next is doc2)
    np.testing.assert_array_equal(out[0], [2, 3, -1, 5, -1, -1])


@pytest.mark.slow
def test_mtp_loss_and_grads():
    cfg = MoEConfig(
        vocab_size=128, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
        mtp_num_layers=1, mtp_loss_coef=0.3,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(0))
    assert "mtp_layers" in params
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, (2, 32)).astype(np.int32)
    ctx = SequenceContext(
        input_ids=jnp.asarray(ids), segment_ids=jnp.ones((2, 32), jnp.int32),
        position_ids=jnp.tile(jnp.arange(32, dtype=jnp.int32), (2, 1)))
    labels = np.roll(ids, -1, 1); labels[:, -1] = -100
    weights = (labels != -100).astype(np.float32)

    def f(p):
        out = model.loss(p, ctx, jnp.asarray(labels), jnp.asarray(weights),
                         jnp.sum(weights), compute_dtype=jnp.float32)
        return out.total_loss(), out

    (loss, out), grads = jax.value_and_grad(f, has_aux=True)(params)
    assert np.isfinite(float(loss))
    assert float(out.mtp_loss) > 0
    g = grads["mtp_layers"]["proj"]["w"]
    assert float(jnp.abs(g).sum()) > 0
    g_layer = grads["mtp_layers"]["experts"]["gate_proj"]
    assert np.isfinite(np.asarray(g_layer)).all()
