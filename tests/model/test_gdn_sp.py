"""GatedDeltaNet sequence parallelism (Ulysses constraint flips).

Reference ships a dedicated 4-all-to-all SP path for GDN
(xtuner/v1/module/attention/gated_deltanet.py:25-43, forward_for_sp :188).
Ours flips the recurrence inputs seq-sharded -> head-sharded so each device
runs the full-length delta rule on Hv/sp heads: (1) the loss at sp=2 must
match sp=1, (2) the compiled HLO must contain all-to-alls and must NOT
allgather the full-sequence activations for the GDN sublayers.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.config.optim import AdamWConfig, LRConfig
from xtuner_tpu.datasets.collator import fake_collator
from xtuner_tpu.engine.train_engine import TrainEngine
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.hybrid import HybridConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.module.gated_deltanet import GatedDeltaNetConfig
from xtuner_tpu.parallel.mesh import MeshConfig, build_mesh

VOCAB = 64
SEQ = 64


def hybrid_cfg():
    return HybridConfig(
        vocab_size=VOCAB, num_hidden_layers=4, hidden_size=32,
        intermediate_size=64,
        layer_types_pattern=["linear", "linear", "linear", "full"],
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2,
                            head_dim=8),
        # conv_channels = 2*2*8 + 4*8 = 64; head counts divisible by sp=2
        linear_attention=GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2,
                                             head_k_dim=8, head_v_dim=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


def make_engine(mesh_cfg, mesh=None):
    eng = TrainEngine(hybrid_cfg(), AdamWConfig(lr=1e-3),
                      LRConfig(warmup_steps=0, lr_type="constant"),
                      mesh_cfg, total_steps=5, mesh=mesh)
    eng.init_random(0)
    return eng


def batch_of(a, b, seed=0):
    flat = fake_collator(a * b, SEQ, VOCAB, seed)
    return {k: v.reshape(a, b, SEQ) for k, v in flat.items()}


@pytest.mark.slow
def test_hybrid_sp2_matches_sp1_loss():
    """Hybrid (3 GDN : 1 full attn) train step: (fsdp=2, sp=2) == single
    device, loss and grad norm."""
    eng_sp = make_engine(MeshConfig(fsdp_size=4, sp_size=2,
                                    param_dtype="float32"))
    single_cfg = MeshConfig(fsdp_size=1, param_dtype="float32")
    eng_1 = make_engine(single_cfg,
                        mesh=build_mesh(single_cfg, jax.devices()[:1]))
    batch = batch_of(1, 4, seed=7)
    m_sp = eng_sp.train_step(batch, 1)
    m_1 = eng_1.train_step(batch, 1)
    np.testing.assert_allclose(float(m_sp["reduced_llm_loss"]),
                               float(m_1["reduced_llm_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_sp["grad_norm"]),
                               float(m_1["grad_norm"]), rtol=1e-4)


def test_gdn_sp_hlo_all_to_all_no_full_seq_allgather():
    """The compiled sp=2 forward must reshard GDN recurrence inputs with
    all-to-alls, not by allgathering full-sequence activations. We assert
    (a) >=1 all-to-all exists, (b) no all-gather output carries the
    distinctive GDN conv-channel width (2*qk_dim + v_dim) at full seq."""
    from xtuner_tpu.data_proto import SequenceContext
    from xtuner_tpu.loss.ce_loss import IGNORE_IDX
    from xtuner_tpu.module.params import init_params, param_shardings
    from xtuner_tpu.parallel.sharding import ShardCtx

    cfg = hybrid_cfg()
    model = cfg.build()
    mesh_cfg = MeshConfig(fsdp_size=2, sp_size=2, param_dtype="float32")
    mesh = build_mesh(mesh_cfg, jax.devices()[:4])
    rules = mesh_cfg.rules()
    sc = ShardCtx(mesh, rules)
    specs = model.param_specs()
    params = init_params(specs, jax.random.key(0))
    shardings = param_shardings(specs, mesh, rules)
    params = jax.tree.map(jax.device_put, params, shardings)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, VOCAB - 1, (2, SEQ)).astype(np.int32)
    labels = np.roll(ids, -1, 1).astype(np.int32)
    labels[:, -1] = IGNORE_IDX
    w = (labels != IGNORE_IDX).astype(np.float32)
    ctx = SequenceContext.from_input_ids(ids)

    def loss_fn(p, ids, labels, w):
        c = SequenceContext(input_ids=ids, segment_ids=ctx.segment_ids,
                            position_ids=ctx.position_ids)
        return model.loss(p, c, labels, w, jnp.sum(w), sc=sc,
                          compute_dtype=jnp.float32).total_loss()

    with mesh:
        txt = (jax.jit(loss_fn)
               .lower(params, jnp.asarray(ids), jnp.asarray(labels),
                      jnp.asarray(w))
               .compile().as_text())
    assert "all-to-all" in txt, "GDN SP flip did not lower to all-to-all"
    # conv_channels = 2*qk_dim + v_dim is unique to the GDN qkv activation
    ch = 2 * cfg.linear_attention.qk_dim + cfg.linear_attention.v_dim
    bad = [l for l in txt.splitlines()
           if "all-gather" in l and re.search(rf"\b{SEQ},{ch}\b", l)]
    assert not bad, f"full-seq allgather of GDN qkv activations:\n" + "\n".join(bad)
