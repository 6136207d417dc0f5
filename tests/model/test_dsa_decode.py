"""Indexer-aware DSA decode (GLM-5.2 / DeepSeek V3.2 family).

Before round 3 the dense engine decoded DSA models with FULL MLA attention
(no indexer): fine while the context fits in index_top_k, silently
off-distribution beyond it. `dsa_cached_forward` scores the lightning
indexer per step over the cached indexer keys (packed after the latent in
cache_k), narrows attention to the top-k tokens, and must reproduce the
TRAINING forward's sparse pattern exactly — the test drives the context
well past index_top_k. The paged engine packs the same layout per block.
"""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.generate import GenerateConfig, generate
from xtuner_tpu.model.glm import GLMConfig
from xtuner_tpu.model.paged_generate import PagedGenerator, paged_eligible
from xtuner_tpu.module.dsa import DSAConfig
from xtuner_tpu.module.params import init_params
from xtuner_tpu.module.router import NoAuxRouterConfig


def _tiny_glm52():
    return GLMConfig(
        vocab_size=160, num_hidden_layers=3, first_k_dense_replace=1,
        hidden_size=32, intermediate_size=48, moe_intermediate_size=16,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        eos_token_id=150,
        router=NoAuxRouterConfig(scoring_func="sigmoid", norm_topk_prob=True,
                                 routed_scaling_factor=2.5),
        attention=DSAConfig(num_attention_heads=4, q_lora_rank=16, kv_lora_rank=16,
                            qk_nope_head_dim=8, qk_rope_head_dim=4, v_head_dim=8,
                            index_n_heads=2, index_head_dim=8, index_top_k=8),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )


def _setup(seed=0):
    cfg = _tiny_glm52()
    model = cfg.build()
    params = init_params(model.param_specs(), jax.random.key(seed))
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
    return cfg, model, params


def test_dsa_decode_matches_training_forward_beyond_topk():
    """Greedy decode == argmax of the training forward replayed over the
    generated sequence, with context length (12 prompt + 10 new) well past
    index_top_k=8 — i.e. decode follows the SPARSE training distribution."""
    cfg, model, params = _setup()
    prompt = [(3 + 7 * i) % 149 + 1 for i in range(12)]
    g = GenerateConfig(max_new_tokens=10, do_sample=False, temperature=0.0,
                       eos_token_id=150, max_length=64)
    out = generate(model, params, np.asarray([prompt], np.int32), g,
                   compute_dtype=jnp.float32, pad_token_id=0)
    seq = out["sequences"][0]
    ctx = SequenceContext.from_input_ids(seq[None, :].astype(np.int32))
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32, remat="none")
    logits = np.asarray(hidden @ model.lm_head_weight(params))
    stop = (list(seq).index(150) + 1 if 150 in list(seq[12:]) else len(seq))
    checked = 0
    for t in range(12, stop):
        pred = int(np.argmax(logits[0, t - 1]))
        assert pred == int(seq[t]), f"sparse decode drift at position {t}"
        checked += 1
    assert checked >= 5  # the comparison actually ran past top_k


def test_paged_dsa_matches_dense_greedy():
    """GLM-5.2-style DSA through the paged engine == the dense engine,
    contexts past index_top_k, continuous batching with 2 slots."""
    cfg, model, params = _setup(seed=1)
    assert paged_eligible(cfg)
    g = GenerateConfig(max_new_tokens=8, do_sample=False, temperature=0.0,
                       eos_token_id=150, max_length=128,
                       paged_max_batch=2, paged_block_size=16)
    prompts = [[(5 + 3 * i) % 149 + 1 for i in range(14)],
               [(9 + 5 * i) % 149 + 1 for i in range(11)],
               [42, 43, 44, 45]]
    arr = np.zeros((3, 14), np.int32)
    for i, p in enumerate(prompts):
        arr[i, 14 - len(p):] = p
    dense = generate(model, params, arr, g, compute_dtype=jnp.float32,
                     pad_token_id=0)
    pg = PagedGenerator(model, params, g, max_batch=2, block_size=16,
                        compute_dtype=jnp.float32, pad_token_id=0)
    outs = pg.generate([{"prompt_ids": p} for p in prompts])
    for i in range(3):
        d = list(dense["generated"][i])
        if 150 in d:
            d = d[: d.index(150) + 1]
        p = outs[i]["token_ids"]
        assert p[: len(d)] == d, (i, p, d)
    pg.check_block_conservation()
    assert not pg.cache.tables  # no live sequences leak blocks
    assert pg.cache.allocator.refcount.sum() == 1  # DSA: APC off, all released
