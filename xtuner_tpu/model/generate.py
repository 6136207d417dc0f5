"""Batch text generation with a KV cache (engine-native inference).

Reference: GenerateConfig (xtuner/v1/config/generate.py) + the MHA
prefill/decode paths used for engine-native generation and RL tests
(SURVEY.md §3.5). TPU design: the KV cache is a stacked (n_layers, B, S, Hkv, D)
pytree threaded through the same `lax.scan` as training; decode is a
`lax.scan` over steps — one compiled program for the whole generation.
Works for Dense and MoE models (layer type dispatched by param keys).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from ..module.attention import mha_cached_forward
from ..module.mlp import mlp_forward
from ..module.params import cast_tree
from ..module.rope import _rope_dim, rope_cos_sin
from ..ops.rms_norm import rms_norm


class GenerateConfig(BaseModel):
    """Sampling + engine config (reference config/generate.py GenerateConfig
    + data_proto/rl_data.py SampleParams surface)."""

    model_config = ConfigDict(extra="forbid")
    max_new_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = 0  # 0 = disabled
    do_sample: bool = True
    eos_token_id: Optional[int] = None
    max_length: int = 2048  # cache size (prompt + generation)
    # SampleParams parity (reference rl_data.py:25-45)
    repetition_penalty: float = 1.0  # >1 discourages any already-seen token
    presence_penalty: float = 0.0  # additive, fires once per seen token
    frequency_penalty: float = 0.0  # additive, scales with occurrence count
    min_tokens: int = 0  # suppress eos/stop ids for the first N new tokens
    stop_token_ids: list[int] = []  # extra terminators beyond eos
    logit_bias: dict[int, float] = {}  # OpenAI logit_bias: token id -> bias
    top_logprobs: int = 0  # also return the top-K alternatives per position
    # rollout engine: "auto" = paged continuous batching when the attention
    # variant supports it (model/paged_generate.py), else the dense cache
    engine: str = "auto"  # auto | dense | paged
    # automatic prefix caching (paged engine): finished sequences retain
    # their block-aligned KV under content hashes; new prompts sharing that
    # prefix (multi-turn chat, common system prompts) skip its prefill
    # FLOPs. Exact reuse — KV depends only on (params, tokens, positions).
    # Auto-disabled for hybrid-GDN / MTP-speculative / DSA / routing-record.
    prefix_cache: bool = True
    paged_max_batch: int = 8  # decode slots (compiled once)
    paged_block_size: int = 128
    # chunked prefill (paged engine): process prompts in `prefill_chunk`-
    # token chunks, one per engine tick, so a long prompt never head-of-
    # line-blocks in-flight decodes. 0 = whole-bucket prefill. Dense/MoE
    # non-spec engines only (hybrid/spec/routing-record fall back).
    prefill_chunk: int = 0
    # "int8": quantized paged KV (per-token-per-head absmax scales packed
    # into the pool rows, kv_cache.py pack_kv_int8) — ~2x cache capacity and
    # half the pool-read bandwidth; paged engine only
    kv_cache_dtype: str = "bf16"  # bf16 | int8
    # MTP self-speculative decode (paged engine, mtp_num_layers >= 1 models):
    # the MTP head drafts token t+2, the next step verifies draft+commits up
    # to 2 tokens — exact (greedy: argmax match; sampling: Leviathan
    # accept/reject), ~1/(1+accept_rate) decode steps per token
    mtp_speculative: bool = False


def _layer_cached(model, lp, cfg, x, cos, sin, cache_k, cache_v, cache_len,
                  compute_dtype, kv_mask=None, window=None):
    lp = cast_tree(lp, compute_dtype)
    zero_c = cfg.rms_norm_type == "zero_centered"
    lora_s = cfg.lora_cfg.scaling if cfg.lora_cfg else 1.0
    h = rms_norm(x, lp["input_norm"], cfg.rms_norm_eps, zero_c)
    from ..module.dsa import DSAConfig, dsa_cached_forward
    from ..module.mla import MLAConfig, mla_cached_forward

    if isinstance(cfg.attention, DSAConfig):
        # indexer-aware sparse decode: cache_k packs latent ‖ indexer key
        h, cache_k, cache_v = dsa_cached_forward(
            lp["attn"], cfg.attention, h, cos, sin, cache_k, cache_v, cache_len,
            rope_scaling=cfg.rope_scaling_cfg, kv_mask=kv_mask)
    elif isinstance(cfg.attention, MLAConfig):
        # compressed-KV decode: caches hold the latent + shared rope key
        h, cache_k, cache_v = mla_cached_forward(
            lp["attn"], cfg.attention, h, cos, sin, cache_k, cache_v, cache_len,
            rope_scaling=cfg.rope_scaling_cfg, kv_mask=kv_mask)
    else:
        h, cache_k, cache_v = mha_cached_forward(
            lp["attn"], cfg.attention, h, cos, sin, cache_k, cache_v, cache_len,
            window=window, lora_scaling=lora_s, kv_mask=kv_mask)
    x = x + h
    h = rms_norm(x, lp["post_attn_norm"], cfg.rms_norm_eps, zero_c)
    routing = None
    if "experts" in lp:
        from ..module.moe_layer import moe_mlp_forward

        moe_out, r, _ = moe_mlp_forward(
            lp["experts"], lp["router"], cfg.router, h,
            num_experts=cfg.n_routed_experts, top_k=cfg.num_experts_per_tok,
            act=cfg.hidden_act, compute_dtype=compute_dtype)
        # (B, C, K) expert assignment — R3 rollout-routing record
        routing = r.topk_idx.reshape(h.shape[0], h.shape[1], -1)
        if "shared_experts" in lp:
            moe_out = moe_out + mlp_forward(lp["shared_experts"], h, cfg.hidden_act)
        h = moe_out
    else:
        h = mlp_forward(lp["mlp"], h, cfg.hidden_act, lora_scaling=lora_s)
    return x + h, cache_k, cache_v, routing


def _stacks(model, params):
    """[(stack_name, layer_params_stacked), ...] in forward order."""
    out = []
    for key in ("dense_layers", "layers", "moe_layers"):
        if key in params:
            out.append((key, params[key]))
    if not out and not hasattr(model, "forward_cached"):
        # fail LOUDLY: silently decoding zero layers produced plausible-but-
        # wrong rollouts for pattern-stacked models before round 3
        raise ValueError(
            f"{type(model).__name__} has no recognized layer stacks "
            f"(params keys: {sorted(params)}) and no forward_cached hook — "
            f"generation would silently skip every layer")
    return out


def _layer_windows_py(cfg, stack_name: str, n_layers: int) -> list:
    """Per-layer sliding window as python ints; 0 = full attention.

    GPT-OSS-style `layer_window_pattern` (moe.py:207-224) alternates
    sliding/full across the MoE stack; training honors it, so decode must
    too — a sliding layer attending the whole cache drifts off-policy as
    soon as the context exceeds the window."""
    pattern = getattr(cfg, "layer_window_pattern", None)
    if stack_name == "moe_layers" and pattern:
        return [int(pattern[i % len(pattern)] or 0) for i in range(n_layers)]
    w = cfg.sliding_window if cfg.use_sliding_window else None
    return [0 if w is None else int(w)] * n_layers


def _layer_windows(cfg, stack_name: str, n_layers: int):
    """(n_layers,) int32 version of `_layer_windows_py` (scan xs)."""
    return jnp.asarray(_layer_windows_py(cfg, stack_name, n_layers), jnp.int32)


def init_cache(model, batch_size: int, max_length: int, dtype=jnp.bfloat16):
    cfg = model.cfg
    attn = cfg.attention
    from ..module.mla import MLAConfig

    if isinstance(attn, MLAConfig):
        # compressed-KV: latent (rank) + shared rope key per position —
        # kv_lora_rank+rope_dim dims vs nh*(dn+dv) materialized (mla.py:83-123).
        # DSA additionally packs the per-token lightning-indexer key into the
        # latent cache (dsa.py:dsa_cached_forward)
        from ..module.dsa import DSAConfig

        extra = attn.index_head_dim if isinstance(attn, DSAConfig) else 0
        shape_k = (batch_size, max_length, 1, attn.kv_lora_rank + extra)
        shape_v = (batch_size, max_length, 1, attn.qk_rope_head_dim)
    else:
        shape_k = shape_v = (batch_size, max_length, attn.num_key_value_heads, attn.head_dim)
    caches = []
    for _name, stack in _stacks(model, model.param_specs()):
        n = jax.tree.leaves(stack, is_leaf=lambda x: hasattr(x, "shape"))[0].shape[0]
        caches.append((jnp.zeros((n, *shape_k), dtype), jnp.zeros((n, *shape_v), dtype)))
    return caches


def _forward_cached(model, params, ids, positions, caches, cache_len, compute_dtype,
                    kv_mask=None, record_routing: bool = False,
                    with_hidden: bool = False):
    """ids: (B, C) -> (logits (B, C, V), new caches, routing or None).

    routing: (B, C, nL_moe, K) int32 per-layer expert assignment of the MoE
    stacks (R3 rollout-routing record, reference rollout/worker.py:784).
    with_hidden: additionally return the PRE-final-norm trunk hidden
    (B, C, H) — MTP drafting fuses it with next-token embeddings."""
    cfg = model.cfg
    x = jnp.take(params["embed"]["w"], ids, axis=0).astype(compute_dtype)
    cos, sin = rope_cos_sin(positions, _rope_dim(cfg.attention), cfg.rope_theta,
                            cfg.rope_scaling_cfg, cfg.max_position_embeddings)
    new_caches = []
    routings = []
    for (name, stack), (ck, cv) in zip(_stacks(model, params), caches):
        windows = _layer_windows(cfg, name, ck.shape[0])

        def body(x, xs):
            lp, ck_l, cv_l, win = xs
            x, ck_l, cv_l, routing = _layer_cached(model, lp, cfg, x, cos, sin, ck_l, cv_l,
                                                   cache_len, compute_dtype, kv_mask,
                                                   window=win)
            ys = (ck_l, cv_l) if (routing is None or not record_routing) \
                else (ck_l, cv_l, routing)
            return x, ys

        x, ys = jax.lax.scan(body, x, (stack, ck, cv, windows))
        new_caches.append((ys[0], ys[1]))
        if len(ys) == 3 and record_routing:
            routings.append(ys[2])  # (nL, B, C, K)
    trunk = x
    x = rms_norm(x, params["final_norm"].astype(jnp.float32), cfg.rms_norm_eps,
                 cfg.rms_norm_type == "zero_centered")
    logits = jnp.dot(x.astype(compute_dtype), model.lm_head_weight(params).astype(compute_dtype),
                     preferred_element_type=jnp.float32)
    routing = None
    if routings:
        routing = jnp.transpose(jnp.concatenate(routings, axis=0), (1, 2, 0, 3))
    if with_hidden:
        return logits, new_caches, routing, trunk
    return logits, new_caches, routing


def penalties_active(gen_cfg: GenerateConfig) -> bool:
    return (gen_cfg.repetition_penalty != 1.0 or gen_cfg.presence_penalty != 0.0
            or gen_cfg.frequency_penalty != 0.0)


def _apply_penalties(logits, gen_cfg: GenerateConfig, seen, gen_counts):
    """seen: (B, V) bool — token appeared in prompt or generation;
    gen_counts: (B, V) int32 — occurrences among GENERATED tokens only
    (OpenAI presence/frequency semantics; repetition penalty spans the full
    context like the serving engines the reference wraps)."""
    if gen_cfg.repetition_penalty != 1.0 and seen is not None:
        rp = gen_cfg.repetition_penalty
        penalized = jnp.where(logits > 0, logits / rp, logits * rp)
        logits = jnp.where(seen, penalized, logits)
    if gen_counts is not None and (gen_cfg.presence_penalty != 0.0
                                   or gen_cfg.frequency_penalty != 0.0):
        counts = gen_counts.astype(jnp.float32)
        logits = logits - gen_cfg.presence_penalty * (counts > 0) \
            - gen_cfg.frequency_penalty * counts
    return logits


def _suppress_stops(logits, gen_cfg: GenerateConfig, n_generated, eos):
    """min_tokens: terminators are unreachable for the first N new tokens."""
    if gen_cfg.min_tokens <= 0:
        return logits
    ids = [eos] + [t for t in gen_cfg.stop_token_ids if t != eos]
    blocked = jnp.zeros((logits.shape[-1],), bool)
    for t in ids:
        if t is not None:
            blocked = blocked.at[t].set(True)
    return jnp.where(blocked[None, :] & (n_generated < gen_cfg.min_tokens),
                     -jnp.inf, logits)


def _sample(logits, rng, gen_cfg: GenerateConfig, seen=None, gen_counts=None,
            n_generated=None, eos=None):
    """logits (B, V) fp32 -> token ids (B,)."""
    if gen_cfg.logit_bias:
        ids = jnp.asarray(list(gen_cfg.logit_bias.keys()), jnp.int32)
        vals = jnp.asarray(list(gen_cfg.logit_bias.values()), logits.dtype)
        logits = logits.at[:, ids].add(vals)
    logits = _apply_penalties(logits, gen_cfg, seen, gen_counts)
    if n_generated is not None and eos is not None:
        logits = _suppress_stops(logits, gen_cfg, n_generated, eos)
    if not gen_cfg.do_sample or gen_cfg.temperature == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(rng, _filter_logits(logits, gen_cfg)).astype(jnp.int32)


def _filter_logits(logits, gen_cfg: GenerateConfig):
    """Temperature/top-k/top-p filtered logits — log of the (unnormalized)
    SAMPLING distribution. Shared by _sample and speculative accept/reject
    (the spec target/draft distributions must be the filtered ones)."""
    logits = logits / gen_cfg.temperature
    if gen_cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[:, -gen_cfg.top_k][:, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if gen_cfg.top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < gen_cfg.top_p, axis=-1)
        cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        logits = jnp.where(logits < cutoff, -jnp.inf, logits)
    return logits


def generate(model, params, prompt_ids: np.ndarray, gen_cfg: GenerateConfig,
             rng=None, compute_dtype=jnp.bfloat16, pad_token_id: int = 0,
             return_logprobs: bool = False, record_routing: bool = False,
             prompt_group_size: int = 1):
    """prompt_ids: (B, P) int32, left-padded with pad_token_id.

    Returns dict with `sequences` (B, P+N), `num_generated`, and optionally
    per-step `logprobs` (B, N) of the sampled tokens (RL rollout needs them).
    record_routing (MoE only): adds `routed_experts` (B, N, nL_moe, K) — the
    expert assignment of the forward step that SAMPLED each token, i.e.
    routing of input position p+j-1 for response token j, which is exactly
    the position token j occupies as a training input (R3 replay).
    prompt_group_size g > 1: rows come in groups of g IDENTICAL prompts (GRPO
    rollout); prefill runs once per unique prompt (B/g rows) and the prompt
    KV is tiled across the group — the prefix-sharing compute win without
    paging (cf. module/kv_cache.py for the paged memory analog).
    """
    cfg = model.cfg
    rng = rng if rng is not None else jax.random.key(0)
    prompt_ids = jnp.asarray(prompt_ids, jnp.int32)
    b, p = prompt_ids.shape
    n_new = gen_cfg.max_new_tokens
    max_len = p + n_new
    eos = gen_cfg.eos_token_id if gen_cfg.eos_token_id is not None else cfg.eos_token_id

    g = prompt_group_size
    assert b % max(g, 1) == 0
    b_u = b // g if g > 1 else b
    # models with heterogeneous layer caches (hybrid GDN: recurrent state +
    # conv buffer instead of KV) provide their own decode hooks
    if hasattr(model, "forward_cached"):
        caches = model.init_decode_cache(b_u, max_len, compute_dtype)
        fwd_cached = lambda params, ids_, pos_, caches_, clen, kvm, rec: \
            model.forward_cached(params, ids_, pos_, caches_, clen,
                                 compute_dtype, kv_mask=kvm, record_routing=rec)
    else:
        caches = init_cache(model, b_u, max_len, compute_dtype)
        fwd_cached = lambda params, ids_, pos_, caches_, clen, kvm, rec: \
            _forward_cached(model, params, ids_, pos_, caches_, clen,
                            compute_dtype, kvm, rec)
    prompt_mask = prompt_ids != pad_token_id
    positions = jnp.maximum(jnp.cumsum(prompt_mask, axis=1) - 1, 0).astype(jnp.int32)

    kv_mask0 = jnp.concatenate([prompt_mask, jnp.zeros((b, n_new), bool)], axis=1)

    # Decode is a jitted SINGLE step driven by a host loop (donated caches) —
    # a scan-of-steps around the scan-of-layers compiles pathologically slowly,
    # while one step compiles in ~1s and the host loop adds only dispatch
    # latency per token.
    # penalty/min-token state rides the loop only when configured (extra
    # (B, V) arrays otherwise skipped; the jit cache keys on the config)
    use_pen = penalties_active(gen_cfg)
    use_min = gen_cfg.min_tokens > 0
    stop_ids = set([eos] + list(gen_cfg.stop_token_ids)) - {None}

    def prefill(params, prompt_ids, positions, kv_mask0, caches, rng):
        logits, caches, routing = fwd_cached(params, prompt_ids, positions,
                                             caches, jnp.int32(0), kv_mask0,
                                             record_routing)
        last = logits[:, -1]
        rout = routing[:, -1] if routing is not None else None  # (B_u, nL, K)
        if g > 1:
            # tile the shared prompt KV / logits across the rollout group
            caches = jax.tree.map(lambda a: jnp.repeat(a, g, axis=1), caches)
            last = jnp.repeat(last, g, axis=0)
            rout = jnp.repeat(rout, g, axis=0) if rout is not None else None
        seen = gen_counts = None
        if use_pen:
            v = last.shape[-1]
            rows = jnp.arange(b)[:, None]
            ids_full = prompt_ids if g == 1 else jnp.repeat(prompt_ids, g, axis=0)
            mask_full = ids_full != pad_token_id
            seen = (jnp.zeros((b, v), jnp.float32)
                    .at[rows, ids_full].add(mask_full.astype(jnp.float32)) > 0)
            gen_counts = jnp.zeros((b, v), jnp.int32)
        next_tok = _sample(last, rng, gen_cfg, seen, gen_counts,
                           n_generated=jnp.int32(0) if use_min else None, eos=eos)
        lps_full = jax.nn.log_softmax(last, axis=-1)
        lp = jnp.take_along_axis(lps_full, next_tok[:, None], axis=-1)[:, 0]
        top = (jax.lax.top_k(lps_full, gen_cfg.top_logprobs)
               if gen_cfg.top_logprobs > 0 else None)
        return next_tok, lp, caches, rout, seen, gen_counts, top

    def decode_step(params, tok, pos, cache_len, kv_mask0, caches, rng, done,
                    seen, gen_counts):
        # unmask only the GENERATED slots [p, cache_len]; `< cache_len + 1`
        # alone would re-enable the left-pad slots that kv_mask0 masked out,
        # making generated tokens attend to pad KV written during prefill
        # (diverges from the unpadded run at ~10 pads)
        slots = jnp.arange(max_len)[None, :]
        kv_mask = kv_mask0 | ((slots >= p) & (slots < cache_len + 1))
        logits, caches, routing = fwd_cached(params, tok[:, None], pos[:, None],
                                             caches, cache_len, kv_mask,
                                             record_routing)
        last = logits[:, -1]
        if use_pen:
            rows = jnp.arange(b)
            live = (~done).astype(jnp.int32)
            gen_counts = gen_counts.at[rows, tok].add(live)
            seen = seen | (jnp.zeros_like(seen).at[rows, tok].set(True)
                           & (~done)[:, None])
        n_gen = (cache_len - p + 1) if use_min else None
        new_tok = _sample(last, rng, gen_cfg, seen, gen_counts,
                          n_generated=n_gen, eos=eos)
        lps_full = jax.nn.log_softmax(last, axis=-1)
        lp = jnp.take_along_axis(lps_full, new_tok[:, None], axis=-1)[:, 0]
        top = (jax.lax.top_k(lps_full, gen_cfg.top_logprobs)
               if gen_cfg.top_logprobs > 0 else None)
        new_done = done
        for t in stop_ids:
            new_done = new_done | (tok == t)
        new_tok = jnp.where(new_done, eos, new_tok)
        rout = routing[:, 0] if routing is not None else None
        return new_tok, lp, caches, new_done, rout, seen, gen_counts, top

    cache_key = (b, p, n_new, eos, pad_token_id, str(compute_dtype), record_routing,
                 g, gen_cfg.model_dump_json())
    jit_cache = getattr(model, "_gen_jit_cache", None)
    if jit_cache is None:
        jit_cache = model._gen_jit_cache = {}
    if cache_key not in jit_cache:
        jit_cache[cache_key] = (
            jax.jit(prefill, donate_argnums=(4,)),
            jax.jit(decode_step, donate_argnums=(5,)),
        )
    prefill_fn, step_fn = jit_cache[cache_key]

    if g > 1:
        tok, lp, caches, rout, seen, gen_counts, top = prefill_fn(
            params, prompt_ids[::g], positions[::g], kv_mask0[::g], caches, rng)
    else:
        tok, lp, caches, rout, seen, gen_counts, top = prefill_fn(
            params, prompt_ids, positions, kv_mask0, caches, rng)
    toks_list, lps_list, rout_list, top_list = [tok], [lp], [rout], [top]
    done = jnp.zeros(b, bool)
    pos = positions[:, -1]
    for i in range(n_new - 1):
        rng, step_rng = jax.random.split(rng)
        new_tok, lp, caches, done, rout, seen, gen_counts, top = step_fn(
            params, tok, pos + 1, jnp.int32(p + i), kv_mask0, caches, step_rng,
            done, seen, gen_counts)
        toks_list.append(new_tok)
        lps_list.append(lp)
        rout_list.append(rout)
        top_list.append(top)
        tok, pos = new_tok, pos + 1
    toks = jnp.stack(toks_list, axis=1)  # (B, N)
    lps = jnp.stack(lps_list, axis=1)
    sequences = jnp.concatenate([prompt_ids, toks], axis=1)
    out = {"sequences": np.asarray(sequences), "generated": np.asarray(toks),
           "num_generated": n_new}
    if return_logprobs:
        out["logprobs"] = np.asarray(lps)
    if gen_cfg.top_logprobs > 0:
        # (B, N, K): the K best alternatives' logprobs + ids per position
        out["top_logprobs"] = np.asarray(jnp.stack([t[0] for t in top_list], axis=1))
        out["top_logprob_ids"] = np.asarray(jnp.stack([t[1] for t in top_list], axis=1))
    if record_routing and rout_list[0] is not None:
        out["routed_experts"] = np.asarray(jnp.stack(rout_list, axis=1))  # (B, N, nL, K)
    return out
