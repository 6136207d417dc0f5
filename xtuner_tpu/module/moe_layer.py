"""MoE decoder-layer building blocks: expert MLP + dispatch pipeline.

Reference: xtuner/v1/module/decoder_layer/moe_decoder_layer.py (6-phase
dispatcher pipeline, intra-layer micro-batch interleaving, comm/compute event
sync) + grouped_linear/moe_group_linear.py. TPU redesign: the whole pipeline
is permute -> ragged grouped GEMMs -> weighted scatter-add combine; XLA's
latency-hiding scheduler overlaps the EP collectives that GSPMD inserts, so
the reference's cuda-event choreography has no analog here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.act_fn import get_act_fn, swiglu_clipped
from ..ops.moe import grouped_gemm, permute, unpermute
from .params import ParamSpec
from .router import RouterConfig, RouterOutput, route


def expert_mlp_param_specs(hidden_size: int, moe_intermediate_size: int,
                           num_experts: int, init_scale: float = 0.02) -> dict:
    """Per-expert fused weights, expert dim sharded over ep, hidden over fsdp
    (reference: GroupedLinear Shard(0) on ep_mesh, moe_group_linear.py:12-50)."""
    e, h, f = num_experts, hidden_size, moe_intermediate_size
    return {
        "gate_proj": ParamSpec((e, h, f), ("experts", "expert_in", "expert_out"), scale=init_scale),
        "up_proj": ParamSpec((e, h, f), ("experts", "expert_in", "expert_out"), scale=init_scale),
        "down_proj": ParamSpec((e, f, h), ("experts", "expert_out", "expert_in"), scale=init_scale),
    }


def moe_mlp_forward(p: dict, router_p: dict, router_cfg: RouterConfig,
                    x, *, num_experts: int, top_k: int, act: str = "silu",
                    compute_dtype=jnp.bfloat16, dispatcher: str = "gspmd", sc=None,
                    forced_topk_idx=None, fp8_cfg=None,
                    gemm_impl: str = "ragged_dot"):
    """x: (B, L, H) -> (out (B, L, H), RouterOutput, expert_load (E,)).

    Dropless: every routed token is computed (no capacity factor).
    dispatcher="gspmd": global sort + ragged_dot, XLA derives collectives from
    shardings. dispatcher="a2a": explicit shard_map ragged all-to-all over ep
    (the DeepEP analog, ops/moe_a2a.py). dispatcher="agrs": all-gather +
    reduce-scatter over ep (reference dispatcher/agrs.py analog,
    ops/moe_agrs.py).
    """
    from ..profiler.prober import probe

    b, l, h = x.shape
    x2d = x.reshape(b * l, h)
    if gemm_impl == "auto":
        # Pallas visit-table kernels on real TPU backends when the GEMM dims
        # are lane-aligned and the token count amortizes the 512-row block
        # padding (training/prefill); XLA ragged_dot otherwise (CPU tests,
        # odd shapes, small decode batches)
        from ..ops.bf16_grouped import pallas_grouped_ok

        gemm_impl = ("pallas"
                     if jax.default_backend() in ("tpu", "axon")
                     and pallas_grouped_ok(h, p["gate_proj"].shape[2])
                     and b * l * top_k >= 4096
                     else "ragged_dot")
    r: RouterOutput = route(router_p, router_cfg, x2d, top_k,
                            forced_idx=forced_topk_idx)
    # name the (N, K) routing decisions so save_attn_residuals_idx can keep
    # them across the remat boundary (lets XLA DCE the router GEMM + softmax
    # + top_k recompute in the backward; ~8 MB per layer at 16k tokens)
    from jax.ad_checkpoint import checkpoint_name

    r = r._replace(topk_weights=checkpoint_name(r.topk_weights, "moe_topk_w"),
                   topk_idx=checkpoint_name(r.topk_idx, "moe_topk_idx"))
    probe("after_moe_gate", r.logits)

    if dispatcher in ("a2a", "agrs") and sc is not None and sc.mesh is not None:
        if dispatcher == "a2a":
            from ..ops.moe_a2a import moe_mlp_a2a as moe_mlp_dispatch
        else:
            from ..ops.moe_agrs import moe_mlp_agrs as moe_mlp_dispatch

        out2d = moe_mlp_dispatch(
            x2d, r.topk_idx, r.topk_weights, p["gate_proj"], p["up_proj"], p["down_proj"],
            num_experts=num_experts, act=act, mesh=sc.mesh, rules=sc.rules,
            compute_dtype=compute_dtype,
        )
        from ..ops.moe import histogram

        load = histogram(r.topk_idx, num_experts)
        return out2d.reshape(b, l, h).astype(compute_dtype), r, load

    info = permute(x2d.astype(compute_dtype), r.topk_idx, num_experts,
                   topk_weights=r.topk_weights)
    probe("before_dispatch", info.sorted_tokens)
    fp8_on = fp8_cfg is not None and getattr(fp8_cfg, "enabled", False)
    if gemm_impl == "pallas" and not fp8_on:
        # visit-table megablox kernels (ops/bf16_grouped.py) with gate|up
        # FUSED into one grouped GEMM: one sweep over the sorted rows instead
        # of two (measured 108.7 TF/s fused vs 93.8 separate, docs/kernels.md)
        import os

        from ..ops.bf16_grouped import bf16_grouped_linear

        f = p["gate_proj"].shape[2]
        w_cat = jnp.concatenate(
            [p["gate_proj"].astype(compute_dtype),
             p["up_proj"].astype(compute_dtype)], axis=2)
        if act == "silu" and os.environ.get("XTUNER_FUSED_MLP", "0") != "0":
            # whole-MLP fused kernel (ops/fused_moe_mlp.py): gate|up dot ->
            # silu -> down dot per visit, no gu/hidden HBM round-trips
            from ..ops.fused_moe_mlp import fused_moe_mlp

            out = fused_moe_mlp(info.sorted_tokens, w_cat,
                                p["down_proj"].astype(compute_dtype),
                                info.group_sizes)
            combined = unpermute(out, info, b * l)
            combined = probe("after_combine", combined)
            return (combined.reshape(b, l, h).astype(compute_dtype), r,
                    info.group_sizes)
        gu = bf16_grouped_linear(info.sorted_tokens, w_cat, info.group_sizes)
        gate, up = gu[:, :f].astype(jnp.float32), gu[:, f:].astype(jnp.float32)
        if act == "swiglu_clipped":
            hidden = swiglu_clipped(gate, up).astype(compute_dtype)
        else:
            hidden = (get_act_fn(act)(gate) * up).astype(compute_dtype)
        out = bf16_grouped_linear(hidden, p["down_proj"].astype(compute_dtype),
                                  info.group_sizes)
        combined = unpermute(out, info, b * l)
        combined = probe("after_combine", combined)
        return combined.reshape(b, l, h).astype(compute_dtype), r, info.group_sizes
    if fp8_on:
        # tile-wise fp8 expert GEMMs (reference float8_gmm_tile_wise.py:42-215)
        from ..ops.fp8_grouped import fp8_grouped_linear

        e5m2 = getattr(fp8_cfg, "e5m2_grads", False)

        def gg(x_, w_, gs_):
            return fp8_grouped_linear(x_, w_.astype(compute_dtype), gs_, e5m2)
    else:
        def gg(x_, w_, gs_):
            # grouped GEMMs emit compute_dtype: the MXU accumulates f32
            # internally either way, and f32 (N*K, ...) outputs are GBs of
            # HBM at 64k tokens
            return grouped_gemm(x_, w_.astype(compute_dtype), gs_,
                                preferred_dtype=compute_dtype)

    gate = gg(info.sorted_tokens, p["gate_proj"], info.group_sizes)
    up = gg(info.sorted_tokens, p["up_proj"], info.group_sizes)
    # act fns upcast elementwise to f32 before their transcendentals
    gate, up = gate.astype(jnp.float32), up.astype(jnp.float32)
    if act == "swiglu_clipped":  # GPT-OSS experts (reference gpt_oss.py)
        hidden = swiglu_clipped(gate, up).astype(compute_dtype)
    else:
        hidden = (get_act_fn(act)(gate) * up).astype(compute_dtype)
    out = gg(hidden, p["down_proj"], info.group_sizes)
    combined = unpermute(out, info, b * l)
    combined = probe("after_combine", combined)
    return combined.reshape(b, l, h).astype(compute_dtype), r, info.group_sizes
