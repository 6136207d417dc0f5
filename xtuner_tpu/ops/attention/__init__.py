"""Varlen packed attention — op family.

Reference: xtuner/v1/ops/flash_attn/ (flash-attn2/3 CUDA wrappers + CPU
protocol impl) and ops/attn_imp.py (eager / flex / flash registry). TPU
redesign: packed documents are expressed with segment ids instead of
cu_seqlens; the mask is (seg_q == seg_k) & causal & valid, block-diagonal by
construction.

Implementations:
- "reference": fp32-softmax eager jnp — HF-parity oracle (ops/attn_imp.py:277-296).
- "pallas": flash kernel with online softmax + segment-aware block skipping.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax

from .reference import reference_attention

_IMPLS = {"reference": None, "pallas": None}  # lazily populated


def get_attention(impl: Optional[str] = None):
    impl = impl or os.environ.get("XTUNER_ATTN_IMPL")
    if impl is None:
        impl = "pallas" if jax.default_backend() in ("tpu", "axon") else "reference"
    if impl in ("reference", "eager", "xla"):
        return reference_attention
    if impl == "pallas":
        from .flash import flash_attention

        return flash_attention
    raise KeyError(f"Unknown attention impl {impl!r}")


def attention(q, k, v, segment_ids, *, causal: bool = True, scale: Optional[float] = None,
              window: Optional[int] = None, sinks=None, max_logit=None,
              impl: Optional[str] = None, sc=None):
    """sc: optional ShardCtx. With a mesh present and a Pallas impl, attention
    runs under shard_map: heads sharded over (sp, tp), sequence gathered —
    the Ulysses layout (reference mha.py:365-390) with the all_to_alls
    inserted by GSPMD at the shard_map boundary.

    max_logit: optional proven |scaled logit| bound (see flash_attention) —
    enables the max-free flash forward; ignored by the reference impl."""
    if impl is None and q.shape[-1] % 128 != 0:
        # head_dim must be lane-aligned for the Pallas kernel; small/odd head
        # dims (tiny test models) take the XLA path instead
        impl = "reference"
    fn = get_attention(impl)
    if fn.__name__ != "flash_attention":
        return fn(q, k, v, segment_ids, causal=causal, scale=scale, window=window, sinks=sinks)
    if sc is None or sc.mesh is None:
        return fn(q, k, v, segment_ids, causal=causal, scale=scale, window=window,
                  sinks=sinks, max_logit=max_logit)
    return _shard_mapped_attention(fn, q, k, v, segment_ids, causal, scale, window,
                                   sinks, max_logit, sc)


def _axes_of(rules, name):
    phys = rules.get(name)
    if phys is None:
        return ()
    return phys if isinstance(phys, tuple) else (phys,)


def _shard_mapped_attention(fn, q, k, v, segment_ids, causal, scale, window, sinks,
                            max_logit, sc):
    from jax.sharding import PartitionSpec as P

    from .reference import repeat_kv

    mesh = sc.mesh
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    batch_axes = tuple(a for a in _axes_of(sc.rules, "batch") if sizes.get(a, 1) > 1)
    head_axes = tuple(a for a in _axes_of(sc.rules, "act_heads") if sizes.get(a, 1) > 1)
    head_ways = 1
    for a in head_axes:
        head_ways *= sizes[a]
    if head_ways == 1 and not batch_axes:
        return fn(q, k, v, segment_ids, causal=causal, scale=scale, window=window,
                  sinks=sinks, max_logit=max_logit)

    hq, hkv = q.shape[2], k.shape[2]
    if head_ways > 1 and hkv % head_ways != 0:
        # Ulysses with sp > kv_heads: physically repeat kv groups (mha.py:368-371)
        rep = -(-head_ways // hkv)
        k = repeat_kv(k, rep)
        v = repeat_kv(v, rep)
        hkv *= rep
    if hq % head_ways != 0:
        raise ValueError(f"q heads ({hq}) must divide over sp*tp ({head_ways})")

    qspec = P(batch_axes or None, None, head_axes or None, None)
    segspec = P(batch_axes or None, None)
    sinkspec = P(head_axes or None)

    # optional operands folded into one dict so one shard_map handles every
    # combination of {sinks, max_logit} present/absent
    opt = {}
    opt_specs = {}
    if sinks is not None:
        opt["sinks"] = sinks
        opt_specs["sinks"] = sinkspec
    if max_logit is not None:
        opt["max_logit"] = max_logit
        opt_specs["max_logit"] = P()  # replicated scalar

    def local_attn(q_, k_, v_, seg_, opt_):
        return fn(q_, k_, v_, seg_, causal=causal, scale=scale, window=window,
                  sinks=opt_.get("sinks"), max_logit=opt_.get("max_logit"))

    wrapped = jax.shard_map(
        local_attn, mesh=mesh,
        in_specs=(qspec, qspec, qspec, segspec, opt_specs), out_specs=qspec,
        check_vma=False,
    )
    return wrapped(q, k, v, segment_ids, opt)
