"""Gated delta rule (linear attention) recurrence.

Reference: xtuner/v1/ops/gated_deltanet/ (flash-linear-attention Triton
chunk_gated_delta_rule + causal_conv1d + gated RMSNorm wrappers) backing
xtuner/v1/module/attention/gated_deltanet.py (Qwen3.5 hybrid).

State recurrence per head (S: (d_k, d_v) fast-weight matrix):

    S_t = a_t (I - b_t k_t k_t^T) S_{t-1} + b_t k_t v_t^T
    o_t = S_t^T q_t

with a_t in (0,1] the forget gate and b_t in (0,1) the delta learning rate.
Packed documents reset the state at segment starts (gate forced to ~0).

Implementations:
- `gated_delta_rule_scan`: exact `lax.scan` over time (the oracle).
- `gated_delta_rule_chunked`: chunk-parallel WY form. Factoring the decay out
  (S_hat_t = S_t / A_t, A_t = prod a_s) reduces the gated rule to the plain
  delta rule, whose chunk unroll is S_C = S_0 + W^T R with
  R = (I + strict_tril(K W^T))^{-1} (V - K S_0); re-scaling every row by its
  decay keeps all terms as bounded ratios exp(c_t - c_s), s <= t. Everything
  is (C x C)/(C x d) matmuls on the MXU; only the L/C chunk scan is
  sequential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LOG_GATE_MIN = -30.0  # log(0) stand-in: exp(-30) ~ 1e-13, keeps ratios finite


def _doc_start_mask(segment_ids):
    """(B, L) bool: True where a new document begins."""
    prev = jnp.concatenate([jnp.zeros_like(segment_ids[:, :1]), segment_ids[:, :-1]], axis=1)
    return (segment_ids != prev) & (segment_ids != 0)


def gated_delta_rule_scan(q, k, v, alpha, beta, segment_ids=None,
                          initial_state=None, return_state=False):
    """q, k: (B, L, H, dk); v: (B, L, H, dv); alpha, beta: (B, L, H).
    Returns o: (B, L, H, dv) fp32 (plus the final (B, H, dk, dv) state when
    return_state — the decode-cache carry). Exact sequential recurrence
    (oracle; also the prefill path for cached generation)."""
    b, l, h, dk = q.shape
    dv = v.shape[-1]
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))
    alpha = alpha.astype(jnp.float32)
    beta = beta.astype(jnp.float32)
    reset = _doc_start_mask(segment_ids) if segment_ids is not None else jnp.zeros((b, l), bool)

    def step(S, xs):
        q_t, k_t, v_t, a_t, b_t, r_t = xs
        S = jnp.where(r_t[:, None, None, None], 0.0, S)
        Sk = jnp.einsum("bhkv,bhk->bhv", S, k_t)  # S^T k
        S = a_t[..., None, None] * (S - b_t[..., None, None]
                                    * jnp.einsum("bhk,bhv->bhkv", k_t, Sk))
        S = S + b_t[..., None, None] * jnp.einsum("bhk,bhv->bhkv", k_t, v_t)
        o_t = jnp.einsum("bhkv,bhk->bhv", S, q_t)
        return S, o_t

    xs = (q.transpose(1, 0, 2, 3), k.transpose(1, 0, 2, 3), v.transpose(1, 0, 2, 3),
          alpha.transpose(1, 0, 2), beta.transpose(1, 0, 2), reset.T)
    S0 = (jnp.zeros((b, h, dk, dv), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))
    S_final, o = jax.lax.scan(step, S0, xs)
    o = o.transpose(1, 0, 2, 3)
    if return_state:
        return o, S_final
    return o


def gated_delta_rule_step(S, q_t, k_t, v_t, a_t, b_t):
    """Single-token decode update (the rollout recurrence; O(1) per token).

    S: (B, H, dk, dv) f32 fast-weight state; q_t/k_t: (B, H, dk);
    v_t: (B, H, dv); a_t/b_t: (B, H). Returns (S', o_t (B, H, dv) f32)."""
    q_t, k_t, v_t = (x.astype(jnp.float32) for x in (q_t, k_t, v_t))
    a_t = a_t.astype(jnp.float32)
    b_t = b_t.astype(jnp.float32)
    Sk = jnp.einsum("bhkv,bhk->bhv", S, k_t)
    S = a_t[..., None, None] * (S - b_t[..., None, None]
                                * jnp.einsum("bhk,bhv->bhkv", k_t, Sk))
    S = S + b_t[..., None, None] * jnp.einsum("bhk,bhv->bhkv", k_t, v_t)
    o_t = jnp.einsum("bhkv,bhk->bhv", S, q_t)
    return S, o_t


def gated_delta_rule_chunked(q, k, v, alpha, beta, segment_ids=None, chunk: int = 64):
    """Chunk-parallel gated delta rule; same signature/result as the scan."""
    b, l, h, dk = q.shape
    dv = v.shape[-1]
    if l % chunk:
        pad = chunk - l % chunk
        zq = lambda x: jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))
        out = gated_delta_rule_chunked(zq(q), zq(k), zq(v), zq(alpha), zq(beta),
                                       None if segment_ids is None else zq(segment_ids),
                                       chunk)
        return out[:, :l]
    n = l // chunk
    f32 = jnp.float32
    q, k, v = (x.astype(f32) for x in (q, k, v))
    alpha = jnp.clip(alpha.astype(f32), 0.0, 1.0)
    beta = beta.astype(f32)
    if segment_ids is not None:
        reset = _doc_start_mask(segment_ids)
        alpha = jnp.where(reset[..., None], 0.0, alpha)

    # (B, L, H, ...) -> (B*H, N, C, ...)
    def rsh(x):
        if x.ndim == 3:
            return x.reshape(b, n, chunk, h).transpose(0, 3, 1, 2).reshape(b * h, n, chunk)
        d = x.shape[-1]
        return x.reshape(b, n, chunk, h, d).transpose(0, 3, 1, 2, 4).reshape(b * h, n, chunk, d)

    qc, kc, vc = rsh(q), rsh(k), rsh(v)
    ac, bc = rsh(alpha), rsh(beta)

    log_a = jnp.maximum(jnp.log(jnp.maximum(ac, 0.0)), LOG_GATE_MIN)
    c = jnp.cumsum(log_a, axis=-1)  # inclusive cumulative log decay (Z, N, C)
    c_end = c[..., -1]

    cc = jnp.eye(chunk, dtype=f32)
    strict = jnp.tril(jnp.ones((chunk, chunk), f32), -1)
    incl = jnp.tril(jnp.ones((chunk, chunk), f32))

    ratio = jnp.exp(jnp.clip(c[..., :, None] - c[..., None, :], LOG_GATE_MIN, 0.0))
    # M~[t, s] = b_s (k_t . k_s) A_t/A_s, s < t
    kk = jnp.einsum("znck,znsk->zncs", kc, kc)
    m = kk * ratio * bc[..., None, :] * strict
    t_inv = jax.scipy.linalg.solve_triangular(cc + m, jnp.broadcast_to(
        cc, m.shape), lower=True)  # (I + M~)^{-1}

    # per-chunk precomputations
    a_incl = jnp.exp(c)  # A_t
    qk = jnp.einsum("znck,znsk->zncs", qc, kc)
    attn = qk * ratio * bc[..., None, :] * incl  # inclusive: o_t sees write at t

    def body(S, xs):
        # S: (Z, dk, dv) chunk-entry state. Scaled residuals R~_t = A_t r_t:
        #   R~ = T~ (V - diag(A) K S);   o_t = A_t q_t^T S + sum_{s<=t} attn[t,s] R~_s
        #   S' = A_C S + sum_t (A_C/A_t) b_t k_t R~_t^T
        q_b, k_b, v_b, b_b, t_b, attn_b, a_b, cend_b, c_b = xs
        kd = k_b * a_b[..., None]  # A_t k_t
        r = jnp.einsum("zcs,zsd->zcd", t_b, v_b - jnp.einsum("zck,zkd->zcd", kd, S))
        o = jnp.einsum("zck,zkd->zcd", q_b * a_b[..., None], S) \
            + jnp.einsum("zcs,zsd->zcd", attn_b, r)
        decay_to_end = jnp.exp(jnp.clip(cend_b[:, None] - c_b, LOG_GATE_MIN, 0.0))
        carry_k = k_b * (b_b * decay_to_end)[..., None]  # (A_C/A_t) b_t k_t
        S_new = jnp.exp(cend_b)[:, None, None] * S + jnp.einsum("zck,zcd->zkd", carry_k, r)
        return S_new, o

    # move chunk axis first for scan
    xs = (qc.transpose(1, 0, 2, 3), kc.transpose(1, 0, 2, 3), vc.transpose(1, 0, 2, 3),
          bc.transpose(1, 0, 2), t_inv.transpose(1, 0, 2, 3), attn.transpose(1, 0, 2, 3),
          a_incl.transpose(1, 0, 2), c_end.transpose(1, 0), c.transpose(1, 0, 2))
    S0 = jnp.zeros((b * h, dk, dv), f32)
    _, o = jax.lax.scan(body, S0, xs)  # o: (N, Z, C, dv)
    o = o.transpose(1, 0, 2, 3).reshape(b, h, n * chunk, dv).transpose(0, 2, 1, 3)
    return o
