"""Kernel registry.

Analog of the reference ops layer (xtuner/v1/ops/): every op family exposes a
``get_*`` dispatch returning an implementation by name. Implementations:

- ``"reference"``: pure jnp, fp32 softmax, HF-bitwise semantics — the parity
  oracle for tests (reference: ops/attn_imp.py eager + ops/*/protocol.py).
- ``"xla"``: jnp written for XLA fusion (default on CPU and for cold paths).
- ``"pallas"``: hand-written TPU kernels for the hot ops (flash varlen
  attention, grouped GEMM) — default on TPU.

Selection: explicit name > XTUNER_ATTN_IMPL env > device default.
"""

from .attention import attention, get_attention
from .act_fn import get_act_fn, swiglu
from .rms_norm import rms_norm
from .rotary import apply_rotary_emb

__all__ = [
    "attention",
    "get_attention",
    "get_act_fn",
    "swiglu",
    "rms_norm",
    "apply_rotary_emb",
]
