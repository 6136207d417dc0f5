"""HuggingFace safetensors import/export.

Reference: the LoadSpec system (xtuner/v1/model/base.py:1030-1171 `_init_load_spec`,
:2030-2112 `_load_params` streamed per-param DTensor loads, :1742-2029 `save_hf`
with chunked <=3.6GB safetensors and DTensor re-gather). TPU redesign:

- Load: for each param leaf, `jax.make_array_from_callback` asks for exactly
  the slices each local shard needs; we map those global slices through the
  HFKey transform (transpose for nn.Linear layout, per-layer/per-expert
  stacking) onto safetensors `get_slice` range reads — no full tensor is ever
  materialized on host, so 200B+ checkpoints stream straight into the sharded
  param tree (hard part #3 of SURVEY.md §7).
- Save: stacked params are gathered layer-by-layer (device slice -> host) and
  written into size-capped safetensors chunks with an HF weight_map index.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from ..module.params import ParamSpec
from ..utils.logger import get_logger
from .spec import HFKey

logger = get_logger()

MAX_SHARD_BYTES = int(3.6 * 1024**3)


class HFCheckpointReader:
    """Lazy safetensors reader keyed by the weight_map index
    (reference: HFCheckpointLoader, train_engine.py:87-136)."""

    def __init__(self, hf_path: str | Path):
        self.path = Path(hf_path)
        index_file = self.path / "model.safetensors.index.json"
        if index_file.exists():
            self.weight_map: dict[str, str] = json.loads(index_file.read_text())["weight_map"]
        else:
            single = self.path / "model.safetensors"
            if not single.exists():
                raise FileNotFoundError(f"No safetensors found under {self.path}")
            from safetensors import safe_open

            with safe_open(single, framework="np") as f:
                keys = list(f.keys())
            self.weight_map = {k: "model.safetensors" for k in keys}
        self._open_files: dict[str, Any] = {}

    def _file(self, name: str):
        if name not in self._open_files:
            from safetensors import safe_open

            self._open_files[name] = safe_open(self.path / name, framework="np")
        return self._open_files[name]

    def has(self, key: str) -> bool:
        return key in self.weight_map

    def get_slice(self, key: str):
        if key not in self.weight_map:
            raise KeyError(f"HF checkpoint missing key {key!r}")
        return self._file(self.weight_map[key]).get_slice(key)

    def get(self, key: str) -> np.ndarray:
        return self._file(self.weight_map[key]).get_tensor(key)


def _slices_to_ranges(idx: tuple, shape: tuple) -> list[tuple[int, int]]:
    out = []
    for sl, dim in zip(idx, shape):
        start = sl.start or 0
        stop = sl.stop if sl.stop is not None else dim
        out.append((start, stop))
    return out


def _read_leaf_slice(reader: HFCheckpointReader, key: HFKey, spec: ParamSpec,
                     idx: tuple, stacked: bool) -> np.ndarray:
    """Read the global slice `idx` of OUR param layout from the HF files."""
    ranges = _slices_to_ranges(idx, spec.shape)

    def read_2d_t(hf_key: str, in_r, out_r) -> np.ndarray:
        # HF nn.Linear weight is (out, in); ours is (in, out)
        sl = reader.get_slice(hf_key)
        return np.ascontiguousarray(
            sl[out_r[0]:out_r[1], in_r[0]:in_r[1]].T
        )

    if key.transform == "expert_linear":
        # ours: (layers?, E, in, out); HF: per-(layer, expert) (out, in) tensors
        if stacked:
            (l0, l1), (e0, e1), in_r, out_r = ranges
            layers = range(l0, l1)
        else:
            (e0, e1), in_r, out_r = ranges
            layers = [None]
        blocks = []
        for li in layers:
            experts = [
                read_2d_t(
                    key.template.format(layer=(li * key.layer_stride + key.layer_offset) if li is not None else 0,
                                        expert=ei),
                    in_r, out_r,
                )
                for ei in range(e0, e1)
            ]
            blocks.append(np.stack(experts))
        arr = np.stack(blocks) if stacked else blocks[0]
        return arr

    if key.transform in ("nf4_pack", "nf4_scale"):
        # QLoRA: read the FULL hf weight per layer, transpose to (in, out),
        # quantize, return either the packed codes or the scales (the leaf is
        # replicated, so idx always covers the full flattened range)
        from ..module.quant import quantize_nf4

        def read_q(li):
            hf_key = key.template.format(layer=li * key.layer_stride + key.layer_offset) \
                if stacked else key.template
            w = reader.get(hf_key).T  # (in, out)
            codes, absmax = quantize_nf4(w)
            return codes if key.transform == "nf4_pack" else absmax

        if stacked:
            (l0, l1), _ = ranges
            return np.stack([read_q(li) for li in range(l0, l1)])
        return read_q(0)

    def read_fused3d_half(hf_key: str, rest) -> np.ndarray:
        # HF fused expert tensor (E, H, 2F); ours is the (E, H, F) gate or up
        # half (qwen3_vl_moe Qwen3VLMoeTextExperts.gate_up_proj, chunk(2, -1))
        off = spec.shape[-1] if key.transform == "fused3d_half1" else 0
        *lead, (o0, o1) = rest
        sl = reader.get_slice(hf_key)
        index = tuple(slice(a, b) for a, b in lead) + (slice(o0 + off, o1 + off),)
        return np.asarray(sl[index])

    if stacked:
        (l0, l1), *rest = ranges
        parts = []
        for li in range(l0, l1):
            hf_key = key.template.format(layer=li * key.layer_stride + key.layer_offset)
            if key.transform == "linear":
                in_r, out_r = rest
                parts.append(read_2d_t(hf_key, in_r, out_r))
            elif key.transform in ("fused3d_half0", "fused3d_half1"):
                parts.append(read_fused3d_half(hf_key, rest))
            else:
                sl = reader.get_slice(hf_key)
                index = tuple(slice(a, b) for a, b in rest)
                parts.append(np.asarray(sl[index] if rest else reader.get(hf_key)))
        return np.stack(parts)

    hf_key = key.template
    if key.transform == "linear":
        in_r, out_r = ranges
        return read_2d_t(hf_key, in_r, out_r)
    if key.transform.startswith("conv3d:"):
        # HF Conv3d weight (embed, C, tps, ph, pw) -> ours (C*tps*ph*pw, embed)
        w = reader.get(hf_key)
        w = np.ascontiguousarray(w.reshape(w.shape[0], -1).T)
        return w[tuple(slice(a, b) for a, b in ranges)]
    if key.transform in ("fused3d_half0", "fused3d_half1"):
        return read_fused3d_half(hf_key, ranges)
    sl = reader.get_slice(hf_key)
    index = tuple(slice(a, b) for a, b in ranges)
    return np.asarray(sl[index]) if ranges else reader.get(hf_key)


def _is_stacked(key: HFKey) -> bool:
    return "{layer}" in key.template


def load_hf_checkpoint(hf_path: str | Path, specs, key_map, shardings):
    """-> param pytree matching `specs`, sharded per `shardings`."""
    reader = HFCheckpointReader(hf_path)

    init_rng = jax.random.key(0)

    def load_leaf(i: int, spec: ParamSpec, key: Optional[HFKey], sharding):
        if key is None:
            raise ValueError("param has no HF key mapping")
        if key.template == "<random>":
            # param not present in the HF checkpoint (e.g. fresh LoRA adapters)
            init = jax.jit(spec.initializer(), out_shardings=sharding)
            return init(jax.random.fold_in(init_rng, i))
        stacked = _is_stacked(key)

        def cb(idx):
            arr = _read_leaf_slice(reader, key, spec, idx, stacked)
            return arr.astype(np.dtype(spec.dtype))

        return jax.make_array_from_callback(spec.shape, sharding, cb)

    flat_specs, treedef = jax.tree.flatten(specs, is_leaf=lambda x: isinstance(x, ParamSpec))
    flat_keys = treedef.flatten_up_to(key_map)
    flat_shardings = jax.tree.leaves(shardings)
    params = [
        load_leaf(i, s, k, sh)
        for i, (s, k, sh) in enumerate(zip(flat_specs, flat_keys, flat_shardings))
    ]
    logger.info(f"loaded {len(params)} params from HF checkpoint {hf_path}")
    return jax.tree.unflatten(treedef, params)


# ----------------------------------------------------------------------
# save
# ----------------------------------------------------------------------

# Replication-gather jits, cached per mesh (jit caches per input shape
# underneath): used by the export path to pull one (layer-)slice of a
# multihost-sharded leaf onto every host via XLA collectives.
_GATHER_FULL: dict = {}
_GATHER_SLICE: dict = {}


def _fetch(p, li: Optional[int] = None) -> np.ndarray:
    """Full host copy of `p` (or its layer slice `p[li]`), correct for
    non-fully-addressable arrays. The reference re-gathers DTensor shards
    collectively for HF export (ref xtuner/v1/model/base.py:1902-2029); the
    TPU analog is an XLA replication gather: jit identity /
    dynamic_index_in_dim with a fully-replicated out_sharding, then read
    the local replica. EVERY process must call this in the same order
    (collective). Single-process arrays short-circuit to device_get."""
    if not isinstance(p, jax.Array) or p.is_fully_addressable:
        return np.asarray(jax.device_get(p if li is None else p[li]))
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = p.sharding.mesh
    repl = NamedSharding(mesh, PartitionSpec())
    if li is None:
        fn = _GATHER_FULL.get(mesh)
        if fn is None:
            fn = jax.jit(lambda x: x, out_shardings=repl)
            _GATHER_FULL[mesh] = fn
        out = fn(p)
    else:
        fn = _GATHER_SLICE.get(mesh)
        if fn is None:
            fn = jax.jit(
                lambda x, i: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
                out_shardings=repl)
            _GATHER_SLICE[mesh] = fn
        out = fn(p, jnp.int32(li))
    return np.asarray(out.addressable_data(0))


class _ChunkedWriter:
    """Accumulate tensors and flush into size-capped safetensors shards
    (reference `_iter_hf_save_chunks`, base.py:1742). In multihost runs
    only process 0 buffers/writes; other processes still participate in
    the collective gathers feeding `add` but drop the host copy here."""

    def __init__(self, out_dir: Path):
        self.out_dir = out_dir
        self.active = jax.process_index() == 0
        self.buffer: dict[str, np.ndarray] = {}
        self.buffer_bytes = 0
        self.files: list[dict[str, np.ndarray]] = []

    def add(self, key: str, tensor: np.ndarray) -> None:
        if not self.active:
            return
        self.buffer[key] = tensor
        self.buffer_bytes += tensor.nbytes
        if self.buffer_bytes >= MAX_SHARD_BYTES:
            self.flush()

    def flush(self) -> None:
        if self.buffer:
            self.files.append(self.buffer)
            self.buffer = {}
            self.buffer_bytes = 0

    def finalize(self) -> None:
        if not self.active:
            return
        from safetensors.numpy import save_file

        self.flush()
        n = len(self.files)
        weight_map = {}
        if n == 1:
            save_file(self.files[0], self.out_dir / "model.safetensors")
            return
        for i, chunk in enumerate(self.files, start=1):
            name = f"model-{i:05d}-of-{n:05d}.safetensors"
            save_file(chunk, self.out_dir / name)
            for k in chunk:
                weight_map[k] = name
        total = sum(t.nbytes for c in self.files for t in c.values())
        (self.out_dir / "model.safetensors.index.json").write_text(
            json.dumps({"metadata": {"total_size": total}, "weight_map": weight_map}, indent=1)
        )


def _to_hf_tensor(arr: np.ndarray, transform: str) -> np.ndarray:
    if transform in ("linear", "expert_linear"):
        return np.ascontiguousarray(arr.T)
    if transform.startswith("conv3d:"):
        # ours (C*tps*ph*pw, embed) -> HF Conv3d weight (embed, C, tps, ph, pw)
        dims = tuple(int(d) for d in transform.split(":", 1)[1].split(","))
        return np.ascontiguousarray(arr.T).reshape(arr.shape[1], *dims)
    return arr


def async_save_hf_checkpoint(hf_path: str | Path, params, key_map, model_cfg=None):
    """Snapshot params to host, then write safetensors in a background thread
    (reference: async HF export w/ pinned-CPU snapshot + writer pool,
    base.py:754-918). Returns a handle with .join()."""
    import threading

    if any(isinstance(p, jax.Array) and not p.is_fully_addressable
           for p in jax.tree.leaves(params)):
        # multihost: the snapshot would need collective gathers, which must
        # not run on a background thread (they'd interleave with training
        # collectives) — fall back to the synchronous collective export
        logger.warning("async HF export on a multi-process mesh falls back "
                       "to synchronous export (collective gathers)")
        save_hf_checkpoint(hf_path, params, key_map, model_cfg)

        class DoneHandle:
            def join(self, timeout=None):
                pass

            done = True

        return DoneHandle()

    host_params = jax.tree.map(lambda p: np.asarray(jax.device_get(p)), params)
    thread = threading.Thread(
        target=save_hf_checkpoint, args=(hf_path, host_params, key_map, model_cfg),
        daemon=True,
    )
    thread.start()

    class Handle:
        def join(self, timeout=None):
            thread.join(timeout)

        @property
        def done(self):
            return not thread.is_alive()

    return Handle()


def save_hf_checkpoint(hf_path: str | Path, params, key_map, model_cfg=None) -> None:
    """Gather sharded params (layer-by-layer for stacked) -> HF safetensors."""
    out_dir = Path(hf_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    writer = _ChunkedWriter(out_dir)

    flat_params, treedef = jax.tree.flatten(params)
    flat_keys = treedef.flatten_up_to(key_map)
    fused_halves: dict[str, list] = {}  # fused3d gate/up pairs awaiting merge
    for p, key in zip(flat_params, flat_keys):
        if key.transform in ("fused3d_half0", "fused3d_half1"):
            stacked = _is_stacked(key)
            n_layers = p.shape[0] if stacked else 1
            for li in range(n_layers):
                hf_key = key.template.format(layer=li * key.layer_stride + key.layer_offset) \
                    if stacked else key.template
                half = _fetch(p, li) if stacked else _fetch(p)
                slot = fused_halves.setdefault(hf_key, [None, None])
                slot[1 if key.transform.endswith("1") else 0] = half
                if slot[0] is not None and slot[1] is not None:
                    writer.add(hf_key, np.concatenate(slot, axis=-1))
                    del fused_halves[hf_key]
        elif key.transform == "expert_linear":
            stacked = p.ndim == 4
            n_layers = p.shape[0] if stacked else 1
            for li in range(n_layers):
                layer_slice = _fetch(p, li) if stacked else _fetch(p)
                for ei in range(layer_slice.shape[0]):
                    hf_key = key.template.format(layer=li * key.layer_stride + key.layer_offset,
                                                 expert=ei)
                    writer.add(hf_key, _to_hf_tensor(layer_slice[ei], key.transform))
        elif _is_stacked(key):
            for li in range(p.shape[0]):
                hf_key = key.template.format(layer=li * key.layer_stride + key.layer_offset)
                writer.add(hf_key, _to_hf_tensor(_fetch(p, li), key.transform))
        else:
            writer.add(key.template, _to_hf_tensor(_fetch(p), key.transform))
    writer.finalize()
    if (model_cfg is not None and getattr(model_cfg, "model_type", None)
            and jax.process_index() == 0):
        _write_hf_config(out_dir, model_cfg)
    logger.info(f"saved HF checkpoint -> {out_dir}")


def _write_hf_config(out_dir: Path, cfg) -> None:
    """Minimal HF config.json so transformers can reload the export."""
    attn = cfg.attention
    config = {
        "architectures": [],
        "model_type": cfg.model_type,
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden_size,
        "intermediate_size": cfg.intermediate_size,
        "num_hidden_layers": cfg.num_hidden_layers,
        "num_attention_heads": attn.num_attention_heads,
        "num_key_value_heads": attn.num_key_value_heads,
        "head_dim": attn.head_dim,
        "rms_norm_eps": cfg.rms_norm_eps,
        "hidden_act": cfg.hidden_act,
        "rope_theta": cfg.rope_theta,
        "max_position_embeddings": cfg.max_position_embeddings,
        "tie_word_embeddings": cfg.tie_word_embeddings,
        "eos_token_id": cfg.eos_token_id,
        "torch_dtype": "bfloat16",
    }
    for extra in ("n_routed_experts", "num_experts_per_tok", "moe_intermediate_size"):
        if hasattr(cfg, extra):
            config[{"n_routed_experts": "num_experts"}.get(extra, extra)] = getattr(cfg, extra)
    (out_dir / "config.json").write_text(json.dumps(config, indent=1))
