"""Ulysses shard_map wrapper around the Pallas kernel (interpret) on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from xtuner_tpu.ops.attention import attention
from xtuner_tpu.ops.attention.reference import reference_attention
from xtuner_tpu.parallel import MeshConfig, build_mesh
from xtuner_tpu.parallel.sharding import ShardCtx


def test_ulysses_shard_map_parity():
    mesh_cfg = MeshConfig(fsdp_size=2, sp_size=4)
    mesh = build_mesh(mesh_cfg)
    sc = ShardCtx(mesh, mesh_cfg.rules())

    rng = np.random.default_rng(0)
    b, l, hq, hkv, d = 4, 256, 8, 4, 32
    q = jnp.asarray(rng.standard_normal((b, l, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    seg = np.ones((b, l), np.int32)
    seg[:, 200:] = 0
    seg[:, 100:200] = 2
    seg = jnp.asarray(seg)

    out_ref = reference_attention(q, k, v, seg)

    @jax.jit
    def sharded(q, k, v, seg):
        return attention(q, k, v, seg, impl="pallas", sc=sc)

    out = sharded(q, k, v, seg)
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(np.asarray(out)[valid], np.asarray(out_ref)[valid],
                               rtol=3e-5, atol=3e-5)


def test_ulysses_kv_repeat_when_sp_exceeds_kv_heads():
    mesh_cfg = MeshConfig(fsdp_size=1, sp_size=8)
    mesh = build_mesh(mesh_cfg)
    sc = ShardCtx(mesh, mesh_cfg.rules())

    rng = np.random.default_rng(1)
    b, l, hq, hkv, d = 1, 128, 8, 2, 16  # sp=8 > kv_heads=2 -> repeat path
    q = jnp.asarray(rng.standard_normal((b, l, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    seg = jnp.ones((b, l), jnp.int32)

    out_ref = reference_attention(q, k, v, seg)
    out = jax.jit(lambda *a: attention(*a, impl="pallas", sc=sc))(q, k, v, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=3e-5, atol=3e-5)
