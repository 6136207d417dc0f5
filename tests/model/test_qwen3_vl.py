"""Qwen3-VL: ViT geometry/forward parity vs HF, deepstack + interleaved MRoPE
end-to-end logits parity, tokenize/collate pipeline, engine train step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xtuner_tpu.data_proto import SequenceContext
from xtuner_tpu.datasets.qwen_vl import Qwen3VLTokenizeFn, qwen3vl_collator
from xtuner_tpu.model.qwen3_vl import (
    Qwen3VLConfig, Qwen3VLVisionConfig, preprocess_image, qwen3vl_config_from_hf,
    smart_resize, vision_geometry,
)
from xtuner_tpu.module.rope import build_mrope_positions, mrope_cos_sin_interleaved
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer

VL_SPECIALS = ["<|vision_start|>", "<|image_pad|>", "<|vision_end|>"]


# ---------------------------------------------------------------------------
# HF tiny fixtures
# ---------------------------------------------------------------------------
def tiny_hf_config(moe: bool = False):
    text = dict(
        hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16, vocab_size=512,
        rope_theta=100000.0, max_position_embeddings=512,
        tie_word_embeddings=False,
        rope_scaling=dict(rope_type="default", mrope_section=[4, 2, 2],
                          mrope_interleaved=True),
    )
    vision = dict(
        depth=4, hidden_size=32, intermediate_size=64, num_heads=2, patch_size=4,
        temporal_patch_size=2, spatial_merge_size=2, out_hidden_size=64,
        num_position_embeddings=16, deepstack_visual_indexes=[0, 1], in_channels=3,
    )
    special = dict(image_token_id=501, video_token_id=502,
                   vision_start_token_id=503, vision_end_token_id=504)
    if moe:
        from transformers.models.qwen3_vl_moe import Qwen3VLMoeConfig

        text.update(num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
                    decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=True)
        return Qwen3VLMoeConfig(text_config=text, vision_config=vision, **special)
    from transformers import Qwen3VLConfig as HFQwen3VLConfig

    return HFQwen3VLConfig(text_config=text, vision_config=vision, **special)


@pytest.fixture(scope="module")
def hf_qwen3vl(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3VLForConditionalGeneration

    cfg = tiny_hf_config()
    torch.manual_seed(0)
    model = Qwen3VLForConditionalGeneration(cfg).eval().float()
    out = tmp_path_factory.mktemp("hf_qwen3vl")
    model.save_pretrained(out, safe_serialization=True)
    return out, model, cfg


@pytest.fixture(scope="module")
def hf_qwen3vl_moe(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_vl_moe import Qwen3VLMoeForConditionalGeneration

    cfg = tiny_hf_config(moe=True)
    torch.manual_seed(1)
    model = Qwen3VLMoeForConditionalGeneration(cfg).eval().float()
    out = tmp_path_factory.mktemp("hf_qwen3vl_moe")
    model.save_pretrained(out, safe_serialization=True)
    return out, model, cfg


def _vl_inputs(cfg, seed=0, n_text=6):
    """input ids with a vision_start + image_pad block + vision_end and random
    patches for one (1, 8, 8) image grid (=> 16 merged tokens)."""
    rng = np.random.default_rng(seed)
    grid = (1, 8, 8)
    n_img = int(np.prod(grid)) // 4
    v = cfg.vision_config
    patch_dim = v.in_channels * v.temporal_patch_size * v.patch_size ** 2
    patches = rng.normal(size=(int(np.prod(grid)), patch_dim)).astype(np.float32)
    ids = list(rng.integers(1, 500, n_text // 2))
    ids += [cfg.vision_start_token_id] + [cfg.image_token_id] * n_img + [cfg.vision_end_token_id]
    ids += list(rng.integers(1, 500, n_text - n_text // 2))
    return np.asarray(ids, np.int64), patches, np.asarray([grid], np.int64)


def _our_logits(hf_dir, ids, patches, grids, hf_cfg):
    from transformers import AutoConfig

    from xtuner_tpu.checkpoint.hf import load_hf_checkpoint
    from xtuner_tpu.module.params import param_shardings
    from xtuner_tpu.parallel import MeshConfig, build_mesh

    our_cfg = qwen3vl_config_from_hf(AutoConfig.from_pretrained(hf_dir))
    model = our_cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig(fsdp_size=2, dp_size=2, ep_size=2)
    mesh = build_mesh(mesh_cfg)
    shardings = param_shardings(specs, mesh, mesh_cfg.rules())
    params = load_hf_checkpoint(hf_dir, specs, model.hf_key_map(), shardings)

    mask = (ids == hf_cfg.image_token_id)
    mrope = build_mrope_positions(ids, mask, grids, spatial_merge=2)  # (3, L)
    geo = vision_geometry(grids, our_cfg.vision_cfg.num_grid_per_side, 2)
    ctx = SequenceContext.from_input_ids(ids[None].astype(np.int32))
    ctx = ctx.replace(
        pixel_values=jnp.asarray(patches),
        image_token_mask=jnp.asarray(mask[None]),
        mrope_positions=jnp.asarray(mrope)[None],  # (B, 3, L)
        **{k: jnp.asarray(v) for k, v in geo.items()},
    )
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    w = np.asarray(jax.device_get(model.lm_head_weight(params)), np.float32)
    return np.asarray(hidden)[0] @ w


def test_logits_parity_dense(hf_qwen3vl):
    import torch

    hf_dir, hf_model, cfg = hf_qwen3vl
    ids, patches, grids = _vl_inputs(cfg)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grids),
        ).logits[0].numpy()
    ours = _our_logits(hf_dir, ids, patches, grids, cfg)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


def test_logits_parity_text_only(hf_qwen3vl):
    """No image: mrope falls back to broadcast positions == HF text path."""
    import torch

    hf_dir, hf_model, cfg = hf_qwen3vl
    from transformers import AutoConfig

    from xtuner_tpu.checkpoint.hf import load_hf_checkpoint
    from xtuner_tpu.module.params import param_shardings
    from xtuner_tpu.parallel import MeshConfig, build_mesh

    ids = np.random.default_rng(3).integers(1, 500, 12).astype(np.int64)
    with torch.no_grad():
        hf_logits = hf_model(input_ids=torch.tensor(ids)[None]).logits[0].numpy()

    our_cfg = qwen3vl_config_from_hf(AutoConfig.from_pretrained(hf_dir))
    model = our_cfg.build()
    specs = model.param_specs()
    mesh_cfg = MeshConfig(fsdp_size=4, dp_size=2)
    mesh = build_mesh(mesh_cfg)
    params = load_hf_checkpoint(hf_dir, specs, model.hf_key_map(),
                                param_shardings(specs, mesh, mesh_cfg.rules()))
    ctx = SequenceContext.from_input_ids(ids[None].astype(np.int32))
    hidden = model.forward(params, ctx, compute_dtype=jnp.float32)
    w = np.asarray(jax.device_get(model.lm_head_weight(params)), np.float32)
    ours = np.asarray(hidden)[0] @ w
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_logits_parity_moe(hf_qwen3vl_moe):
    import torch

    hf_dir, hf_model, cfg = hf_qwen3vl_moe
    ids, patches, grids = _vl_inputs(cfg, seed=1)
    with torch.no_grad():
        hf_logits = hf_model(
            input_ids=torch.tensor(ids)[None],
            pixel_values=torch.tensor(patches),
            image_grid_thw=torch.tensor(grids),
        ).logits[0].numpy()
    ours = _our_logits(hf_dir, ids, patches, grids, cfg)
    np.testing.assert_allclose(ours, hf_logits, rtol=4e-3, atol=4e-3)


def test_interleaved_mrope_matches_hf(hf_qwen3vl):
    import torch

    _, hf_model, _ = hf_qwen3vl
    rot = hf_model.model.language_model.rotary_emb
    pos = np.random.default_rng(0).integers(0, 64, (3, 1, 10)).astype(np.int64)
    with torch.no_grad():
        cos_hf, sin_hf = rot(torch.zeros(1, dtype=torch.float32), torch.tensor(pos))
    cos, sin = mrope_cos_sin_interleaved(jnp.asarray(pos), 16, 100000.0, (4, 2, 2))
    np.testing.assert_allclose(np.asarray(cos), cos_hf.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), sin_hf.numpy(), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# preprocessing parity vs the HF image processor
# ---------------------------------------------------------------------------
def test_smart_resize_matches_hf():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        smart_resize as hf_smart_resize,
    )

    rng = np.random.default_rng(0)
    for _ in range(20):
        h, w = int(rng.integers(64, 3000)), int(rng.integers(64, 3000))
        if max(h, w) / min(h, w) > 100:
            continue
        ours = smart_resize(h, w, 32, 65536, 16777216)
        hf = hf_smart_resize(h, w, 32, 65536, 16777216)
        assert ours == tuple(hf)


def test_preprocess_patch_layout_matches_hf():
    """Patch row ordering/content must match Qwen2VLImageProcessor (merge-block
    order, (C, tps, ph, pw) features) — feed identical pre-resized pixels."""
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import Qwen2VLImageProcessor

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3)).astype(np.uint8)
    proc = Qwen2VLImageProcessor(patch_size=4, merge_size=2, temporal_patch_size=2,
                                 size={"shortest_edge": 64 * 96, "longest_edge": 64 * 96},
                                 do_resize=False)
    hf_out = proc.preprocess([img], return_tensors="np")
    ours, grid = preprocess_image(img, patch_size=4, merge_size=2, temporal_patch_size=2,
                                  min_pixels=64 * 96, max_pixels=64 * 96)
    np.testing.assert_array_equal(grid, hf_out["image_grid_thw"][0])
    np.testing.assert_allclose(ours, hf_out["pixel_values"], rtol=2e-2, atol=2e-2)


# ---------------------------------------------------------------------------
# tokenize + collate + train step
# ---------------------------------------------------------------------------
def tiny_our_config():
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.dense import DenseConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.rope import RopeScalingConfig

    tok = UTF8ByteTokenizer(VL_SPECIALS)
    text = DenseConfig(
        vocab_size=280, num_hidden_layers=3, hidden_size=32, intermediate_size=64,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
        rope_scaling_cfg=RopeScalingConfig(rope_type="qwen3_vl", mrope_section=[2, 1, 1]),
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    vision = Qwen3VLVisionConfig(
        depth=2, hidden_size=16, intermediate_size=32, num_attention_heads=2,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=16, deepstack_visual_indexes=[0])
    start_id = tok.special_ids["<|vision_start|>"]
    pad_id = tok.special_ids["<|image_pad|>"]
    end_id = tok.special_ids["<|vision_end|>"]
    cfg = Qwen3VLConfig(vision_cfg=vision, text_cfg=text, image_token_id=pad_id,
                        video_token_id=pad_id, vision_start_token_id=start_id,
                        vision_end_token_id=end_id)
    return cfg, tok


def test_tokenize_and_collate():
    cfg, tok = tiny_our_config()
    fn = Qwen3VLTokenizeFn(tok, "qwen", patch_size=4, merge_size=2,
                           min_pixels=32 * 32, max_pixels=64 * 64)
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3)).astype(np.uint8)
    item = {"messages": [
        {"role": "user", "content": [
            {"type": "text", "text": "what is this?"},
            {"type": "image", "image": img},
        ]},
        {"role": "assistant", "content": "a picture"},
    ]}
    out = fn(item)
    n_patches = out["pixel_values"].shape[0]
    grid = out["image_grid_thw"][0]
    assert n_patches == int(np.prod(grid))
    n_merged = n_patches // 4
    assert int(out["image_token_mask"].sum()) == n_merged
    assert out["mrope_positions"].shape == (3, out["num_tokens"])

    batch = qwen3vl_collator([[out]], pack_max_length=128, max_patches=128,
                             num_grid_per_side=4, merge_size=2)
    assert batch["pixel_values"].shape == (128, out["pixel_values"].shape[1])
    assert batch["vision_segment_ids"].max() == 1
    assert int(batch["image_token_mask"].sum()) == n_merged
    # mrope positions: image rows/cols vary within the grid block
    mask_pos = np.where(batch["image_token_mask"][0])[0]
    h_pos = batch["mrope_positions"][0, 1, mask_pos]
    assert len(np.unique(h_pos)) == int(grid[1]) // 2


def test_truncation_through_image_raises():
    cfg, tok = tiny_our_config()
    fn = Qwen3VLTokenizeFn(tok, "qwen", patch_size=4, merge_size=2,
                           min_pixels=32 * 32, max_pixels=64 * 64, max_length=8)
    img = np.random.default_rng(0).integers(0, 255, (40, 40, 3)).astype(np.uint8)
    item = {"messages": [
        {"role": "user", "content": [{"type": "image", "image": img}]},
        {"role": "assistant", "content": "hi"},
    ]}
    with pytest.raises(ValueError, match="truncation"):
        fn(item)


@pytest.mark.slow
def test_engine_train_step():
    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.parallel import MeshConfig

    cfg, tok = tiny_our_config()
    fn = Qwen3VLTokenizeFn(tok, "qwen", patch_size=4, merge_size=2,
                           min_pixels=32 * 32, max_pixels=64 * 64)
    rng = np.random.default_rng(0)
    samples = []
    for i in range(2):
        img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
        samples.append(fn({"messages": [
            {"role": "user", "content": [{"type": "image", "image": img},
                                         {"type": "text", "text": f"caption {i}"}]},
            {"role": "assistant", "content": f"answer {i}"},
        ]}))
    micro = qwen3vl_collator([[s] for s in samples], pack_max_length=160,
                             max_patches=256, num_grid_per_side=4, merge_size=2)
    batch = {k: v[None] for k, v in micro.items()}  # A=1

    engine = TrainEngine(cfg, AdamWConfig(lr=1e-3), LRConfig(),
                         MeshConfig(fsdp_size=2, sp_size=4), total_steps=4)
    engine.init_random(0)
    m1 = engine.train_step(batch, 0)
    m2 = engine.train_step(batch, 1)
    l1 = float(m1["reduced_llm_loss"])
    l2 = float(m2["reduced_llm_loss"])
    assert np.isfinite(l1) and np.isfinite(l2) and l2 < l1


def test_freeze_vision_labels():
    cfg, _ = tiny_our_config()
    cfg = cfg.model_copy(update=dict(freeze_vision=True))
    model = cfg.build()
    labels = model.param_labels(model.param_specs())
    assert all(l == "freeze" for l in jax.tree.leaves(labels["vision"]))
    assert all(l == "train" for l in jax.tree.leaves(labels["language"]))


def test_qwen35_vl_hybrid_engine_step():
    """Qwen3.5-VL composition: the Qwen3VL vision tower over the HYBRID
    GatedDeltaNet/full-attention MoE text model trains end-to-end
    (reference compose/qwen3_5/qwen3_5_config.py)."""
    from xtuner_tpu.config.optim import AdamWConfig, LRConfig
    from xtuner_tpu.engine.train_engine import TrainEngine
    from xtuner_tpu.loss.ce_loss import CELossConfig
    from xtuner_tpu.model.hybrid import HybridMoEConfig
    from xtuner_tpu.module.attention import MHAConfig
    from xtuner_tpu.module.gated_deltanet import GatedDeltaNetConfig
    from xtuner_tpu.module.rope import RopeScalingConfig
    from xtuner_tpu.parallel import MeshConfig

    tok = UTF8ByteTokenizer(VL_SPECIALS)
    text = HybridMoEConfig(
        vocab_size=280, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, n_routed_experts=4, num_experts_per_tok=2,
        n_shared_experts=1,
        attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                            with_gate=True),
        linear_attention=GatedDeltaNetConfig(num_v_heads=4, num_k_heads=2,
                                             head_k_dim=8, head_v_dim=8,
                                             conv_kernel_size=3),
        layer_types_pattern=["linear", "full"],
        rope_scaling_cfg=RopeScalingConfig(rope_type="qwen3_vl", mrope_section=[2, 1, 1]),
        balancing_loss_coef=0.01,
        lm_loss_cfg=CELossConfig(chunk_size=64),
    )
    vision = Qwen3VLVisionConfig(
        depth=2, hidden_size=16, intermediate_size=32, num_attention_heads=2,
        patch_size=4, temporal_patch_size=2, spatial_merge_size=2,
        num_position_embeddings=16, deepstack_visual_indexes=[])
    cfg = Qwen3VLConfig(
        vision_cfg=vision, text_cfg=text,
        image_token_id=tok.special_ids["<|image_pad|>"],
        video_token_id=tok.special_ids["<|image_pad|>"],
        vision_start_token_id=tok.special_ids["<|vision_start|>"],
        vision_end_token_id=tok.special_ids["<|vision_end|>"])

    fn = Qwen3VLTokenizeFn(tok, "qwen", patch_size=4, merge_size=2,
                           min_pixels=32 * 32, max_pixels=64 * 64)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
    sample = fn({"messages": [
        {"role": "user", "content": [{"type": "image", "image": img},
                                     {"type": "text", "text": "what is this"}]},
        {"role": "assistant", "content": "a picture"},
    ]})
    micro = qwen3vl_collator([[sample], [sample]], pack_max_length=160, max_patches=256,
                             num_grid_per_side=4, merge_size=2)
    batch = {k: v[None] for k, v in micro.items()}

    engine = TrainEngine(cfg, AdamWConfig(lr=1e-3), LRConfig(),
                         MeshConfig(fsdp_size=2, sp_size=4), total_steps=3)
    engine.init_random(0)
    l1 = float(engine.train_step(batch, 0)["reduced_llm_loss"])
    l2 = float(engine.train_step(batch, 1)["reduced_llm_loss"])
    assert np.isfinite(l1) and l2 < l1
