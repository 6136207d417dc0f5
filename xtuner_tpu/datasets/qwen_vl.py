"""Qwen3-VL data pipeline: smart-resize preprocessing + tokenize fn + collator.

Reference: xtuner/v1/datasets/mllm_tokenize_fn/qwen3_vl_tokenize_fn.py
(Qwen3VLTokenizeFunction :276-1050 — smart_get_thw, placeholder expansion,
get_rope_index_3) and qwenvl_rope2d.py. Images become flat patch rows in the
HF Qwen2VL processor's merge-block order (see model/qwen3_vl.preprocess_image)
so the in-graph spatial merge is a plain reshape; MRoPE 3D positions and all
data-dependent ViT geometry are computed here on the host.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Optional

import numpy as np

from ..data_proto.templates import ChatMessages, get_chat_template
from ..model.qwen3_vl import preprocess_image, smart_resize, vision_geometry
from ..module.rope import build_mrope_positions

VISION_START = "<|vision_start|>"
VISION_END = "<|vision_end|>"
IMAGE_PAD = "<|image_pad|>"
IMG_TOKEN = "<image>"


class Qwen3VLTokenizeFn:
    """OpenAI-format chat; user content items of type image/image_url expand to
    VISION_START + IMAGE_PAD * (t*h*w / merge^2) + VISION_END with the image
    preprocessed into patch rows (reference qwen3_vl_tokenize_fn.py:569-653)."""

    is_vlm = True  # routes to SoftPack in HybridMLLMPackDataset

    def __init__(self, tokenizer, chat_template: str = "qwen",
                 patch_size: int = 16, merge_size: int = 2, temporal_patch_size: int = 2,
                 min_pixels: int = 65536, max_pixels: int = 16777216,
                 image_root: Optional[str] = None, max_length: Optional[int] = None):
        self.tokenizer = tokenizer
        self.chat_template = get_chat_template(chat_template)
        self.patch_size = patch_size
        self.merge_size = merge_size
        self.temporal_patch_size = temporal_patch_size
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        self.image_root = Path(image_root) if image_root else None
        self.max_length = max_length
        self.image_pad_id = tokenizer.encode(IMAGE_PAD, add_special_tokens=False)[0]

    # ------------------------------------------------------------------
    def _load_image(self, ref) -> np.ndarray:
        if isinstance(ref, np.ndarray):
            return ref
        path = Path(ref)
        if self.image_root and not path.is_absolute():
            path = self.image_root / path
        if path.suffix == ".npy":
            return np.load(path)
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))

    def _process(self, img: np.ndarray):
        return preprocess_image(
            img, patch_size=self.patch_size, merge_size=self.merge_size,
            temporal_patch_size=self.temporal_patch_size,
            min_pixels=self.min_pixels, max_pixels=self.max_pixels)

    def _placeholder(self, grid) -> str:
        n = int(np.prod(grid)) // (self.merge_size ** 2)
        return VISION_START + IMAGE_PAD * n + VISION_END

    # ------------------------------------------------------------------
    def __call__(self, item: dict[str, Any]) -> dict:
        patch_list, grid_list = [], []
        messages = []
        for msg in item["messages"]:
            content = msg.get("content", "")
            if isinstance(content, list):
                parts = []
                for part in content:
                    if part.get("type") in ("image_url", "image"):
                        img = self._load_image(part.get("image_url", part.get("image")))
                        patches, grid = self._process(img)
                        patch_list.append(patches)
                        grid_list.append(grid)
                        parts.append(self._placeholder(grid))
                    else:
                        parts.append(part.get("text", ""))
                content = "".join(parts)
            elif IMG_TOKEN in content and "image" in item:
                img = self._load_image(item["image"])
                patches, grid = self._process(img)
                patch_list.append(patches)
                grid_list.append(grid)
                content = content.replace(IMG_TOKEN, self._placeholder(grid_list[-1]), 1)
            messages.append({**msg, "content": content})

        out = ChatMessages(messages=messages).tokenize(self.tokenizer, self.chat_template)
        ids = np.asarray(out["input_ids"], np.int64)
        mask = ids == self.image_pad_id
        n_img_tokens = sum(int(np.prod(g)) // self.merge_size ** 2 for g in grid_list)
        if int(mask.sum()) != n_img_tokens:
            raise ValueError(
                f"image token count mismatch: {int(mask.sum())} placeholders vs "
                f"{n_img_tokens} vision tokens (template swallowed a special token?)")
        if self.max_length is not None and out["num_tokens"] > self.max_length:
            if mask[self.max_length:].any():
                # truncation would desync vision tokens from patches — the
                # reference discards such samples (qwen3_vl_tokenize_fn.py:634-641)
                raise ValueError("truncation would cut image tokens; discard sample")
            ids = ids[: self.max_length]
            mask = mask[: self.max_length]
            out["input_ids"] = out["input_ids"][: self.max_length]
            out["labels"] = out["labels"][: self.max_length]
            out["num_tokens"] = self.max_length

        if grid_list:
            grids = np.stack(grid_list)
            out["pixel_values"] = np.concatenate(patch_list)
            out["image_grid_thw"] = grids
            out["mrope_positions"] = build_mrope_positions(
                ids, mask, grids, spatial_merge=self.merge_size)  # (3, L)
            out["image_token_mask"] = mask
        return out

    # token-count precompute without touching pixels (reference
    # calc_num_tokens_multi_modal_get_item :503): width/height via item "hw"
    def count_tokens(self, item: dict[str, Any]) -> int:
        total = 0
        for msg in item["messages"]:
            content = msg.get("content", "")
            if isinstance(content, list):
                for part in content:
                    if part.get("type") in ("image_url", "image") and "hw" in part:
                        h, w = part["hw"]
                        hb, wb = smart_resize(h, w, self.patch_size * self.merge_size,
                                              self.min_pixels, self.max_pixels)
                        total += (hb // self.patch_size) * (wb // self.patch_size) \
                            // self.merge_size ** 2 + 2
        return total

    def hash(self) -> str:
        key = json.dumps(["qwen3vl", self.patch_size, self.merge_size,
                          self.temporal_patch_size, self.min_pixels, self.max_pixels,
                          self.chat_template.model_dump()], sort_keys=True, default=str)
        return hashlib.sha256(key.encode()).hexdigest()[:16]


def qwen3vl_collator(packs: list[list[dict]], pack_max_length: int,
                     loss_reduction: str = "token", max_patches: int = 0,
                     num_grid_per_side: int = 48, merge_size: int = 2,
                     pad_token_id: int = 0) -> dict:
    """SFT collator + patch rows padded to a static count + host-precomputed
    ViT geometry + per-pack MRoPE positions (reference collator.py VLM path +
    get_rope_index_3). Static shapes: pixel_values (max_patches, patch_dim)."""
    from .collator import sft_llm_collator

    batch = sft_llm_collator(packs, pack_max_length, loss_reduction,
                             pad_token_id=pad_token_id)
    b, l = batch["input_ids"].shape
    mrope = np.zeros((b, 3, l), np.int32)
    img_mask = np.zeros((b, l), bool)
    patch_arrs, grids = [], []
    for bi, pack in enumerate(packs):
        offset = 0
        for sample in pack:
            n = min(int(sample["num_tokens"]), l - offset)
            if n <= 0:
                break
            if "mrope_positions" in sample:
                mrope[bi, :, offset:offset + n] = sample["mrope_positions"][:, :n]
            else:
                mrope[bi, :, offset:offset + n] = np.arange(n)
            if "image_token_mask" in sample:
                img_mask[bi, offset:offset + n] = sample["image_token_mask"][:n]
            if "pixel_values" in sample:
                patch_arrs.append(sample["pixel_values"])
                grids.extend(list(sample["image_grid_thw"]))
            offset += n

    if not patch_arrs:
        batch["mrope_positions"] = mrope
        return batch
    pixels = np.concatenate(patch_arrs)
    p = pixels.shape[0]
    if max_patches and p > max_patches:
        raise ValueError(
            f"micro-batch has {p} vision patches > max_patches={max_patches}; "
            f"raise DataloaderConfig.max_patches or lower max_pixels")
    total = max_patches or p
    if p < total:
        pixels = np.concatenate(
            [pixels, np.zeros((total - p, pixels.shape[1]), pixels.dtype)])
    geo = vision_geometry(grids, num_grid_per_side, merge_size, total_patches=total)
    n_merged = p // merge_size ** 2
    if int(img_mask.sum()) != n_merged:
        raise ValueError(
            f"image-context tokens ({int(img_mask.sum())}) != merged vision tokens "
            f"({n_merged}): a truncated sample desynced the vision scatter")
    batch.update({
        "pixel_values": pixels,
        "image_token_mask": img_mask,
        "mrope_positions": mrope,
        **geo,
    })
    return batch
