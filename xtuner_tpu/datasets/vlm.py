"""VLM data pipeline: dynamic image tiling + vision-token tokenization.

Reference: xtuner/v1/datasets/mllm_tokenize_fn/intern_s1_vl_process.py
(find_closest_aspect_ratio :96-110, dynamic_preprocess :113-153,
dynamic_num_patch :156) and intern_s1_vl_tokenize_fn.py (InternS1VLTokenizeFunction
:71-470 — expands <image> into start/context*N/end tokens). Images are numpy
arrays here (PIL optional); normalization uses ImageNet stats like the
reference processor.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Optional

import numpy as np

from ..data_proto.templates import ChatMessages, get_chat_template

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

IMG_TOKEN = "<image>"


def find_closest_aspect_ratio(aspect_ratio: float, target_ratios, width: int, height: int,
                              image_size: int):
    """Pick the (i, j) tile grid whose aspect ratio best matches the image
    (reference intern_s1_vl_process.py:96-110)."""
    best_diff = float("inf")
    best = (1, 1)
    area = width * height
    for ratio in target_ratios:
        target_ar = ratio[0] / ratio[1]
        diff = abs(aspect_ratio - target_ar)
        if diff < best_diff:
            best_diff = diff
            best = ratio
        elif diff == best_diff:
            if area > 0.5 * image_size * image_size * ratio[0] * ratio[1]:
                best = ratio
    return best


def _resize(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Bilinear resize (H, W, C) uint8/float -> (h, w, C) float32."""
    src_h, src_w = img.shape[:2]
    ys = np.linspace(0, src_h - 1, h)
    xs = np.linspace(0, src_w - 1, w)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, src_h - 1)
    x1 = np.minimum(x0 + 1, src_w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    img = img.astype(np.float32)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def dynamic_preprocess(image: np.ndarray, image_size: int = 448, max_num: int = 12,
                       min_num: int = 1, use_thumbnail: bool = True) -> np.ndarray:
    """image: (H, W, 3) -> (num_tiles, 3, S, S) normalized fp32 tiles
    (reference dynamic_preprocess :113-153)."""
    h, w = image.shape[:2]
    aspect_ratio = w / h
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda r: r[0] * r[1],
    )
    ti, tj = find_closest_aspect_ratio(aspect_ratio, target_ratios, w, h, image_size)
    target_w, target_h = image_size * ti, image_size * tj
    resized = _resize(image, target_w, target_h)
    tiles = []
    for row in range(tj):
        for col in range(ti):
            tile = resized[row * image_size:(row + 1) * image_size,
                           col * image_size:(col + 1) * image_size]
            tiles.append(tile)
    if use_thumbnail and len(tiles) > 1:
        tiles.append(_resize(image, image_size, image_size))
    out = np.stack(tiles)  # (T, S, S, 3)
    out = (out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out.transpose(0, 3, 1, 2).astype(np.float32)  # (T, 3, S, S)


def dynamic_num_patch(width: int, height: int, image_size: int = 448, max_num: int = 12,
                      min_num: int = 1, use_thumbnail: bool = True) -> int:
    """Tile count without touching pixels (drives token-count precompute,
    reference :156)."""
    target_ratios = sorted(
        {(i, j) for n in range(min_num, max_num + 1)
         for i in range(1, n + 1) for j in range(1, n + 1)
         if min_num <= i * j <= max_num},
        key=lambda r: r[0] * r[1],
    )
    ti, tj = find_closest_aspect_ratio(width / height, target_ratios, width, height, image_size)
    n = ti * tj
    return n + 1 if use_thumbnail and n > 1 else n


class InternVLTokenizeFn:
    """OpenAI-format chat where user content may include {"type": "image_url"}
    items or a literal <image> placeholder; each image expands to
    IMG_START + IMG_CONTEXT * (tiles * tokens_per_tile) + IMG_END."""

    is_vlm = True  # routes to SoftPack in HybridMLLMPackDataset

    def __init__(self, tokenizer, chat_template: str = "qwen",
                 image_size: int = 448, max_num: int = 12, tokens_per_tile: int = 256,
                 img_start_token: str = "<img>", img_end_token: str = "</img>",
                 img_context_token: str = "<IMG_CONTEXT>",
                 image_root: Optional[str] = None, max_length: Optional[int] = None):
        self.tokenizer = tokenizer
        self.chat_template = get_chat_template(chat_template)
        self.image_size = image_size
        self.max_num = max_num
        self.tokens_per_tile = tokens_per_tile
        self.img_start = img_start_token
        self.img_end = img_end_token
        self.img_context = img_context_token
        self.image_root = Path(image_root) if image_root else None
        self.max_length = max_length
        self.img_context_id = tokenizer.encode(img_context_token, add_special_tokens=False)[0]

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

    def __call__(self, item: dict[str, Any]) -> dict:
        pixel_tiles = []
        messages = []
        for msg in item["messages"]:
            content = msg.get("content", "")
            if isinstance(content, list):
                text_parts = []
                for part in content:
                    if part.get("type") in ("image_url", "image"):
                        img = self._load_image(part.get("image_url", part.get("image")))
                        tiles = dynamic_preprocess(img, self.image_size, self.max_num)
                        pixel_tiles.append(tiles)
                        n_ctx = tiles.shape[0] * self.tokens_per_tile
                        text_parts.append(
                            self.img_start + self.img_context * n_ctx + self.img_end)
                    else:
                        text_parts.append(part.get("text", ""))
                content = "".join(text_parts)
            elif IMG_TOKEN in content and "image" in item:
                img = self._load_image(item["image"])
                tiles = dynamic_preprocess(img, self.image_size, self.max_num)
                pixel_tiles.append(tiles)
                n_ctx = tiles.shape[0] * self.tokens_per_tile
                content = content.replace(
                    IMG_TOKEN, self.img_start + self.img_context * n_ctx + self.img_end, 1)
            messages.append({**msg, "content": content})

        out = ChatMessages(messages=messages).tokenize(self.tokenizer, self.chat_template)
        if self.max_length is not None and out["num_tokens"] > self.max_length:
            out["input_ids"] = out["input_ids"][: self.max_length]
            out["labels"] = out["labels"][: self.max_length]
            out["num_tokens"] = self.max_length
        if pixel_tiles:
            out["pixel_values"] = np.concatenate(pixel_tiles)
        return out

    def hash(self) -> str:
        key = json.dumps(["internvl", self.image_size, self.max_num, self.tokens_per_tile,
                          self.chat_template.model_dump()], sort_keys=True)
        return hashlib.sha256(key.encode()).hexdigest()[:16]


def vlm_collator(packs: list[list[dict]], pack_max_length: int,
                 loss_reduction: str = "token", max_tiles: Optional[int] = None,
                 pad_token_id: int = 0) -> dict:
    """SFT collator + stacked pixel tiles, padded to a static tile count
    (reference collator.py:135 VLM collators)."""
    from .collator import sft_llm_collator

    batch = sft_llm_collator(packs, pack_max_length, loss_reduction,
                             pad_token_id=pad_token_id)
    tiles = [s["pixel_values"] for pack in packs for s in pack if "pixel_values" in s]
    if tiles:
        pixel_values = np.concatenate(tiles)
        if max_tiles is not None:
            t = pixel_values.shape[0]
            if t > max_tiles:
                # silent truncation would desync image-context tokens from
                # vision embeddings — refuse loudly instead
                raise ValueError(
                    f"micro-batch has {t} image tiles > max_tiles={max_tiles}; "
                    f"raise DataloaderConfig.max_tiles or lower image_max_num")
            if t < max_tiles:
                pad = np.zeros((max_tiles - t, *pixel_values.shape[1:]), pixel_values.dtype)
                pixel_values = np.concatenate([pixel_values, pad])
        batch["pixel_values"] = pixel_values
    return batch
