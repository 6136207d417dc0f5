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
VIDEO_TOKEN = "<video>"


def get_frame_indices(num_frames: int, vlen: int, sample: str = "rand",
                      seed: Optional[int] = None) -> list[int]:
    """Sample frame indices from a clip of `vlen` frames (reference
    intern_s1_vl_utils.py get_frame_indices :41-68): split into uniform
    intervals, one frame per interval — 'rand' within each (deterministic
    when seeded), 'middle' at the center; short clips pad with the last
    frame. 'fpsX' samples at X frames per source frame-rate unit."""
    if sample.startswith("fps"):
        step = max(1.0 / float(sample[3:]), 1.0)
        idx = np.arange(0, vlen, step).astype(int).tolist()
        return idx if not num_frames else idx[:num_frames]
    acc = min(num_frames, vlen)
    intervals = np.linspace(0, vlen, acc + 1).astype(int)
    rng = np.random.default_rng(seed)
    indices: list[int] = []
    for lo, hi in zip(intervals[:-1], intervals[1:]):
        hi = max(hi - 1, lo + 1)
        if sample == "rand":
            indices.append(int(rng.integers(lo, hi)))
        else:  # middle
            indices.append(int((lo + hi - 1) // 2))
    if len(indices) < num_frames:  # padded with last frame
        indices += [indices[-1]] * (num_frames - len(indices))
    return indices


def _stable_int(key: dict, lo: int, hi: int) -> int:
    """Deterministic 'random' int in [lo, hi] keyed on the data item
    (reference generate_random_int_from_dict — sampling must be stable
    across the token-count precompute pass and the actual load)."""
    digest = hashlib.sha256(json.dumps(key, sort_keys=True, default=str).encode())
    return lo + int.from_bytes(digest.digest()[:4], "little") % (hi - lo + 1)


def load_video_frames(ref, num_frames: int, sample: str = "rand",
                      seed: Optional[int] = None,
                      clip: Optional[tuple[float, float]] = None) -> list[np.ndarray]:
    """-> list of (H, W, 3) uint8/float frames. Sources (reference
    read_interns1_vl_video :213-269, minus the OSS/decord backends this
    image doesn't ship): a (T, H, W, 3) ndarray / .npy clip, a directory of
    frame images (sorted), or a .gif (PIL). `clip=(start_frac, end_frac)`
    restricts sampling to a sub-range."""
    if isinstance(ref, np.ndarray):
        frames = list(ref)
    else:
        path = Path(ref)
        if path.suffix == ".npy":
            frames = list(np.load(path))
        elif path.is_dir():
            from PIL import Image

            files = sorted(p for p in path.iterdir()
                           if p.suffix.lower() in (".jpg", ".jpeg", ".png", ".npy"))
            frames = [np.load(p) if p.suffix == ".npy"
                      else np.asarray(Image.open(p).convert("RGB")) for p in files]
        elif path.suffix.lower() == ".gif":
            from PIL import Image, ImageSequence

            with Image.open(path) as im:
                frames = [np.asarray(f.convert("RGB"))
                          for f in ImageSequence.Iterator(im)]
        else:
            raise ValueError(
                f"unsupported video source {ref!r}: use a (T,H,W,3) array, "
                f".npy clip, frame directory, or .gif (mp4 decode needs a "
                f"video backend this image doesn't ship)")
    if clip is not None:
        lo = int(clip[0] * len(frames))
        hi = max(int(clip[1] * len(frames)), lo + 1)
        frames = frames[lo:hi]
    idx = get_frame_indices(num_frames, len(frames), sample, seed)
    return [frames[i] for i in idx]


def preprocess_frame(frame: np.ndarray, image_size: int = 448) -> np.ndarray:
    """One video frame -> (1, 3, S, S) normalized tile. Video frames get NO
    dynamic tiling (reference video_get_item applies the plain transform
    per frame — one patch each, unlike images)."""
    resized = _resize(frame, image_size, image_size)[None]
    out = (resized / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return out.transpose(0, 3, 1, 2).astype(np.float32)


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
                 image_root: Optional[str] = None, max_length: Optional[int] = None,
                 min_num_frames: int = 4, max_num_frames: int = 24,
                 video_context_token: Optional[str] = None,
                 frame_sample: str = "rand"):
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
        self.min_num_frames = min_num_frames
        self.max_num_frames = max_num_frames
        # reference uses a distinct <VIDEO_CONTEXT> placeholder id so the
        # model can tell frame tokens from image tokens; default to sharing
        # the image context token for tokenizers without the extra special
        self.video_context = video_context_token or img_context_token
        self.frame_sample = frame_sample
        self.img_context_id = tokenizer.encode(img_context_token, add_special_tokens=False)[0]

    def _expand_video(self, ref, item: dict) -> tuple[str, np.ndarray]:
        """Sample frames deterministically per item, preprocess each to one
        448 patch, and build the 'Frame-k: <img>ctx*N</img>' text block
        (reference replace_video_token :37-68 + video_get_item :383-470)."""
        key = {"item": item.get("id", item.get("messages", "")), "video": str(ref)}
        n = _stable_int(key, self.min_num_frames, self.max_num_frames)
        src = ref
        if not isinstance(src, np.ndarray):
            path = Path(src)
            if self.image_root and not path.is_absolute():
                path = self.image_root / path
            src = path
        frames = load_video_frames(src, n, self.frame_sample,
                                   seed=_stable_int(key, 0, 2**31 - 1),
                                   clip=item.get("clip"))
        tiles = np.concatenate([preprocess_frame(f, self.image_size) for f in frames])
        one = (self.img_start + self.video_context * self.tokens_per_tile
               + self.img_end)
        text = "\n".join(f"Frame-{i + 1}: {one}" for i in range(len(frames)))
        return text, tiles

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
                    elif part.get("type") in ("video_url", "video"):
                        text, tiles = self._expand_video(
                            part.get("video_url", part.get("video")), item)
                        pixel_tiles.append(tiles)
                        text_parts.append(text)
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
            elif VIDEO_TOKEN in content and "video" in item:
                text, tiles = self._expand_video(item["video"], item)
                pixel_tiles.append(tiles)
                content = content.replace(VIDEO_TOKEN, text, 1)
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
                          self.min_num_frames, self.max_num_frames, self.video_context,
                          self.frame_sample, self.chat_template.model_dump()],
                         sort_keys=True)
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
