"""Collators: packed sample lists -> fixed-shape numpy batches.

Reference: xtuner/v1/datasets/collator.py (sft_llm_collator :108 packs the
sample list into one row + cu_seq_lens + shifted labels). TPU shape: each pack
becomes one (L,) row with segment ids; labels are shifted *within* each
document (the next-doc token is never a target); loss weights implement the
global calibration modes (loss/ce_loss.py).
"""

from __future__ import annotations

import numpy as np

from ..loss.ce_loss import IGNORE_IDX, build_loss_weights


def sft_llm_collator(packs: list[list[dict]], pack_max_length: int,
                     loss_reduction: str = "token",
                     pad_token_id: int = 0) -> dict[str, np.ndarray]:
    """packs: B lists of tokenized samples -> dict of (B, L) arrays. Pad
    slots carry pad_token_id with segment 0 (attention-masked, loss-ignored)."""
    b, l = len(packs), pack_max_length
    input_ids = np.full((b, l), pad_token_id, np.int32)
    segment_ids = np.zeros((b, l), np.int32)
    position_ids = np.zeros((b, l), np.int32)
    shifted_labels = np.full((b, l), IGNORE_IDX, np.int32)
    doc_lens = np.zeros((b, l), np.int64)  # supervised tokens of the doc, per token

    for bi, pack in enumerate(packs):
        offset = 0
        for seg, sample in enumerate(pack, start=1):
            ids = np.asarray(sample["input_ids"], np.int32)
            labels = np.asarray(sample["labels"], np.int32)
            n = min(len(ids), l - offset)
            if n <= 0:
                break
            ids, labels = ids[:n], labels[:n]
            sl = slice(offset, offset + n)
            input_ids[bi, sl] = ids
            segment_ids[bi, sl] = seg
            position_ids[bi, sl] = np.arange(n)
            # shift within the document: target of position t is labels[t+1]
            shifted = np.full(n, IGNORE_IDX, np.int32)
            shifted[:-1] = labels[1:]
            shifted_labels[bi, sl] = shifted
            doc_lens[bi, sl] = max(int((shifted != IGNORE_IDX).sum()), 1)
            offset += n

    loss_weights = build_loss_weights(shifted_labels, doc_lens, loss_reduction)
    return {
        "input_ids": input_ids,
        "segment_ids": segment_ids,
        "position_ids": position_ids,
        "shifted_labels": shifted_labels,
        "loss_weights": loss_weights,
    }


def fake_collator(b: int, l: int, vocab: int, seed: int = 0) -> dict[str, np.ndarray]:
    """Random batch for tests/benchmarks (reference collator.py:29)."""
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, (b, l)).astype(np.int32)
    labels = np.roll(ids, -1, 1).astype(np.int32)
    labels[:, -1] = IGNORE_IDX
    weights = (labels != IGNORE_IDX).astype(np.float32)
    return {
        "input_ids": ids,
        "segment_ids": np.ones((b, l), np.int32),
        "position_ids": np.tile(np.arange(l, dtype=np.int32), (b, 1)),
        "shifted_labels": labels,
        "loss_weights": weights,
    }
