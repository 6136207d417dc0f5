"""FTDP processed-dialog tokenization.

Reference: xtuner/v1/datasets/ftdp.py (805 LoC) — tokenizes InternLM's
"ftdp" processed format: items are {"dialogs": [...]} where each dialog turn
carries a role (system/user/assistant plus sub-roles like knowledge,
interpreter/plugin-named system turns, environment, answer_prefix/middle/
postfix), an optional `type` in {"icl", "current", "prefix"} and a per-part
loss policy defined by the role config. The reference masks tokens by
negating ids; here each part is an explicit (ids, supervised) pair.

Only the internlm2 and qwen role configs are provided (ROLE_CONFIG analog);
the schema accepts custom configs for the rest.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Optional

IGNORE_IDX = -100
MAX_LEN = 32 * 1024


def _role(begin_without: str, end_str: str, *, begin_with: str = "",
          names: dict | None = None, fallback: str | None = None,
          belong: str | None = None, **loss) -> dict:
    return {
        "begin": {"with_name": begin_with, "without_name": begin_without,
                  "name": names or {}},
        "end": end_str,
        "loss": loss,
        "fallback_role": fallback,
        "belong": belong,
    }


INTERNLM2_ROLES: dict[str, dict] = {
    "system": _role("<|im_start|>system\n", "<|im_end|>\n",
                    begin_with="<|im_start|>system name={name}\n",
                    names={"interpreter": "<|interpreter|>", "plugin": "<|plugin|>"},
                    meta=False, icl=False, current=False, prefix=False),
    "user": _role("<|im_start|>user\n", "<|im_end|>\n",
                  begin_with="<|im_start|>user name={name}\n",
                  icl=False, current=False, prefix=False),
    "assistant": _role("<|im_start|>assistant\n", "<|im_end|>\n",
                       begin_with="<|im_start|>assistant name={name}\n",
                       names={"interpreter": "<|interpreter|>", "plugin": "<|plugin|>"},
                       icl=True, current=True, prefix=False, end=True),
    "knowledge": _role("<|im_start|>knowledge\n", "<|im_end|>\n",
                       icl=False, current=False, prefix=False),
    "environment": _role("<|im_start|>environment\n", "<|im_end|>\n",
                         begin_with="<|im_start|>environment name={name}\n",
                         names={"interpreter": "<|interpreter|>", "plugin": "<|plugin|>"},
                         icl=False, current=False, prefix=False),
    # split-answer sub-roles: prefix unsupervised, middle supervised w/o end,
    # postfix closes the turn
    "answer_prefix": _role("<|im_start|>assistant\n", "",
                           begin_with="<|im_start|>assistant name={name}\n",
                           icl=False, current=False, prefix=False),
    "answer_middle": _role("", "", icl=False, current=True, prefix=False),
    "answer_postfix": _role("", "<|im_end|>\n", icl=True, current=True, prefix=False,
                            end=True),
    "pretrain_meta": _role("", "", icl=False, current=False, prefix=False, end=False),
    "pretrain_content": _role("", "</s>", icl=True, current=True, prefix=False, end=True),
    # sub-roles folded into their parent turn
    "thought": _role("", "", belong="assistant", icl=True, current=True, prefix=False),
    "interpreter_call": _role("", "", belong="assistant", icl=True, current=True,
                              prefix=False),
}

QWEN_ROLES = {k: v for k, v in INTERNLM2_ROLES.items()}

ROLE_CONFIG: dict[str, dict[str, dict]] = {
    "internlm2": INTERNLM2_ROLES,
    "qwen": QWEN_ROLES,
    "qwen2": QWEN_ROLES,
}


def _format_begin(role_cfg: dict, message: dict) -> str:
    name = message.get("name")
    if name is not None:
        begin = role_cfg["begin"].get("with_name", "")
        mapped = role_cfg["begin"].get("name", {}).get(name, name)
        return begin.format(name=mapped)
    return role_cfg["begin"].get("without_name", "")


_TOP_ROLES = ("assistant", "user", "system", "environment", "pretrain_content",
              "pretrain_meta", "answer_prefix", "answer_middle", "answer_postfix")


def _fold_sub_roles(messages: list[dict], roles: dict) -> list[dict]:
    """Sub-roles render with their own begin/end then merge into a parent
    turn (reference format_sub_role :609-638)."""
    out: list[dict] = []
    for m in messages:
        if m["role"] in _TOP_ROLES:
            out.append(dict(m))
            continue
        cfg = roles[m["role"]]
        text = _format_begin(cfg, m) + m["content"] + cfg["end"]
        if cfg.get("fallback_role"):
            out.append({"role": cfg["fallback_role"], "content": text})
        elif cfg.get("belong"):
            if out and out[-1]["role"] == cfg["belong"]:
                out[-1]["content"] += text
            else:
                out.append({"role": cfg["belong"], "content": text})
        else:
            out.append(dict(m))
    return out


def ftdp_tokenize(tokenizer, messages, role_config: dict[str, dict],
                  max_length: Optional[int] = None) -> dict[str, Any]:
    """messages: list of dialog turns or {"dialogs": [...]}. Returns
    {input_ids, labels, num_tokens} with per-part loss flags applied."""
    if isinstance(messages, dict) and "dialogs" in messages:
        messages = messages["dialogs"]
    msgs = _fold_sub_roles(messages, role_config)

    input_ids: list[int] = []
    labels: list[int] = []

    def emit(ids: list[int], supervised: bool):
        input_ids.extend(ids)
        labels.extend(ids if supervised else [IGNORE_IDX] * len(ids))

    for m in msgs:
        cfg = role_config[m["role"]]
        begin = _format_begin(cfg, m)
        end = cfg["end"]
        begin_ids = tokenizer.encode(begin, add_special_tokens=False) if begin else []
        both = tokenizer.encode(begin + m["content"] + end, add_special_tokens=False)
        end_ids = tokenizer.encode(end, add_special_tokens=False) if end else []
        stop = len(both) - len(end_ids) if end_ids else len(both)
        content_ids = both[len(begin_ids): stop]

        loss_cfg = cfg["loss"] if m.get("loss", True) else {}
        loss_type = m.get("type", "current")
        emit(begin_ids, bool(loss_cfg.get("begin", False)))
        emit(content_ids, bool(loss_cfg.get(loss_type, False)))
        emit(end_ids, bool(loss_cfg.get("end", False)))

    if getattr(tokenizer, "bos_token_id", None):
        input_ids = [tokenizer.bos_token_id] + input_ids
        labels = [IGNORE_IDX] + labels
    limit = max_length or MAX_LEN
    input_ids, labels = input_ids[:limit], labels[:limit]
    if labels:
        labels[0] = IGNORE_IDX
    return {"input_ids": input_ids, "labels": labels, "num_tokens": len(input_ids)}


class FtdpTokenizeFn:
    """JsonlDataset-compatible tokenize fn for ftdp items
    (reference FtdpTokenizeFunction :711-752)."""

    def __init__(self, tokenizer, chat_template: str = "internlm2",
                 max_length: Optional[int] = None):
        self.tokenizer = tokenizer
        self.role_config = ROLE_CONFIG[chat_template]
        self.chat_template = chat_template
        self.max_length = max_length

    def __call__(self, item) -> dict[str, Any]:
        return ftdp_tokenize(self.tokenizer, item, self.role_config, self.max_length)

    def hash(self) -> str:
        from .tokenize_fns import _tokenizer_fingerprint

        key = json.dumps([self.chat_template, self.max_length,
                          _tokenizer_fingerprint(self.tokenizer)], sort_keys=True)
        return f"ftdp-v1-{hashlib.sha256(key.encode()).hexdigest()[:12]}"


class FtdpTokenizedDataMapping:
    """Pre-tokenized ftdp shards: {"tokens": [...]} where negative ids mark
    loss-masked positions (reference FtdpTokenizedDataMapping :754-786)."""

    def __init__(self, max_length: Optional[int] = None):
        self.max_length = max_length

    def __call__(self, item: dict) -> dict[str, Any]:
        toks = item["tokens"][: self.max_length or MAX_LEN]
        input_ids = [abs(t) for t in toks]
        labels = [t if t >= 0 else IGNORE_IDX for t in toks]
        if labels:
            labels[0] = IGNORE_IDX
        return {"input_ids": input_ids, "labels": labels, "num_tokens": len(input_ids)}

    def hash(self) -> str:
        return f"ftdp-pretok-v1-{self.max_length}"
