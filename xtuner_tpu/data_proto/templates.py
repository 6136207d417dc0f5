"""Chat templates + message tokenization.

Reference: xtuner/v1/data_proto/templates/ (ChatTemplate/HybridChatTemplate)
and messages/chat.py:86-280 (ChatMessages.tokenize: builds input_ids + labels
with per-message loss flags — assistant-only label masking).
"""

from __future__ import annotations

from typing import Any, Optional

from pydantic import BaseModel, ConfigDict


class ChatTemplate(BaseModel):
    """Format-string chat template (defaults: ChatML / Qwen)."""

    model_config = ConfigDict(extra="forbid")
    system: str = "<|im_start|>system\n{system}<|im_end|>\n"
    user: str = "<|im_start|>user\n{user}<|im_end|>\n<|im_start|>assistant\n"
    assistant: str = "{assistant}<|im_end|>\n"
    stop_words: list[str] = ["<|im_end|>"]
    default_system: Optional[str] = None
    # thinking-model variants (reference glm52_chat.py / qwen35_chat.py)
    thinking_prefix: Optional[str] = None


CHAT_TEMPLATE_MAP: dict[str, ChatTemplate] = {
    "qwen": ChatTemplate(),
    "chatml": ChatTemplate(),
    "internlm2": ChatTemplate(
        system="<|im_start|>system\n{system}<|im_end|>\n",
        user="<|im_start|>user\n{user}<|im_end|>\n<|im_start|>assistant\n",
        assistant="{assistant}<|im_end|>\n",
        stop_words=["<|im_end|>"],
    ),
    "llama3": ChatTemplate(
        system="<|start_header_id|>system<|end_header_id|>\n\n{system}<|eot_id|>",
        user="<|start_header_id|>user<|end_header_id|>\n\n{user}<|eot_id|>"
             "<|start_header_id|>assistant<|end_header_id|>\n\n",
        assistant="{assistant}<|eot_id|>",
        stop_words=["<|eot_id|>"],
    ),
}


def get_chat_template(name: str) -> ChatTemplate:
    if name not in CHAT_TEMPLATE_MAP:
        raise KeyError(f"Unknown chat template {name!r}; known: {sorted(CHAT_TEMPLATE_MAP)}")
    return CHAT_TEMPLATE_MAP[name]


class ChatMessages(BaseModel):
    """OpenAI-format message list with loss-flag tokenization."""

    model_config = ConfigDict(extra="allow")
    messages: list[dict[str, Any]]

    def tokenize(self, tokenizer, chat_template: ChatTemplate) -> dict:
        """-> {input_ids, labels, num_tokens}. Assistant turns are supervised
        (their closing template too); system/user/tool text is masked with
        -100 (reference chat.py per-message `loss` flags)."""
        input_ids: list[int] = []
        labels: list[int] = []

        def extend(text: str, supervised: bool) -> None:
            ids = tokenizer.encode(text, add_special_tokens=False)
            input_ids.extend(ids)
            labels.extend(ids if supervised else [-100] * len(ids))

        msgs = list(self.messages)
        if chat_template.default_system is not None and (not msgs or msgs[0]["role"] != "system"):
            msgs = [{"role": "system", "content": chat_template.default_system}] + msgs

        for msg in msgs:
            role, content = msg["role"], msg.get("content", "")
            loss_flag = msg.get("loss", role == "assistant")
            if role == "system":
                extend(chat_template.system.format(system=content), False)
            elif role in ("user", "tool"):
                extend(chat_template.user.format(user=content), False)
            elif role == "assistant":
                extend(chat_template.assistant.format(assistant=content), bool(loss_flag))
            else:
                raise ValueError(f"Unknown role {role!r}")
        return {"input_ids": input_ids, "labels": labels, "num_tokens": len(input_ids)}
