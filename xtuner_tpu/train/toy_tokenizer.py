"""UTF-8 byte toy tokenizer — used when no tokenizer_path is given
(reference: xtuner/v1/train/toy_tokenizer.py, trainer.py:656-660)."""

from __future__ import annotations


class UTF8ByteTokenizer:
    """Bytes 0-255 are ids 0-255; a few specials follow."""

    def __init__(self):
        self.specials = ["<pad>", "<bos>", "<eos>"]
        self.pad_token_id = 256
        self.bos_token_id = 257
        self.eos_token_id = 258
        self.vocab_size = 259

    def __len__(self):
        return self.vocab_size

    def encode(self, text: str, add_special_tokens: bool = False) -> list[int]:
        ids = list(text.encode("utf-8"))
        if add_special_tokens:
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
        return ids

    def decode(self, ids) -> str:
        return bytes(i for i in ids if i < 256).decode("utf-8", errors="replace")

    def __call__(self, text: str, **kw):
        return {"input_ids": self.encode(text)}
