"""Dataset preprocess converters -> OpenAI-format jsonl.

Reference: xtuner/tools/data_preprocess/ (arxiv.py abstract->title pairs,
convert_refcoco.py referring-expression -> llava conversations) plus the
legacy alpaca/sharegpt map_fns (xtuner/dataset/map_fns). Everything emits the
one canonical shape the v1 pipeline consumes: {"messages": [{role, content}]}
(text) or content lists with image items (VLM).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, Iterator


def _write_jsonl(records: Iterable[dict], out_path: str | Path) -> int:
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with out_path.open("w") as f:
        for rec in records:
            f.write(json.dumps(rec, ensure_ascii=False) + "\n")
            n += 1
    return n


def _read_any(path: str | Path) -> list:
    path = Path(path)
    text = path.read_text()
    if path.suffix == ".jsonl":
        return [json.loads(l) for l in text.splitlines() if l.strip()]
    return json.loads(text)


# ---------------------------------------------------------------------------
def alpaca_to_openai(items: list[dict]) -> Iterator[dict]:
    """{'instruction', 'input', 'output'} -> messages (legacy alpaca_map_fn)."""
    for it in items:
        if it.get("output") in (None, "", "<nooutput>"):
            continue
        user = it.get("instruction", "")
        if it.get("input"):
            user = f"{user}\n{it['input']}"
        yield {"messages": [
            {"role": "user", "content": user},
            {"role": "assistant", "content": it["output"]},
        ]}


def sharegpt_to_openai(items: list[dict]) -> Iterator[dict]:
    """{'conversations': [{'from': human|gpt|system, 'value': ...}]} ->
    messages (legacy sharegpt/llava style)."""
    role_map = {"human": "user", "gpt": "assistant", "system": "system",
                "user": "user", "assistant": "assistant"}
    for it in items:
        msgs = []
        for turn in it.get("conversations", []):
            role = role_map.get(turn.get("from", "human"))
            if role is None:
                continue
            msgs.append({"role": role, "content": turn.get("value", "")})
        if any(m["role"] == "assistant" for m in msgs):
            rec = {"messages": msgs}
            if "image" in it:
                rec["image"] = it["image"]
            yield rec


def arxiv_to_openai(items: list[dict], categories: list[str] | None = None,
                    start_date: str = "2020-01-01") -> Iterator[dict]:
    """arxiv metadata snapshot -> abstract->title pairs filtered by category
    and update date (reference tools/data_preprocess/arxiv.py)."""
    categories = categories or ["cs.AI", "cs.CL", "cs.CV"]
    for it in items:
        cats = str(it.get("categories", "")).split()
        if not set(cats) & set(categories):
            continue
        if str(it.get("update_date", "")) < start_date:
            continue
        abstract = (it.get("abstract") or "").strip()
        title = (it.get("title") or "").strip()
        if not abstract or not title:
            continue
        yield {"messages": [
            {"role": "user",
             "content": "If you are an expert in writing papers, please generate "
                        f"a good paper title for this paper based on other authors' "
                        f"descriptions of their abstracts.\n\nAbstract: {abstract}"},
            {"role": "assistant", "content": title},
        ]}


def refcoco_to_openai(items: list[dict], image_root: str = "") -> Iterator[dict]:
    """RefCOCO referring expressions -> grounded-bbox VLM conversations
    (reference convert_refcoco.py). Items: {sentence | sentences, bbox,
    image | file_name, height, width}."""
    for it in items:
        sents = it.get("sentences") or [it.get("sentence", "")]
        if isinstance(sents, str):
            sents = [sents]
        bbox = it.get("bbox")
        image = it.get("image") or it.get("file_name")
        if bbox is None or not image:
            continue
        h, w = it.get("height"), it.get("width")
        if h and w:  # normalize to [0, 1000) grounding coords
            x0, y0, bw, bh = bbox
            bbox = [round(x0 / w * 1000), round(y0 / h * 1000),
                    round((x0 + bw) / w * 1000), round((y0 + bh) / h * 1000)]
        for sent in sents:
            text = sent["sent"] if isinstance(sent, dict) else sent
            yield {
                "image": str(Path(image_root) / image) if image_root else image,
                "messages": [
                    {"role": "user",
                     "content": f"<image>\nPlease provide the bounding box "
                                f"coordinate of the region this sentence describes: {text}"},
                    {"role": "assistant", "content": json.dumps(bbox)},
                ],
            }


CONVERTERS = {
    "alpaca": alpaca_to_openai,
    "sharegpt": sharegpt_to_openai,
    "arxiv": arxiv_to_openai,
    "refcoco": refcoco_to_openai,
}


def convert(format: str, in_path: str | Path, out_path: str | Path, **kw) -> int:
    """Load -> convert -> write; returns the record count."""
    fn = CONVERTERS[format]
    return _write_jsonl(fn(_read_any(in_path), **kw), out_path)
