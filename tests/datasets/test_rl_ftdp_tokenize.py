"""RL + FTDP tokenize fns (reference rl_tokenize_fn/text_tokenize_fn.py,
datasets/ftdp.py)."""

import numpy as np

from xtuner_tpu.datasets.ftdp import FtdpTokenizedDataMapping, FtdpTokenizeFn
from xtuner_tpu.datasets.rl_tokenize import RLTextTokenizeFn
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


def test_rl_tokenize_reference_schema():
    tok = UTF8ByteTokenizer()
    fn = RLTextTokenizeFn(tok, "qwen", system_prompt="be brief",
                          data_judger_mapping={"gsm8k": {"math": 0.7, "fmt": 0.3}})
    item = {
        "data_source": "gsm8k",
        "prompt": [{"role": "user", "content": "what is 2+2?"}],
        "ability": "math",
        "reward_model": {"style": "rule", "ground_truth": "4"},
        "extra_info": {"index": 7},
    }
    out = fn(item)
    assert out["num_tokens"] == len(out["prompt_ids"]) > 0
    assert out["label"] == "4"
    assert out["data_source"] == {"math": 0.7, "fmt": 0.3}
    assert out["messages"][0]["role"] == "system"
    assert out["extra_info"]["index"] == 7
    # generation prompt: the encoded prompt ends with the assistant header
    tail = tok.decode(out["prompt_ids"][-30:])
    assert "assistant" in tail

    # over-length prompts count zero tokens (dataset filter drops them)
    short = RLTextTokenizeFn(tok, "qwen", max_length=4)
    assert short(item)["num_tokens"] == 0


def test_rl_tokenize_simple_schema():
    tok = UTF8ByteTokenizer()
    fn = RLTextTokenizeFn(tok, "qwen")
    out = fn({"prompt": "hi", "label": "yo"})
    assert out["label"] == "yo" and out["num_tokens"] > 0


def test_ftdp_tokenize_loss_flags():
    tok = UTF8ByteTokenizer()
    fn = FtdpTokenizeFn(tok, "internlm2")
    item = {"dialogs": [
        {"role": "system", "content": "sys"},
        {"role": "knowledge", "content": "facts"},
        {"role": "user", "content": "q"},
        {"role": "assistant", "content": "answer!"},
    ]}
    out = fn(item)
    ids, labels = np.asarray(out["input_ids"]), np.asarray(out["labels"])
    assert out["num_tokens"] == len(ids) == len(labels)
    sup = labels != -100
    assert sup.any()
    # supervised region must decode to the assistant turn (+ its end marker)
    text = tok.decode(ids[sup].tolist())
    assert "answer!" in text
    assert "sys" not in text and "facts" not in text and "q<" not in text
    # icl-typed assistant turns stay supervised; prefix-typed do not
    out2 = fn({"dialogs": [{"role": "assistant", "content": "icl demo", "type": "icl"}]})
    assert (np.asarray(out2["labels"]) != -100).any()
    out3 = fn({"dialogs": [{"role": "assistant", "content": "pfx", "type": "prefix"}]})
    labels3 = np.asarray(out3["labels"])
    ids3 = np.asarray(out3["input_ids"])
    sup_text = tok.decode(ids3[labels3 != -100].tolist())
    assert "pfx" not in sup_text  # content unsupervised; only the end marker is


def test_ftdp_named_system_and_subrole_fold():
    tok = UTF8ByteTokenizer()
    fn = FtdpTokenizeFn(tok, "internlm2")
    out = fn({"dialogs": [
        {"role": "system", "content": "tools", "name": "plugin"},
        {"role": "user", "content": "go"},
        {"role": "assistant", "content": "calling"},
        {"role": "thought", "content": "hmm"},  # folds into the assistant turn
    ]})
    text = tok.decode(out["input_ids"])
    assert "<|plugin|>" in text
    assert "hmm" in text


def test_ftdp_pretokenized_mapping():
    fn = FtdpTokenizedDataMapping()
    out = fn({"tokens": [5, -6, 7, -8, 9]})
    assert out["input_ids"] == [5, 6, 7, 8, 9]
    # first label always ignored; negatives masked
    assert out["labels"] == [-100, -100, 7, -100, 9]
