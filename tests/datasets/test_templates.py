"""Tool/function/thinking chat-template formatting end-to-end with the
agent-loop parser (reference data_proto/messages/chat.py:60-280)."""

import numpy as np

from xtuner_tpu.data_proto.templates import (ChatMessages, get_chat_template,
                                             tool_formatter)
from xtuner_tpu.rl.agent_loop import parse_tool_call
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer

TOOLS = [{
    "name": "calculator",
    "description": "evaluate arithmetic",
    "parameters": {"type": "object", "properties": {"expr": {"type": "string"}}},
}]

MSGS = [
    {"role": "user", "content": "what is 2+3?"},
    {"role": "assistant", "content": "",
     "tool_calls": [{"function": {"name": "calculator", "arguments": {"expr": "2+3"}}}]},
    {"role": "tool", "content": "5"},
    {"role": "assistant", "content": "The answer is 5."},
]


def test_tool_turns_format_and_mask():
    tok = UTF8ByteTokenizer()
    tmpl = get_chat_template("qwen3")
    out = ChatMessages(messages=MSGS, tools=TOOLS).tokenize(tok, tmpl)
    text = tok.decode(out["input_ids"])

    # tool signatures injected into a system turn
    assert "<tools>" in text and '"calculator"' in text
    # assistant tool call rendered as the canonical json block
    assert '<tool_call>\n{"name": "calculator", "arguments": {"expr": "2+3"}}\n</tool_call>' in text
    # tool result framed with the tool_extractor wrapper
    assert "<tool_response>\n5\n</tool_response>" in text

    labels = np.asarray(out["labels"])
    ids = np.asarray(out["input_ids"])
    sup_text = tok.decode(ids[labels != -100].tolist())
    # the tool CALL is supervised (policy must learn to emit it)...
    assert "<tool_call>" in sup_text
    assert "The answer is 5." in sup_text
    # ...but the tool RESULT and the signatures are loss-masked
    assert "<tool_response>" not in sup_text
    assert "<tools>" not in sup_text


def test_template_toolcall_matches_agent_loop_parser():
    tok = UTF8ByteTokenizer()
    tmpl = get_chat_template("qwen3")
    out = ChatMessages(messages=MSGS, tools=TOOLS).tokenize(tok, tmpl)
    text = tok.decode(out["input_ids"])
    call = parse_tool_call(text)
    assert call is not None
    name, args = call
    assert name == "calculator"
    assert "2+3" in args


def test_thinking_only_on_last_turn():
    tok = UTF8ByteTokenizer()
    tmpl = get_chat_template("gpt-oss")
    msgs = [
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "first", "thinking": "early thought"},
        {"role": "user", "content": "again"},
        {"role": "assistant", "content": "final", "thinking": "late thought"},
    ]
    out = ChatMessages(messages=msgs).tokenize(tok, tmpl)
    text = tok.decode(out["input_ids"])
    assert "late thought" in text
    assert "early thought" not in text  # only the last round keeps thinking


def test_only_last_assistant_loss_and_format_mapping():
    tok = UTF8ByteTokenizer()
    tmpl = get_chat_template("gpt-oss")
    msgs = [
        {"role": "user", "content": "q1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": "q2"},
        {"role": "assistant", "content": "a2"},
    ]
    out = ChatMessages(messages=msgs).tokenize(tok, tmpl)
    ids, labels = np.asarray(out["input_ids"]), np.asarray(out["labels"])
    sup_text = tok.decode(ids[labels != -100].tolist())
    assert "a2" in sup_text and "a1" not in sup_text
    # supervised final turn ends with <|return|> instead of <|end|>
    assert "<|return|>" in sup_text
    full = tok.decode(ids.tolist())
    assert full.count("<|return|>") == 1


def test_tool_formatter_wraps_function_type():
    text = tool_formatter(TOOLS)
    assert '"type": "function"' in text and '"calculator"' in text


def test_parse_tool_call_legacy_form():
    assert parse_tool_call("<tool_call>search(foo bar)</tool_call>") == ("search", "foo bar")
    assert parse_tool_call("no call here") is None
