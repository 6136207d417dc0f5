"""Agent loops: single-turn and multi-turn tool-calling rollout.

Reference: xtuner/v1/rl/agent_loop/ (AgentLoop :165-253 single-turn;
localhost_agent_loop/agent_in_localhost_loop.py — multi-turn agent invoking
local tools between generations). The loop produces SEGMENTS with
model-generated flags so the RL packer can supervise only the tokens the
policy actually produced (tool outputs and prompts are loss-masked).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np

TOOL_CALL_RE = re.compile(r"<tool_call>\s*(\w+)\((.*?)\)\s*</tool_call>", re.DOTALL)
TOOL_CALL_JSON_RE = re.compile(r"<tool_call>\s*(\{.*?)\s*</tool_call>", re.DOTALL)


def parse_tool_call(text: str) -> Optional[tuple[str, str]]:
    """-> (name, args) from the FIRST <tool_call> block, accepting both the
    canonical json form the chat templates emit
    (`{"name": ..., "arguments": {...}}`, reference qwen3 tool_prompt) and the
    legacy `name(args)` form."""
    for m in TOOL_CALL_JSON_RE.finditer(text):
        # skip malformed blocks (e.g. the instruction example in tool_prompt)
        try:
            call = json.loads(m.group(1))
            args = call.get("arguments", {})
            return str(call["name"]), (args if isinstance(args, str)
                                       else json.dumps(args, ensure_ascii=False))
        except (json.JSONDecodeError, KeyError, TypeError):
            continue
    m = TOOL_CALL_RE.search(text)
    if m:
        return m.group(1), m.group(2)
    return None


@dataclass
class Segment:
    ids: list[int]
    generated: bool  # True = produced by the policy (supervised in RL)
    logprobs: Optional[list[float]] = None


@dataclass
class AgentRollout:
    segments: list[Segment] = field(default_factory=list)
    final_text: str = ""
    num_turns: int = 0
    stop_reason: str = ""

    def response_ids(self) -> list[int]:
        return [t for s in self.segments if s.generated for t in s.ids]

    def flatten(self) -> tuple[list[int], list[bool], list[float]]:
        """-> (ids, generated mask, logprobs aligned with generated ids)."""
        ids, gen, lps = [], [], []
        for s in self.segments:
            ids.extend(s.ids)
            gen.extend([s.generated] * len(s.ids))
            lps.extend(s.logprobs if s.logprobs is not None else [0.0] * len(s.ids))
        return ids, gen, lps


class ToolAgentLoop:
    """Multi-turn loop: generate -> parse <tool_call>name(args)</tool_call> ->
    run tool -> feed result back -> repeat until no tool call / max turns."""

    def __init__(self, generate_fn: Callable, tokenizer,
                 tools: dict[str, Callable[[str], str]],
                 max_turns: int = 4, tool_result_template: str = "\n<tool_result>{}</tool_result>\n"):
        """generate_fn(prompt_ids: list[int]) -> (ids: list[int], logprobs: list[float])."""
        self.generate_fn = generate_fn
        self.tokenizer = tokenizer
        self.tools = tools
        self.max_turns = max_turns
        self.tool_result_template = tool_result_template

    def _handle_no_tool_call(self, text: str):
        """Hook for subclasses: a tool result to feed back when the turn has
        no <tool_call> (None = final answer, stop the loop)."""
        return None

    def _early_stop(self, text: str) -> bool:
        """Hook for subclasses: True terminates the rollout after this turn
        (e.g. a per-turn judger already scored it — reference sandbox
        judger.py hook). Checked before tool-call parsing."""
        return False

    def run(self, prompt_ids: list[int]) -> AgentRollout:
        rollout = AgentRollout()
        rollout.segments.append(Segment(list(prompt_ids), generated=False))
        context = list(prompt_ids)
        for turn in range(self.max_turns):
            gen_ids, logprobs = self.generate_fn(context)
            rollout.segments.append(Segment(list(gen_ids), generated=True,
                                            logprobs=list(logprobs)))
            context = context + list(gen_ids)
            text = self.tokenizer.decode(gen_ids)
            rollout.final_text += text
            rollout.num_turns = turn + 1
            if self._early_stop(text):
                rollout.stop_reason = "judged"
                return rollout
            call = parse_tool_call(text)
            if call is None:
                result = self._handle_no_tool_call(text)
                if result is None:
                    rollout.stop_reason = "answer"
                    return rollout
            else:
                name, args = call
                tool = self.tools.get(name)
                result = tool(args) if tool is not None else f"error: unknown tool {name}"
            if "{tool_extractor}" in self.tool_result_template:
                # a ChatTemplate.tool_extractor was passed directly
                framed = self.tool_result_template.format(tool_extractor=result)
            else:
                framed = self.tool_result_template.format(result)
            result_ids = self.tokenizer.encode(framed, add_special_tokens=False)
            rollout.segments.append(Segment(result_ids, generated=False))
            context = context + result_ids
        rollout.stop_reason = "max_turns"
        return rollout


def pack_agent_rollouts(rollouts: list, advantages: list[float], max_len: int,
                        pad_id: int = 0) -> dict[str, np.ndarray]:
    """AgentRollouts -> (1, B, L) GRPO batch; only policy-generated tokens are
    supervised (tool results / prompts loss-masked)."""
    b = len(rollouts)
    max_len = -(-max_len // 128) * 128
    ids = np.full((b, max_len), pad_id, np.int32)
    seg = np.zeros((b, max_len), np.int32)
    pos = np.zeros((b, max_len), np.int32)
    labels = np.full((b, max_len), -100, np.int32)
    old_lp = np.zeros((b, max_len), np.float32)
    adv = np.zeros((b, max_len), np.float32)
    for bi, (r, a) in enumerate(zip(rollouts, advantages)):
        flat_ids, gen, lps = r.flatten()
        n = min(len(flat_ids), max_len)
        ids[bi, :n] = flat_ids[:n]
        seg[bi, :n] = 1
        pos[bi, :n] = np.arange(n)
        # supervise position t-1 -> token t when token t was policy-generated
        for t in range(1, n):
            if gen[t]:
                labels[bi, t - 1] = flat_ids[t]
                old_lp[bi, t - 1] = lps[t]
                adv[bi, t - 1] = a
    mask = (labels != -100).astype(np.float32)
    return {
        "input_ids": ids[None], "segment_ids": seg[None], "position_ids": pos[None],
        "shifted_labels": labels[None], "loss_weights": mask[None],
        "old_logprobs": old_lp[None], "advantages": adv[None],
    }
