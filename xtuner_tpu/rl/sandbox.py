"""Sandboxed code-execution agent loop.

Reference: xtuner/v1/rl/agent_loop/sandbox_agent_loop/sandbox.py (1,170 LoC)
— RL rollouts where the policy emits code that runs in an isolated
environment, with the captured output fed back as a tool turn. TPU/host
redesign: a subprocess sandbox (`python -I`, fresh interpreter, rlimits for
CPU/memory/filesize, wall-clock kill) behind the existing ToolAgentLoop
machinery, plus fenced-code parsing (the sandbox variant accepts
```python ...``` blocks as implicit execution requests, not only
<tool_call> JSON).
"""

from __future__ import annotations

import re
import subprocess
import sys
from dataclasses import dataclass
from typing import Optional

from .agent_loop import ToolAgentLoop

FENCED_CODE_RE = re.compile(r"```(?:python|py)\n(.*?)```", re.DOTALL)


@dataclass
class SandboxConfig:
    timeout_s: float = 10.0
    memory_mb: int = 512
    max_output_chars: int = 2000
    cpu_time_s: int = 10


"""Child-side bootstrap: rlimits are applied INSIDE the spawned interpreter
(not via preexec_fn, which forces a plain fork — unsafe and slow under the
multithreaded JAX runtime; without it CPython uses posix_spawn). User code
arrives on stdin and runs under the limits."""
_CHILD_BOOTSTRAP = """
import resource, sys
_mem = {mem}
resource.setrlimit(resource.RLIMIT_AS, (_mem, _mem))
resource.setrlimit(resource.RLIMIT_CPU, ({cpu}, {cpu}))
resource.setrlimit(resource.RLIMIT_FSIZE, (1 << 20, 1 << 20))
resource.setrlimit(resource.RLIMIT_NPROC, (16, 16))
_src = sys.stdin.read()
del resource, sys
exec(compile(_src, "<sandbox>", "exec"), {{"__name__": "__main__"}})
"""


class PythonSandbox:
    """One-shot isolated python execution (fresh `python -I` per call)."""

    def __init__(self, cfg: SandboxConfig = SandboxConfig()):
        self.cfg = cfg

    def run(self, code: str) -> str:
        bootstrap = _CHILD_BOOTSTRAP.format(
            mem=self.cfg.memory_mb * 1024 * 1024, cpu=self.cfg.cpu_time_s)
        try:
            proc = subprocess.run(
                [sys.executable, "-I", "-c", bootstrap],
                input=code,
                capture_output=True, text=True, timeout=self.cfg.timeout_s,
                cwd="/tmp",
            )
            out = proc.stdout
            if proc.returncode != 0:
                out += ("\n" if out else "") + f"[exit {proc.returncode}] {proc.stderr.strip()}"
        except subprocess.TimeoutExpired:
            out = f"[timeout after {self.cfg.timeout_s}s]"
        except Exception as e:  # resource denial etc.
            out = f"[sandbox error: {e}]"
        out = out.strip() or "[no output]"
        if len(out) > self.cfg.max_output_chars:
            out = out[: self.cfg.max_output_chars] + "...[truncated]"
        return out


class SandboxAgentLoop(ToolAgentLoop):
    """ToolAgentLoop with a sandboxed `python` tool; additionally treats a
    trailing fenced ```python``` block as an execution request (reference
    sandbox loop behavior), so models that answer with plain code still get
    their program executed and observed."""

    def __init__(self, generate_fn, tokenizer, max_turns: int = 4,
                 sandbox: Optional[PythonSandbox] = None,
                 tool_result_template: str = "\n<tool_result>{}</tool_result>\n",
                 extra_tools: Optional[dict] = None):
        self.sandbox = sandbox or PythonSandbox()
        tools = {"python": self.sandbox.run, **(extra_tools or {})}
        super().__init__(generate_fn, tokenizer, tools, max_turns, tool_result_template)

    def _handle_no_tool_call(self, text: str):
        fenced = FENCED_CODE_RE.findall(text)
        if not fenced:
            return None  # final answer
        return self.sandbox.run(fenced[-1])
