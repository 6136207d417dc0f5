"""Sandboxed code-execution agent loops and sessions.

Reference: xtuner/v1/rl/agent_loop/sandbox_agent_loop/ — sandbox.py (1,170
LoC: SandboxPool of long-lived remote sandbox containers, staged
setup/run/judge execution with per-entry records, failure policies, file
upload, health checks) + agent_in_sandbox_loop.py + judger.py. TPU/host
redesign: the sandboxes are local subprocesses instead of remote HTTP
containers (a single-controller TPU host drives its own rollout workers, so
an HTTP sandbox farm is an ops choice, not an architecture requirement):

- `PythonSandbox`: one-shot isolated execution (`python -I`, fresh
  interpreter, rlimits for CPU/memory/filesize, wall-clock kill).
- `SandboxSession`: PERSISTENT stateful interpreter — variables survive
  across turns (the reference's long-lived sandbox semantics); framed
  JSON protocol over pipes, per-call wall timeout, kill+restart on wedge,
  parent-side file staging into a private workdir (the local analog of
  the reference's http_upload/upload_tar_and_extract).
- `SandboxPool`: named reusable sessions with health-checked acquire and
  release_all (reference SandboxPool :829-934).
- `StagedSandboxRollout`: setup -> multi-turn agent (tools execute IN the
  session) -> judge, with per-entry `EntryRecord` diagnostics and a
  retry failure policy (reference SandboxStage :642-726,
  EntryFailurePolicy :144-190).
- `SandboxAgentLoop`: ToolAgentLoop over a sandbox, with fenced
  ```python ...``` blocks treated as implicit execution requests and an
  optional per-turn judger that can terminate the rollout early
  (reference judger.py hook).
"""

from __future__ import annotations

import json
import os
import re
import select
import shutil
import struct
import subprocess
import sys
import tempfile
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from .agent_loop import AgentRollout, ToolAgentLoop

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


"""Session child: a framed-JSON exec server inside one `python -I`
interpreter. Globals persist across requests (stateful, REPL-like). Frames:
<u32 little-endian length><json payload>. User prints/tracebacks are
captured per call and returned; the frame pipe is the RAW stdout fd."""
_SESSION_CHILD = """
import contextlib, io, json, resource, struct, sys, traceback
_mem, _cpu = {mem}, {cpu}
resource.setrlimit(resource.RLIMIT_AS, (_mem, _mem))
resource.setrlimit(resource.RLIMIT_CPU, (_cpu, _cpu))
resource.setrlimit(resource.RLIMIT_FSIZE, (1 << 24, 1 << 24))
_in, _out = sys.stdin.buffer, sys.stdout.buffer
_g = {{"__name__": "__main__"}}
while True:
    _hdr = _in.read(4)
    if len(_hdr) < 4:
        break
    _req = json.loads(_in.read(struct.unpack("<I", _hdr)[0]).decode())
    _buf = io.StringIO()
    _ok = True
    try:
        with contextlib.redirect_stdout(_buf), contextlib.redirect_stderr(_buf):
            exec(compile(_req["code"], "<sandbox>", "exec"), _g)
    except SystemExit as _e:
        _ok = _e.code in (0, None)
        _buf.write(f"[SystemExit {{_e.code}}]")
    except BaseException:
        _ok = False
        _buf.write(traceback.format_exc(limit=8))
    _data = json.dumps({{"out": _buf.getvalue(), "ok": _ok}}).encode()
    _out.write(struct.pack("<I", len(_data)) + _data)
    _out.flush()
"""


class SandboxSession:
    """Persistent stateful sandbox: one isolated interpreter whose globals
    survive across `exec` calls — a multi-turn agent can define state in
    turn 1 and use it in turn 3 (the reference's long-lived sandbox
    container semantics, sandbox.py SandboxPool/exec_in). Each session owns
    a private temp workdir (cwd of the child); `upload` stages files there
    parent-side. A wall-clock timeout kills and marks the session dead —
    `restart()` (or pool re-acquire) brings up a fresh interpreter."""

    def __init__(self, cfg: SandboxConfig = SandboxConfig(), workdir: Optional[str] = None):
        self.cfg = cfg
        self._own_workdir = workdir is None
        self.workdir = workdir or tempfile.mkdtemp(prefix="xt_sandbox_")
        self.proc: Optional[subprocess.Popen] = None
        self.calls = 0
        self.last_ok = True  # did the LAST exec complete without exception?
        self._start()

    def _start(self) -> None:
        child = _SESSION_CHILD.format(
            mem=self.cfg.memory_mb * 1024 * 1024,
            # session CPU budget covers MANY calls; wall timeout per call is
            # the primary control
            cpu=max(self.cfg.cpu_time_s, 1) * 64)
        self.proc = subprocess.Popen(
            [sys.executable, "-I", "-c", child],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL, cwd=self.workdir)
        self.calls = 0

    def alive(self) -> bool:
        return self.proc is not None and self.proc.poll() is None

    def restart(self) -> None:
        self._kill()
        self._start()

    # ------------------------------------------------------------- actions
    def upload(self, files: dict[str, Any]) -> None:
        """Stage files into the session workdir (path -> str|bytes). Local
        analog of the reference's http_upload/upload_tar_and_extract
        (sandbox.py:1085-1137) — the sandbox is on this host, so staging is
        a direct write outside the child's control."""
        for rel, content in files.items():
            dest = os.path.normpath(os.path.join(self.workdir, rel))
            if not dest.startswith(os.path.abspath(self.workdir)):
                raise ValueError(f"upload path escapes workdir: {rel}")
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            mode = "wb" if isinstance(content, bytes) else "w"
            with open(dest, mode) as f:
                f.write(content)

    def exec(self, code: str, timeout_s: Optional[float] = None) -> str:
        """Run `code` in the persistent interpreter; returns captured
        stdout+stderr (truncated). Timeout/violation kills the child — the
        caller sees a bracketed status string, never an exception."""
        self.last_ok = False
        if not self.alive():
            return "[sandbox session dead]"
        deadline = time.monotonic() + (timeout_s or self.cfg.timeout_s)
        try:
            data = json.dumps({"code": code}).encode()
            self.proc.stdin.write(struct.pack("<I", len(data)) + data)
            self.proc.stdin.flush()
            frame = self._read_frame(deadline)
        except (BrokenPipeError, OSError):
            self._kill()
            return "[sandbox session crashed]"
        if frame is None:
            self._kill()
            return f"[timeout after {timeout_s or self.cfg.timeout_s}s]"
        self.calls += 1
        self.last_ok = bool(frame["ok"])
        out = frame["out"].strip() or ("[no output]" if frame["ok"] else "[error]")
        if len(out) > self.cfg.max_output_chars:
            out = out[: self.cfg.max_output_chars] + "...[truncated]"
        return out

    def _read_frame(self, deadline: float) -> Optional[dict]:
        fd = self.proc.stdout.fileno()
        buf = b""
        need = 4
        body = False
        while True:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                return None
            r, _, _ = select.select([fd], [], [], min(remaining, 0.5))
            if not r:
                if self.proc.poll() is not None:
                    return None
                continue
            chunk = os.read(fd, 65536)
            if not chunk:  # child died
                return None
            buf += chunk
            if not body and len(buf) >= 4:
                need = struct.unpack("<I", buf[:4])[0]
                buf = buf[4:]
                body = True
            if body and len(buf) >= need:
                return json.loads(buf[:need].decode())

    def _kill(self) -> None:
        if self.proc is not None and self.proc.poll() is None:
            self.proc.kill()
            self.proc.wait()

    def close(self) -> None:
        self._kill()
        if self._own_workdir:
            shutil.rmtree(self.workdir, ignore_errors=True)


class SandboxPool:
    """Named, reusable sandbox sessions (reference SandboxPool,
    sandbox.py:829-934): `get` returns a healthy session for the name,
    transparently restarting a dead/wedged one; `release_all` tears
    everything down (end of a rollout batch / weight update)."""

    def __init__(self, cfg: SandboxConfig = SandboxConfig(), max_sessions: int = 16):
        self.cfg = cfg
        self.max_sessions = max_sessions
        self.sessions: dict[str, SandboxSession] = {}
        self.restarts = 0

    def get(self, name: str) -> SandboxSession:
        s = self.sessions.get(name)
        if s is None:
            if len(self.sessions) >= self.max_sessions:
                # evict the coldest (fewest calls) idle session
                victim = min(self.sessions, key=lambda k: self.sessions[k].calls)
                self.sessions.pop(victim).close()
            s = SandboxSession(self.cfg)
            self.sessions[name] = s
        elif not s.alive():
            s.restart()
            self.restarts += 1
        return s

    def release(self, name: str) -> None:
        s = self.sessions.pop(name, None)
        if s is not None:
            s.close()

    def release_all(self) -> None:
        for s in self.sessions.values():
            s.close()
        self.sessions.clear()


# ---------------------------------------------------------------------------
# staged execution: setup -> agent -> judge with per-entry diagnostics


@dataclass
class EntryRecord:
    """One executed entry's diagnostics (reference EntryRecord/StageRecord,
    sandbox.py:59-143)."""

    kind: str  # setup | turn | judge
    input: str
    output: str
    ok: bool
    duration_s: float


@dataclass
class SandboxRolloutResult:
    rollout: Optional[AgentRollout]
    reward: float
    records: list[EntryRecord] = field(default_factory=list)
    ok: bool = True
    fail_reason: str = ""
    attempts: int = 1


class StagedSandboxRollout:
    """Per-item staged execution against a pooled session (reference
    SandboxStage.run, sandbox.py:642-726):

    1. SETUP: stage `files` into the workdir, run `setup` scripts; any
       failure aborts the item (retried up to `max_retries` on a FRESH
       session — the reference's EntryFailurePolicy).
    2. AGENT: multi-turn tool loop; the `python` tool executes in the SAME
       persistent session, so state accumulates across turns.
    3. JUDGE: `judge_code` runs in the session (it can inspect state the
       agent created) and must print a float reward; or `judge_fn`
       (final_text, session) -> float runs parent-side.
    """

    def __init__(self, generate_fn: Callable, tokenizer,
                 pool: Optional[SandboxPool] = None, max_turns: int = 4,
                 setup: tuple = (), files: Optional[dict] = None,
                 judge_code: Optional[str] = None,
                 judge_fn: Optional[Callable] = None,
                 max_retries: int = 1,
                 per_turn_judger: Optional[Callable] = None,
                 cfg: SandboxConfig = SandboxConfig()):
        self.generate_fn = generate_fn
        self.tokenizer = tokenizer
        self.pool = pool or SandboxPool(cfg)
        self.max_turns = max_turns
        self.setup = list(setup)
        self.files = files or {}
        self.judge_code = judge_code
        self.judge_fn = judge_fn
        self.max_retries = max_retries
        self.per_turn_judger = per_turn_judger
        self.cfg = cfg

    def run(self, name: str, prompt_ids: list[int]) -> SandboxRolloutResult:
        last = None
        for attempt in range(1, self.max_retries + 2):
            res = self._run_once(name, prompt_ids)
            res.attempts = attempt
            if res.ok:
                return res
            self.pool.release(name)  # fresh session for the retry
            last = res
        return last

    def _run_once(self, name: str, prompt_ids: list[int]) -> SandboxRolloutResult:
        session = self.pool.get(name)
        records: list[EntryRecord] = []

        def entry(kind: str, code: str) -> EntryRecord:
            t0 = time.monotonic()
            out = session.exec(code)
            rec = EntryRecord(kind, code, out, session.alive() and session.last_ok,
                              time.monotonic() - t0)
            records.append(rec)
            return rec

        if self.files:
            session.upload(self.files)
        for script in self.setup:
            rec = entry("setup", script)
            if not rec.ok:
                return SandboxRolloutResult(None, 0.0, records, ok=False,
                                            fail_reason=f"setup: {rec.output[:200]}")

        loop = SandboxAgentLoop(
            self.generate_fn, self.tokenizer, max_turns=self.max_turns,
            session=session, per_turn_judger=self.per_turn_judger,
            entry_sink=records.append)
        rollout = loop.run(prompt_ids)

        reward = loop.judged_reward
        if reward is None and self.judge_code is not None:
            rec = entry("judge", self.judge_code)
            if not rec.ok:
                return SandboxRolloutResult(rollout, 0.0, records, ok=False,
                                            fail_reason=f"judge: {rec.output[:200]}")
            try:
                reward = float(rec.output.strip().splitlines()[-1])
            except (ValueError, IndexError):
                return SandboxRolloutResult(rollout, 0.0, records, ok=False,
                                            fail_reason=f"judge output not a float: {rec.output[:200]}")
        if reward is None and self.judge_fn is not None:
            reward = float(self.judge_fn(rollout.final_text, session))
        return SandboxRolloutResult(rollout, reward or 0.0, records)


class SandboxAgentLoop(ToolAgentLoop):
    """ToolAgentLoop with a sandboxed `python` tool; additionally treats a
    trailing fenced ```python``` block as an execution request (reference
    sandbox loop behavior), so models that answer with plain code still get
    their program executed and observed.

    Execution target is either a one-shot `PythonSandbox` (default) or a
    persistent `SandboxSession` — in the session case state the agent builds
    in turn 1 is visible in turn 3 and to the judge (reference
    agent_in_sandbox_loop.py runs every turn inside ONE container).

    `per_turn_judger(text) -> Optional[float]`: scored -> the rollout stops
    with stop_reason="judged" and the reward lands on `self.judged_reward`
    (reference judger.py early-termination hook). `entry_sink` receives an
    `EntryRecord` per executed tool call for staged-rollout diagnostics."""

    def __init__(self, generate_fn, tokenizer, max_turns: int = 4,
                 sandbox: Optional[PythonSandbox] = None,
                 session: Optional[SandboxSession] = None,
                 tool_result_template: str = "\n<tool_result>{}</tool_result>\n",
                 extra_tools: Optional[dict] = None,
                 per_turn_judger: Optional[Callable[[str], Optional[float]]] = None,
                 entry_sink: Optional[Callable[["EntryRecord"], None]] = None):
        self.session = session
        self.sandbox = sandbox if sandbox is not None else (
            None if session is not None else PythonSandbox())
        self.per_turn_judger = per_turn_judger
        self.entry_sink = entry_sink
        self.judged_reward: Optional[float] = None
        tools = {"python": self._run_python, **(extra_tools or {})}
        super().__init__(generate_fn, tokenizer, tools, max_turns, tool_result_template)

    def _run_python(self, code: str) -> str:
        t0 = time.monotonic()
        if self.session is not None:
            out = self.session.exec(code)
            ok = self.session.alive() and self.session.last_ok
        else:
            out = self.sandbox.run(code)
            ok = not out.startswith(("[timeout", "[sandbox"))
        if self.entry_sink is not None:
            self.entry_sink(EntryRecord("turn", code, out, ok, time.monotonic() - t0))
        return out

    def _early_stop(self, text: str) -> bool:
        if self.per_turn_judger is None:
            return False
        reward = self.per_turn_judger(text)
        if reward is None:
            return False
        self.judged_reward = float(reward)
        return True

    def _handle_no_tool_call(self, text: str):
        fenced = FENCED_CODE_RE.findall(text)
        if not fenced:
            return None  # final answer
        return self._run_python(fenced[-1])
