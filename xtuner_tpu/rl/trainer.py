"""GRPO colocate RL trainer.

Reference: xtuner/v1/rl/ + train/rl_trainer.py (RLColocateTrainer loop
:1648-1722: produce_batch -> train -> weight sync). TPU-native redesign: the
policy is *served by the same JAX params* that training updates — generation
runs the engine-native KV-cache decode (model/generate.py) on the same mesh,
so the reference's Ray actors, HTTP rollout servers, NCCL suspend/resume and
CUDA-IPC weight sync all collapse into one process: the "weight sync" is
literally passing `engine.params` to `generate`.

Loop per step (reference agent_loop_manager.produce_batch + _train_one_batch):
  sample prompts -> generate G rollouts per prompt (with logprobs) ->
  judge rewards -> group advantage -> replay buffer -> pack (B, L) rows ->
  GRPO loss train step.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from pydantic import BaseModel, ConfigDict

from ..config.optim import AdamWConfig, LRConfig, OptimConfig
from ..data_proto import SequenceContext
from ..data_proto.templates import get_chat_template
from ..engine.train_engine import TrainEngine
from ..loss.ce_loss import per_token_logprobs
from ..model.base import TransformerConfig
from ..model.generate import GenerateConfig, generate
from ..parallel.mesh import MeshConfig
from ..utils.logger import get_logger
from ..writer import JsonlWriter
from .advantage import compute_advantage
from .evaluator import Evaluator, EvaluatorConfig
from .grpo_loss import GRPOLossConfig, grpo_loss
from .judger import JUDGER_MAP
from .replay_buffer import ReplayBuffer, SampleGroup

logger = get_logger()


class RLTrainerConfig(BaseModel):
    model_config = ConfigDict(extra="forbid", arbitrary_types_allowed=True)
    model_cfg: TransformerConfig
    prompts_path: str  # jsonl: {"messages": [...] | "prompt": str, "label": ...}
    optim_cfg: OptimConfig = AdamWConfig(lr=1e-6)
    lr_cfg: LRConfig = LRConfig(lr_type="constant", warmup_ratio=0.0)
    mesh_cfg: MeshConfig = MeshConfig()
    loss_cfg: GRPOLossConfig = GRPOLossConfig()
    gen_cfg: GenerateConfig = GenerateConfig(max_new_tokens=64, temperature=1.0)
    group_size: int = 8  # rollouts per prompt (GRPO group)
    prompts_per_step: int = 4
    total_steps: int = 10
    max_prompt_length: int = 256
    judger: str = "gsm8k"
    advantage: str = "grpo"
    chat_template: str = "qwen"
    load_from: Optional[str] = None
    tokenizer_path: Optional[str] = None
    work_dir: str = "work_dirs"
    exp_name: str = "rl"
    seed: int = 0
    max_staleness: Optional[int] = None
    eval_cfg: Optional["EvaluatorConfig"] = None
    # R3 rollout-routing replay (MoE): train with the rollout's expert
    # assignment (reference rollout/worker.py:784 -> trainer/worker.py:473)
    rollout_routing_replay: bool = False
    # debug rollout capture/replay (reference rl_trainer.py:978-1010):
    # capture writes every produced batch to <work_dir>/rollout_traces/;
    # replay_from bypasses generation and feeds captured groups back in
    debug_rollout_capture: bool = False
    debug_rollout_replay_from: Optional[str] = None
    # mixed RL+SFT (reference trainer/worker.py:882-952 _fit_sft): every
    # `sft_interval` RL steps, one SFT step from this dataloader runs through
    # the SAME engine/optimizer (a second jitted step with the CE loss)
    sft_dataloader_cfg: Optional[Any] = None  # datasets.config.DataloaderConfig
    sft_interval: int = 0  # 0 disables

    def build(self) -> "RLColocateTrainer":
        return RLColocateTrainer(self)


class RLColocateTrainer:
    def __init__(self, cfg: RLTrainerConfig):
        self.cfg = cfg
        self.work_dir = Path(cfg.work_dir) / cfg.exp_name
        self.work_dir.mkdir(parents=True, exist_ok=True)
        self.tokenizer = self._build_tokenizer()
        self.prompts = [json.loads(x) for x in Path(cfg.prompts_path).read_text().splitlines() if x]
        self.engine = TrainEngine(cfg.model_cfg, cfg.optim_cfg, cfg.lr_cfg, cfg.mesh_cfg,
                                  cfg.total_steps)
        if cfg.load_from:
            self.engine.from_hf(cfg.load_from)
        else:
            self.engine.init_random(cfg.seed)
        # frozen reference policy for the KL penalty (reference keeps a
        # CPU-parked ref model swapped in per batch, trainer/worker.py:458-472;
        # under GSPMD the ref tree just stays sharded in HBM)
        self.ref_params = None
        self._ref_logprob_fn = None
        if cfg.loss_cfg.kl_coef > 0.0:
            self.ref_params = jax.tree.map(lambda x: x.copy(), self.engine.params)
        self.judger = JUDGER_MAP[cfg.judger]()
        self.replay_buffer = ReplayBuffer(max_staleness=cfg.max_staleness)
        self.writer = JsonlWriter(self.work_dir)
        self.rng = np.random.default_rng(cfg.seed)
        self.gen_rng = jax.random.key(cfg.seed)
        self._step_fn = None
        self.pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        self.evaluator = None
        if cfg.eval_cfg is not None:
            self.evaluator = Evaluator(cfg.eval_cfg, self.judger, self._eval_generate)
        # mixed RL+SFT plumbing (reference _fit_sft)
        self._sft_iter = None
        self._sft_step_fn = None
        self._sft_dataloader = None
        if cfg.sft_interval and cfg.sft_dataloader_cfg is not None:
            n_dev = self.engine.mesh.devices.size
            self._sft_dataloader = cfg.sft_dataloader_cfg.build(
                self.tokenizer, global_batch_rows=n_dev, micro_batch_rows=n_dev)

    def _build_tokenizer(self):
        if self.cfg.tokenizer_path:
            from transformers import AutoTokenizer

            return AutoTokenizer.from_pretrained(self.cfg.tokenizer_path, trust_remote_code=True)
        from ..train.toy_tokenizer import UTF8ByteTokenizer

        return UTF8ByteTokenizer()

    # ------------------------------------------------------------------
    def _encode_prompt(self, item: dict) -> list[int]:
        """Format each history turn with ITS role's template (assistant turns
        previously went through the user template, malforming multi-turn
        prompts). The user template ends with the assistant generation prompt."""
        if "prompt_ids" in item:  # pre-tokenized (datasets/rl_tokenize.py)
            return list(item["prompt_ids"])[-self.cfg.max_prompt_length:]
        template = get_chat_template(self.cfg.chat_template)
        if "messages" in item:
            msgs = item["messages"]
        else:
            msgs = [{"role": "user", "content": item["prompt"]}]
        ids: list[int] = []
        for m in msgs:
            role, content = m["role"], m.get("content", "")
            if role == "system":
                text = template.system.format(system=content)
            elif role == "assistant":
                text = template.assistant.format(assistant=content)
            else:  # user / tool
                text = template.user.format(user=content)
            ids.extend(self.tokenizer.encode(text, add_special_tokens=False))
        return ids[-self.cfg.max_prompt_length:]

    def _eval_generate(self, items: list[dict], n: int) -> list[list[str]]:
        """Evaluator binding: n sampled responses per eval prompt."""
        cfg = self.cfg
        out_texts: list[list[str]] = []
        eos = cfg.gen_cfg.eos_token_id or cfg.model_cfg.eos_token_id
        for item in items:
            prompt = self._encode_prompt(item)
            prompt_arr = np.full((n, cfg.max_prompt_length), self.pad_id, np.int32)
            prompt_arr[:, -len(prompt):] = prompt
            self.gen_rng, rng = jax.random.split(self.gen_rng)
            out = generate(self.engine.model, self.engine.params, prompt_arr, cfg.gen_cfg,
                           rng=rng, compute_dtype=self.engine.compute_dtype,
                           pad_token_id=self.pad_id)
            texts = []
            for gi in range(n):
                resp = out["generated"][gi].tolist()
                if eos in resp:
                    resp = resp[: resp.index(eos)]
                texts.append(self.tokenizer.decode(resp))
            out_texts.append(texts)
        return out_texts

    def produce_batch(self, policy_version: int) -> list[SampleGroup]:
        """Rollout generation + judging + advantages (the AgentLoopManager
        produce_batch analog, agent_loop_manager.py:206-300). All prompt
        groups are generated in ONE batched `generate` call — rollout
        throughput scales with the mesh, not with the group loop."""
        cfg = self.cfg
        idxs = self.rng.choice(len(self.prompts), cfg.prompts_per_step, replace=False)
        items = [self.prompts[int(pi)] for pi in idxs]
        prompts = [self._encode_prompt(item) for item in items]
        g = cfg.group_size
        total = len(items) * g
        prompt_arr = np.full((total, cfg.max_prompt_length), self.pad_id, np.int32)
        for i, prompt in enumerate(prompts):
            prompt_arr[i * g:(i + 1) * g, -len(prompt):] = prompt  # left padding
        self.gen_rng, rng = jax.random.split(self.gen_rng)
        out = generate(self.engine.model, self.engine.params, prompt_arr, cfg.gen_cfg,
                       rng=rng, compute_dtype=self.engine.compute_dtype,
                       pad_token_id=self.pad_id, return_logprobs=True,
                       record_routing=cfg.rollout_routing_replay,
                       prompt_group_size=g)  # prompt KV prefilled once per group
        eos = cfg.gen_cfg.eos_token_id or cfg.model_cfg.eos_token_id
        groups = []
        for i, (pi, item, prompt) in enumerate(zip(idxs, items, prompts)):
            samples, rewards = [], []
            for gi in range(g):
                row = i * g + gi
                resp = out["generated"][row].tolist()
                if eos in resp:
                    n_resp = resp.index(eos) + 1
                else:
                    n_resp = len(resp)
                text = self.tokenizer.decode(resp[:n_resp])
                reward = self.judger.judge(text, item.get("label") or item.get("answer"))
                rewards.append(reward)
                samples.append({
                    "prompt_ids": prompt,
                    "response_ids": resp[:n_resp],
                    "logprobs": out["logprobs"][row][:n_resp],
                    "reward": reward,
                })
                if "routed_experts" in out:
                    samples[-1]["routed_experts"] = out["routed_experts"][row][:n_resp]
            advs = compute_advantage(np.asarray(rewards), cfg.advantage)
            for s, a in zip(samples, advs):
                s["advantage"] = float(a)
            groups.append(SampleGroup(prompt_id=int(pi), samples=samples,
                                      policy_version=policy_version,
                                      meta={"mean_reward": float(np.mean(rewards))}))
        return groups

    # ------------------------------------------------------------------
    def _pack(self, groups: list[SampleGroup]) -> dict[str, np.ndarray]:
        """Samples -> (1, B, L) arrays for one optimizer step."""
        rows = [s for g in groups for s in g.samples]
        # fixed packing length -> the train step compiles exactly once
        bound = self.cfg.max_prompt_length + self.cfg.gen_cfg.max_new_tokens
        max_len = -(-bound // 128) * 128
        b = len(rows)
        ids = np.zeros((b, max_len), np.int32)
        seg = np.zeros((b, max_len), np.int32)
        pos = np.zeros((b, max_len), np.int32)
        labels = np.full((b, max_len), -100, np.int32)
        old_lp = np.zeros((b, max_len), np.float32)
        adv = np.zeros((b, max_len), np.float32)
        routed = None
        route_shape = next((np.asarray(s["routed_experts"]).shape[1:]
                            for s in rows if "routed_experts" in s), None)
        if route_shape is not None:
            # -1 = "no replay here": prompt/pad positions keep fresh routing
            routed = np.full((b, max_len, *route_shape), -1, np.int32)
        for bi, s in enumerate(rows):
            p, r = s["prompt_ids"], s["response_ids"]
            n = len(p) + len(r)
            ids[bi, :n] = p + r
            seg[bi, :n] = 1
            pos[bi, :n] = np.arange(n)
            # shifted: position t supervises token t+1; responses start at len(p)
            for j, tok in enumerate(r):
                t = len(p) + j - 1
                labels[bi, t] = tok
                old_lp[bi, t] = s["logprobs"][j]
                adv[bi, t] = s["advantage"]
                if routed is not None and "routed_experts" in s:
                    # routing of the forward that sampled token j == routing of
                    # input position len(p)+j-1 (see generate docstring)
                    routed[bi, t] = s["routed_experts"][j]
        mask = (labels != -100).astype(np.float32)
        out = {
            "input_ids": ids[None], "segment_ids": seg[None], "position_ids": pos[None],
            "shifted_labels": labels[None], "loss_weights": mask[None],
            "old_logprobs": old_lp[None], "advantages": adv[None],
            # whole-batch pos/neg token counts for OREAL's global calibration
            # (exact under grad accumulation; see grpo_loss.oreal_loss)
            "global_pos": np.asarray([((labels != -100) & (adv > 0)).sum()], np.float32),
            "global_neg": np.asarray([((labels != -100) & (adv <= 0)).sum()], np.float32),
        }
        if routed is not None:
            out["rollout_routed_experts"] = routed[None]
        return out

    def _rl_loss_fn(self):
        model, sc, dtype = self.engine.model, self.engine.sc, self.engine.compute_dtype
        loss_cfg = self.cfg.loss_cfg
        chunk = self.cfg.model_cfg.lm_loss_cfg.chunk_size

        def loss_fn(params, mb, denom):
            seq_ctx = SequenceContext(input_ids=mb["input_ids"],
                                      segment_ids=mb["segment_ids"],
                                      position_ids=mb["position_ids"],
                                      rollout_routed_experts=mb.get("rollout_routed_experts"))
            hidden = model.forward(params, seq_ctx, sc=sc, compute_dtype=dtype)
            w = model.lm_head_weight(params).astype(dtype)
            logps = per_token_logprobs(hidden, w, mb["shifted_labels"], chunk, sc=sc)
            mask = mb["shifted_labels"] != -100
            from .grpo_loss import OREALLossConfig, oreal_loss

            if isinstance(loss_cfg, OREALLossConfig):
                loss, mets = oreal_loss(
                    logps, mb["old_logprobs"], mb["advantages"], mask, loss_cfg,
                    ref_logprobs=mb.get("ref_logprobs"), global_denom=denom,
                    global_pos=mb.get("global_pos"), global_neg=mb.get("global_neg"))
            else:
                loss, mets = grpo_loss(logps, mb["old_logprobs"], mb["advantages"], mask,
                                       loss_cfg, ref_logprobs=mb.get("ref_logprobs"),
                                       global_denom=denom,
                                       rollout_logprobs=mb.get("rollout_logprobs"))
            return loss, mets

        return loss_fn

    def _compute_teacher_forced_logprobs(self, params, batch: dict[str, np.ndarray]) -> np.ndarray:
        """Teacher-forced recompute of per-token logprobs over the packed
        batch (reference trainer/worker.py:458-472). Used both for the frozen
        ref policy (KL) and for the actor's own training-numerics logprobs
        when rollout-IS correction is enabled."""
        model, sc, dtype = self.engine.model, self.engine.sc, self.engine.compute_dtype
        chunk = self.cfg.model_cfg.lm_loss_cfg.chunk_size

        if self._ref_logprob_fn is None:
            def ref_fn(ref_params, ids, seg, pos, labels):
                seq_ctx = SequenceContext(input_ids=ids, segment_ids=seg, position_ids=pos)
                hidden = model.forward(ref_params, seq_ctx, sc=sc, compute_dtype=dtype)
                w = model.lm_head_weight(ref_params).astype(dtype)
                return per_token_logprobs(hidden, w, labels, chunk, sc=sc)

            self._ref_logprob_fn = jax.jit(ref_fn)

        a, b, l = batch["input_ids"].shape
        lps = self._ref_logprob_fn(
            params,
            batch["input_ids"].reshape(a * b, l),
            batch["segment_ids"].reshape(a * b, l),
            batch["position_ids"].reshape(a * b, l),
            batch["shifted_labels"].reshape(a * b, l),
        )
        return np.asarray(lps, np.float32).reshape(a, b, l)

    def _compute_ref_logprobs(self, batch: dict[str, np.ndarray]) -> np.ndarray:
        return self._compute_teacher_forced_logprobs(self.ref_params, batch)

    def _maybe_add_rollout_is_inputs(self, batch: dict[str, np.ndarray]) -> None:
        """When rollout-IS correction is configured, the packed
        `old_logprobs` (which came from the rollout engine) become
        `rollout_logprobs`, and the training-policy old logprobs are
        recomputed teacher-forced with the CURRENT params (reference
        separation of vLLM-numerics vs trainer-numerics logprobs)."""
        if self.cfg.loss_cfg.rollout_is is None:
            return
        batch["rollout_logprobs"] = batch["old_logprobs"]
        batch["old_logprobs"] = self._compute_teacher_forced_logprobs(
            self.engine.params, batch)

    # ------------------------------------------------------------------
    def _maybe_sft_step(self, step: int) -> Optional[dict]:
        """Interleaved SFT step on the same engine/optimizer (reference
        trainer/worker.py:882-952 `_fit_sft`; epoch-cycling iterator
        :914-922). Uses a SECOND jitted step with the default CE loss."""
        cfg = self.cfg
        if not cfg.sft_interval or self._sft_dataloader is None \
                or step % cfg.sft_interval != 0:
            return None
        if self._sft_iter is None:
            self._sft_iter = iter(self._sft_dataloader)
        try:
            batch = next(self._sft_iter)
        except StopIteration:
            self._sft_iter = iter(self._sft_dataloader)
            batch = next(self._sft_iter)
        if self._sft_step_fn is None:
            self._sft_step_fn = self.engine._build_step_fn()  # default CE loss
        device_batch = self.engine.put_batch(batch)
        self.engine.params, self.engine.opt_state, metrics = self._sft_step_fn(
            self.engine.params, self.engine.opt_state,
            jnp.asarray(step, jnp.int32), device_batch)
        metrics = {k: float(v) for k, v in metrics.items()
                   if getattr(v, "ndim", 0) == 0}
        logger.info(f"SFT interleave at RL step {step}: "
                    f"loss {metrics.get('reduced_llm_loss', float('nan')):.4f}")
        return metrics

    def fit(self) -> None:
        cfg = self.cfg
        trace = None
        replay = None
        if cfg.debug_rollout_capture or cfg.debug_rollout_replay_from:
            from .trace import RolloutTraceStore

            if cfg.debug_rollout_replay_from:
                replay = RolloutTraceStore(cfg.debug_rollout_replay_from)
            if cfg.debug_rollout_capture:
                trace = RolloutTraceStore(self.work_dir)
        for step in range(1, cfg.total_steps + 1):
            t0 = time.time()
            if replay is not None:
                groups = replay.load_groups(step)
                if not groups:
                    logger.info(f"debug replay: no captured rollout for step {step}; stopping")
                    break
            else:
                groups = self.produce_batch(policy_version=step)
            if trace is not None:
                trace.record(step, groups, tokenizer=self.tokenizer)
            for g in groups:
                self.replay_buffer.put(g)
            self.replay_buffer.maybe_expire(step)
            train_groups = self.replay_buffer.get(cfg.prompts_per_step)
            t_roll = time.time() - t0
            batch = self._pack(train_groups)
            self._maybe_add_rollout_is_inputs(batch)
            if self.ref_params is not None:
                batch["ref_logprobs"] = self._compute_ref_logprobs(batch)
            if self._step_fn is None:
                self._step_fn = self.engine._build_step_fn(self._rl_loss_fn())
            device_batch = self.engine.put_batch(batch)
            self.engine.params, self.engine.opt_state, metrics = self._step_fn(
                self.engine.params, self.engine.opt_state,
                jnp.asarray(step, jnp.int32), device_batch)
            metrics = {k: float(v) for k, v in metrics.items()}
            mean_reward = float(np.mean([g.meta["mean_reward"] for g in train_groups]))
            step_time = time.time() - t0
            kl_part = f"kl {metrics['kl']:.5f} " if "kl" in metrics else ""
            logger.info(
                f"RL Step {step}/{cfg.total_steps} reward {mean_reward:.3f} "
                f"pg_loss {metrics['pg_loss']:.4f} ratio {metrics['ratio_mean']:.3f} "
                f"clip_frac {metrics['clip_frac']:.3f} {kl_part}"
                f"grad_norm {metrics['grad_norm']:.3f} "
                f"rollout {t_roll:.1f}s step {step_time:.1f}s"
            )
            self.writer.add_scalars({**metrics, "mean_reward": mean_reward,
                                     "rollout_time": t_roll, "step_time": step_time}, step)
            sft_mets = self._maybe_sft_step(step)
            if sft_mets is not None:
                self.writer.add_scalars({f"sft/{k}": v for k, v in sft_mets.items()},
                                        step)
            if (self.evaluator is not None and cfg.eval_cfg.eval_interval
                    and step % cfg.eval_cfg.eval_interval == 0):
                self.writer.add_scalars(self.evaluator.run(), step)
        if self.evaluator is not None:
            self.writer.add_scalars(self.evaluator.run(), self.cfg.total_steps)
        self.writer.close()
