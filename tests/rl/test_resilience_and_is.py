"""Round-3 RL additions: rollout-IS correction, PassK advantage, span
tracing, N-worker rollout plane with dead-worker restart."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.loss.ce_loss import CELossConfig
from xtuner_tpu.model.dense import DenseConfig
from xtuner_tpu.model.generate import GenerateConfig
from xtuner_tpu.module.attention import MHAConfig
from xtuner_tpu.rl.advantage import compute_advantage, passk_advantage
from xtuner_tpu.rl.rollout_is import (RolloutISConfig, compute_rollout_is,
                                      mismatch_metrics)
from xtuner_tpu.train.toy_tokenizer import UTF8ByteTokenizer


# ---------------------------------------------------------------- rollout IS
def _lp_pair():
    # 2 sequences x 6 tokens; seq 0 has a catastrophic token at t=2
    old = np.array([[-1.0, -1.2, -9.0, -0.5, -1.1, 0.0],
                    [-0.9, -1.0, -1.1, -1.0, -0.8, 0.0]], np.float32)
    roll = np.array([[-1.1, -1.0, -1.0, -0.6, -1.0, 0.0],
                     [-1.0, -1.1, -1.0, -1.1, -0.9, 0.0]], np.float32)
    mask = np.array([[1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 1, 0]], np.float32)
    return jnp.asarray(old), jnp.asarray(roll), jnp.asarray(mask)


def test_token_truncate_semantics():
    old, roll, mask = _lp_pair()
    cfg = RolloutISConfig(level="token", mode="truncate", threshold_upper=1.5)
    w, new_mask, mets = compute_rollout_is(old, roll, mask, cfg)
    ratios = np.exp((np.asarray(old) - np.asarray(roll)) * np.asarray(mask))
    expect = np.clip(ratios, 1 / 1.5, 1.5) * np.asarray(mask)
    np.testing.assert_allclose(np.asarray(w), expect, rtol=1e-5)
    # truncate mode leaves the mask alone (no veto configured)
    np.testing.assert_allclose(np.asarray(new_mask), np.asarray(mask))
    assert float(mets["rollout_is_ratio_fraction_low"]) > 0  # the -9 token


def test_sequence_level_mask_and_veto():
    old, roll, mask = _lp_pair()
    cfg = RolloutISConfig(level="sequence", mode="mask", threshold_upper=1.5,
                          veto_threshold=(1e-3, 1e3))
    w, new_mask, mets = compute_rollout_is(old, roll, mask, cfg)
    # seq 0 log-ratio sum ~ -8 + ... => weight ~0 => masked out AND vetoed
    # (token ratio exp(-8) < 1e-3 trips the veto)
    assert float(jnp.sum(new_mask[0])) == 0.0
    assert float(mets["rollout_is_veto_fraction"]) == pytest.approx(0.5)
    # seq 1 stays (mild drift)
    assert float(jnp.sum(new_mask[1])) > 0
    # sequence level: every kept token in a row shares one weight
    row1 = np.asarray(w[1])[np.asarray(mask[1]) > 0]
    assert np.allclose(row1, row1[0])


def test_geometric_level_bounded():
    old, roll, mask = _lp_pair()
    cfg = RolloutISConfig(level="geometric", mode="truncate", threshold_upper=2.0)
    w, _, _ = compute_rollout_is(old, roll, mask, cfg)
    w = np.asarray(w)[np.asarray(mask) > 0]
    assert (w >= 0.5 - 1e-6).all() and (w <= 2.0 + 1e-6).all()


def test_mismatch_metrics_zero_when_identical():
    old, _, mask = _lp_pair()
    m = mismatch_metrics(old, old, mask)
    assert float(m["mismatch_kl"]) == pytest.approx(0.0, abs=1e-6)
    assert float(m["mismatch_ppl_ratio"]) == pytest.approx(1.0, rel=1e-5)
    assert float(m["mismatch_log_ppl_abs_diff"]) == pytest.approx(0.0, abs=1e-6)


def test_mismatch_ppl_is_per_sequence():
    """ppl metrics are exp(per-seq mean NLL) batch-averaged, and log_ppl_diff
    tracks the per-sequence drift (reference rollout_is.py:529-569)."""
    old, roll, mask = _lp_pair()
    m = mismatch_metrics(old, roll, mask)
    o, r, mk = np.asarray(old), np.asarray(roll), np.asarray(mask)
    mean_o = (o * mk).sum(-1) / mk.sum(-1)
    mean_r = (r * mk).sum(-1) / mk.sum(-1)
    assert float(m["mismatch_training_ppl"]) == pytest.approx(
        np.exp(-mean_o).mean(), rel=1e-5)
    diff = mean_r - mean_o
    assert float(m["mismatch_log_ppl_diff"]) == pytest.approx(diff.mean(), rel=1e-5)
    assert float(m["mismatch_log_ppl_diff_max"]) == pytest.approx(diff.max(), rel=1e-5)
    assert float(m["mismatch_ppl_ratio"]) == pytest.approx(
        np.exp(diff).mean(), rel=1e-5)


def test_is_seq_breakdown_and_seq_masked_fraction():
    old, roll, mask = _lp_pair()
    cfg = RolloutISConfig(level="token", mode="mask", threshold_upper=1.5)
    _, new_mask, mets = compute_rollout_is(old, roll, mask, cfg)
    # seq 0's catastrophic token is masked -> exactly one of two sequences hit
    assert float(mets["rollout_is_seq_masked_fraction"]) == pytest.approx(0.5)
    for k in ("rollout_is_seq_std", "rollout_is_seq_max", "rollout_is_seq_min",
              "rollout_is_seq_fraction_high", "rollout_is_seq_fraction_low"):
        assert k in mets
    assert float(mets["rollout_is_seq_max"]) >= float(mets["rollout_is_seq_min"])


def test_merge_rollout_is_metrics():
    from xtuner_tpu.rl.rollout_is import merge_rollout_is_metrics

    a = {"valid": True, "rollout_is_mean": 1.0, "rollout_is_max": 2.0,
         "rollout_is_min": 0.5}
    b = {"valid": True, "rollout_is_mean": 3.0, "rollout_is_max": 5.0,
         "rollout_is_min": 0.1}
    c = {"valid": False, "rollout_is_mean": 99.0, "rollout_is_max": 99.0,
         "rollout_is_min": 99.0}  # invalid batch: excluded entirely
    out = merge_rollout_is_metrics([a, b, c])
    assert out["rollout_is_mean"] == pytest.approx(2.0)
    assert out["rollout_is_max"] == 5.0 and out["rollout_is_min"] == 0.1


def test_grpo_loss_applies_is_weights():
    from xtuner_tpu.rl.grpo_loss import GRPOLossConfig, grpo_loss

    b, l = 2, 6
    logp = jnp.zeros((b, l)) - 1.0
    old = jnp.zeros((b, l)) - 1.0
    roll = jnp.zeros((b, l)) - 1.5  # training/rollout drift
    adv = jnp.ones((b, l))
    mask = jnp.ones((b, l))
    cfg_is = GRPOLossConfig(rollout_is=RolloutISConfig(
        level="token", mode="truncate", threshold_upper=1.2))
    loss_is, mets = grpo_loss(logp, old, adv, mask, cfg_is, rollout_logprobs=roll)
    loss_plain, _ = grpo_loss(logp, old, adv, mask, GRPOLossConfig())
    # ratio=1, adv=1 -> pg=-1 per token; IS weight = clip(e^0.5, .833, 1.2)=1.2
    assert float(loss_plain) == pytest.approx(-1.0)
    assert float(loss_is) == pytest.approx(-1.2, rel=1e-5)
    assert "mismatch_kl" in mets and "rollout_is_mean" in mets


# ---------------------------------------------------------------- PassK
def test_passk_advantage_combinatorics():
    # 8 rollouts, 3 correct, k=4: rho = 1 - C(5,4)/C(8,4) = 1 - 5/70
    rewards = np.array([1, 0, 1, 0, 0, 0, 1, 0], np.float32)
    adv = passk_advantage(rewards, k=4, eps=1e-6)
    rho = 1.0 - 5.0 / 70.0
    sigma = np.sqrt(rho * (1 - rho)) + 1e-6
    np.testing.assert_allclose(adv[rewards > 0], (1 - rho) / sigma, rtol=1e-5)
    cond = 4.0 / 35.0  # C(4,3)/C(7,3): pass prob of a k-set through this failure
    np.testing.assert_allclose(adv[rewards == 0], (1 - rho - cond) / sigma, rtol=1e-5)
    # registry path
    adv2 = compute_advantage(rewards, "passk", k=4)
    np.testing.assert_allclose(adv2, adv)


def test_passk_all_wrong_group():
    adv = passk_advantage(np.zeros(6, np.float32), k=4)
    assert (adv < 0).all()


# ---------------------------------------------------------------- spans
def test_span_tracer_nesting_and_summary(tmp_path):
    from xtuner_tpu.rl.spans import SpanTracer, read_spans

    tr = SpanTracer(tmp_path)
    with tr.span("train.step", step=1):
        with tr.span("rollout.generate"):
            pass
    recs = read_spans(tmp_path)
    assert {r["name"] for r in recs} == {"train.step", "rollout.generate"}
    child = next(r for r in recs if r["name"] == "rollout.generate")
    parent = next(r for r in recs if r["name"] == "train.step")
    assert child["parent_id"] == parent["span_id"]
    s = tr.summary()
    assert s["train.step"]["count"] == 1 and s["train.step"]["avg_s"] >= 0


# ------------------------------------------------- N workers + restart
def test_on_dead_fires_once_even_after_request_failover():
    """Request failover flips `alive=False` before the probe loop confirms
    death (disagg_trainer routes around a mid-request error immediately).
    on_dead must still fire — and fire exactly once — so the restart path
    runs (reference health_manager.py:105-214 restart_inactive_workers)."""
    from xtuner_tpu.rl.health_manager import HealthManager, WorkerRegistry

    reg = WorkerRegistry()
    reg.register("http://127.0.0.1:1")  # nothing listens: every probe fails
    fired = []
    hm = HealthManager(reg, failure_threshold=3, timeout=0.1,
                       on_dead=fired.append)
    # failover marked it dead before any probe ran
    reg.states()[0].alive = False
    for _ in range(5):
        hm.check_once()
    assert len(fired) == 1 and fired[0].url == "http://127.0.0.1:1"
    # recovery re-arms the dead handler
    w = reg.states()[0]
    w.alive, w.consecutive_failures, w.dead_handled = True, 0, False
    for _ in range(3):
        hm.check_once()
    assert len(fired) == 2


def _tiny_disagg_cfg(tmp_path, **kw):
    from xtuner_tpu.config.optim import AdamWConfig
    from xtuner_tpu.parallel.mesh import MeshConfig
    from xtuner_tpu.rl.disagg_trainer import RLDisaggregatedTrainerConfig
    from xtuner_tpu.rl.grpo_loss import GRPOLossConfig

    prompts = tmp_path / "prompts.jsonl"
    with open(prompts, "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": f"What is {i} plus {i}?",
                                "label": f"#### {2 * i}"}) + "\n")
    return RLDisaggregatedTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            eos_token_id=258,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        prompts_path=str(prompts),
        optim_cfg=AdamWConfig(lr=1e-4),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        loss_cfg=GRPOLossConfig(cliprange_low=0.2, cliprange_high=0.2),
        gen_cfg=GenerateConfig(max_new_tokens=8, temperature=1.0, eos_token_id=258),
        group_size=4, prompts_per_step=2, max_prompt_length=56,
        work_dir=str(tmp_path / "work"), exp_name="rl_resilience",
        transport="filesystem", health_interval=600.0,  # probe manually
        **kw,
    )


def test_worker_restart_and_failover(tmp_path):
    from xtuner_tpu.rl.disagg_trainer import RLDisaggregatedTrainer

    trainer = RLDisaggregatedTrainer(_tiny_disagg_cfg(
        tmp_path, total_steps=1, num_rollout_workers=2))
    try:
        assert len(trainer.workers) == 2
        urls = list(trainer.workers)
        # hard-kill one worker's HTTP server (simulates a crash)
        victim = trainer.workers[urls[0]]
        victim.stop()
        # failover: produce still succeeds by rerouting to the survivor
        groups = trainer._produce_remote(policy_version=0)
        assert len(groups) == 2
        # health manager detects + restarts (threshold=3 consecutive probes)
        for _ in range(3):
            trainer.health.check_once()
        assert trainer._restarts == 1
        live = trainer.registry.live()
        assert len(live) == 2  # survivor + replacement
        assert urls[0] not in {w.url for w in live}
        # the replacement serves the latest published weights
        groups = trainer._produce_remote(policy_version=0)
        assert len(groups) == 2
    finally:
        trainer.shutdown()


@pytest.mark.slow
def test_disagg_completes_training_after_mid_run_worker_death(tmp_path):
    """Kill a worker between steps; training completes on the survivor and
    the restarted replacement (reference restart_inactive_workers bar)."""
    from xtuner_tpu.rl.disagg_trainer import RLDisaggregatedTrainer

    trainer = RLDisaggregatedTrainer(_tiny_disagg_cfg(
        tmp_path, total_steps=3, num_rollout_workers=2))
    orig_sync = trainer.sync_weights
    killed = {}

    def sync_and_kill_once(step):
        orig_sync(step)
        if step == 1 and not killed:
            url, victim = next(iter(trainer.workers.items()))
            victim.stop()
            killed["url"] = url
            for _ in range(3):
                trainer.health.check_once()

    trainer.sync_weights = sync_and_kill_once
    trainer.fit()
    assert killed and trainer._restarts == 1
    assert trainer.trace_store.steps() == [1, 2, 3]
    tracker = trainer.work_dir / "tracker.jsonl"
    assert len(tracker.read_text().splitlines()) >= 3
    spans = (trainer.work_dir / "rl_spans.jsonl").read_text()
    assert "rollout.generate" in spans and "train.step" in spans


@pytest.mark.slow
def test_colocate_trainer_with_rollout_is(tmp_path):
    """Colocate GRPO with rollout-IS enabled: old_logprobs are recomputed
    teacher-forced, engine logprobs become rollout_logprobs, and the step
    logs mismatch/IS metrics."""
    import numpy as np

    from xtuner_tpu.config.optim import AdamWConfig
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.parallel.mesh import MeshConfig
    from xtuner_tpu.rl.grpo_loss import GRPOLossConfig
    from xtuner_tpu.rl.trainer import RLColocateTrainer, RLTrainerConfig

    prompts = tmp_path / "prompts.jsonl"
    with open(prompts, "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": f"What is {i} plus {i}?",
                                "label": f"#### {2 * i}"}) + "\n")
    cfg = RLTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            eos_token_id=258,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        prompts_path=str(prompts),
        optim_cfg=AdamWConfig(lr=1e-4),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        loss_cfg=GRPOLossConfig(rollout_is=RolloutISConfig(
            level="token", mode="truncate", threshold_upper=2.0)),
        gen_cfg=GenerateConfig(max_new_tokens=8, temperature=1.0, eos_token_id=258),
        group_size=4, prompts_per_step=2, total_steps=2, max_prompt_length=56,
        work_dir=str(tmp_path / "work"), exp_name="rl_is",
    )
    trainer = RLColocateTrainer(cfg)
    trainer.fit()
    tracker = trainer.work_dir / "tracker.jsonl"
    recs = [json.loads(x) for x in tracker.read_text().splitlines()]
    assert len(recs) == 2
    for rec in recs:
        assert np.isfinite(rec["pg_loss"])
        assert "mismatch_kl" in rec and np.isfinite(rec["mismatch_kl"])
        assert "rollout_is_mean" in rec and rec["rollout_is_mean"] > 0
        # colocate same-params recompute: drift is tiny but nonzero (decode
        # path vs packed-train numerics)
        assert abs(rec["mismatch_kl"]) < 1.0


# ------------------------------------------------- replay query + mixed SFT
def test_replay_buffer_query_language():
    from xtuner_tpu.rl.replay_buffer import ReplayBuffer, SampleGroup

    buf = ReplayBuffer()
    for i in range(6):
        buf.put(SampleGroup(prompt_id=i, samples=[{}], policy_version=i,
                            meta={"mean_reward": i / 5.0, "source": "gsm8k" if i % 2 else "math"}))
    # comparison ops over group fields
    assert [g.prompt_id for g in buf.query({"policy_version": {"$gte": 4}})] == [4, 5]
    # meta fields + $between
    got = buf.query({"mean_reward": {"$between": [0.2, 0.6]}})
    assert [g.prompt_id for g in got] == [1, 2, 3]
    # $and / $or / $in composition
    q = {"$and": [{"source": {"$in": ["gsm8k"]}},
                  {"$or": [{"policy_version": {"$lt": 2}},
                           {"policy_version": {"$eq": 5}}]}]}
    assert [g.prompt_id for g in buf.query(q)] == [1, 5]
    # pop removes matches, preserves order of the rest
    buf.query({"source": "math"}, pop=True)
    assert [g.prompt_id for g in buf.groups] == [1, 3, 5]
    with pytest.raises(ValueError):
        buf.query({"policy_version": {"$nope": 1}})
    with pytest.raises(KeyError):
        buf.query({"missing_field": 1})


@pytest.mark.slow
def test_colocate_mixed_sft_interleave(tmp_path):
    """RL + interleaved SFT steps share the engine/optimizer (reference
    _fit_sft): every sft_interval RL steps one CE step runs and is logged."""
    import numpy as np

    from xtuner_tpu.config.optim import AdamWConfig
    from xtuner_tpu.datasets.config import DataloaderConfig, DatasetConfig
    from xtuner_tpu.model.generate import GenerateConfig
    from xtuner_tpu.parallel.mesh import MeshConfig
    from xtuner_tpu.rl.grpo_loss import GRPOLossConfig
    from xtuner_tpu.rl.trainer import RLColocateTrainer, RLTrainerConfig

    prompts = tmp_path / "prompts.jsonl"
    sft_data = tmp_path / "sft.jsonl"
    with open(prompts, "w") as f:
        for i in range(8):
            f.write(json.dumps({"prompt": f"What is {i} plus {i}?",
                                "label": f"#### {2 * i}"}) + "\n")
    with open(sft_data, "w") as f:
        for i in range(16):
            f.write(json.dumps({"messages": [
                {"role": "user", "content": f"what is {i}?"},
                {"role": "assistant", "content": f"the answer is {i}."},
            ]}) + "\n")
    cfg = RLTrainerConfig(
        model_cfg=DenseConfig(
            vocab_size=300, num_hidden_layers=2, hidden_size=32, intermediate_size=64,
            eos_token_id=258,
            attention=MHAConfig(num_attention_heads=4, num_key_value_heads=2, head_dim=8),
            lm_loss_cfg=CELossConfig(chunk_size=128),
        ),
        prompts_path=str(prompts),
        optim_cfg=AdamWConfig(lr=1e-4),
        mesh_cfg=MeshConfig(fsdp_size=8, param_dtype="float32"),
        loss_cfg=GRPOLossConfig(),
        gen_cfg=GenerateConfig(max_new_tokens=8, temperature=1.0, eos_token_id=258),
        group_size=4, prompts_per_step=2, total_steps=2, max_prompt_length=56,
        work_dir=str(tmp_path / "work"), exp_name="rl_mixed",
        sft_dataloader_cfg=DataloaderConfig(
            datasets=[DatasetConfig(anno_path=str(sft_data), chat_template="qwen")],
            pack_max_length=128),
        sft_interval=2,
    )
    trainer = RLColocateTrainer(cfg)
    trainer.fit()
    recs = [json.loads(x) for x in (trainer.work_dir / "tracker.jsonl")
            .read_text().splitlines()]
    sft_recs = [r for r in recs if any(k.startswith("sft/") for k in r)]
    assert len(sft_recs) == 1  # fired at step 2 only
    assert np.isfinite(sft_recs[0]["sft/reduced_llm_loss"])
