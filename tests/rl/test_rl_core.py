"""RL core: advantages, GRPO loss semantics, replay buffer, judgers."""

import jax.numpy as jnp
import numpy as np
import pytest

from xtuner_tpu.rl.advantage import compute_advantage
from xtuner_tpu.rl.grpo_loss import GRPOLossConfig, grpo_loss
from xtuner_tpu.rl.judger import GSM8KJudger, MathBoxedJudger
from xtuner_tpu.rl.replay_buffer import ReplayBuffer, SampleGroup


def test_grpo_advantage():
    r = np.array([1.0, 0.0, 1.0, 0.0])
    a = compute_advantage(r, "grpo")
    assert a[0] > 0 > a[1]
    np.testing.assert_allclose(a.mean(), 0, atol=1e-6)
    # all-same rewards -> zero advantage (the eps prevents nan)
    a2 = compute_advantage(np.ones(4), "grpo")
    np.testing.assert_allclose(a2, 0, atol=1e-6)


def test_rloo_advantage():
    r = np.array([1.0, 0.0])
    a = compute_advantage(r, "rloo")
    np.testing.assert_allclose(a, [1.0, -1.0])


def test_grpo_loss_directions():
    """Positive advantage + higher prob than old -> ratio > 1; clipping engages."""
    lp = jnp.log(jnp.full((1, 4), 0.9))
    old = jnp.log(jnp.full((1, 4), 0.5))
    adv = jnp.ones((1, 4))
    mask = jnp.ones((1, 4), bool)
    cfg = GRPOLossConfig(cliprange_low=0.2, cliprange_high=0.2)
    loss, mets = grpo_loss(lp, old, adv, mask, cfg)
    # ratio 1.8 clipped to 1.2; loss = -1.2
    np.testing.assert_allclose(float(loss), -1.2, rtol=1e-5)
    assert float(mets["clip_frac"]) == 1.0

    # negative advantage with increased prob is penalized un-clipped
    loss2, _ = grpo_loss(lp, old, -adv, mask, cfg)
    np.testing.assert_allclose(float(loss2), 1.8, rtol=1e-5)


def test_grpo_loss_kl_term():
    lp = jnp.log(jnp.full((1, 2), 0.5))
    ref = jnp.log(jnp.full((1, 2), 0.8))
    adv = jnp.zeros((1, 2))
    mask = jnp.ones((1, 2), bool)
    cfg = GRPOLossConfig(kl_coef=1.0)
    loss, mets = grpo_loss(lp, lp, adv, mask, cfg, ref_logprobs=ref)
    assert float(mets["kl"]) > 0
    np.testing.assert_allclose(float(loss), float(mets["kl"]), rtol=1e-6)


def test_replay_buffer_staleness():
    buf = ReplayBuffer(max_staleness=2)
    for v in range(5):
        buf.put(SampleGroup(prompt_id=v, samples=[{}], policy_version=v))
    dropped = buf.maybe_expire(current_version=4)
    assert dropped == 2  # versions 0,1 dropped (4-2=2 cutoff)
    got = buf.get(2)
    assert [g.prompt_id for g in got] == [2, 3]
    assert len(buf) == 1


def test_gsm8k_judger():
    j = GSM8KJudger()
    assert j.judge("the answer is 42", "#### 42") == 1.0
    assert j.judge("I think it's \\boxed{42}", "#### 42") == 1.0
    assert j.judge("maybe 41?", "#### 42") == 0.0
    assert j.judge("no numbers here", "#### 42") == 0.0
    assert j.judge("1,234 total", "#### 1234") == 1.0


def test_math_boxed_judger():
    j = MathBoxedJudger()
    assert j.judge("so \\boxed{x+1}", "x+1") == 1.0
    assert j.judge("so x+1", "x+1") == 0.0


def test_oreal_loss_pos_neg_calibration():
    """OREAL: positive-advantage tokens carry an SFT term + policy term over
    the global positive count; negatives only the policy term over the
    negative count (reference rl/loss/oreal_loss.py)."""
    import jax.numpy as jnp

    from xtuner_tpu.rl.grpo_loss import OREALLossConfig, oreal_loss

    lp = jnp.asarray([[-1.0, -2.0, -0.5, -1.5]])
    old = jnp.asarray([[-1.0, -2.0, -0.5, -1.5]])  # ratio 1 everywhere
    adv = jnp.asarray([[1.0, 1.0, -1.0, 0.0]])
    mask = jnp.asarray([[1, 1, 1, 0]])
    cfg = OREALLossConfig(pos_sft_loss_weight=1.0, kl_coef=0.0)
    loss, mets = oreal_loss(lp, old, adv, mask, cfg)
    # sft = mean(-lp over positives) = (1.0 + 2.0)/2; pos pg = (-1 + -1)/2;
    # neg pg = +1/1 (maximum of pg1/pg2 at ratio 1 is -adv = +1)
    assert abs(float(mets["sft_loss"]) - 1.5) < 1e-5
    assert abs(float(mets["pg_loss"]) - 0.0) < 1e-5  # -1 + 1 = 0
    assert abs(float(loss) - 1.5) < 1e-5
    # zero sft weight -> pure policy calibration
    cfg2 = OREALLossConfig(pos_sft_loss_weight=0.0)
    loss2, _ = oreal_loss(lp, old, adv, mask, cfg2)
    assert abs(float(loss2) - 0.0) < 1e-5
