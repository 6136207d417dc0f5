"""Replay buffer with staleness expiry.

Reference: xtuner/v1/rl/replay_buffer.py (StorageBackend :130 / ReplayPolicy
:156 / NaiveStorage :167, query language :179-228, maybe_expire_group :38).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional


@dataclass
class SampleGroup:
    """One prompt's G rollout samples + rewards/advantages."""

    prompt_id: Any
    samples: list[dict]  # each: {prompt_ids, response_ids, logprobs, reward, advantage, ...}
    policy_version: int = 0
    meta: dict = field(default_factory=dict)


class ReplayBuffer:
    def __init__(self, max_staleness: Optional[int] = None):
        self.groups: list[SampleGroup] = []
        self.max_staleness = max_staleness

    def put(self, group: SampleGroup) -> None:
        self.groups.append(group)

    def __len__(self) -> int:
        return len(self.groups)

    def num_samples(self) -> int:
        return sum(len(g.samples) for g in self.groups)

    def maybe_expire(self, current_version: int) -> int:
        """Drop groups older than max_staleness policy versions; returns count."""
        if self.max_staleness is None:
            return 0
        before = len(self.groups)
        self.groups = [
            g for g in self.groups
            if current_version - g.policy_version <= self.max_staleness
        ]
        return before - len(self.groups)

    def get(self, n_groups: int, predicate: Optional[Callable[[SampleGroup], bool]] = None
            ) -> list[SampleGroup]:
        """FIFO pop of up to n_groups groups matching the predicate."""
        taken, kept = [], []
        for g in self.groups:
            if len(taken) < n_groups and (predicate is None or predicate(g)):
                taken.append(g)
            else:
                kept.append(g)
        self.groups = kept
        return taken
