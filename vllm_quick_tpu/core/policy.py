"""Scheduling policies (reference: vllm/core/policy.py)."""
from typing import Deque, List

from vllm_quick_tpu.sequence import SequenceGroup


class Policy:

    def get_priority(self, now: float, seq_group: SequenceGroup) -> float:
        raise NotImplementedError

    def sort_by_priority(
        self, now: float,
        seq_groups: Deque[SequenceGroup]) -> List[SequenceGroup]:
        return sorted(seq_groups,
                      key=lambda g: self.get_priority(now, g),
                      reverse=True)


class FCFS(Policy):

    def get_priority(self, now: float, seq_group: SequenceGroup) -> float:
        return now - seq_group.arrival_time


class PolicyFactory:
    _POLICIES = {"fcfs": FCFS}

    @classmethod
    def get_policy(cls, policy_name: str, **kwargs) -> Policy:
        return cls._POLICIES[policy_name](**kwargs)
