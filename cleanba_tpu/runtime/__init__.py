from cleanba_tpu.runtime.agent import AgentBundle, build_agent
from cleanba_tpu.runtime.learner import make_impala_update, make_ppo_update
from cleanba_tpu.runtime.rollout import impala_rollout_thread, ppo_rollout_thread
from cleanba_tpu.runtime.storage import ImpalaStorage, PPOStorage
from cleanba_tpu.runtime.trainer import train

__all__ = [
    "AgentBundle",
    "build_agent",
    "make_impala_update",
    "make_ppo_update",
    "impala_rollout_thread",
    "ppo_rollout_thread",
    "ImpalaStorage",
    "PPOStorage",
    "train",
]
