from cleanba_tpu.models.heads import (
    Actor,
    AgentParams,
    Critic,
    PrevActionRewardWrapper,
    init_agent_params,
    make_trunk,
)
from cleanba_tpu.models.trunks import ConvSequence, ImpalaCNN, MLPTrunk, NatureCNN, ResidualBlock

__all__ = [
    "Actor",
    "AgentParams",
    "Critic",
    "PrevActionRewardWrapper",
    "init_agent_params",
    "make_trunk",
    "ConvSequence",
    "ImpalaCNN",
    "MLPTrunk",
    "NatureCNN",
    "ResidualBlock",
]
