"""Checkpointing: periodic full training state + reference-format final model.

The reference only serializes final params ([vars(args), [network, actor,
critic params]] via flax.serialization, cleanba_ppo.py:753-771) and has **no
resume path** (SURVEY.md §5). Here:

- `save_checkpoint` / `restore_checkpoint`: full state — params, optimizer
  state (incl. MultiSteps counters), learner update index, global env step —
  written atomically; `latest_checkpoint` finds the newest for `--resume`.
- `save_model` / `load_model`: the reference's final-model format for the eval
  harness and HF zoo.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import flax.serialization

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "save_model",
    "load_model",
]

_CKPT_RE = re.compile(r"checkpoint_(\d+)\.msgpack$")


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(run_dir: str, agent_state: Any, update: int, global_step: int) -> str:
    """Serialize full training state; returns the checkpoint path."""
    os.makedirs(run_dir, exist_ok=True)
    payload = {
        "update": update,
        "global_step": global_step,
        "params": agent_state.params,
        "opt_state": agent_state.opt_state,
        "step": agent_state.step,
    }
    path = os.path.join(run_dir, f"checkpoint_{update}.msgpack")
    _atomic_write(path, flax.serialization.to_bytes(payload))
    return path


def latest_checkpoint(run_dir: str) -> Optional[str]:
    if not os.path.isdir(run_dir):
        return None
    best, best_update = None, -1
    for name in os.listdir(run_dir):
        m = _CKPT_RE.match(name)
        if m and int(m.group(1)) > best_update:
            best_update = int(m.group(1))
            best = os.path.join(run_dir, name)
    return best


def restore_checkpoint(path: str, agent_state: Any) -> Tuple[Any, int, int]:
    """Restore (agent_state, update, global_step) from a checkpoint file,
    using `agent_state` as the structure template."""
    with open(path, "rb") as f:
        raw = f.read()
    template = {
        "update": 0,
        "global_step": 0,
        "params": agent_state.params,
        "opt_state": agent_state.opt_state,
        "step": agent_state.step,
    }
    restored = flax.serialization.from_bytes(template, raw)
    agent_state = agent_state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return agent_state, int(restored["update"]), int(restored["global_step"])


def save_model(path: str, cfg_dict: dict, agent_params: Any) -> None:
    """Final-model format of the reference (cleanba_ppo.py:758-771):
    [args_dict, [network_params, actor_params, critic_params]]."""
    data = flax.serialization.to_bytes(
        [
            cfg_dict,
            [
                agent_params.network_params,
                agent_params.actor_params,
                agent_params.critic_params,
            ],
        ]
    )
    _atomic_write(path, data)


def load_model(path: str, agent_params_template: Any) -> Any:
    """Load a final model saved by `save_model` (or the reference trainer),
    returning an AgentParams-like object (template's type)."""
    with open(path, "rb") as f:
        raw = f.read()
    template = [
        {},
        [
            agent_params_template.network_params,
            agent_params_template.actor_params,
            agent_params_template.critic_params,
        ],
    ]
    _, (net, actor, critic) = flax.serialization.from_bytes(template, raw)
    return type(agent_params_template)(net, actor, critic)
