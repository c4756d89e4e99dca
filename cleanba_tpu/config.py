"""Experiment configuration for the TPU-native Sebulba trainers.

Mirrors the flag surface of the reference's tyro `Args` dataclasses
(cleanba/cleanba_ppo.py:34-118, cleanba/cleanba_impala.py:34-110) so that a
cleanba user finds every knob they know, while the derived-field resolution
(reference cleanba_ppo.py:411-443) is factored into `resolve()` and the device
topology lives in :mod:`cleanba_tpu.parallel.topology`.
"""

from __future__ import annotations

import dataclasses
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

__all__ = ["CommonConfig", "PPOConfig", "ImpalaConfig", "ATARI_MAX_FRAMES"]

# 108000 Atari frames / frameskip 4 (Hessel et al. 2018, Rainbow, Table 3);
# reference cleanba_ppo.py:121-123.
ATARI_MAX_FRAMES = 108000 // 4


@dataclass
class CommonConfig:
    """Flags shared by PPO and IMPALA trainers."""

    exp_name: str = "cleanba_tpu"
    "the name of this experiment"
    seed: int = 1
    "seed of the experiment"
    track: bool = False
    "if toggled, this experiment will be tracked with Weights and Biases (if installed)"
    wandb_project_name: str = "cleanba_tpu"
    "the wandb's project name"
    wandb_entity: Optional[str] = None
    "the entity (team) of wandb's project"
    capture_video: bool = False
    "whether to capture videos of the agent performances (check out `videos` folder)"
    save_model: bool = False
    "whether to save model into the `runs/{run_name}` folder"
    upload_model: bool = False
    "whether to upload the saved model to huggingface"
    hf_entity: str = ""
    "the user or org name of the model repository from the Hugging Face Hub"
    log_frequency: int = 10
    "the logging frequency of the model performance (in terms of `updates`)"
    run_dir: str = "runs"
    "root directory for run artifacts (tensorboard, checkpoints, videos)"

    # --- checkpointing (extends the reference, which only saves at exit:
    # cleanba_ppo.py:753-771, and has no resume path) ---
    checkpoint_frequency: int = 0
    "save a full (params + optimizer + step) checkpoint every N updates; 0 disables"
    resume: bool = False
    "resume from the latest checkpoint under the run directory if one exists"

    # --- environment ---
    env_id: str = "Breakout-v5"
    "the id of the environment"
    env_protocol: str = "machado"
    "Atari eval protocol preset: 'machado' (sticky actions) or 'espeholt' (episodic life)"
    total_timesteps: int = 50_000_000
    "total timesteps of the experiments"
    local_num_envs: int = 64
    "the number of parallel game environments per actor thread"
    async_batch_size: int = 0
    "EnvPool-style async sub-batch size; 0 means fully synchronous stepping"
    inference_pipeline_depth: int = 1
    "async-rollout dispatch pipelining: keep up to D sub-batches' inference in flight before fetching the oldest batch's actions, so host<->device round trips overlap instead of serializing (reference actor_threads_concat re-done as dispatch pipelining; useless unless async_batch_size < local_num_envs)"
    env_backend: str = "auto"
    "environment engine backend: 'auto', 'native' (C++), or 'python'"

    # --- runtime topology ---
    num_actor_threads: int = 2
    "the number of actor threads to use per actor device"
    actor_device_ids: List[int] = field(default_factory=lambda: [0])
    "the local device ids that actor workers will use"
    learner_device_ids: List[int] = field(default_factory=lambda: [0])
    "the local device ids that learner workers will use"
    distributed: bool = False
    "whether to initialize multi-host JAX (jax.distributed)"
    concurrency: bool = False
    "whether to run the actor and learner concurrently (actors one policy version behind)"
    asap: bool = False
    "fully-async mode: actors self-serve latest params (no handshake), learner consumes payloads one at a time"

    # --- model ---
    network: str = "impala_cnn"
    "policy trunk: 'impala_cnn', 'nature_cnn', or 'mlp'"
    channels: List[int] = field(default_factory=lambda: [16, 32, 32])
    "the channels of the CNN"
    hiddens: List[int] = field(default_factory=lambda: [256])
    "the hiddens size of the MLP"
    use_prev_action_reward: bool = False
    "condition the trunk on one-hot(prev action) and prev reward (R2D2-style inputs)"
    bf16: bool = False
    "run the conv trunk in bfloat16 on the MXU (params and heads stay float32)"
    remat: bool = False
    "rematerialize trunk activations in the learner backward pass (jax.checkpoint); trades FLOPs for HBM, enabling large minibatches"
    device_stack: bool = False
    "frame-stack on the TPU: the engine emits only the newest frame (4x less host->device traffic) and the stack is rebuilt on-device"

    # --- optimization (shared) ---
    anneal_lr: bool = True
    "Toggle learning rate annealing for policy and value networks"
    gamma: float = 0.99
    "the discount factor gamma"
    num_minibatches: int = 4
    "the number of mini-batches"
    gradient_accumulation_steps: int = 1
    "the number of gradient accumulation steps before performing an optimization step"
    ent_coef: float = 0.01
    "coefficient of the entropy"
    vf_coef: float = 0.5
    "coefficient of the value function"

    # --- profiling / throughput modes (reference legacy flags,
    # legacy_scripts/cleanba_ppo_envpool_impala_atari_wrapper.py:101-104) ---
    profile: bool = False
    "add block_until_ready fences for honest segment timings"
    trace_dir: str = ""
    "if set, capture a jax.profiler trace (updates 4..15) into this directory"
    test_actor_learner_throughput: bool = False
    "decouple actor and learner to measure each side's throughput ceiling"

    # --- runtime arguments to be filled in by resolve() ---
    local_batch_size: int = field(default=0, metadata={"cli": False})
    local_minibatch_size: int = field(default=0, metadata={"cli": False})
    num_updates: int = field(default=0, metadata={"cli": False})
    world_size: int = field(default=1, metadata={"cli": False})
    local_rank: int = field(default=0, metadata={"cli": False})
    num_envs: int = field(default=0, metadata={"cli": False})
    batch_size: int = field(default=0, metadata={"cli": False})
    minibatch_size: int = field(default=0, metadata={"cli": False})
    global_learner_devices: Optional[List[str]] = field(default=None, metadata={"cli": False})
    actor_devices: Optional[List[str]] = field(default=None, metadata={"cli": False})
    learner_devices: Optional[List[str]] = field(default=None, metadata={"cli": False})
    run_name: str = ""
    "run directory name under --run-dir; defaults to env__exp__seed__time. Set it explicitly to make --resume find a previous run's checkpoints"

    # Subclasses set this; used for batch math below.
    num_steps: int = field(default=0, metadata={"cli": False})

    def resolve(self, world_size: int = 1, local_rank: int = 0) -> "CommonConfig":
        """Fill derived batch-size fields (reference cleanba_ppo.py:411-443)."""
        n_actor_chips = len(self.actor_device_ids)
        self.local_batch_size = int(
            self.local_num_envs * self.num_steps * self.num_actor_threads * n_actor_chips
        )
        self.local_minibatch_size = int(self.local_batch_size // self.num_minibatches)
        assert self.local_num_envs % len(self.learner_device_ids) == 0, (
            "local_num_envs must be divisible by len(learner_device_ids)"
        )
        assert (
            int(self.local_num_envs / len(self.learner_device_ids))
            * self.num_actor_threads
            % self.num_minibatches
            == 0
        ), "int(local_num_envs / len(learner_device_ids)) * num_actor_threads must be divisible by num_minibatches"
        self.world_size = world_size
        self.local_rank = local_rank
        self.num_envs = self.local_num_envs * world_size * self.num_actor_threads * n_actor_chips
        self.batch_size = self.local_batch_size * world_size
        self.minibatch_size = self.local_minibatch_size * world_size
        self.num_updates = self.total_timesteps // (self.local_batch_size * world_size)
        if self.async_batch_size <= 0:
            self.async_batch_size = self.local_num_envs
        if not self.run_name:
            self.run_name = (
                f"{self.env_id}__{self.exp_name}__{self.seed}__{int(time.time())}"
            )
        elif "{" in self.run_name:
            # Deterministic templated names for orchestrated sweeps: e.g.
            # --run-name 'hns_{env_id}_s{seed}' gives every (env, seed) job a
            # stable directory so a retried job can --resume its checkpoints.
            self.run_name = self.run_name.format(
                env_id=self.env_id, seed=self.seed, exp_name=self.exp_name
            )
        return self

    @property
    def run_path(self) -> str:
        return os.path.join(self.run_dir, self.run_name)

    def asdict(self) -> dict:
        return dataclasses.asdict(self)


@dataclass
class PPOConfig(CommonConfig):
    """Sebulba PPO with GAE (reference cleanba/cleanba_ppo.py defaults, :58-95)."""

    exp_name: str = "ppo"
    learning_rate: float = 2.5e-4
    "the learning rate of the optimizer"
    num_steps: int = 128
    "the number of steps to run in each environment per policy rollout"
    gae_lambda: float = 0.95
    "the lambda for the general advantage estimation"
    update_epochs: int = 4
    "the K epochs to update the policy"
    norm_adv: bool = True
    "Toggles advantages normalization (per minibatch)"
    clip_coef: float = 0.1
    "the surrogate clipping coefficient"
    max_grad_norm: float = 0.5
    "the maximum norm for the gradient clipping"


@dataclass
class ImpalaConfig(CommonConfig):
    """Sebulba IMPALA with V-trace (reference cleanba/cleanba_impala.py defaults, :60-96)."""

    exp_name: str = "impala"
    learning_rate: float = 6e-4
    "the learning rate of the optimizer"
    num_steps: int = 20
    "the number of steps to run in each environment per policy rollout"
    max_grad_norm: float = 40.0
    "the maximum norm for the gradient clipping"
    rmsprop_decay: float = 0.99
    "RMSProp second-moment decay"
    rmsprop_eps: float = 0.01
    "RMSProp epsilon (inside the sqrt, PyTorch-style; see ops/optim.py)"
    concurrency: bool = True
    vtrace_rho_clip: float = 1.0
    "V-trace importance-weight clip rho-bar"
    vtrace_c_clip: float = 1.0
    "V-trace trace-cutting clip c-bar"
    vtrace_lambda: float = 1.0
    "V-trace lambda (mixing parameter)"
