"""Post-training evaluation harness (reference
cleanrl_utils/evals/ppo_envpool_jax_eval.py:13-82 and its procgen twin
cleanba_ppo_envpool_procgen_eval.py — one function here serves both: the env
factory already applies the procgen protocol to -v0 ids, and video capture is
color-aware).

Rebuilds the model from the saved final-model file, runs `eval_episodes`
episodes on a single env with on-device Gumbel sampling, and optionally writes
an mp4 via OpenCV (moviepy is not available in this environment; cv2's
VideoWriter replaces it). Atari obs ([84,84,stack] grayscale) render the
newest frame; procgen obs ([64,64,3]) render in RGB.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np

from cleanba_tpu.envs import make_env
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.utils.checkpoint import load_model

__all__ = ["evaluate"]


def evaluate(
    model_path: str,
    env_id: str,
    eval_episodes: int,
    run_name: str,
    cfg,
    capture_video: bool = False,
    seed: int = 1,
    video_dir: str = "videos",
) -> List[float]:
    envs = make_env(
        env_id, seed=seed, num_envs=1,
        protocol=getattr(cfg, "env_protocol", "machado"),
        backend=getattr(cfg, "env_backend", "auto"),
    )()
    sample_obs = np.zeros((1, *envs.spec.obs_shape), envs.spec.obs_dtype)
    agent = build_agent(cfg, envs.spec.num_actions, sample_obs, jax.random.PRNGKey(seed))
    params = load_model(model_path, agent.init_params)

    # Per-algo inference dispatch: PPO checkpoints sample through the PPO
    # head path (reference ppo_envpool_jax_eval.py uses get_action_and_value),
    # IMPALA through the logits path — so eval cannot silently diverge from
    # the trained policy head if the two inference fns ever differ.
    if hasattr(cfg, "update_epochs"):  # PPOConfig marker field

        def _act(p, obs, pa, pr, k):
            _, action, _, _, k = agent.ppo_inference(p, obs, pa, pr, k)
            return action, k
    else:

        def _act(p, obs, pa, pr, k):
            _, action, _, k = agent.impala_inference(p, obs, pa, pr, k)
            return action, k

    key = jax.random.PRNGKey(seed)
    episodic_returns: List[float] = []
    frames: List[np.ndarray] = []
    next_obs, _ = envs.reset()
    episode_return = 0.0
    prev_a = np.zeros(1, np.int32)
    prev_r = np.zeros(1, np.float32)

    while len(episodic_returns) < eval_episodes:
        action, key = _act(params, next_obs, prev_a, prev_r, key)
        next_obs, reward, terminated, truncated, info = envs.step(np.asarray(action))
        first = (info["elapsed_step"] == 0).astype(np.float32)
        prev_a = (np.asarray(action) * (1.0 - first)).astype(np.int32)
        prev_r = (np.asarray(reward) * (1.0 - first)).astype(np.float32)
        episode_return += float(info["reward"][0])
        if capture_video and next_obs.ndim == 4:
            if next_obs.shape[-1] == 3:   # procgen-family RGB observation
                frames.append(next_obs[0])
            else:                          # Atari stack: newest grayscale frame
                frames.append(next_obs[0, :, :, -1])
        if terminated[0] or truncated[0]:
            episodic_returns.append(episode_return)
            print(f"eval_episode={len(episodic_returns)}, episodic_return={episode_return}")
            episode_return = 0.0

    if capture_video and frames:
        _write_video(frames, os.path.join(video_dir, run_name, "eval.mp4"))
    envs.close()
    # HNS report when anchors exist (the reference's headline metric family,
    # README.md:14; anchors in cleanba_tpu/hns.py).
    try:
        from cleanba_tpu.hns import human_normalized_score

        hns = human_normalized_score(env_id, float(np.mean(episodic_returns)))
        print(f"eval HNS({env_id}) = {hns:.3f}")
    except KeyError:
        pass
    return episodic_returns


def _write_video(frames: List[np.ndarray], path: str, fps: int = 30, scale: int = 4) -> Optional[str]:
    """Write grayscale [H, W] or RGB [H, W, 3] frames (reference procgen eval
    captures RGB, cleanba_ppo_envpool_procgen_eval.py; Atari eval grayscale)."""
    try:
        import cv2
    except ImportError:
        return None
    os.makedirs(os.path.dirname(path), exist_ok=True)
    color = frames[0].ndim == 3
    h, w = frames[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w * scale, h * scale), isColor=color
    )
    for f in frames:
        if color:
            f = cv2.cvtColor(f, cv2.COLOR_RGB2BGR)
        writer.write(cv2.resize(f, (w * scale, h * scale), interpolation=cv2.INTER_NEAREST))
    writer.release()
    return path
