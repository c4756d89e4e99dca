"""Environment factory with Atari eval-protocol presets.

`make_env` mirrors the reference's factory (cleanba/cleanba_ppo.py:121-146):
the default **Machado** protocol (sticky actions p=0.25, no episodic life,
noop_max=1, full 18-action space, 27000-step cap, reward clipping) and the
**Espeholt/IMPALA** variant (episodic life, no sticky actions, noop_max=30,
minimal action set; reference legacy_scripts/
cleanba_ppo_envpool_impala_atari_wrapper.py:120-141).

Backends: 'native' (C++ engine, csrc/), 'python' (NumPy CartPole fallback),
'auto' (native when buildable, python for CartPole otherwise).
"""

from __future__ import annotations

from typing import Callable

from cleanba_tpu.config import ATARI_MAX_FRAMES
from cleanba_tpu.envs.api import BatchedEnv, EnvSpec
from cleanba_tpu.envs.python_engine import PyCartPoleEnv

__all__ = ["make_env", "BatchedEnv", "EnvSpec", "PROTOCOLS", "is_procgen_task"]

PROTOCOLS = {
    # Machado et al. 2017 eval protocol (reference cleanba_ppo.py:126-139).
    "machado": dict(
        repeat_action_probability=0.25,
        episodic_life=False,
        noop_max=1,
        full_action_space=True,
        reward_clip=True,
        max_episode_steps=ATARI_MAX_FRAMES,
    ),
    # Espeholt et al. 2018 / original IMPALA protocol (reference
    # legacy_scripts/cleanba_ppo_envpool_impala_atari_wrapper.py:120-141).
    "espeholt": dict(
        repeat_action_probability=0.0,
        episodic_life=True,
        noop_max=30,
        full_action_space=False,
        reward_clip=True,
        max_episode_steps=ATARI_MAX_FRAMES,
    ),
    # Procgen: plain make with no Atari preprocessing (reference
    # legacy_scripts/cleanba_ppo_envpool_procgen.py:115-130); raw rewards,
    # 64x64x3 RGB obs, 15-action space, procgen's 1000-step timeout.
    "procgen": dict(
        repeat_action_probability=0.0,
        episodic_life=False,
        noop_max=1,
        full_action_space=True,
        reward_clip=False,
        max_episode_steps=1000,
    ),
}

_STATE_TASKS = {"CartPole-v1"}

# Procgen-family ids handled by the engine's procedural 64x64 RGB tasks.
_PROCGEN_PREFIXES = ("Bigfish", "Maze", "Leaper", "Chaser", "Starpilot",
                     "Fruitbot", "Coinrun", "Miner", "Heist", "Jumper",
                     "Ninja", "Plunder", "Caveflyer", "Climber", "Dodgeball",
                     "Bossfight")

# Task ids the from-scratch engines (csrc/ + jax_engine) implement. Ids
# outside this set route to the EnvPool backend under backend='auto'
# (mirrors csrc/envs/factory.cc).
NATIVE_ATARI_TASKS = (
    "Breakout-v5", "Pong-v5", "SpaceInvaders-v5", "BeamRider-v5",
    "Freeway-v5", "Boxing-v5", "Seaquest-v5", "Qbert-v5",
    "Asterix-v5", "MsPacman-v5", "DemonAttack-v5", "Enduro-v5",
    "Atlantis-v5", "Bowling-v5", "FishingDerby-v5", "CrazyClimber-v5",
    "Assault-v5", "Phoenix-v5", "Gopher-v5", "NameThisGame-v5",
    "Riverraid-v5", "KungFuMaster-v5", "Tennis-v5", "StarGunner-v5",
    "Amidar-v5", "BankHeist-v5", "UpNDown-v5", "TimePilot-v5",
    "Alien-v5", "RoadRunner-v5", "Skiing-v5", "Frostbite-v5",
    "Kangaroo-v5", "ChopperCommand-v5", "Jamesbond-v5", "Zaxxon-v5",
    "Berzerk-v5", "WizardOfWor-v5", "Asteroids-v5", "Centipede-v5",
    "Tutankham-v5", "Venture-v5", "IceHockey-v5", "BattleZone-v5",
    "Surround-v5", "Defender-v5", "Robotank-v5", "Gravitar-v5",
    "DoubleDunk-v5", "Hero-v5", "YarsRevenge-v5", "Krull-v5",
    "MontezumaRevenge-v5", "Pitfall-v5", "PrivateEye-v5", "Solaris-v5",
    "VideoPinball-v5",
)
NATIVE_PROCGEN_TASKS = (
    "Bigfish-v0", "BigfishEasy-v0", "BigfishHard-v0",
    "Maze-v0", "MazeEasy-v0", "MazeHard-v0",
    "Leaper-v0", "LeaperEasy-v0", "LeaperHard-v0",
    "Chaser-v0", "ChaserEasy-v0", "ChaserHard-v0",
    "Starpilot-v0", "StarpilotEasy-v0", "StarpilotHard-v0",
    "Fruitbot-v0", "FruitbotEasy-v0", "FruitbotHard-v0",
    "Coinrun-v0", "CoinrunEasy-v0", "CoinrunHard-v0",
    "Miner-v0", "MinerEasy-v0", "MinerHard-v0",
    "Heist-v0", "HeistEasy-v0", "HeistHard-v0",
    "Jumper-v0", "JumperEasy-v0", "JumperHard-v0",
    "Ninja-v0", "NinjaEasy-v0", "NinjaHard-v0",
    "Plunder-v0", "PlunderEasy-v0", "PlunderHard-v0",
    "Caveflyer-v0", "CaveflyerEasy-v0", "CaveflyerHard-v0",
    "Climber-v0", "ClimberEasy-v0", "ClimberHard-v0",
    "Dodgeball-v0", "DodgeballEasy-v0", "DodgeballHard-v0",
    "Bossfight-v0", "BossfightEasy-v0", "BossfightHard-v0",
)


def _native_has_task(env_id: str) -> bool:
    return (
        env_id in _STATE_TASKS
        or env_id in NATIVE_ATARI_TASKS
        or env_id in NATIVE_PROCGEN_TASKS
    )


def is_procgen_task(env_id: str) -> bool:
    return env_id.endswith("-v0") and env_id.startswith(_PROCGEN_PREFIXES)


def make_env(
    env_id: str,
    seed: int,
    num_envs: int,
    async_batch_size: int = 0,
    num_threads: int = 0,
    protocol: str = "machado",
    backend: str = "auto",
    frame_stack: int = 0,
) -> Callable[[], BatchedEnv]:
    """Returns a thunk building the batched env (reference factory shape,
    cleanba_ppo.py:126-146: `envs = make_env(...)()`)."""

    def thunk() -> BatchedEnv:
        if env_id in _STATE_TASKS:
            if backend in ("python",):
                return PyCartPoleEnv(
                    num_envs=num_envs, batch_size=async_batch_size, seed=seed,
                    max_episode_steps=500,
                )
            from cleanba_tpu.envs.native import native_available, NativeBatchedEnv

            if backend == "auto" and not native_available():
                return PyCartPoleEnv(
                    num_envs=num_envs, batch_size=async_batch_size, seed=seed,
                    max_episode_steps=500,
                )
            return NativeBatchedEnv(
                env_id, num_envs=num_envs, batch_size=async_batch_size,
                num_threads=num_threads, seed=seed, max_episode_steps=500,
                repeat_action_probability=0.0, reward_clip=False,
            )
        if backend == "python":
            raise ValueError(f"{env_id!r} requires the native engine (backend='python' given)")
        # Procgen tasks always use the plain-make protocol regardless of the
        # configured Atari preset (the reference's procgen script has no
        # protocol flags at all).
        # Any -v0 id is procgen-family (native or EnvPool's <Game>{Easy,Hard}-v0).
        opts = dict(PROTOCOLS["procgen" if env_id.endswith("-v0") else protocol])
        if backend == "envpool" or (backend == "auto" and not _native_has_task(env_id)):
            # Real EnvPool: full Atari-57/Procgen-16 catalog (reference
            # make_env, cleanba_ppo.py:126-146) behind the same BatchedEnv
            # protocol as the native engine.
            from cleanba_tpu.envs.envpool_backend import (
                EnvPoolBatchedEnv,
                envpool_available,
            )

            if not envpool_available():
                hint = (
                    "envpool is not installed"
                    if backend == "envpool"
                    else f"{env_id!r} is not a native-engine task and envpool is not installed"
                )
                raise ValueError(f"cannot build {env_id!r}: {hint}")
            return EnvPoolBatchedEnv(
                env_id, num_envs=num_envs, batch_size=async_batch_size,
                num_threads=num_threads, seed=seed,
                frame_stack=frame_stack if frame_stack > 0 else 4, **opts,
            )
        from cleanba_tpu.envs.native import NativeBatchedEnv

        if frame_stack > 0:
            opts["frame_stack"] = frame_stack
        return NativeBatchedEnv(
            env_id, num_envs=num_envs, batch_size=async_batch_size,
            num_threads=num_threads, seed=seed, **opts,
        )

    return thunk
