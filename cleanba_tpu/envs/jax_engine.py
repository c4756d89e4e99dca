"""On-device (pure-JAX) environment engine — the Anakin-architecture path.

The Sebulba runtime (host C++ envs + device policy, SURVEY.md L0/L1) pays one
host<->device round trip per environment step; on a remote/tunneled chip that
round trip dominates wall-clock. This module removes the host from the loop
entirely: the games themselves are pure JAX functions, so the whole
rollout -> GAE -> update pipeline compiles into ONE XLA program per update
(`cleanba_tpu/train_ppo_anakin.py`), with envs sharded over the device mesh.

Game rules and protocol semantics mirror the C++ engine exactly
(csrc/envs/breakout.cc, csrc/envs/atari_like.h), which in turn stands in for
EnvPool's ALE games in the reference's configs (reference make_env,
cleanba/cleanba_ppo.py:126-146): sticky actions (Machado p=0.25), frameskip 4
with max-pool over the last two raw frames, 4-frame stacking (oldest in
channel 0, NHWC), noop starts, optional episodic-life termination, sign reward
clipping, 27000-step truncation, and EnvPool auto-reset (the obs returned with
done=True is the NEW episode's first observation; elapsed_step==0 marks it).

All functions are single-env; batch with `jax.vmap`, shard with a mesh.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["JaxAtariEnv", "JaxCartPoleEnv", "make_jax_env", "JAX_TASKS"]

SCREEN = 84

# ALE full action set: index -> (dx, dy, fire) (csrc/envs/atari_like.h:32-38).
_ACTION_TABLE = np.array(
    [
        [0, 0, 0], [0, 0, 1], [0, -1, 0], [1, 0, 0], [-1, 0, 0], [0, 1, 0],
        [1, -1, 0], [-1, -1, 0], [1, 1, 0], [-1, 1, 0], [0, -1, 1], [1, 0, 1],
        [-1, 0, 1], [0, 1, 1], [1, -1, 1], [-1, -1, 1], [1, 1, 1], [-1, 1, 1],
    ],
    dtype=np.int32,
)

_Y = np.arange(SCREEN, dtype=np.int32)[:, None]  # [84, 1]
_X = np.arange(SCREEN, dtype=np.int32)[None, :]  # [1, 84]


# ---------------------------------------------------------------------------
# Breakout game core (rules mirror csrc/envs/breakout.cc)
# ---------------------------------------------------------------------------

_BK_ROWS, _BK_COLS = 6, 10
_BK_BRICK_W, _BK_BRICK_H = 8, 2
_BK_BRICK_TOP = 14
_BK_WALL_TOP = 4
_BK_SIDE = 2
_BK_PADDLE_Y = 79.0
_BK_PADDLE_H = 2
_BK_PADDLE_W = 12
_BK_BALL = 2.0
_BK_BOTTOM = 84.0
_BK_ROW_SHADE = np.array([200, 186, 172, 158, 144, 130], np.uint8)
_BK_ROW_SCORE = np.array([7, 7, 4, 4, 1, 1], np.float32)


@flax.struct.dataclass
class BreakoutCore:
    bricks: jax.Array   # [6, 10] bool
    lives: jax.Array    # i32
    hits: jax.Array     # i32
    over: jax.Array     # bool
    waiting: jax.Array  # bool
    speed: jax.Array    # f32
    paddle_x: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array
    vx: jax.Array
    vy: jax.Array


def _breakout_reset(key: jax.Array) -> BreakoutCore:
    del key  # serve() consumes no randomness (breakout.cc:127-132)
    paddle_x = jnp.float32(42.0 - _BK_PADDLE_W / 2.0)
    return BreakoutCore(
        bricks=jnp.ones((_BK_ROWS, _BK_COLS), jnp.bool_),
        lives=jnp.int32(5),
        hits=jnp.int32(0),
        over=jnp.bool_(False),
        waiting=jnp.bool_(True),
        speed=jnp.float32(1.2),
        paddle_x=paddle_x,
        ball_x=paddle_x + _BK_PADDLE_W / 2.0 - _BK_BALL / 2.0,
        ball_y=jnp.float32(_BK_PADDLE_Y - _BK_BALL),
        vx=jnp.float32(0.0),
        vy=jnp.float32(0.0),
    )


def _breakout_collide(s: BreakoutCore) -> Tuple[BreakoutCore, jax.Array]:
    """One collision pass (breakout.cc:144-192), vectorized with selects."""
    # Side walls.
    ball_x = jnp.where(s.ball_x < _BK_SIDE, jnp.float32(_BK_SIDE), s.ball_x)
    vx = jnp.where(s.ball_x < _BK_SIDE, jnp.abs(s.vx), s.vx)
    hit_r = ball_x + _BK_BALL > SCREEN - _BK_SIDE
    ball_x = jnp.where(hit_r, SCREEN - _BK_SIDE - _BK_BALL, ball_x)
    vx = jnp.where(hit_r, -jnp.abs(vx), vx)
    # Top wall.
    hit_t = s.ball_y < _BK_WALL_TOP
    ball_y = jnp.where(hit_t, jnp.float32(_BK_WALL_TOP), s.ball_y)
    vy = jnp.where(hit_t, jnp.abs(s.vy), s.vy)

    # Bricks: test the ball-center cell.
    cx = ball_x + _BK_BALL / 2.0
    cy = ball_y + _BK_BALL / 2.0
    r = ((cy - _BK_BRICK_TOP) / _BK_BRICK_H).astype(jnp.int32)
    c = ((cx - _BK_SIDE) / _BK_BRICK_W).astype(jnp.int32)
    in_grid = (r >= 0) & (r < _BK_ROWS) & (c >= 0) & (c < _BK_COLS)
    rc = jnp.clip(r, 0, _BK_ROWS - 1)
    cc = jnp.clip(c, 0, _BK_COLS - 1)
    brick_hit = in_grid & s.bricks[rc, cc]
    bricks = s.bricks.at[rc, cc].set(jnp.where(brick_hit, False, s.bricks[rc, cc]))
    reward = jnp.where(brick_hit, jnp.asarray(_BK_ROW_SCORE)[rc], 0.0)
    vy = jnp.where(brick_hit, -vy, vy)
    # speed_up() after the 4th and 12th hit (breakout.cc:134-142).
    hits = s.hits + brick_hit.astype(jnp.int32)
    boost = brick_hit & ((hits == 4) | (hits == 12))
    scale = jnp.where(boost, jnp.float32(1.18), jnp.float32(1.0))
    speed = s.speed * scale
    vx = vx * scale
    vy = vy * scale
    # New wall when cleared.
    cleared = ~jnp.any(bricks)
    bricks = jnp.where(cleared, jnp.ones_like(bricks), bricks)

    # Paddle (only when moving down); bounce angle from hit offset.
    pad_hit = (
        (vy > 0)
        & (ball_y + _BK_BALL >= _BK_PADDLE_Y)
        & (ball_y < _BK_PADDLE_Y + _BK_PADDLE_H)
        & (ball_x + _BK_BALL > s.paddle_x)
        & (ball_x < s.paddle_x + _BK_PADDLE_W)
    )
    ball_y = jnp.where(pad_hit, _BK_PADDLE_Y - _BK_BALL, ball_y)
    offset = jnp.clip(
        (cx - (s.paddle_x + _BK_PADDLE_W / 2.0)) / (_BK_PADDLE_W / 2.0), -1.0, 1.0
    )
    vx = jnp.where(pad_hit, offset * 1.25 * speed, vx)
    vy = jnp.where(pad_hit, -speed, vy)

    # Bottom: life lost.
    out = ball_y > _BK_BOTTOM
    lives = s.lives - out.astype(jnp.int32)
    over = s.over | (out & (lives <= 0))
    waiting = s.waiting | (out & (lives > 0))
    vx = jnp.where(out, 0.0, vx)
    vy = jnp.where(out, 0.0, vy)
    return (
        s.replace(
            bricks=bricks, lives=lives, hits=hits, over=over, waiting=waiting,
            speed=speed, ball_x=ball_x, ball_y=ball_y, vx=vx, vy=vy,
        ),
        reward,
    )


def _breakout_act(s: BreakoutCore, dx: jax.Array, dy: jax.Array, fire: jax.Array,
                  key: jax.Array) -> Tuple[BreakoutCore, jax.Array]:
    """One raw frame (breakout.cc:49-81). No-op when the game is over."""
    del dy
    live = ~s.over
    # Paddle: 2 px per raw frame, clamped to the side walls.
    paddle_x = jnp.clip(
        s.paddle_x + 2.0 * dx.astype(jnp.float32),
        float(_BK_SIDE), 84.0 - _BK_SIDE - _BK_PADDLE_W,
    )
    paddle_x = jnp.where(live, paddle_x, s.paddle_x)
    s = s.replace(paddle_x=paddle_x)

    # Waiting branch: ball rides the paddle; FIRE launches on a random diagonal.
    k1, k2 = jax.random.split(key)
    dir_ = jnp.where(jax.random.bernoulli(k1), 1.0, -1.0)
    steep = jnp.where(jax.random.bernoulli(k2), 0.5, 1.0)
    launch = s.waiting & (fire > 0) & live
    waiting_s = s.replace(
        ball_x=paddle_x + _BK_PADDLE_W / 2.0 - _BK_BALL / 2.0,
        ball_y=jnp.float32(_BK_PADDLE_Y - _BK_BALL),
        waiting=jnp.where(launch, False, s.waiting),
        vx=jnp.where(launch, dir_ * steep * s.speed, s.vx),
        vy=jnp.where(launch, -s.speed, s.vy),
    )

    # Flight branch: 2 substeps to avoid tunneling (breakout.cc:72-80).
    def substep(st, _):
        moved = st.replace(ball_x=st.ball_x + st.vx / 2.0, ball_y=st.ball_y + st.vy / 2.0)
        nxt, r = _breakout_collide(moved)
        # `if (waiting_ || over_) break`: freeze once the ball is dead.
        halt = st.waiting | st.over
        nxt = jax.tree.map(lambda a, b: jnp.where(halt, a, b), st, nxt)
        return nxt, jnp.where(halt, 0.0, r)

    flight_s, rewards = jax.lax.scan(substep, s, None, length=2)
    reward = rewards.sum()

    was_waiting = s.waiting
    out = jax.tree.map(
        lambda w, f: jnp.where(was_waiting, w, f), waiting_s, flight_s
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live & ~was_waiting, reward, 0.0)


def _breakout_render(s: BreakoutCore) -> jax.Array:
    """84x84 grayscale frame (breakout.cc:83-108), pure broadcasted masks."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.where((y < _BK_WALL_TOP) | (x < _BK_SIDE) | (x >= SCREEN - _BK_SIDE),
                  jnp.uint8(142), jnp.uint8(0))
    # Lives ticks in the top wall row.
    tick = (y == 1) & (x >= 4) & (x < 4 + s.lives * 4) & (((x - 4) % 4) < 2)
    f = jnp.where(tick, jnp.uint8(0), f)
    # Bricks.
    r = (y - _BK_BRICK_TOP) // _BK_BRICK_H
    c = (x - _BK_SIDE) // _BK_BRICK_W
    in_wall = (
        (y >= _BK_BRICK_TOP) & (y < _BK_BRICK_TOP + _BK_ROWS * _BK_BRICK_H)
        & (x >= _BK_SIDE) & (x < _BK_SIDE + _BK_COLS * _BK_BRICK_W)
    )
    rc = jnp.clip(r, 0, _BK_ROWS - 1)
    cc = jnp.clip(c, 0, _BK_COLS - 1)
    vis = in_wall & s.bricks[rc, cc]
    f = jnp.where(vis, jnp.asarray(_BK_ROW_SHADE)[rc], f)
    # Paddle (draw_rect truncates coordinates, breakout.cc:119-125).
    px0 = s.paddle_x.astype(jnp.int32)
    px1 = (s.paddle_x + _BK_PADDLE_W).astype(jnp.int32)
    pad = (y >= int(_BK_PADDLE_Y)) & (y < int(_BK_PADDLE_Y) + _BK_PADDLE_H) & (x >= px0) & (x < px1)
    f = jnp.where(pad, jnp.uint8(200), f)
    # Ball (hidden when the game is over).
    bx0 = s.ball_x.astype(jnp.int32)
    bx1 = (s.ball_x + _BK_BALL).astype(jnp.int32)
    by0 = s.ball_y.astype(jnp.int32)
    by1 = (s.ball_y + _BK_BALL).astype(jnp.int32)
    ball = ~s.over & (y >= by0) & (y < by1) & (x >= bx0) & (x < bx1)
    f = jnp.where(ball, jnp.uint8(236), f)
    return f


_BREAKOUT = dict(
    reset=_breakout_reset,
    act=_breakout_act,
    render=_breakout_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=4,
    minimal_to_full=np.array([0, 1, 3, 4], np.int32),  # NOOP FIRE RIGHT LEFT
)


def _games():
    from cleanba_tpu.envs.jax_games import BEAMRIDER, PONG, SPACE_INVADERS
    from cleanba_tpu.envs.jax_games_extra import BOXING, FREEWAY, QBERT, SEAQUEST
    from cleanba_tpu.envs.jax_games_wave3 import ASTERIX, DEMON_ATTACK, ENDURO, MSPACMAN
    from cleanba_tpu.envs.jax_games_wave4 import (
        ATLANTIS, BOWLING, CRAZY_CLIMBER, FISHING_DERBY,
    )
    from cleanba_tpu.envs.jax_games_wave5 import (
        ASSAULT, GOPHER, NAME_THIS_GAME, PHOENIX,
    )
    from cleanba_tpu.envs.jax_games_wave6 import (
        KUNG_FU_MASTER, RIVERRAID, STAR_GUNNER, TENNIS,
    )
    from cleanba_tpu.envs.jax_games_wave7 import (
        AMIDAR, BANK_HEIST, TIME_PILOT, UP_N_DOWN,
    )
    from cleanba_tpu.envs.jax_games_wave8 import ALIEN, ROAD_RUNNER
    from cleanba_tpu.envs.jax_games_wave9 import FROSTBITE, KANGAROO, SKIING
    from cleanba_tpu.envs.jax_games_wave9b import (
        CHOPPER_COMMAND, JAMESBOND, ZAXXON,
    )
    from cleanba_tpu.envs.jax_games_wave9c import BERZERK, WIZARD_OF_WOR
    from cleanba_tpu.envs.jax_games_wave9d import ASTEROIDS, CENTIPEDE
    from cleanba_tpu.envs.jax_games_wave10 import (
        BATTLEZONE, ICE_HOCKEY, TUTANKHAM, VENTURE,
    )
    from cleanba_tpu.envs.jax_games_wave11 import (
        DEFENDER, GRAVITAR, ROBOTANK, SURROUND,
    )
    from cleanba_tpu.envs.jax_games_wave12 import (
        DOUBLE_DUNK, HERO, KRULL, YARS_REVENGE,
    )
    from cleanba_tpu.envs.jax_games_wave13 import (
        MONTEZUMA, PITFALL, PRIVATE_EYE, SOLARIS, VIDEO_PINBALL,
    )

    return {
        "Breakout-v5": _BREAKOUT,
        "Pong-v5": PONG,
        "SpaceInvaders-v5": SPACE_INVADERS,
        "BeamRider-v5": BEAMRIDER,
        "Freeway-v5": FREEWAY,
        "Boxing-v5": BOXING,
        "Seaquest-v5": SEAQUEST,
        "Qbert-v5": QBERT,
        "Asterix-v5": ASTERIX,
        "MsPacman-v5": MSPACMAN,
        "DemonAttack-v5": DEMON_ATTACK,
        "Enduro-v5": ENDURO,
        "Atlantis-v5": ATLANTIS,
        "Bowling-v5": BOWLING,
        "FishingDerby-v5": FISHING_DERBY,
        "CrazyClimber-v5": CRAZY_CLIMBER,
        "Assault-v5": ASSAULT,
        "Phoenix-v5": PHOENIX,
        "Gopher-v5": GOPHER,
        "NameThisGame-v5": NAME_THIS_GAME,
        "Riverraid-v5": RIVERRAID,
        "KungFuMaster-v5": KUNG_FU_MASTER,
        "Tennis-v5": TENNIS,
        "StarGunner-v5": STAR_GUNNER,
        "Amidar-v5": AMIDAR,
        "BankHeist-v5": BANK_HEIST,
        "UpNDown-v5": UP_N_DOWN,
        "TimePilot-v5": TIME_PILOT,
        "Alien-v5": ALIEN,
        "RoadRunner-v5": ROAD_RUNNER,
        "Skiing-v5": SKIING,
        "Frostbite-v5": FROSTBITE,
        "Kangaroo-v5": KANGAROO,
        "ChopperCommand-v5": CHOPPER_COMMAND,
        "Jamesbond-v5": JAMESBOND,
        "Zaxxon-v5": ZAXXON,
        "Berzerk-v5": BERZERK,
        "WizardOfWor-v5": WIZARD_OF_WOR,
        "Asteroids-v5": ASTEROIDS,
        "Centipede-v5": CENTIPEDE,
        "Tutankham-v5": TUTANKHAM,
        "Venture-v5": VENTURE,
        "IceHockey-v5": ICE_HOCKEY,
        "BattleZone-v5": BATTLEZONE,
        "Surround-v5": SURROUND,
        "Defender-v5": DEFENDER,
        "Robotank-v5": ROBOTANK,
        "Gravitar-v5": GRAVITAR,
        "DoubleDunk-v5": DOUBLE_DUNK,
        "Hero-v5": HERO,
        "YarsRevenge-v5": YARS_REVENGE,
        "Krull-v5": KRULL,
        "MontezumaRevenge-v5": MONTEZUMA,
        "Pitfall-v5": PITFALL,
        "PrivateEye-v5": PRIVATE_EYE,
        "Solaris-v5": SOLARIS,
        "VideoPinball-v5": VIDEO_PINBALL,
    }


_GAMES = None


def _get_games():
    global _GAMES
    if _GAMES is None:
        _GAMES = _games()
    return _GAMES


# ---------------------------------------------------------------------------
# Atari protocol wrapper (mirrors csrc/envs/atari_like.h AtariLikeEnv)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class AtariEnvState:
    core: BreakoutCore
    stack: jax.Array        # [84, 84, frame_stack] u8, oldest in channel 0
    raw0: jax.Array         # [84, 84] u8 — first max-pool frame buffer
    prev_action: jax.Array  # i32 (sticky actions)
    prev_lives: jax.Array   # i32 (episodic life)
    elapsed: jax.Array      # i32 agent steps this episode
    key: jax.Array          # per-env PRNG


class JaxAtariEnv:
    """Single-env functional Atari-protocol env; vmap for a batch.

    Protocol parity with AtariLikeEnv (csrc/envs/atari_like.h:54-143) and the
    reference's make_env flags (cleanba/cleanba_ppo.py:126-146).
    """

    def __init__(
        self,
        env_id: str = "Breakout-v5",
        repeat_action_probability: float = 0.25,
        episodic_life: bool = False,
        noop_max: int = 1,
        full_action_space: bool = True,
        reward_clip: bool = True,
        max_episode_steps: int = 27000,
        frame_stack: int = 4,
        frame_skip: int = 4,
    ):
        games = _get_games()
        if env_id not in games:
            raise ValueError(f"unknown task for the JAX engine: {env_id!r}")
        self.env_id = env_id
        self.game = games[env_id]
        self.sticky_p = float(repeat_action_probability)
        self.episodic_life = bool(episodic_life)
        self.noop_max = int(noop_max)
        self.full_action_space = bool(full_action_space)
        self.reward_clip = bool(reward_clip)
        self.max_episode_steps = int(max_episode_steps)
        self.frame_stack = int(frame_stack)
        self.frame_skip = int(frame_skip)

    @property
    def num_actions(self) -> int:
        return 18 if self.full_action_space else self.game["minimal_actions"]

    @property
    def obs_shape(self) -> Tuple[int, int, int]:
        return (SCREEN, SCREEN, self.frame_stack)

    obs_dtype = jnp.uint8

    # -- helpers ----------------------------------------------------------

    def _fresh_episode(self, key: jax.Array) -> Tuple[BreakoutCore, jax.Array]:
        """reset_game + noop starts + initial frame (atari_like.h:63-77)."""
        k_reset, k_noops, k_act = jax.random.split(key, 3)
        core = self.game["reset"](k_reset)
        if self.noop_max > 1:
            noops = jax.random.randint(k_noops, (), 0, self.noop_max)

            def noop_body(i, c):
                def do(c):
                    nc, _ = self.game["act"](
                        c, jnp.int32(0), jnp.int32(0), jnp.int32(0),
                        jax.random.fold_in(k_act, i),
                    )
                    return nc
                return jax.lax.cond(
                    (i < noops) & ~self.game["over"](c), do, lambda c: c, c
                )

            core = jax.lax.fori_loop(0, self.noop_max, noop_body, core)
        frame = self.game["render"](core)
        return core, frame

    def _compose(self, stack: jax.Array) -> jax.Array:
        return stack  # already [84, 84, S] oldest-first

    # -- public API --------------------------------------------------------

    def reset(self, key: jax.Array) -> Tuple[AtariEnvState, jax.Array]:
        key, sub = jax.random.split(key)
        core, frame = self._fresh_episode(sub)
        stack = jnp.repeat(frame[:, :, None], self.frame_stack, axis=-1)
        state = AtariEnvState(
            core=core,
            stack=stack,
            raw0=frame,
            prev_action=jnp.int32(0),
            prev_lives=self.game["lives"](core),
            elapsed=jnp.int32(0),
            key=key,
        )
        return state, self._compose(stack)

    def step(self, state: AtariEnvState, action: jax.Array):
        """Returns (state, obs, reward, raw_reward, terminated, truncated, first).

        EnvPool auto-reset semantics (csrc/engine.cc:219-222): on done the
        returned obs is the NEW episode's first obs and `first` is True.
        """
        key, k_sticky, k_acts, k_reset = jax.random.split(state.key, 4)

        action = action.astype(jnp.int32)
        sticky = jax.random.uniform(k_sticky) < self.sticky_p
        action = jnp.where(sticky, state.prev_action, action)
        prev_action = action
        full = action
        if not self.full_action_space:
            full = jnp.asarray(self.game["minimal_to_full"])[action]
        dxdyf = jnp.asarray(_ACTION_TABLE)[full]

        # Frame skip with max-pool over the last two raw frames
        # (atari_like.h:90-99). `break` on game over is mirrored by freezing.
        def skip_body(carry, k):
            core, raw0, rew, broke = carry
            nc, r = self.game["act"](
                core, dxdyf[0], dxdyf[1], dxdyf[2], jax.random.fold_in(k_acts, k)
            )
            core = jax.tree.map(lambda a, b: jnp.where(broke, a, b), core, nc)
            rew = rew + jnp.where(broke, 0.0, r)
            render_now = (k == self.frame_skip - 2) & ~broke
            raw0 = jnp.where(render_now, self.game["render"](core), raw0)
            broke = broke | self.game["over"](core)
            return (core, raw0, rew, broke), None

        # Partially unrolled: frame_skip is static (4), and a fully rolled
        # lax.scan here becomes a per-env-step XLA while loop — profiled at
        # ~30% of rollout time in loop overhead alone on a v5e (while.478 in
        # the trace). unroll=2 halves that overhead; unroll=True removes it
        # entirely but blows compile time up ~5x (516s vs 95s for the Anakin
        # PPO program on the remote compiler), so 2 is the runtime balance
        # point. Compile time scales the same way DOWN: unroll=1 compiles
        # each new game several times faster at ~15% runtime cost, which is
        # the right trade for catalog-wide sweeps that compile 28 distinct
        # game programs once each (CLEANBA_FRAMESKIP_UNROLL=1, set by
        # scripts/run_hns_sweep.sh).
        (core, raw0, reward, _), _ = jax.lax.scan(
            skip_body,
            (state.core, state.raw0, jnp.float32(0.0), jnp.bool_(False)),
            jnp.arange(self.frame_skip),
            unroll=int(os.environ.get("CLEANBA_FRAMESKIP_UNROLL", "2")),
        )
        raw1 = self.game["render"](core)
        frame = jnp.maximum(raw0, raw1)
        stack = jnp.concatenate([state.stack[:, :, 1:], frame[:, :, None]], axis=-1)

        lives = self.game["lives"](core)
        terminated = self.game["over"](core)
        if self.episodic_life:
            terminated = terminated | (lives < state.prev_lives)
        elapsed = state.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated

        raw_reward = reward
        if self.reward_clip:
            reward = jnp.sign(reward)

        # Auto-reset: replace state/obs with a fresh episode on done.
        new_core, new_frame = self._fresh_episode(k_reset)
        new_stack = jnp.repeat(new_frame[:, :, None], self.frame_stack, axis=-1)
        core = jax.tree.map(lambda n, o: jnp.where(done, n, o), new_core, core)
        stack = jnp.where(done, new_stack, stack)
        raw0 = jnp.where(done, new_frame, raw0)
        out_state = AtariEnvState(
            core=core,
            stack=stack,
            raw0=raw0,
            prev_action=jnp.where(done, 0, prev_action),
            prev_lives=self.game["lives"](core),
            elapsed=jnp.where(done, 0, elapsed),
            key=key,
        )
        first = done  # elapsed_step == 0 on the auto-reset row
        return (
            out_state, self._compose(stack), reward, raw_reward,
            terminated, truncated, first,
        )


# ---------------------------------------------------------------------------
# CartPole (classic control; matches csrc/envs/cartpole.cc semantics)
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class CartPoleState:
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxCartPoleEnv:
    """Functional CartPole-v1 (gym classic dynamics), for fast engine tests."""

    num_actions = 2
    obs_shape = (4,)
    obs_dtype = jnp.float32

    def __init__(self, env_id: str = "CartPole-v1", max_episode_steps: int = 500, **_):
        self.env_id = env_id
        self.max_episode_steps = int(max_episode_steps)

    def _obs(self, s: CartPoleState) -> jax.Array:
        return jnp.stack([s.x, s.x_dot, s.theta, s.theta_dot])

    def reset(self, key: jax.Array) -> Tuple[CartPoleState, jax.Array]:
        key, sub = jax.random.split(key)
        init = jax.random.uniform(sub, (4,), minval=-0.05, maxval=0.05)
        s = CartPoleState(init[0], init[1], init[2], init[3], jnp.int32(0), key)
        return s, self._obs(s)

    def step(self, s: CartPoleState, action: jax.Array):
        key = s.key
        force = jnp.where(action.astype(jnp.int32) == 1, 10.0, -10.0)
        costh, sinth = jnp.cos(s.theta), jnp.sin(s.theta)
        temp = (force + 0.05 * s.theta_dot**2 * sinth) / 1.1
        thacc = (9.8 * sinth - costh * temp) / (0.5 * (4.0 / 3.0 - 0.1 * costh**2 / 1.1))
        xacc = temp - 0.05 * thacc * costh / 1.1
        tau = 0.02
        x = s.x + tau * s.x_dot
        x_dot = s.x_dot + tau * xacc
        theta = s.theta + tau * s.theta_dot
        theta_dot = s.theta_dot + tau * thacc
        elapsed = s.elapsed + 1
        terminated = (jnp.abs(x) > 2.4) | (jnp.abs(theta) > 12 * 2 * jnp.pi / 360)
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        key, sub = jax.random.split(key)
        init = jax.random.uniform(sub, (4,), minval=-0.05, maxval=0.05)
        ns = CartPoleState(
            x=jnp.where(done, init[0], x),
            x_dot=jnp.where(done, init[1], x_dot),
            theta=jnp.where(done, init[2], theta),
            theta_dot=jnp.where(done, init[3], theta_dot),
            elapsed=jnp.where(done, 0, elapsed),
            key=key,
        )
        reward = jnp.float32(1.0)
        return ns, self._obs(ns), reward, reward, terminated, truncated, done


def _jax_tasks():
    """Every task the on-device engine serves (kept in sync with _games()
    and the procgen dispatch in make_jax_env by derivation, not by hand)."""
    atari = tuple(_get_games().keys())
    procgen = tuple(
        f"{p}{suffix}-v0"
        for p in ("Bigfish", "Maze", "Leaper", "Chaser", "Starpilot",
                  "Fruitbot", "Coinrun", "Miner", "Heist", "Jumper",
                  "Ninja", "Plunder", "Caveflyer", "Climber", "Dodgeball",
                  "Bossfight")
        for suffix in ("", "Easy", "Hard")
    )
    return atari + procgen + ("CartPole-v1",)


JAX_TASKS = _jax_tasks()


def make_jax_env(env_id: str, protocol_opts: dict | None = None):
    """Build the functional on-device env for `env_id`.

    `protocol_opts` uses the same keys as `cleanba_tpu.envs.PROTOCOLS`
    entries (repeat_action_probability, episodic_life, noop_max,
    full_action_space, reward_clip, max_episode_steps). Procgen-family ids
    ignore the Atari options (plain-make contract, like the C++ engine).
    """
    opts = dict(protocol_opts or {})
    if env_id == "CartPole-v1":
        return JaxCartPoleEnv(env_id, max_episode_steps=opts.get("max_episode_steps", 500))
    if env_id.startswith(
        ("Bigfish", "Maze", "Leaper", "Chaser", "Starpilot", "Fruitbot",
         "Coinrun", "Miner", "Heist", "Jumper", "Ninja", "Plunder",
         "Caveflyer", "Climber", "Dodgeball", "Bossfight")
    ) and env_id.endswith("-v0"):
        from cleanba_tpu.envs.jax_procgen import JaxBigfishEnv, JaxMazeEnv
        from cleanba_tpu.envs.jax_procgen_extra import JaxChaserEnv, JaxLeaperEnv
        from cleanba_tpu.envs.jax_procgen_wave5 import JaxFruitbotEnv, JaxStarpilotEnv
        from cleanba_tpu.envs.jax_procgen_wave9 import (
            JaxCoinrunEnv, JaxHeistEnv, JaxJumperEnv, JaxMinerEnv,
        )
        from cleanba_tpu.envs.jax_procgen_wave14 import (
            JaxBossfightEnv, JaxCaveflyerEnv, JaxClimberEnv, JaxDodgeballEnv,
            JaxNinjaEnv, JaxPlunderEnv,
        )

        hard = "Hard" in env_id
        prefixes = ("Bigfish", "Maze", "Leaper", "Chaser", "Starpilot",
                    "Fruitbot", "Coinrun", "Miner", "Heist", "Jumper",
                    "Ninja", "Plunder", "Caveflyer", "Climber", "Dodgeball",
                    "Bossfight")
        cls = {
            "Bigfish": JaxBigfishEnv, "Maze": JaxMazeEnv,
            "Leaper": JaxLeaperEnv, "Chaser": JaxChaserEnv,
            "Starpilot": JaxStarpilotEnv, "Fruitbot": JaxFruitbotEnv,
            "Coinrun": JaxCoinrunEnv, "Miner": JaxMinerEnv,
            "Heist": JaxHeistEnv, "Jumper": JaxJumperEnv,
            "Ninja": JaxNinjaEnv, "Plunder": JaxPlunderEnv,
            "Caveflyer": JaxCaveflyerEnv, "Climber": JaxClimberEnv,
            "Dodgeball": JaxDodgeballEnv, "Bossfight": JaxBossfightEnv,
        }[next(p for p in prefixes if env_id.startswith(p))]
        return cls(env_id, hard=hard, max_episode_steps=1000)
    return JaxAtariEnv(env_id, **opts)
