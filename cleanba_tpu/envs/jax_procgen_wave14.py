"""Pure-JAX procgen-family envs, wave 14: Ninja, Plunder, Caveflyer,
Climber, Dodgeball, Bossfight — completing the 16-game procgen suite.

Rules mirror the C++ clones (csrc/envs/ninja.cc, plunder.cc, caveflyer.cc,
climber.cc, dodgeball.cc, bossfight.cc) and the procgen protocol
(csrc/envs/procgen_like.h): 64x64x3 RGB uint8 observations, the 15-action
combo space, a fresh procedural level every episode, raw rewards, 1000-step
truncation, EnvPool auto-reset semantics. The engines draw independent RNG
streams, so levels differ but rules and scoring match.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_procgen import PG, _PG_DX, _PG_DY, _rect

__all__ = [
    "JaxNinjaEnv", "JaxPlunderEnv", "JaxCaveflyerEnv", "JaxClimberEnv",
    "JaxDodgeballEnv", "JaxBossfightEnv",
]

# Procgen combo specials: indices 9..14 are the D/A/W/S/Q/E buttons.
_PG_SPECIAL = np.array([0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 5, 6], np.int32)


class _ProcgenBase:
    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str, hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def reset(self, key: jax.Array):
        s = self._fresh(key)
        return s, self._render(s)

    def _finish(self, s, ns, raw_reward, terminated, key, k_reset):
        elapsed = ns.elapsed
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Ninja (csrc/envs/ninja.cc)
# ---------------------------------------------------------------------------

_NJ_MAXP = 6
_NJ_P = 4.0
_NJ_RUN = 1.2
_NJ_JUMP = -2.3
_NJ_G = 0.17
_NJ_STARV = 2.6
_NJ_MAXB = 3


@flax.struct.dataclass
class NinjaState:
    n_plat: jax.Array
    plat_x: jax.Array
    plat_y: jax.Array
    plat_w: jax.Array
    n_bombs: jax.Array
    bomb_live: jax.Array
    bomb_x: jax.Array
    bomb_y: jax.Array
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    facing: jax.Array
    grounded: jax.Array
    star_live: jax.Array
    star_x: jax.Array
    star_y: jax.Array
    star_vx: jax.Array
    goal_x: jax.Array
    goal_y: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxNinjaEnv(_ProcgenBase):
    """Functional ninja; vmap for a batch."""

    def _fresh(self, key) -> NinjaState:
        ks = jax.random.split(key, 8)
        key = ks[0]
        n_plat = 4 + jax.random.randint(ks[1], (), 0, 3 if self.hard else 2)
        plat_w = 10.0 + jax.random.randint(ks[2], (_NJ_MAXP,), 0, 6).astype(jnp.float32)
        gaps = 3.0 + jax.random.randint(ks[3], (_NJ_MAXP,), 0,
                                        7 if self.hard else 4).astype(jnp.float32)
        plat_x = 2.0 + jnp.concatenate(
            [jnp.zeros(1), jnp.cumsum(plat_w[:-1] + gaps[:-1])]
        )
        plat_y = 40.0 + jax.random.randint(ks[4], (_NJ_MAXP,), 0, 16).astype(jnp.float32) \
            - (jnp.arange(_NJ_MAXP) % 2).astype(jnp.float32) * 10.0
        n_bombs = 1 + jax.random.randint(ks[5], (), 0, _NJ_MAXB)
        bp = 1 + jax.random.randint(ks[6], (_NJ_MAXB,), 0,
                                    jnp.maximum(n_plat - 1, 1))
        bomb_x = plat_x[bp] + plat_w[bp] / 2.0 - 2.0
        bomb_y = plat_y[bp] - 4.0
        bomb_live = jnp.arange(_NJ_MAXB) < n_bombs
        last = n_plat - 1
        return NinjaState(
            n_plat=n_plat, plat_x=plat_x, plat_y=plat_y, plat_w=plat_w,
            n_bombs=n_bombs, bomb_live=bomb_live, bomb_x=bomb_x, bomb_y=bomb_y,
            px=plat_x[0] + 2.0, py=plat_y[0] - _NJ_P, vy=jnp.float32(0.0),
            facing=jnp.float32(1.0), grounded=jnp.bool_(True),
            star_live=jnp.bool_(False), star_x=jnp.float32(0.0),
            star_y=jnp.float32(0.0), star_vx=jnp.float32(0.0),
            goal_x=plat_x[last] + plat_w[last] / 2.0 - 2.0,
            goal_y=plat_y[last] - 4.0, elapsed=jnp.int32(0), key=key,
        )

    def _render(self, s: NinjaState) -> jax.Array:
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (30, 34, 44)], -1)
        for i in range(_NJ_MAXP):
            body = _rect(f, s.plat_x[i], s.plat_y[i], s.plat_w[i], 3.0,
                         (jnp.uint8(90), jnp.uint8(120), jnp.uint8(80)))
            f = jnp.where(i < s.n_plat, body, f)
        for b in range(_NJ_MAXB):
            body = _rect(f, s.bomb_x[b], s.bomb_y[b], 4.0, 4.0,
                         (jnp.uint8(220), jnp.uint8(80), jnp.uint8(60)))
            f = jnp.where(s.bomb_live[b], body, f)
        f = _rect(f, s.goal_x, s.goal_y, 4.0, 4.0,
                  (jnp.uint8(230), jnp.uint8(190), jnp.uint8(90)))
        star = _rect(f, s.star_x - 1.0, s.star_y - 1.0, 2.0, 2.0,
                     (jnp.uint8(240), jnp.uint8(240), jnp.uint8(240)))
        f = jnp.where(s.star_live, star, f)
        f = _rect(f, s.px, s.py, _NJ_P, _NJ_P,
                  (jnp.uint8(70), jnp.uint8(70), jnp.uint8(80)))
        return f

    def step(self, s: NinjaState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a]
        sp = jnp.asarray(_PG_SPECIAL)[a]

        px = jnp.clip(s.px + _NJ_RUN * dx, 0.0, PG - _NJ_P)
        facing = jnp.where(dx != 0, jnp.sign(dx), s.facing)
        jumps = (dy < 0) & s.grounded
        vy = jnp.where(jumps, _NJ_JUMP, s.vy) + _NJ_G
        prev_bottom = s.py + _NJ_P
        py = s.py + vy
        idx = jnp.arange(_NJ_MAXP)
        over = (px + _NJ_P > s.plat_x) & (px < s.plat_x + s.plat_w) & (idx < s.n_plat)
        lands = (vy >= 0.0) & over & (prev_bottom <= s.plat_y) & (py + _NJ_P >= s.plat_y)
        landed = lands.any()
        land_y = jnp.where(lands, s.plat_y, jnp.inf).min()
        py = jnp.where(landed, land_y - _NJ_P, py)
        vy = jnp.where(landed, 0.0, vy)
        grounded = landed
        fell = py > PG

        throws = (sp != 0) & ~s.star_live
        star_live = s.star_live | throws
        star_x = jnp.where(throws, px + _NJ_P / 2.0, s.star_x)
        star_y = jnp.where(throws, py + 2.0, s.star_y)
        star_vx = jnp.where(throws, facing * _NJ_STARV, s.star_vx)
        star_x = jnp.where(star_live, star_x + star_vx, star_x)
        star_live = star_live & (star_x >= 0.0) & (star_x < PG)

        star_hits = (
            star_live & s.bomb_live
            & (star_x >= s.bomb_x) & (star_x < s.bomb_x + 4.0)
            & (star_y >= s.bomb_y) & (star_y < s.bomb_y + 4.0)
        )
        pop = star_hits & (jnp.cumsum(star_hits.astype(jnp.int32)) == 1)
        star_live = star_live & ~pop.any()
        bomb_live = s.bomb_live & ~pop

        bombed = ~fell & (
            bomb_live
            & (px + _NJ_P > s.bomb_x) & (px < s.bomb_x + 4.0)
            & (py + _NJ_P > s.bomb_y) & (py < s.bomb_y + 4.0)
        ).any()
        goaled = ~fell & ~bombed \
            & (px + _NJ_P > s.goal_x) & (px < s.goal_x + 4.0) \
            & (py + _NJ_P > s.goal_y) & (py < s.goal_y + 4.0)
        raw_reward = jnp.where(goaled, 10.0, 0.0)
        terminated = fell | bombed | goaled

        ns = s.replace(px=px, py=py, vy=vy, facing=facing, grounded=grounded,
                       star_live=star_live, star_x=star_x, star_y=star_y,
                       star_vx=star_vx, bomb_live=bomb_live,
                       elapsed=s.elapsed + 1, key=key)
        return self._finish(s, ns, raw_reward, terminated, key, k_reset)


# ---------------------------------------------------------------------------
# Plunder (csrc/envs/plunder.cc)
# ---------------------------------------------------------------------------

_PL_LANES = 3
_PL_LANEY = np.array([12.0, 24.0, 36.0], np.float32)
_PL_SW, _PL_SH = 7.0, 4.0
_PL_PW, _PL_PH = 6.0, 4.0
_PL_PY = 56.0
_PL_MOVE = 1.3
_PL_SHOT = 2.4
_PL_TIMER = 1200
_PL_MISS = 80


@flax.struct.dataclass
class PlunderState:
    ship_x: jax.Array
    speed: jax.Array
    target: jax.Array
    px: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    clock: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxPlunderEnv(_ProcgenBase):
    """Functional plunder; vmap for a batch."""

    def _fresh(self, key) -> PlunderState:
        k1, k2, k3, key = jax.random.split(key, 4)
        sgn = jnp.asarray([1.0, -1.0, 1.0], jnp.float32)
        speed = (0.4 + 0.4 * jax.random.uniform(k1, (_PL_LANES,))) \
            * (1.5 if self.hard else 1.0) * sgn
        return PlunderState(
            ship_x=jax.random.uniform(k2, (_PL_LANES,)) * PG, speed=speed,
            target=jax.random.uniform(k3, (_PL_LANES,)) < 0.5,
            px=jnp.float32(PG / 2.0 - _PL_PW / 2.0), shot_live=jnp.bool_(False),
            shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
            clock=jnp.int32(_PL_TIMER), elapsed=jnp.int32(0), key=key,
        )

    def _render(self, s: PlunderState) -> jax.Array:
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (16, 30, 60)], -1)
        for l in range(_PL_LANES):
            tgt = _rect(f, s.ship_x[l], float(_PL_LANEY[l]), _PL_SW, _PL_SH,
                        (jnp.uint8(210), jnp.uint8(60), jnp.uint8(60)))
            fr = _rect(f, s.ship_x[l], float(_PL_LANEY[l]), _PL_SW, _PL_SH,
                       (jnp.uint8(230), jnp.uint8(230), jnp.uint8(230)))
            f = jnp.where(s.target[l], tgt, fr)
        shot = _rect(f, s.shot_x - 1.0, s.shot_y - 2.0, 2.0, 3.0,
                     (jnp.uint8(240), jnp.uint8(220), jnp.uint8(120)))
        f = jnp.where(s.shot_live, shot, f)
        f = _rect(f, s.px, _PL_PY, _PL_PW, _PL_PH,
                  (jnp.uint8(160), jnp.uint8(120), jnp.uint8(60)))
        bars = jnp.maximum(s.clock, 0) * (PG - 4) // _PL_TIMER
        f = _rect(f, 2.0, 61.0, bars.astype(jnp.float32), 1.0,
                  (jnp.uint8(230), jnp.uint8(200), jnp.uint8(90)))
        return f

    def step(self, s: PlunderState, action: jax.Array):
        key, k_reset, k_t1, k_t2 = jax.random.split(s.key, 4)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a]
        sp = jnp.asarray(_PG_SPECIAL)[a]

        px = jnp.clip(s.px + _PL_MOVE * dx, 0.0, PG - _PL_PW)
        fires = ((sp != 0) | (dy < 0)) & ~s.shot_live
        shot_live = s.shot_live | fires
        shot_x = jnp.where(fires, px + _PL_PW / 2.0, s.shot_x)
        shot_y = jnp.where(fires, _PL_PY, s.shot_y)
        shot_y = jnp.where(shot_live, shot_y - _PL_SHOT, shot_y)
        shot_live = shot_live & (shot_y >= 0.0)

        ship_x = s.ship_x + s.speed
        wrap_l = ship_x < -_PL_SW
        wrap_r = ship_x > PG
        ship_x = jnp.where(wrap_l, float(PG), jnp.where(wrap_r, -_PL_SW, ship_x))
        reroll = jax.random.uniform(k_t1, (_PL_LANES,)) < 0.5
        target = jnp.where(wrap_l | wrap_r, reroll, s.target)

        hits = (
            shot_live
            & (shot_x >= ship_x) & (shot_x < ship_x + _PL_SW)
            & (shot_y >= jnp.asarray(_PL_LANEY)) & (shot_y < jnp.asarray(_PL_LANEY) + _PL_SH)
        )
        hit = hits & (jnp.cumsum(hits.astype(jnp.int32)) == 1)
        shot_live = shot_live & ~hit.any()
        sank_target = (hit & target).any()
        sank_friendly = (hit & ~target).any()
        raw_reward = jnp.where(sank_target, 1.0, 0.0)
        clock = s.clock - 1 - jnp.where(sank_friendly, _PL_MISS, 0)
        ship_x = jnp.where(hit, jnp.where(s.speed > 0, -_PL_SW, float(PG)), ship_x)
        target = jnp.where(hit, jax.random.uniform(k_t2, (_PL_LANES,)) < 0.5, target)

        terminated = clock <= 0
        ns = s.replace(ship_x=ship_x, target=target, px=px,
                       shot_live=shot_live, shot_x=shot_x, shot_y=shot_y,
                       clock=clock, elapsed=s.elapsed + 1, key=key)
        return self._finish(s, ns, raw_reward, terminated, key, k_reset)


# ---------------------------------------------------------------------------
# Caveflyer (csrc/envs/caveflyer.cc)
# ---------------------------------------------------------------------------

_CF_COLS = 16
_CF_SHIP = 3.0
_CF_THRUST = 0.16
_CF_DRAG = 0.985
_CF_MAXPODS = 3


@flax.struct.dataclass
class CaveflyerState:
    center: jax.Array   # [16]
    half: jax.Array
    n_pods: jax.Array
    pod_live: jax.Array
    pod_x: jax.Array
    pod_y: jax.Array
    px: jax.Array
    py: jax.Array
    vx: jax.Array
    vy: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxCaveflyerEnv(_ProcgenBase):
    """Functional caveflyer; vmap for a batch."""

    def _fresh(self, key) -> CaveflyerState:
        k1, k2, k3, k4, k5, key = jax.random.split(key, 6)
        steps = (jax.random.uniform(k1, (_CF_COLS,)) - 0.5) * 14.0
        center = jnp.clip(32.0 + jnp.cumsum(steps), 14.0, 50.0)
        half = (7.0 if self.hard else 10.0) + jax.random.uniform(k2, (_CF_COLS,)) * 4.0
        n_pods = 1 + jax.random.randint(k3, (), 0, _CF_MAXPODS)
        col = 4 + jax.random.randint(k4, (_CF_MAXPODS,), 0, _CF_COLS - 6)
        side = jnp.where(jax.random.uniform(k5, (_CF_MAXPODS,)) < 0.5, -1.0, 1.0)
        pod_x = (col * 4 + 1).astype(jnp.float32)
        pod_y = center[col] + side * (half[col] - 3.0)
        return CaveflyerState(
            center=center, half=half, n_pods=n_pods,
            pod_live=jnp.arange(_CF_MAXPODS) < n_pods, pod_x=pod_x, pod_y=pod_y,
            px=jnp.float32(4.0), py=center[0], vx=jnp.float32(0.0),
            vy=jnp.float32(0.0), shot_live=jnp.bool_(False),
            shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
            elapsed=jnp.int32(0), key=key,
        )

    def _render(self, s: CaveflyerState) -> jax.Array:
        y = jnp.asarray(np.arange(PG, dtype=np.int32)[:, None])
        x = jnp.asarray(np.arange(PG, dtype=np.int32)[None, :])
        col = jnp.clip(x // 4, 0, _CF_COLS - 1)
        bore = (y.astype(jnp.float32) >= s.center[col] - s.half[col]) \
            & (y.astype(jnp.float32) < s.center[col] + s.half[col])
        rock = jnp.asarray(np.array([70, 52, 40], np.uint8))
        dark = jnp.asarray(np.array([14, 10, 20], np.uint8))
        f = jnp.where(bore[:, :, None], dark[None, None, :], rock[None, None, :])
        f = _rect(f, float(PG - 3), s.center[_CF_COLS - 1] - 4.0, 3.0, 8.0,
                  (jnp.uint8(90), jnp.uint8(220), jnp.uint8(110)))
        for p in range(_CF_MAXPODS):
            body = _rect(f, s.pod_x[p], s.pod_y[p] - 1.5, 3.0, 3.0,
                         (jnp.uint8(220), jnp.uint8(90), jnp.uint8(70)))
            f = jnp.where(s.pod_live[p], body, f)
        shot = _rect(f, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0,
                     (jnp.uint8(240), jnp.uint8(240), jnp.uint8(160)))
        f = jnp.where(s.shot_live, shot, f)
        f = _rect(f, s.px, s.py, _CF_SHIP, _CF_SHIP,
                  (jnp.uint8(200), jnp.uint8(210), jnp.uint8(230)))
        return f

    def step(self, s: CaveflyerState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a].astype(jnp.float32)
        sp = jnp.asarray(_PG_SPECIAL)[a]

        vx = (s.vx + _CF_THRUST * dx) * _CF_DRAG
        vy = (s.vy + _CF_THRUST * dy) * _CF_DRAG
        px = s.px + vx
        py = s.py + vy
        stop_l = px < 0.0
        px = jnp.where(stop_l, 0.0, px)
        vx = jnp.where(stop_l, 0.0, vx)
        off_v = (py < 0.0) | (py + _CF_SHIP > PG)
        col = jnp.clip(((px + _CF_SHIP / 2.0) / 4.0).astype(jnp.int32), 0, _CF_COLS - 1)
        cy = py + _CF_SHIP / 2.0
        rocked = off_v | (cy < s.center[col] - s.half[col]) \
            | (cy > s.center[col] + s.half[col])

        fires = (sp != 0) & ~s.shot_live
        shot_live = s.shot_live | fires
        shot_x = jnp.where(fires, px + _CF_SHIP, s.shot_x)
        shot_y = jnp.where(fires, py + _CF_SHIP / 2.0, s.shot_y)
        shot_x = jnp.where(shot_live, shot_x + 2.4, shot_x)
        scol = jnp.clip((shot_x / 4.0).astype(jnp.int32), 0, _CF_COLS - 1)
        shot_live = shot_live & (shot_x < PG) \
            & (shot_y >= s.center[scol] - s.half[scol]) \
            & (shot_y <= s.center[scol] + s.half[scol])

        shot_hits = (
            shot_live & s.pod_live
            & (shot_x >= s.pod_x) & (shot_x < s.pod_x + 3.0)
            & (shot_y >= s.pod_y - 1.5) & (shot_y < s.pod_y + 1.5)
        )
        pop = shot_hits & (jnp.cumsum(shot_hits.astype(jnp.int32)) == 1)
        shot_live = shot_live & ~pop.any()
        pod_live = s.pod_live & ~pop
        raw_reward = pop.any().astype(jnp.float32) * 3.0

        podded = ~rocked & (
            pod_live
            & (px + _CF_SHIP > s.pod_x) & (px < s.pod_x + 3.0)
            & (py + _CF_SHIP > s.pod_y - 1.5) & (py < s.pod_y + 1.5)
        ).any()
        exits = ~rocked & ~podded & (px + _CF_SHIP >= PG - 3.0)
        raw_reward = raw_reward + jnp.where(exits, 10.0, 0.0)
        terminated = rocked | podded | exits

        ns = s.replace(px=px, py=py, vx=vx, vy=vy, pod_live=pod_live,
                       shot_live=shot_live, shot_x=shot_x, shot_y=shot_y,
                       elapsed=s.elapsed + 1, key=key)
        return self._finish(s, ns, raw_reward, terminated, key, k_reset)


# ---------------------------------------------------------------------------
# Climber (csrc/envs/climber.cc)
# ---------------------------------------------------------------------------

_CL_MAXP = 9
_CL_P = 4.0
_CL_RUN = 1.1
_CL_JUMP = -2.5
_CL_G = 0.17


@flax.struct.dataclass
class ClimberState:
    n_plat: jax.Array
    plat_x: jax.Array
    plat_y: jax.Array
    plat_w: jax.Array
    star: jax.Array
    n_stars: jax.Array
    got: jax.Array
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    grounded: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxClimberEnv(_ProcgenBase):
    """Functional climber; vmap for a batch."""

    def _fresh(self, key) -> ClimberState:
        ks = jax.random.split(key, 6)
        key = ks[0]
        n_plat = 7 + jax.random.randint(ks[1], (), 0, 3)
        plat_w = 10.0 + jax.random.randint(ks[2], (_CL_MAXP,), 0, 6).astype(jnp.float32)
        plat_x = 2.0 + jax.random.uniform(ks[3], (_CL_MAXP,)) * (PG - 4.0 - plat_w)
        gaps = (7.5 if self.hard else 6.5) \
            + jax.random.randint(ks[4], (_CL_MAXP,), 0, 2).astype(jnp.float32)
        plat_y = 58.0 - jnp.concatenate([jnp.zeros(1), jnp.cumsum(gaps[:-1])])
        idx = jnp.arange(_CL_MAXP)
        star = (idx > 0) & (idx < n_plat) \
            & (jax.random.uniform(ks[5], (_CL_MAXP,)) < 0.6)
        return ClimberState(
            n_plat=n_plat, plat_x=plat_x, plat_y=plat_y, plat_w=plat_w,
            star=star, n_stars=star.sum().astype(jnp.int32), got=jnp.int32(0),
            px=plat_x[0] + 2.0, py=plat_y[0] - _CL_P, vy=jnp.float32(0.0),
            grounded=jnp.bool_(True), elapsed=jnp.int32(0), key=key,
        )

    def _render(self, s: ClimberState) -> jax.Array:
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (44, 52, 78)], -1)
        for i in range(_CL_MAXP):
            body = _rect(f, s.plat_x[i], s.plat_y[i], s.plat_w[i], 3.0,
                         (jnp.uint8(100), jnp.uint8(80), jnp.uint8(60)))
            f = jnp.where(i < s.n_plat, body, f)
            st = _rect(f, s.plat_x[i] + s.plat_w[i] / 2.0 - 1.5,
                       s.plat_y[i] - 4.0, 3.0, 3.0,
                       (jnp.uint8(240), jnp.uint8(220), jnp.uint8(90)))
            f = jnp.where(s.star[i], st, f)
        f = _rect(f, s.px, s.py, _CL_P, _CL_P,
                  (jnp.uint8(220), jnp.uint8(120), jnp.uint8(70)))
        return f

    def step(self, s: ClimberState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a]

        px = jnp.clip(s.px + _CL_RUN * dx, 0.0, PG - _CL_P)
        jumps = (dy < 0) & s.grounded
        vy = jnp.where(jumps, _CL_JUMP, s.vy) + _CL_G
        prev_bottom = s.py + _CL_P
        py = s.py + vy
        idx = jnp.arange(_CL_MAXP)
        over = (px + _CL_P > s.plat_x) & (px < s.plat_x + s.plat_w) & (idx < s.n_plat)
        lands = (vy >= 0.0) & over & (prev_bottom <= s.plat_y) & (py + _CL_P >= s.plat_y)
        landed = lands.any()
        land_y = jnp.where(lands, s.plat_y, jnp.inf).min()
        py = jnp.where(landed, land_y - _CL_P, py)
        vy = jnp.where(landed, 0.0, vy)
        grounded = landed

        sx = s.plat_x + s.plat_w / 2.0
        grabs = s.star & (px + _CL_P > sx - 2.0) & (px < sx + 2.0) \
            & (py + _CL_P > s.plat_y - 5.0) & (py < s.plat_y - 1.0)
        star = s.star & ~grabs
        n_grab = grabs.sum().astype(jnp.int32)
        got = s.got + n_grab
        raw_reward = n_grab.astype(jnp.float32)

        fell = py > PG
        top_y = s.plat_y[jnp.maximum(s.n_plat - 1, 0)]
        topped = ~fell & grounded & (py + _CL_P <= top_y + 0.5)
        raw_reward = raw_reward + jnp.where(topped & (got >= s.n_stars), 10.0, 0.0)
        terminated = fell | topped

        ns = s.replace(px=px, py=py, vy=vy, grounded=grounded, star=star,
                       got=got, elapsed=s.elapsed + 1, key=key)
        return self._finish(s, ns, raw_reward, terminated, key, k_reset)


# ---------------------------------------------------------------------------
# Dodgeball (csrc/envs/dodgeball.cc)
# ---------------------------------------------------------------------------

_DB_MAXF = 4
_DB_A = 4.0
_DB_MOVE = 1.1
_DB_BALLV = 2.2
_DB_FBALLV = 1.4


@flax.struct.dataclass
class DodgeballState:
    n_foes: jax.Array
    foe_live: jax.Array
    fx: jax.Array
    fy: jax.Array
    fvx: jax.Array
    fvy: jax.Array
    fball_live: jax.Array
    fbx: jax.Array
    fby: jax.Array
    fbvx: jax.Array
    fbvy: jax.Array
    px: jax.Array
    py: jax.Array
    last_dx: jax.Array
    last_dy: jax.Array
    ball_live: jax.Array
    bx: jax.Array
    by: jax.Array
    bvx: jax.Array
    bvy: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxDodgeballEnv(_ProcgenBase):
    """Functional dodgeball; vmap for a batch."""

    def _fresh(self, key) -> DodgeballState:
        ks = jax.random.split(key, 6)
        key = ks[0]
        n_foes = (3 if self.hard else 2) + jax.random.randint(ks[1], (), 0, 2)
        return DodgeballState(
            n_foes=n_foes, foe_live=jnp.arange(_DB_MAXF) < n_foes,
            fx=8.0 + jax.random.uniform(ks[2], (_DB_MAXF,)) * 48.0,
            fy=6.0 + jax.random.uniform(ks[3], (_DB_MAXF,)) * 26.0,
            fvx=(jax.random.uniform(ks[4], (_DB_MAXF,)) - 0.5) * 1.2,
            fvy=(jax.random.uniform(ks[5], (_DB_MAXF,)) - 0.5) * 1.2,
            fball_live=jnp.zeros(_DB_MAXF, bool),
            fbx=jnp.zeros(_DB_MAXF, jnp.float32),
            fby=jnp.zeros(_DB_MAXF, jnp.float32),
            fbvx=jnp.zeros(_DB_MAXF, jnp.float32),
            fbvy=jnp.zeros(_DB_MAXF, jnp.float32),
            px=jnp.float32(PG / 2.0), py=jnp.float32(54.0),
            last_dx=jnp.float32(0.0), last_dy=jnp.float32(-1.0),
            ball_live=jnp.bool_(False), bx=jnp.float32(0.0),
            by=jnp.float32(0.0), bvx=jnp.float32(0.0), bvy=jnp.float32(0.0),
            elapsed=jnp.int32(0), key=key,
        )

    def _render(self, s: DodgeballState) -> jax.Array:
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (40, 40, 46)], -1)
        border = (jnp.uint8(120), jnp.uint8(120), jnp.uint8(130))
        f = _rect(f, 0.0, 0.0, float(PG), 2.0, border)
        f = _rect(f, 0.0, 62.0, float(PG), 2.0, border)
        f = _rect(f, 0.0, 0.0, 2.0, float(PG), border)
        f = _rect(f, 62.0, 0.0, 2.0, float(PG), border)
        clear = ~s.foe_live.any()
        gate = _rect(f, PG / 2.0 - 5.0, 62.0, 10.0, 2.0,
                     (jnp.uint8(90), jnp.uint8(220), jnp.uint8(110)))
        f = jnp.where(clear, gate, f)
        for e in range(_DB_MAXF):
            foe = _rect(f, s.fx[e], s.fy[e], _DB_A, _DB_A,
                        (jnp.uint8(210), jnp.uint8(90), jnp.uint8(70)))
            f = jnp.where(s.foe_live[e], foe, f)
            fb = _rect(f, s.fbx[e] - 1.0, s.fby[e] - 1.0, 2.0, 2.0,
                       (jnp.uint8(230), jnp.uint8(160), jnp.uint8(120)))
            f = jnp.where(s.fball_live[e], fb, f)
        ball = _rect(f, s.bx - 1.0, s.by - 1.0, 2.0, 2.0,
                     (jnp.uint8(120), jnp.uint8(200), jnp.uint8(230)))
        f = jnp.where(s.ball_live, ball, f)
        f = _rect(f, s.px, s.py, _DB_A, _DB_A,
                  (jnp.uint8(90), jnp.uint8(140), jnp.uint8(220)))
        return f

    def step(self, s: DodgeballState, action: jax.Array):
        key, k_reset, k_throw = jax.random.split(s.key, 3)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a].astype(jnp.float32)
        sp = jnp.asarray(_PG_SPECIAL)[a]

        px = jnp.clip(s.px + _DB_MOVE * dx, 2.0, PG - 2.0 - _DB_A)
        py = jnp.clip(s.py + _DB_MOVE * dy, 2.0, PG - 4.0 - _DB_A)
        moved = (dx != 0) | (dy != 0)
        last_dx = jnp.where(moved, dx, s.last_dx)
        last_dy = jnp.where(moved, dy, s.last_dy)

        throws = (sp != 0) & ~s.ball_live
        n = jnp.abs(last_dx) + jnp.abs(last_dy)
        n = jnp.where(n > 0, n, 1.0)
        ball_live = s.ball_live | throws
        bx = jnp.where(throws, px + _DB_A / 2.0, s.bx)
        by = jnp.where(throws, py + _DB_A / 2.0, s.by)
        bvx = jnp.where(throws, last_dx / n * _DB_BALLV, s.bvx)
        bvy = jnp.where(throws, last_dy / n * _DB_BALLV, s.bvy)
        bx = jnp.where(ball_live, bx + bvx, bx)
        by = jnp.where(ball_live, by + bvy, by)
        ball_live = ball_live & (bx >= 0) & (bx < PG) & (by >= 0) & (by < PG)

        fx = s.fx + s.fvx
        fy = s.fy + s.fvy
        fvx = jnp.where((fx < 2.0) | (fx + _DB_A > PG - 2.0), -s.fvx, s.fvx)
        fvy = jnp.where((fy < 2.0) | (fy + _DB_A > 40.0), -s.fvy, s.fvy)
        lobs = s.foe_live & ~s.fball_live \
            & (jax.random.uniform(k_throw, (_DB_MAXF,)) < 0.012)
        fball_live = s.fball_live | lobs
        ddx = px - fx
        ddy = py - fy
        dn = jnp.sqrt(ddx * ddx + ddy * ddy) + 1e-3
        fbx = jnp.where(lobs, fx + _DB_A / 2.0, s.fbx)
        fby = jnp.where(lobs, fy + _DB_A / 2.0, s.fby)
        fbvx = jnp.where(lobs, ddx / dn * _DB_FBALLV, s.fbvx)
        fbvy = jnp.where(lobs, ddy / dn * _DB_FBALLV, s.fbvy)

        pegs = (
            ball_live & s.foe_live
            & (bx >= fx) & (bx < fx + _DB_A) & (by >= fy) & (by < fy + _DB_A)
        )
        peg = pegs & (jnp.cumsum(pegs.astype(jnp.int32)) == 1)
        ball_live = ball_live & ~peg.any()
        foe_live = s.foe_live & ~peg
        raw_reward = peg.any().astype(jnp.float32)

        tagged = (
            foe_live
            & (px + _DB_A > fx) & (px < fx + _DB_A)
            & (py + _DB_A > fy) & (py < fy + _DB_A)
        ).any()
        fbx = jnp.where(fball_live, fbx + fbvx, fbx)
        fby = jnp.where(fball_live, fby + fbvy, fby)
        fball_live = fball_live & (fbx >= 0) & (fbx < PG) & (fby >= 0) & (fby < PG)
        beaned = ~tagged & (
            fball_live
            & (px + _DB_A > fbx - 1.0) & (px < fbx + 1.0)
            & (py + _DB_A > fby - 1.0) & (py < fby + 1.0)
        ).any()

        exits = ~tagged & ~beaned & ~foe_live.any() \
            & (py + _DB_A >= PG - 5.0) \
            & (px + _DB_A / 2.0 >= PG / 2.0 - 5.0) \
            & (px + _DB_A / 2.0 < PG / 2.0 + 5.0)
        raw_reward = raw_reward + jnp.where(exits, 10.0, 0.0)
        terminated = tagged | beaned | exits

        ns = s.replace(foe_live=foe_live, fx=fx, fy=fy, fvx=fvx, fvy=fvy,
                       fball_live=fball_live, fbx=fbx, fby=fby, fbvx=fbvx,
                       fbvy=fbvy, px=px, py=py, last_dx=last_dx,
                       last_dy=last_dy, ball_live=ball_live, bx=bx, by=by,
                       bvx=bvx, bvy=bvy, elapsed=s.elapsed + 1, key=key)
        return self._finish(s, ns, raw_reward, terminated, key, k_reset)


# ---------------------------------------------------------------------------
# Bossfight (csrc/envs/bossfight.cc)
# ---------------------------------------------------------------------------

_BF_BW, _BF_BH = 10.0, 6.0
_BF_PW, _BF_PH = 5.0, 4.0
_BF_MOVE = 1.3
_BF_SHOT = 2.6
_BF_SHARDS = 8
_BF_SHARDV = 1.1
_BF_DOWN, _BF_UP = 140, 180
_BF_BARRAGE = 90


@flax.struct.dataclass
class BossfightState:
    round_: jax.Array
    boss_hp: jax.Array
    boss_x: jax.Array
    boss_vx: jax.Array
    shield: jax.Array
    phase_clock: jax.Array
    barrage_clock: jax.Array
    shard_live: jax.Array
    shard_x: jax.Array
    shard_y: jax.Array
    shard_vx: jax.Array
    shard_vy: jax.Array
    px: jax.Array
    py: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxBossfightEnv(_ProcgenBase):
    """Functional bossfight; vmap for a batch."""

    def _fresh(self, key) -> BossfightState:
        k1, k2, key = jax.random.split(key, 3)
        return BossfightState(
            round_=jnp.int32(0), boss_hp=jnp.int32(9 if self.hard else 6),
            boss_x=20.0 + jax.random.uniform(k1) * 14.0,
            boss_vx=0.5 + jax.random.uniform(k2) * 0.3,
            shield=jnp.bool_(True), phase_clock=jnp.int32(_BF_UP),
            barrage_clock=jnp.int32(0),
            shard_live=jnp.zeros(_BF_SHARDS, bool),
            shard_x=jnp.zeros(_BF_SHARDS, jnp.float32),
            shard_y=jnp.zeros(_BF_SHARDS, jnp.float32),
            shard_vx=jnp.zeros(_BF_SHARDS, jnp.float32),
            shard_vy=jnp.zeros(_BF_SHARDS, jnp.float32),
            px=jnp.float32(PG / 2.0 - _BF_PW / 2.0), py=jnp.float32(54.0),
            shot_live=jnp.bool_(False), shot_x=jnp.float32(0.0),
            shot_y=jnp.float32(0.0), elapsed=jnp.int32(0), key=key,
        )

    def _render(self, s: BossfightState) -> jax.Array:
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (18, 16, 30)], -1)
        glow = _rect(f, s.boss_x - 2.0, 8.0, _BF_BW + 4.0, _BF_BH + 4.0,
                     (jnp.uint8(90), jnp.uint8(110), jnp.uint8(200)))
        f = jnp.where(s.shield, glow, f)
        f = _rect(f, s.boss_x, 10.0, _BF_BW, _BF_BH,
                  (jnp.uint8(190), jnp.uint8(80), jnp.uint8(90)))
        for i in range(_BF_SHARDS):
            sh = _rect(f, s.shard_x[i] - 1.0, s.shard_y[i] - 1.0, 2.0, 2.0,
                       (jnp.uint8(240), jnp.uint8(170), jnp.uint8(90)))
            f = jnp.where(s.shard_live[i], sh, f)
        shot = _rect(f, s.shot_x - 1.0, s.shot_y - 2.0, 2.0, 3.0,
                     (jnp.uint8(150), jnp.uint8(230), jnp.uint8(240)))
        f = jnp.where(s.shot_live, shot, f)
        f = _rect(f, s.px, s.py, _BF_PW, _BF_PH,
                  (jnp.uint8(210), jnp.uint8(210), jnp.uint8(230)))
        for h in range(15):
            pip = _rect(f, 2.0 + h * 3.0, 2.0, 2.0, 2.0,
                        (jnp.uint8(230), jnp.uint8(120), jnp.uint8(120)))
            f = jnp.where(h < s.boss_hp, pip, f)
        return f

    def step(self, s: BossfightState, action: jax.Array):
        key, k_reset, k_ang = jax.random.split(s.key, 3)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a]
        sp = jnp.asarray(_PG_SPECIAL)[a]
        aggr = 1.0 + 0.2 * s.round_.astype(jnp.float32)

        px = jnp.clip(s.px + _BF_MOVE * dx, 2.0, PG - 2.0 - _BF_PW)
        py = jnp.clip(s.py + _BF_MOVE * dy.astype(jnp.float32) * 0.6,
                      44.0, PG - 4.0 - _BF_PH)

        boss_x = s.boss_x + s.boss_vx * aggr
        boss_vx = jnp.where((boss_x < 4.0) | (boss_x + _BF_BW > PG - 4.0),
                            -s.boss_vx, s.boss_vx)
        phase_clock = s.phase_clock - 1
        flips = phase_clock <= 0
        shield = jnp.where(flips, ~s.shield, s.shield)
        phase_clock = jnp.where(
            flips, jnp.where(shield, _BF_UP, _BF_DOWN), phase_clock
        )
        barrage_clock = s.barrage_clock + 1
        volleys = barrage_clock >= (_BF_BARRAGE / aggr).astype(jnp.int32)
        barrage_clock = jnp.where(volleys, 0, barrage_clock)
        slot = (~s.shard_live) & (jnp.cumsum((~s.shard_live).astype(jnp.int32)) == 1) \
            & volleys
        ang = jax.random.uniform(k_ang) * 6.2831853
        shard_live = s.shard_live | slot
        shard_x = jnp.where(slot, boss_x + _BF_BW / 2.0, s.shard_x)
        shard_y = jnp.where(slot, 10.0 + _BF_BH, s.shard_y)
        shard_vx = jnp.where(slot, jnp.cos(ang) * _BF_SHARDV, s.shard_vx)
        shard_vy = jnp.where(slot, jnp.abs(jnp.sin(ang)) * _BF_SHARDV + 0.3,
                             s.shard_vy)

        fires = ((sp != 0) | (dy < 0)) & ~s.shot_live
        shot_live = s.shot_live | fires
        shot_x = jnp.where(fires, px + _BF_PW / 2.0, s.shot_x)
        shot_y = jnp.where(fires, py, s.shot_y)
        shot_y = jnp.where(shot_live, shot_y - _BF_SHOT, shot_y)
        gone = shot_y < 0.0
        lands = shot_live & ~gone & (shot_x >= boss_x) & (shot_x < boss_x + _BF_BW) \
            & (shot_y >= 10.0) & (shot_y < 10.0 + _BF_BH)
        shot_live = shot_live & ~gone & ~lands
        scores = lands & ~shield
        raw_reward = scores.astype(jnp.float32)
        boss_hp = s.boss_hp - scores.astype(jnp.int32)
        kills = scores & (boss_hp <= 0)
        raw_reward = raw_reward + jnp.where(kills, 10.0, 0.0)
        round_ = s.round_ + kills.astype(jnp.int32)
        boss_hp = jnp.where(kills, (9 if self.hard else 6) + round_, boss_hp)
        shield = jnp.where(kills, True, shield)
        phase_clock = jnp.where(kills, _BF_UP, phase_clock)
        shard_live = jnp.where(kills, jnp.zeros_like(shard_live), shard_live)

        shard_x = jnp.where(shard_live, shard_x + shard_vx, shard_x)
        shard_y = jnp.where(shard_live, shard_y + shard_vy, shard_y)
        shard_live = shard_live & (shard_x >= 0) & (shard_x < PG) & (shard_y < PG)
        shredded = (
            shard_live
            & (px + _BF_PW > shard_x - 1.0) & (px < shard_x + 1.0)
            & (py + _BF_PH > shard_y - 1.0) & (py < shard_y + 1.0)
        ).any()
        terminated = shredded

        ns = s.replace(round_=round_, boss_hp=boss_hp, boss_x=boss_x,
                       boss_vx=boss_vx, shield=shield, phase_clock=phase_clock,
                       barrage_clock=barrage_clock, shard_live=shard_live,
                       shard_x=shard_x, shard_y=shard_y, shard_vx=shard_vx,
                       shard_vy=shard_vy, px=px, py=py, shot_live=shot_live,
                       shot_x=shot_x, shot_y=shot_y, elapsed=s.elapsed + 1,
                       key=key)
        return self._finish(s, ns, raw_reward, terminated, key, k_reset)
