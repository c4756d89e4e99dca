"""Pure-JAX twins of the fifth-wave procgen-family games.

Rules mirror the C++ clones (csrc/envs/starpilot.cc, fruitbot.cc) and the
procgen protocol (csrc/envs/procgen_like.h): 64x64x3 RGB uint8 observations,
the 15-action combo space, a fresh procedural level every episode, raw
rewards, 1000-step truncation, EnvPool auto-reset semantics.

Fruitbot's wall layout comes from a deterministic per-wall integer hash
(mirroring csrc wall_hash) keyed by a per-episode salt, so level geometry is
reproducible from the episode seed in both engines.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_procgen import PG, _PG_DX, _PG_DY, _rect

__all__ = ["JaxStarpilotEnv", "JaxFruitbotEnv"]


# ---------------------------------------------------------------------------
# Starpilot (csrc/envs/starpilot.cc)
# ---------------------------------------------------------------------------

_SP_FLYERS = 10
_SP_BOLTS = 8
_SP_SHOTS = 3
_SP_SHIP_W, _SP_SHIP_H = 4.0, 3.0
_SP_LEVEL_FRAMES = 1000


@flax.struct.dataclass
class StarpilotState:
    px: jax.Array
    py: jax.Array
    f_alive: jax.Array  # [10]
    f_x: jax.Array
    f_y: jax.Array
    f_vx: jax.Array
    f_vy: jax.Array
    b_alive: jax.Array  # [8]
    b_x: jax.Array
    b_y: jax.Array
    b_vy: jax.Array
    s_alive: jax.Array  # [3]
    s_x: jax.Array
    s_y: jax.Array
    frame: jax.Array
    spawn_prob: jax.Array
    speed_scale: jax.Array
    fire_prob: jax.Array
    bg: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxStarpilotEnv:
    """Functional starpilot; vmap for a batch."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Starpilot-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> StarpilotState:
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        zf = jnp.zeros(_SP_FLYERS, jnp.float32)
        zb = jnp.zeros(_SP_BOLTS, jnp.float32)
        zs = jnp.zeros(_SP_SHOTS, jnp.float32)
        return StarpilotState(
            px=jnp.float32(8.0), py=jnp.float32(32.0),
            f_alive=jnp.zeros(_SP_FLYERS, bool), f_x=zf, f_y=zf, f_vx=zf, f_vy=zf,
            b_alive=jnp.zeros(_SP_BOLTS, bool), b_x=zb, b_y=zb, b_vy=zb,
            s_alive=jnp.zeros(_SP_SHOTS, bool), s_x=zs, s_y=zs,
            frame=jnp.int32(0),
            spawn_prob=(0.08 if self.hard else 0.04) + 0.03 * jax.random.uniform(k1),
            speed_scale=(1.2 if self.hard else 0.8) + 0.4 * jax.random.uniform(k2),
            fire_prob=(0.010 if self.hard else 0.005) + 0.004 * jax.random.uniform(k3),
            bg=(10 + jax.random.randint(k4, (), 0, 30)).astype(jnp.float32),
            elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[StarpilotState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: StarpilotState) -> jax.Array:
        bg = s.bg.astype(jnp.uint8)
        f = jnp.stack(
            [jnp.broadcast_to(bg, (PG, PG)), jnp.broadcast_to(bg, (PG, PG)),
             jnp.broadcast_to((s.bg + 25).astype(jnp.uint8), (PG, PG))], axis=-1)
        for y in range(4, PG, 7):
            f = _rect(f, ((y * 13 + s.frame // 2) % PG).astype(jnp.float32), float(y),
                      1, 1, (jnp.uint8(200), jnp.uint8(200), jnp.uint8(220)))
        for i in range(_SP_FLYERS):
            fl = _rect(f, s.f_x[i], s.f_y[i], 4, 3, (jnp.uint8(220), jnp.uint8(60), jnp.uint8(60)))
            f = jnp.where(s.f_alive[i], fl, f)
        for b in range(_SP_BOLTS):
            bl = _rect(f, s.b_x[b], s.b_y[b], 2, 1, (jnp.uint8(255), jnp.uint8(180), jnp.uint8(40)))
            f = jnp.where(s.b_alive[b], bl, f)
        for sh in range(_SP_SHOTS):
            sl = _rect(f, s.s_x[sh], s.s_y[sh], 2, 1, (jnp.uint8(120), jnp.uint8(220), jnp.uint8(255)))
            f = jnp.where(s.s_alive[sh], sl, f)
        return _rect(f, s.px, s.py, _SP_SHIP_W, _SP_SHIP_H,
                     (jnp.uint8(80), jnp.uint8(200), jnp.uint8(120)))

    def step(self, s: StarpilotState, action: jax.Array):
        key, k_spawn, k_sy, k_svx, k_svy, k_fire, k_reset = jax.random.split(s.key, 7)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a].astype(jnp.float32)
        special = jnp.where(a >= 9, a - 8, 0)

        frame = s.frame + 1
        px = jnp.clip(s.px + 1.4 * dx, 2.0, 30.0)
        py = jnp.clip(s.py + 1.4 * dy, 2.0, PG - 2.0 - _SP_SHIP_H)

        # D button fires (first free shot slot).
        sfree = ~s.s_alive
        sslot = jnp.argmax(sfree)
        sspawn = (special == 1) & jnp.any(sfree)
        s_alive = s.s_alive.at[sslot].set(s.s_alive[sslot] | sspawn)
        s_x = s.s_x.at[sslot].set(jnp.where(sspawn, px + _SP_SHIP_W, s.s_x[sslot]))
        s_y = s.s_y.at[sslot].set(jnp.where(sspawn, py + _SP_SHIP_H / 2.0, s.s_y[sslot]))
        s_x = jnp.where(s_alive, s_x + 2.5, s_x)
        s_alive = s_alive & (s_x <= PG)

        # Flyer spawn (first dead slot).
        ffree = ~s.f_alive
        fslot = jnp.argmax(ffree)
        fspawn = (jax.random.uniform(k_spawn) < s.spawn_prob) & jnp.any(ffree)
        f_alive = s.f_alive.at[fslot].set(s.f_alive[fslot] | fspawn)
        f_x = s.f_x.at[fslot].set(jnp.where(fspawn, float(PG), s.f_x[fslot]))
        f_y = s.f_y.at[fslot].set(jnp.where(fspawn, 3.0 + jax.random.uniform(k_sy) * (PG - 9.0), s.f_y[fslot]))
        f_vx = s.f_vx.at[fslot].set(jnp.where(
            fspawn, -s.speed_scale * (0.6 + 0.6 * jax.random.uniform(k_svx)), s.f_vx[fslot]))
        f_vy = s.f_vy.at[fslot].set(jnp.where(
            fspawn, (jax.random.uniform(k_svy) - 0.5) * 0.6, s.f_vy[fslot]))

        # Flight + bolt fire.
        f_x = jnp.where(f_alive, f_x + f_vx, f_x)
        f_y = jnp.where(f_alive, f_y + f_vy, f_y)
        f_vy = jnp.where(f_alive & ((f_y < 2.0) | (f_y > PG - 5.0)), -f_vy, f_vy)
        f_alive = f_alive & (f_x >= -4.0)
        b_alive, b_x, b_y, b_vy = s.b_alive, s.b_x, s.b_y, s.b_vy
        for i in range(_SP_FLYERS):
            want = f_alive[i] & (jax.random.uniform(jax.random.fold_in(k_fire, i)) < s.fire_prob)
            bslot = jnp.argmax(~b_alive)
            want = want & jnp.any(~b_alive)
            b_x = b_x.at[bslot].set(jnp.where(want, f_x[i], b_x[bslot]))
            b_y = b_y.at[bslot].set(jnp.where(want, f_y[i] + 1.0, b_y[bslot]))
            b_vy = b_vy.at[bslot].set(jnp.where(want, jnp.where(f_y[i] + 1.0 < py, 0.4, -0.4), b_vy[bslot]))
            b_alive = b_alive.at[bslot].set(b_alive[bslot] | want)
        b_x = jnp.where(b_alive, b_x - 1.8, b_x)
        b_y = jnp.where(b_alive, b_y + b_vy, b_y)
        b_alive = b_alive & (b_x >= 0.0)

        # Shots vs flyers (each shot kills at most one flyer).
        raw_reward = jnp.float32(0.0)
        for si in range(_SP_SHOTS):
            hit = (s_alive[si] & f_alive & (s_x[si] + 2.0 > f_x) & (s_x[si] < f_x + 4.0)
                   & (s_y[si] + 1.0 > f_y) & (s_y[si] < f_y + 3.0))
            any_hit = jnp.any(hit)
            first = jnp.argmax(hit)
            f_alive = f_alive.at[first].set(f_alive[first] & ~any_hit)
            s_alive = s_alive.at[si].set(s_alive[si] & ~any_hit)
            raw_reward = raw_reward + any_hit.astype(jnp.float32)

        # Ship hits end the episode.
        flyer_hit = jnp.any(f_alive & (f_x + 4.0 > px) & (f_x < px + _SP_SHIP_W)
                            & (f_y + 3.0 > py) & (f_y < py + _SP_SHIP_H))
        bolt_hit = jnp.any(b_alive & (b_x + 2.0 > px) & (b_x < px + _SP_SHIP_W)
                           & (b_y + 1.0 > py) & (b_y < py + _SP_SHIP_H))
        terminated = flyer_hit | bolt_hit
        survived = (frame >= _SP_LEVEL_FRAMES) & ~terminated
        raw_reward = raw_reward + jnp.where(survived, 10.0, 0.0)
        terminated = terminated | survived

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(
            px=px, py=py, f_alive=f_alive, f_x=f_x, f_y=f_y, f_vx=f_vx, f_vy=f_vy,
            b_alive=b_alive, b_x=b_x, b_y=b_y, b_vy=b_vy,
            s_alive=s_alive, s_x=s_x, s_y=s_y, frame=frame, elapsed=elapsed, key=key,
        )
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        obs = self._render(ns)
        return ns, obs, raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Fruitbot (csrc/envs/fruitbot.cc)
# ---------------------------------------------------------------------------

_FB_BOT_W, _FB_BOT_H = 5.0, 4.0
_FB_BOT_Y = 54.0
_FB_SCROLL = 0.8
_FB_WALL_EVERY = 16
_FB_ITEMS = 12
_FB_ITEM_R = 2.0


def _fb_wall_hash(idx, salt, lane):
    h = idx.astype(jnp.uint32) * jnp.uint32(2654435761) \
        + salt * jnp.uint32(97) + jnp.uint32(lane) * jnp.uint32(40503)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


@flax.struct.dataclass
class FruitbotState:
    px: jax.Array
    dist: jax.Array
    salt: jax.Array      # u32 per-episode geometry seed
    length: jax.Array
    gap_w: jax.Array
    i_alive: jax.Array   # [12]
    i_fruit: jax.Array
    i_x: jax.Array
    i_row: jax.Array
    spawn_row: jax.Array
    bg: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxFruitbotEnv:
    """Functional fruitbot; vmap for a batch."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Fruitbot-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> FruitbotState:
        k_salt, k_bg, key = jax.random.split(key, 3)
        z = jnp.zeros(_FB_ITEMS, jnp.float32)
        return FruitbotState(
            px=jnp.float32(32.0), dist=jnp.float32(0.0),
            salt=jax.random.randint(k_salt, (), 0, jnp.iinfo(jnp.int32).max).astype(jnp.uint32),
            length=jnp.float32(480.0 if self.hard else 320.0),
            gap_w=jnp.float32(12.0 if self.hard else 18.0),
            i_alive=jnp.zeros(_FB_ITEMS, bool), i_fruit=jnp.zeros(_FB_ITEMS, bool),
            i_x=z, i_row=z, spawn_row=jnp.float32(8.0),
            bg=(25 + jax.random.randint(k_bg, (), 0, 35)).astype(jnp.float32),
            elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[FruitbotState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _gap_center(self, idx, salt):
        return 8.0 + _fb_wall_hash(idx, salt, 0) * (PG - 16.0)

    def _render(self, s: FruitbotState) -> jax.Array:
        bg = s.bg.astype(jnp.uint8)
        f = jnp.stack(
            [jnp.broadcast_to(bg, (PG, PG)),
             jnp.broadcast_to((s.bg + 20).astype(jnp.uint8), (PG, PG)),
             jnp.broadcast_to(bg, (PG, PG))], axis=-1)
        first = (s.dist / _FB_WALL_EVERY).astype(jnp.int32)
        for k in range(7):
            idx = first + k
            row = idx.astype(jnp.float32) * _FB_WALL_EVERY + 8.0
            sy = _FB_BOT_Y - (row - s.dist)
            show = (sy >= -3.0) & (sy <= PG + 1.0)
            gap = self._gap_center(idx, s.salt)
            w = _rect(f, 0.0, sy, gap - s.gap_w / 2.0, 3,
                      (jnp.uint8(140), jnp.uint8(90), jnp.uint8(50)))
            w = _rect(w, gap + s.gap_w / 2.0, sy, PG - gap - s.gap_w / 2.0, 3,
                      (jnp.uint8(140), jnp.uint8(90), jnp.uint8(50)))
            f = jnp.where(show, w, f)
        for i in range(_FB_ITEMS):
            sy = _FB_BOT_Y - (s.i_row[i] - s.dist)
            show = s.i_alive[i] & (sy >= -4.0) & (sy <= PG)
            fruit = _rect(f, s.i_x[i], sy, 2 * _FB_ITEM_R, 2 * _FB_ITEM_R,
                          (jnp.uint8(230), jnp.uint8(60), jnp.uint8(60)))
            junk = _rect(f, s.i_x[i], sy, 2 * _FB_ITEM_R, 2 * _FB_ITEM_R,
                         (jnp.uint8(120), jnp.uint8(120), jnp.uint8(120)))
            f = jnp.where(show, jnp.where(s.i_fruit[i], fruit, junk), f)
        f = _rect(f, 0.0, 0.0, s.dist / s.length * PG, 2,
                  (jnp.uint8(240), jnp.uint8(240), jnp.uint8(120)))
        return _rect(f, s.px, _FB_BOT_Y, _FB_BOT_W, _FB_BOT_H,
                     (jnp.uint8(90), jnp.uint8(160), jnp.uint8(230)))

    def step(self, s: FruitbotState, action: jax.Array):
        key, k_place, k_fruit, k_x, k_reset = jax.random.split(s.key, 5)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)

        px = jnp.clip(s.px + 1.5 * dx, 1.0, PG - 1.0 - _FB_BOT_W)
        dist = s.dist + _FB_SCROLL

        # Rolling item spawn schedule (one spawn opportunity per crossing).
        need = dist + 70.0 > s.spawn_row
        spawn_row = jnp.where(need, s.spawn_row + 10.0, s.spawn_row)
        place = need & (jax.random.uniform(k_place) < 0.55) & jnp.any(~s.i_alive)
        slot = jnp.argmax(~s.i_alive)
        i_alive = s.i_alive.at[slot].set(s.i_alive[slot] | place)
        i_fruit = s.i_fruit.at[slot].set(jnp.where(place, jax.random.uniform(k_fruit) < 0.5, s.i_fruit[slot]))
        i_x = s.i_x.at[slot].set(jnp.where(place, 3.0 + jax.random.uniform(k_x) * (PG - 8.0), s.i_x[slot]))
        i_row = s.i_row.at[slot].set(jnp.where(place, spawn_row, s.i_row[slot]))

        # Item collisions at the robot's row.
        sy = _FB_BOT_Y - (i_row - dist)
        passed = i_alive & (sy > PG + 4.0)
        i_alive = i_alive & ~passed
        touch = (i_alive & (sy + 2.0 * _FB_ITEM_R > _FB_BOT_Y) & (sy < _FB_BOT_Y + _FB_BOT_H)
                 & (i_x + 2.0 * _FB_ITEM_R > px) & (i_x < px + _FB_BOT_W))
        raw_reward = jnp.sum(jnp.where(touch, jnp.where(i_fruit, 1.0, -4.0), 0.0))
        i_alive = i_alive & ~touch

        # Wall collision at the robot's row.
        first = (dist / _FB_WALL_EVERY).astype(jnp.int32)
        crashed = jnp.bool_(False)
        for k in range(7):
            idx = first + k
            row = idx.astype(jnp.float32) * _FB_WALL_EVERY + 8.0
            wy = _FB_BOT_Y - (row - dist)
            overlaps = (wy + 3.0 > _FB_BOT_Y) & (wy < _FB_BOT_Y + _FB_BOT_H)
            gap = self._gap_center(idx, s.salt)
            cx = px + _FB_BOT_W / 2.0
            in_gap = (cx >= gap - s.gap_w / 2.0) & (cx <= gap + s.gap_w / 2.0)
            crashed = crashed | (overlaps & ~in_gap)
        terminated = crashed
        completed = (dist >= s.length) & ~terminated
        raw_reward = raw_reward + jnp.where(completed, 10.0, 0.0)
        terminated = terminated | completed

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(px=px, dist=dist, i_alive=i_alive, i_fruit=i_fruit,
                       i_x=i_x, i_row=i_row, spawn_row=spawn_row,
                       elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        obs = self._render(ns)
        return ns, obs, raw_reward, raw_reward, terminated, truncated, done
