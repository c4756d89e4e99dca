"""Pure-JAX procgen-family envs, second wave (Leaper, Chaser).

Rules mirror the C++ clones (csrc/envs/leaper.cc, chaser.cc) under the
procgen protocol (procgen_like.h): 64x64x3 RGB uint8, 15-action combo space,
fresh procedural level per episode, raw rewards, 1000-step truncation,
EnvPool auto-reset. Levels are drawn from the same distributions as the C++
engine (RNG streams differ, so trajectories are distributional twins, like
JaxBigfishEnv/JaxMazeEnv).
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_procgen import PG, _PG_DX, _PG_DY, _X, _Y, _maze_carve, _rect

__all__ = ["JaxLeaperEnv", "JaxChaserEnv"]


# ---------------------------------------------------------------------------
# Leaper (csrc/envs/leaper.cc)
# ---------------------------------------------------------------------------

_LP_MAX_LANES = 4
_LP_CARS = 2
_LP_LOGS = 2
_LP_LANE_H = 5.0
_LP_FROG = 4.0
_LP_CAR_W, _LP_CAR_H = 7.0, 3.0
_LP_LOG_W, _LP_LOG_H = 12.0, 4.0


@flax.struct.dataclass
class LeaperState:
    n_road: jax.Array
    n_river: jax.Array
    rows: jax.Array
    y0: jax.Array
    road_speed: jax.Array  # [4]
    log_speed: jax.Array   # [4]
    car_x: jax.Array       # [4, 2]
    log_x: jax.Array       # [4, 2]
    frog_row: jax.Array
    frog_x: jax.Array
    elapsed: jax.Array
    key: jax.Array


def _lp_wrap(x, w):
    x = jnp.where(x < -w, x + PG + w, x)
    return jnp.where(x > PG, x - (PG + w), x)


class JaxLeaperEnv:
    """Functional leaper; vmap for a batch. hard=True adds lanes."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Leaper-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> LeaperState:
        k_nr, k_nv, k_rs, k_cx, k_ls, k_lx, key = jax.random.split(key, 7)
        base = 3 if self.hard else 2
        n_road = base + jax.random.randint(k_nr, (), 0, 2)
        n_river = base + jax.random.randint(k_nv, (), 0, 2)
        rows = n_river + n_road + 3
        y0 = (PG - rows.astype(jnp.float32) * _LP_LANE_H) / 2.0
        alt = jnp.where(jnp.arange(_LP_MAX_LANES) % 2 == 1, 1.0, -1.0)
        road_speed = (0.5 + 0.7 * jax.random.uniform(k_rs, (_LP_MAX_LANES,))) * alt
        log_speed = (0.3 + 0.5 * jax.random.uniform(k_ls, (_LP_MAX_LANES,))) * alt
        phase = jnp.arange(_LP_CARS, dtype=jnp.float32) * PG * 0.5
        car_x = jax.random.uniform(k_cx, (_LP_MAX_LANES, _LP_CARS)) * PG * 0.5 + phase
        log_x = jax.random.uniform(k_lx, (_LP_MAX_LANES, _LP_LOGS)) * PG * 0.5 + phase
        return LeaperState(
            n_road=n_road, n_river=n_river, rows=rows, y0=y0,
            road_speed=road_speed, log_speed=log_speed, car_x=car_x, log_x=log_x,
            frog_row=rows - 1, frog_x=jnp.float32(PG / 2.0 - _LP_FROG / 2.0),
            elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[LeaperState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: LeaperState) -> jax.Array:
        y, x = jnp.asarray(_Y), jnp.asarray(_X)
        # Per-pixel row classification (leaper.cc render strips).
        row = jnp.floor((y.astype(jnp.float32) - s.y0) / _LP_LANE_H).astype(jnp.int32)
        in_band = (row >= 0) & (row < s.rows)
        is_finish = in_band & (row == 0)
        is_river = in_band & (row >= 1) & (row <= s.n_river)
        is_safe = in_band & ((row == s.n_river + 1) | (row == s.rows - 1))
        is_road = in_band & (row >= s.n_river + 2) & (row < s.rows - 1)
        f = jnp.broadcast_to(jnp.array([28, 30, 34], jnp.uint8), (PG, PG, 3))
        paint = lambda f, m, rgb: jnp.where(
            m[:, :, None] & jnp.ones((PG, PG, 1), bool),
            jnp.array(rgb, jnp.uint8)[None, None, :], f,
        )
        f = paint(f, jnp.broadcast_to(is_finish, (PG, PG)), (60, 160, 70))
        f = paint(f, jnp.broadcast_to(is_river, (PG, PG)), (40, 70, 170))
        f = paint(f, jnp.broadcast_to(is_safe, (PG, PG)), (110, 110, 100))
        f = paint(f, jnp.broadcast_to(is_road, (PG, PG)), (55, 55, 60))
        # Logs, cars, frog (draw order = overwrite order).
        for l in range(_LP_MAX_LANES):
            for c in range(_LP_LOGS):
                body = _rect(f, s.log_x[l, c], s.y0 + (1 + l) * _LP_LANE_H + 0.5,
                             _LP_LOG_W, _LP_LOG_H,
                             (jnp.uint8(140), jnp.uint8(95), jnp.uint8(50)))
                f = jnp.where(l < s.n_river, body, f)
        for l in range(_LP_MAX_LANES):
            for c in range(_LP_CARS):
                body = _rect(f, s.car_x[l, c],
                             s.y0 + (2 + s.n_river + l).astype(jnp.float32) * _LP_LANE_H + 1.0,
                             _LP_CAR_W, _LP_CAR_H,
                             (jnp.uint8(210), jnp.uint8(210), jnp.uint8(220)))
                f = jnp.where(l < s.n_road, body, f)
        f = _rect(f, s.frog_x, s.y0 + s.frog_row.astype(jnp.float32) * _LP_LANE_H + 0.5,
                  _LP_FROG, _LP_FROG, (jnp.uint8(90), jnp.uint8(220), jnp.uint8(60)))
        return f

    def step(self, s: LeaperState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a]
        dy = jnp.asarray(_PG_DY)[a]

        frog_x = jnp.clip(s.frog_x + 2.5 * dx.astype(jnp.float32), 0.0, PG - _LP_FROG)
        frog_row = jnp.clip(s.frog_row + jnp.sign(dy), 0, s.rows - 1)

        car_x = _lp_wrap(s.car_x + s.road_speed[:, None], _LP_CAR_W)
        log_x = _lp_wrap(s.log_x + s.log_speed[:, None], _LP_LOG_W)

        # Row semantics (leaper.cc:63-95).
        finished = frog_row == 0
        in_river = (frog_row >= 1) & (frog_row <= s.n_river)
        river_l = jnp.clip(frog_row - 1, 0, _LP_MAX_LANES - 1)
        frog_c = frog_x + _LP_FROG / 2.0
        on_log = jnp.any(
            (frog_c >= log_x[river_l]) & (frog_c <= log_x[river_l] + _LP_LOG_W)
        )
        drift = in_river & on_log
        frog_x = jnp.where(drift, frog_x + s.log_speed[river_l], frog_x)
        drowned = in_river & ~on_log
        carried_off = drift & (
            (frog_x < -_LP_FROG / 2.0) | (frog_x > PG - _LP_FROG / 2.0)
        )
        in_road = (frog_row >= s.n_river + 2) & (frog_row < s.rows - 1)
        road_l = jnp.clip(frog_row - s.n_river - 2, 0, _LP_MAX_LANES - 1)
        run_over = in_road & jnp.any(
            (frog_x + _LP_FROG > car_x[road_l]) & (frog_x < car_x[road_l] + _LP_CAR_W)
        )

        raw_reward = jnp.where(finished, 10.0, 0.0)
        terminated = finished | drowned | carried_off | run_over
        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated

        ns = s.replace(car_x=car_x, log_x=log_x, frog_row=frog_row, frog_x=frog_x,
                       elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Chaser (csrc/envs/chaser.cc)
# ---------------------------------------------------------------------------

_CH_MAX_DIM = 13
_CH_MAX_E = 3
_MZ_MAX = 25  # _maze_carve's fixed grid


@flax.struct.dataclass
class ChaserState:
    walls: jax.Array   # [25, 25] bool (carve grid; cells >= dim stay walls)
    dots: jax.Array    # [25, 25] bool
    dim: jax.Array
    px: jax.Array
    py: jax.Array
    n_enemies: jax.Array
    ex: jax.Array      # [3]
    ey: jax.Array      # [3]
    n_dots: jax.Array
    dots0: jax.Array   # initial dot count — per-dot reward is 3/dots0
    tick: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxChaserEnv:
    """Functional chaser; vmap for a batch. hard=True: bigger + 3 pursuers."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Chaser-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> ChaserState:
        k_dim, k_carve, k_extra, key = jax.random.split(key, 4)
        half = (5 if self.hard else 4) + jax.random.randint(k_dim, (), 0, 2)
        dim = 2 * half + 1
        walls = _maze_carve(k_carve, dim)
        # Extra knockouts: `dim` tries; only walls joining two open cells
        # (chaser.cc:146-158). Fixed 13 tries gated by t < dim.
        ks = jax.random.split(k_extra, 2 * _CH_MAX_DIM)
        for t in range(_CH_MAX_DIM):
            wx = 1 + jax.random.randint(ks[2 * t], (), 0, dim - 2)
            wy = 1 + jax.random.randint(ks[2 * t + 1], (), 0, dim - 2)
            horiz = ~walls[wy, wx - 1] & ~walls[wy, wx + 1]
            vert = ~walls[wy - 1, wx] & ~walls[wy + 1, wx]
            knock = (t < dim) & walls[wy, wx] & (horiz | vert)
            walls = walls.at[wy, wx].set(jnp.where(knock, False, walls[wy, wx]))
        px = jnp.int32(1)
        py = dim - 2
        gy, gx = jnp.mgrid[0:_MZ_MAX, 0:_MZ_MAX]
        inside = (gx < dim) & (gy < dim)
        dots = inside & ~walls & ~((gx == px) & (gy == py))
        n_enemies = jnp.int32(_CH_MAX_E if self.hard else 1)
        ex = jnp.stack([dim - 2, jnp.int32(1), dim - 2])
        ey = jnp.stack([jnp.int32(1), jnp.int32(1), dim - 2])
        return ChaserState(
            walls=walls, dots=dots, dim=dim, px=px, py=py,
            n_enemies=n_enemies, ex=ex, ey=ey,
            n_dots=jnp.sum(dots).astype(jnp.int32),
            dots0=jnp.sum(dots).astype(jnp.int32),
            tick=jnp.int32(0), elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[ChaserState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: ChaserState) -> jax.Array:
        y, x = jnp.asarray(_Y), jnp.asarray(_X)
        cell = jnp.float32(PG) / s.dim.astype(jnp.float32)
        f = jnp.broadcast_to(jnp.array([22, 22, 26], jnp.uint8), (PG, PG, 3))
        gx = (x.astype(jnp.float32) / cell).astype(jnp.int32)
        gy = (y.astype(jnp.float32) / cell).astype(jnp.int32)
        gxc = jnp.clip(gx, 0, _MZ_MAX - 1)
        gyc = jnp.clip(gy, 0, _MZ_MAX - 1)
        open_px = (gx < s.dim) & (gy < s.dim) & ~s.walls[gyc, gxc]
        f = jnp.where(jnp.broadcast_to(open_px, (PG, PG))[:, :, None],
                      jnp.array([95, 95, 105], jnp.uint8)[None, None, :], f)
        # Dots: pixel within the central 0.3-cell square of a dotted cell.
        fx = x.astype(jnp.float32) - gx.astype(jnp.float32) * cell
        fy = y.astype(jnp.float32) - gy.astype(jnp.float32) * cell
        in_dot = (
            (fx >= cell * 0.35) & (fx < cell * 0.65)
            & (fy >= cell * 0.35) & (fy < cell * 0.65)
        )
        dot_px = open_px & s.dots[gyc, gxc] & jnp.broadcast_to(in_dot, (PG, PG))
        f = jnp.where(dot_px[:, :, None],
                      jnp.array([240, 220, 80], jnp.uint8)[None, None, :], f)
        for i in range(_CH_MAX_E):
            body = _rect(f, s.ex[i] * cell + cell * 0.15, s.ey[i] * cell + cell * 0.15,
                         cell * 0.7, cell * 0.7,
                         (jnp.uint8(220), jnp.uint8(60), jnp.uint8(60)))
            f = jnp.where(i < s.n_enemies, body, f)
        f = _rect(f, s.px * cell + cell * 0.15, s.py * cell + cell * 0.15,
                  cell * 0.7, cell * 0.7, (jnp.uint8(80), jnp.uint8(210), jnp.uint8(90)))
        return f

    def step(self, s: ChaserState, action: jax.Array):
        key, k_reset, *eks = jax.random.split(s.key, 2 + 2 * _CH_MAX_E)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a]
        dy = jnp.asarray(_PG_DY)[a]

        def open_at(x, y):
            inside = (x >= 0) & (x < s.dim) & (y >= 0) & (y < s.dim)
            return inside & ~s.walls[jnp.clip(y, 0, _MZ_MAX - 1), jnp.clip(x, 0, _MZ_MAX - 1)]

        nx = s.px + dx
        ny = s.py + dy
        diag = (dx != 0) & (dy != 0)
        h_open = open_at(s.px + dx, s.py)
        ny = jnp.where(diag & h_open, s.py, ny)
        nx = jnp.where(diag & ~h_open, s.px, nx)
        can = open_at(nx, ny)
        px = jnp.where(can, nx, s.px)
        py = jnp.where(can, ny, s.py)

        ate = s.dots[py, px]
        dots = s.dots.at[py, px].set(False)
        n_dots = s.n_dots - ate.astype(jnp.int32)
        # Official chaser economy (chaser.cc round-5 calibration): the dots
        # collectively pay +3, the clear bonus +10 — perfect episode = 13.
        raw_reward = ate.astype(jnp.float32) * (3.0 / s.dots0.astype(jnp.float32))
        swept = ate & (n_dots == 0)
        raw_reward = raw_reward + jnp.where(swept, 10.0, 0.0)

        # Enemies move every other step: greedy (p=0.7) else random open dir.
        tick = s.tick + 1
        move_turn = ~swept & (tick % 2 == 0)
        dirs = jnp.array([[1, 0], [-1, 0], [0, 1], [0, -1]], jnp.int32)
        ex, ey = s.ex, s.ey
        for i in range(_CH_MAX_E):
            tx = ex[i] + dirs[:, 0]
            ty = ey[i] + dirs[:, 1]
            ok = open_at(tx, ty)
            dist = jnp.abs(tx - px) + jnp.abs(ty - py)
            best = jnp.argmin(jnp.where(ok, dist, 1 << 20))
            n_open = jnp.sum(ok).astype(jnp.int32)
            pick = jax.random.randint(eks[2 * i], (), 0, jnp.maximum(n_open, 1))
            rand_k = jnp.argmax(jnp.cumsum(ok.astype(jnp.int32)) > pick)
            greedy = jax.random.uniform(eks[2 * i + 1]) < 0.7
            k = jnp.where(greedy, best, rand_k)
            do = move_turn & (i < s.n_enemies) & (n_open > 0)
            ex = ex.at[i].set(jnp.where(do, tx[k], ex[i]))
            ey = ey.at[i].set(jnp.where(do, ty[k], ey[i]))

        caught = ~swept & jnp.any(
            (jnp.arange(_CH_MAX_E) < s.n_enemies) & (ex == px) & (ey == py)
        )
        terminated = swept | caught
        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated

        ns = s.replace(dots=dots, n_dots=n_dots, px=px, py=py, ex=ex, ey=ey,
                       tick=tick, elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done
