"""Pure-JAX procgen-family envs, wave 9: Coinrun, Miner, Heist, Jumper.

Rules mirror the C++ clones (csrc/envs/coinrun.cc, miner.cc, heist.cc,
jumper.cc) and the procgen protocol (csrc/envs/procgen_like.h): 64x64x3 RGB
uint8 observations, the 15-action combo space, a fresh procedural level
every episode, raw rewards, 1000-step truncation, EnvPool auto-reset
semantics — the contract of the reference's plain `envpool.make` procgen
path (legacy_scripts/cleanba_ppo_envpool_procgen.py:115-130). The engines
draw independent RNG streams, so levels differ but rules and scoring match.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_procgen import PG, _PG_DX, _PG_DY, _rect, _maze_carve

__all__ = ["JaxCoinrunEnv", "JaxMinerEnv", "JaxHeistEnv", "JaxJumperEnv"]


# ---------------------------------------------------------------------------
# Coinrun (csrc/envs/coinrun.cc)
# ---------------------------------------------------------------------------

_CR_MAX_PLAT = 5
_CR_MAX_SAWS = 3
_CR_GROUND = 56.0
_CR_P = 4.0
_CR_RUN = 1.2
_CR_JUMP = -2.4
_CR_G = 0.18
_CR_SAW_R = 2.5


@flax.struct.dataclass
class CoinrunState:
    n_plat: jax.Array
    plat_x: jax.Array
    plat_y: jax.Array
    plat_w: jax.Array
    n_saws: jax.Array
    saw_x: jax.Array
    saw_lo: jax.Array
    saw_hi: jax.Array
    saw_v: jax.Array
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    grounded: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxCoinrunEnv:
    """Functional coinrun; vmap for a batch."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Coinrun-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> CoinrunState:
        ks = jax.random.split(key, 8)
        key = ks[0]
        n_plat = (3 if self.hard else 2) + jax.random.randint(ks[1], (), 0, 2)
        idx = jnp.arange(_CR_MAX_PLAT, dtype=jnp.float32)
        plat_w = 10.0 + jax.random.randint(ks[2], (_CR_MAX_PLAT,), 0, 7).astype(jnp.float32)
        plat_x = 8.0 + idx * (48.0 / n_plat.astype(jnp.float32)) \
            + jax.random.randint(ks[3], (_CR_MAX_PLAT,), 0, 5).astype(jnp.float32)
        plat_y = 30.0 + jax.random.randint(ks[4], (_CR_MAX_PLAT,), 0, 18).astype(jnp.float32)
        n_saws = 1 + jax.random.randint(ks[5], (), 0, 2) + (1 if self.hard else 0)
        saw_lo = 14.0 + jax.random.randint(ks[6], (_CR_MAX_SAWS,), 0, 20).astype(jnp.float32)
        saw_hi = saw_lo + 10.0 + jax.random.randint(ks[7], (_CR_MAX_SAWS,), 0, 10).astype(jnp.float32)
        saw_v = 0.4 + 0.4 * jax.random.uniform(ks[1], (_CR_MAX_SAWS,))
        return CoinrunState(
            n_plat=n_plat, plat_x=plat_x, plat_y=plat_y, plat_w=plat_w,
            n_saws=n_saws, saw_x=saw_lo, saw_lo=saw_lo, saw_hi=saw_hi,
            saw_v=saw_v, px=jnp.float32(3.0),
            py=jnp.float32(_CR_GROUND - _CR_P), vy=jnp.float32(0.0),
            grounded=jnp.bool_(True), elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[CoinrunState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: CoinrunState) -> jax.Array:
        f = jnp.stack(
            [jnp.full((PG, PG), 140, jnp.uint8),
             jnp.full((PG, PG), 180, jnp.uint8),
             jnp.full((PG, PG), 230, jnp.uint8)], axis=-1,
        )
        f = _rect(f, 0.0, _CR_GROUND, float(PG), 8.0,
                  (jnp.uint8(90), jnp.uint8(70), jnp.uint8(40)))
        for i in range(_CR_MAX_PLAT):
            body = _rect(f, s.plat_x[i], s.plat_y[i], s.plat_w[i], 3.0,
                         (jnp.uint8(110), jnp.uint8(90), jnp.uint8(50)))
            f = jnp.where(i < s.n_plat, body, f)
        for i in range(_CR_MAX_SAWS):
            body = _rect(f, s.saw_x[i] - _CR_SAW_R, _CR_GROUND - 2 * _CR_SAW_R,
                         2 * _CR_SAW_R, 2 * _CR_SAW_R,
                         (jnp.uint8(200), jnp.uint8(200), jnp.uint8(210)))
            f = jnp.where(i < s.n_saws, body, f)
        f = _rect(f, 57.0, _CR_GROUND - 4.0, 4.0, 4.0,
                  (jnp.uint8(240), jnp.uint8(210), jnp.uint8(50)))
        f = _rect(f, s.px, s.py, _CR_P, _CR_P,
                  (jnp.uint8(220), jnp.uint8(60), jnp.uint8(60)))
        return f

    def step(self, s: CoinrunState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a]

        px = jnp.clip(s.px + _CR_RUN * dx, 0.0, PG - _CR_P)
        jumps = (dy < 0) & s.grounded
        vy = jnp.where(jumps, _CR_JUMP, s.vy)
        prev_bottom = s.py + _CR_P
        vy = vy + _CR_G
        py = s.py + vy
        on_ground = (vy >= 0.0) & (py + _CR_P >= _CR_GROUND)
        py = jnp.where(on_ground, _CR_GROUND - _CR_P, py)
        idx = jnp.arange(_CR_MAX_PLAT)
        over = (px + _CR_P > s.plat_x) & (px < s.plat_x + s.plat_w) & (idx < s.n_plat)
        lands = ~on_ground & (vy >= 0.0) & over & (prev_bottom <= s.plat_y) \
            & (py + _CR_P >= s.plat_y)
        land_any = lands.any()
        land_y = jnp.where(lands, s.plat_y, jnp.inf).min()
        py = jnp.where(land_any, land_y - _CR_P, py)
        grounded = on_ground | land_any
        vy = jnp.where(grounded, 0.0, vy)

        saw_x = s.saw_x + s.saw_v
        saw_v = jnp.where((saw_x < s.saw_lo) | (saw_x > s.saw_hi), -s.saw_v, s.saw_v)
        sy = _CR_GROUND - _CR_SAW_R
        sidx = jnp.arange(_CR_MAX_SAWS)
        sawed = (
            (sidx < s.n_saws)
            & (px + _CR_P > saw_x - _CR_SAW_R) & (px < saw_x + _CR_SAW_R)
            & (py + _CR_P > sy - _CR_SAW_R) & (py < sy + _CR_SAW_R)
        ).any()
        coined = ~sawed & (px + _CR_P > 57.0) & (px < 61.0) \
            & (py + _CR_P > _CR_GROUND - 4.0) & (py < _CR_GROUND)
        raw_reward = jnp.where(coined, 10.0, 0.0)
        terminated = sawed | coined

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(px=px, py=py, vy=vy, grounded=grounded, saw_x=saw_x,
                       saw_v=saw_v, elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Miner (csrc/envs/miner.cc)
# ---------------------------------------------------------------------------

_MN_GRID = 16
_MN_EMPTY, _MN_DIRT, _MN_BOULDER, _MN_DIAMOND = 0, 1, 2, 3
_MN_MOVE = 3


@flax.struct.dataclass
class MinerState:
    grid: jax.Array      # [16, 16] i32
    px: jax.Array
    py: jax.Array
    diamonds: jax.Array
    diamonds0: jax.Array  # initial count — per-diamond reward is 3/diamonds0
    move_cd: jax.Array
    fall_cd: jax.Array
    crush: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxMinerEnv:
    """Functional miner; vmap for a batch."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Miner-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> MinerState:
        k_grid, key = jax.random.split(key)
        roll = jax.random.randint(k_grid, (_MN_GRID, _MN_GRID), 0, 100)
        b_cut = 18 if self.hard else 10
        d_cut = 26 if self.hard else 18
        grid = jnp.where(
            roll < b_cut, _MN_BOULDER,
            jnp.where(roll < d_cut, _MN_DIAMOND,
                      jnp.where(roll < 40, _MN_EMPTY, _MN_DIRT)),
        ).astype(jnp.int32)
        grid = grid.at[1, 1].set(_MN_EMPTY)
        grid = grid.at[0, 1].set(
            jnp.where(grid[0, 1] == _MN_BOULDER, _MN_DIRT, grid[0, 1])
        )
        grid = grid.at[_MN_GRID - 2, _MN_GRID - 2].set(_MN_EMPTY)
        diamonds = (grid == _MN_DIAMOND).sum().astype(jnp.int32)
        return MinerState(
            grid=grid, px=jnp.int32(1), py=jnp.int32(1), diamonds=diamonds,
            diamonds0=jnp.maximum(diamonds, 1),
            move_cd=jnp.int32(0), fall_cd=jnp.int32(0), crush=jnp.int32(0),
            elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[MinerState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: MinerState) -> jax.Array:
        y = np.arange(PG, dtype=np.int32)[:, None]
        x = np.arange(PG, dtype=np.int32)[None, :]
        gy = jnp.asarray(y) // 4
        gx = jnp.asarray(x) // 4
        cell = s.grid[jnp.clip(gy, 0, _MN_GRID - 1), jnp.clip(gx, 0, _MN_GRID - 1)]
        base = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (20, 16, 12)], -1)
        dirt = jnp.asarray(np.array([120, 85, 50], np.uint8))
        rock = jnp.asarray(np.array([150, 150, 155], np.uint8))
        diam = jnp.asarray(np.array([80, 220, 230], np.uint8))
        f = jnp.where((cell == _MN_DIRT)[:, :, None], dirt[None, None, :], base)
        f = jnp.where((cell == _MN_BOULDER)[:, :, None], rock[None, None, :], f)
        inner = (jnp.asarray(y) % 4 >= 1) & (jnp.asarray(y) % 4 < 3) \
            & (jnp.asarray(x) % 4 >= 1) & (jnp.asarray(x) % 4 < 3)
        f = jnp.where(((cell == _MN_DIAMOND) & inner)[:, :, None],
                      diam[None, None, :], f)
        exit_open = s.diamonds == 0
        f = jnp.where(
            exit_open,
            _rect(f, (_MN_GRID - 2) * 4.0, (_MN_GRID - 2) * 4.0, 4.0, 4.0,
                  (jnp.uint8(90), jnp.uint8(200), jnp.uint8(90))),
            f,
        )
        f = _rect(f, s.px.astype(jnp.float32) * 4.0, s.py.astype(jnp.float32) * 4.0,
                  4.0, 4.0, (jnp.uint8(230), jnp.uint8(180), jnp.uint8(60)))
        return f

    def step(self, s: MinerState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a]
        dy = jnp.asarray(_PG_DY)[a]

        move_cd = jnp.maximum(s.move_cd - 1, 0)
        wants = (move_cd == 0) & ((dx != 0) | (dy != 0))
        ndy = jnp.where((dx != 0) & (dy != 0), 0, dy)  # diagonals: horizontal
        nx = jnp.clip(s.px + dx, 0, _MN_GRID - 1)
        ny = jnp.clip(s.py + ndy, 0, _MN_GRID - 1)
        inside = (s.px + dx >= 0) & (s.px + dx < _MN_GRID) \
            & (s.py + ndy >= 0) & (s.py + ndy < _MN_GRID)
        target = s.grid[ny, nx]
        moves = wants & inside & (target != _MN_BOULDER)
        got = moves & (target == _MN_DIAMOND)
        # Official miner economy (miner.cc round-5 calibration): diamonds
        # collectively pay +3, the exit +10 — perfect episode = 13.
        raw_reward = jnp.where(got, 3.0 / s.diamonds0.astype(jnp.float32), 0.0)
        diamonds = s.diamonds - got.astype(jnp.int32)
        grid = jnp.where(moves, s.grid.at[ny, nx].set(_MN_EMPTY), s.grid)
        px = jnp.where(moves, nx, s.px)
        py = jnp.where(moves, ny, s.py)
        move_cd = jnp.where(moves, _MN_MOVE, move_cd)

        # Gravity tick: shift boulders into empty cells below (player's cell
        # excluded); one cell per tick, bottom-up semantics via a single
        # vectorized shift (a boulder can't chase another downward in one
        # tick, matching the C++ scan).
        fall_cd = s.fall_cd + 1
        ticks = fall_cd >= _MN_MOVE
        fall_cd = jnp.where(ticks, 0, fall_cd)

        # A falling boulder leaves EMPTY, which cannot also receive one in
        # the same vectorized tick, so the two row-slice scatters below are
        # exclusive per cell.
        def do_fall(grid):
            pmask = (jnp.arange(_MN_GRID)[:, None] == s.py) \
                & (jnp.arange(_MN_GRID)[None, :] == s.px)
            src = grid[:-1, :]
            dst = grid[1:, :]
            falls = (src == _MN_BOULDER) & (dst == _MN_EMPTY) & ~pmask[1:, :]
            grid = grid.at[:-1, :].set(jnp.where(falls, _MN_EMPTY, src))
            grid = grid.at[1:, :].set(jnp.where(falls, _MN_BOULDER, grid[1:, :]))
            return grid

        grid = jnp.where(ticks, do_fall(grid), grid)
        overhead = (py > 0) & (grid[jnp.maximum(py - 1, 0), px] == _MN_BOULDER)
        crush = jnp.where(ticks, jnp.where(overhead, s.crush + 1, 0), s.crush)
        crushed = ticks & (crush >= 2)

        exited = ~crushed & (px == _MN_GRID - 2) & (py == _MN_GRID - 2) \
            & (diamonds == 0)
        raw_reward = raw_reward + jnp.where(exited, 10.0, 0.0)
        terminated = crushed | exited

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(grid=grid, px=px, py=py, diamonds=diamonds,
                       move_cd=move_cd, fall_cd=fall_cd, crush=crush,
                       elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Heist (csrc/envs/heist.cc)
# ---------------------------------------------------------------------------

_HS_MAX = 17
_HS_KEYS = 3


@flax.struct.dataclass
class HeistState:
    walls: jax.Array   # [25, 25] bool (shared _maze_carve canvas)
    dim: jax.Array
    px: jax.Array
    py: jax.Array
    gx: jax.Array
    gy: jax.Array
    key_x: jax.Array   # [3]
    key_y: jax.Array
    door_x: jax.Array
    door_y: jax.Array
    key_held: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxHeistEnv:
    """Functional heist; vmap for a batch."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Heist-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> HeistState:
        k_dim, k_carve, k_place, key = jax.random.split(key, 4)
        max_dim = _HS_MAX if self.hard else 13
        half = 3 + jax.random.randint(k_dim, (), 0, (max_dim - 5) // 2)
        dim = 2 * half + 1
        walls = _maze_carve(k_carve, dim)
        px, py = jnp.int32(1), dim - 2
        gx, gy = dim - 2, jnp.int32(1)
        # Keys/doors on random open odd cells, distinct from start/gem (24
        # candidate draws, first-fit per slot).
        ks = jax.random.split(k_place, 2)
        cand = 1 + 2 * jax.random.randint(ks[0], (24, 2), 0,
                                          jnp.maximum((dim - 1) // 2, 1))
        cx, cy = cand[:, 0], cand[:, 1]
        ok = ~walls[cy, cx] & ~((cx == px) & (cy == py)) & ~((cx == gx) & (cy == gy))
        # Deduplicate: drop candidates equal to an earlier candidate.
        same = (cx[:, None] == cx[None, :]) & (cy[:, None] == cy[None, :])
        earlier = jnp.tril(same, k=-1).any(axis=1)
        ok = ok & ~earlier
        order = jnp.cumsum(ok.astype(jnp.int32))
        slots_x, slots_y = [], []
        for slot in range(2 * _HS_KEYS):
            pick = ok & (order == slot + 1)
            has = pick.any()
            slots_x.append(jnp.where(has, cx[jnp.argmax(pick)], 1))
            slots_y.append(jnp.where(has, cy[jnp.argmax(pick)], 1))
        key_x = jnp.stack(slots_x[:_HS_KEYS])
        key_y = jnp.stack(slots_y[:_HS_KEYS])
        door_x = jnp.stack(slots_x[_HS_KEYS:])
        door_y = jnp.stack(slots_y[_HS_KEYS:])
        return HeistState(
            walls=walls, dim=dim, px=px, py=py, gx=gx, gy=gy,
            key_x=key_x, key_y=key_y, door_x=door_x, door_y=door_y,
            key_held=jnp.zeros(_HS_KEYS, bool), elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[HeistState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: HeistState) -> jax.Array:
        y = jnp.asarray(np.arange(PG, dtype=np.int32)[:, None])
        x = jnp.asarray(np.arange(PG, dtype=np.int32)[None, :])
        cell = jnp.float32(PG) / s.dim.astype(jnp.float32)
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (25, 25, 28)], -1)
        gx_ = (x.astype(jnp.float32) / cell).astype(jnp.int32)
        gy_ = (y.astype(jnp.float32) / cell).astype(jnp.int32)
        open_px = (gx_ < s.dim) & (gy_ < s.dim) \
            & ~s.walls[jnp.clip(gy_, 0, 24), jnp.clip(gx_, 0, 24)]
        f = jnp.where(open_px[:, :, None],
                      jnp.asarray(np.array([115, 115, 125], np.uint8))[None, None, :], f)
        kc = np.array([[230, 70, 70], [70, 200, 70], [80, 120, 230]], np.uint8)
        for k in range(_HS_KEYS):
            door = _rect(f, s.door_x[k] * cell, s.door_y[k] * cell,
                         cell + 0.5, cell + 0.5,
                         tuple(jnp.uint8(v // 2) for v in kc[k]))
            f = jnp.where(~s.key_held[k], door, f)
            keyr = _rect(f, s.key_x[k] * cell + cell * 0.25,
                         s.key_y[k] * cell + cell * 0.25, cell * 0.5, cell * 0.5,
                         tuple(jnp.uint8(v) for v in kc[k]))
            f = jnp.where(~s.key_held[k], keyr, f)
        f = _rect(f, s.gx * cell + cell * 0.2, s.gy * cell + cell * 0.2,
                  cell * 0.6, cell * 0.6,
                  (jnp.uint8(240), jnp.uint8(220), jnp.uint8(60)))
        f = _rect(f, s.px * cell + cell * 0.15, s.py * cell + cell * 0.15,
                  cell * 0.7, cell * 0.7,
                  (jnp.uint8(220), jnp.uint8(220), jnp.uint8(230)))
        return f

    def step(self, s: HeistState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a]
        dy = jnp.asarray(_PG_DY)[a]

        def passable(x, y):
            inside = (x >= 0) & (x < s.dim) & (y >= 0) & (y < s.dim)
            wall = s.walls[jnp.clip(y, 0, 24), jnp.clip(x, 0, 24)]
            door = (
                ~s.key_held & (s.door_x == x) & (s.door_y == y)
            ).any()
            return inside & ~wall & ~door

        nx = s.px + dx
        ny = s.py + dy
        diag = (dx != 0) & (dy != 0)
        h_open = passable(s.px + dx, s.py)
        ny = jnp.where(diag & h_open, s.py, ny)
        nx = jnp.where(diag & ~h_open, s.px, nx)
        can = passable(nx, ny)
        px = jnp.where(can, nx, s.px)
        py = jnp.where(can, ny, s.py)

        grabs = ~s.key_held & (s.key_x == px) & (s.key_y == py)
        key_held = s.key_held | grabs

        stole = (px == s.gx) & (py == s.gy)
        raw_reward = jnp.where(stole, 10.0, 0.0)
        terminated = stole

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(px=px, py=py, key_held=key_held, elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Jumper (csrc/envs/jumper.cc)
# ---------------------------------------------------------------------------

_JP_MAX_PLAT = 8
_JP_P = 4.0
_JP_RUN = 1.1
_JP_JUMP = -2.2
_JP_G = 0.16


@flax.struct.dataclass
class JumperState:
    n_plat: jax.Array
    plat_x: jax.Array
    plat_y: jax.Array
    plat_w: jax.Array
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    jumps: jax.Array
    jump_held: jax.Array
    carrot_x: jax.Array
    carrot_y: jax.Array
    elapsed: jax.Array
    key: jax.Array


class JaxJumperEnv:
    """Functional jumper; vmap for a batch."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Jumper-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> JumperState:
        ks = jax.random.split(key, 5)
        key = ks[0]
        n_plat = (6 if self.hard else 5) + jax.random.randint(ks[1], (), 0, 3)
        idx = jnp.arange(_JP_MAX_PLAT)
        plat_w = 9.0 + jax.random.randint(ks[2], (_JP_MAX_PLAT,), 0, 6).astype(jnp.float32)
        spread = 34 if self.hard else 26
        offs = jax.random.randint(ks[3], (_JP_MAX_PLAT,), 0, spread).astype(jnp.float32)
        left = idx % 2 == 0
        plat_x = jnp.where(left, 4.0 + offs, PG - 4.0 - plat_w - offs)
        gaps = 7.0 + jax.random.randint(ks[4], (_JP_MAX_PLAT,), 0, 3).astype(jnp.float32)
        plat_y = 58.0 - jnp.cumsum(jnp.concatenate([jnp.zeros(1), gaps[:-1]]))
        last = n_plat - 1
        return JumperState(
            n_plat=n_plat, plat_x=plat_x, plat_y=plat_y, plat_w=plat_w,
            px=plat_x[0] + 2.0, py=plat_y[0] - _JP_P, vy=jnp.float32(0.0),
            jumps=jnp.int32(2), jump_held=jnp.bool_(False),
            carrot_x=plat_x[last] + plat_w[last] / 2.0 - 2.0,
            carrot_y=plat_y[last] - 4.0, elapsed=jnp.int32(0), key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[JumperState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: JumperState) -> jax.Array:
        f = jnp.stack([jnp.full((PG, PG), v, jnp.uint8) for v in (40, 44, 60)], -1)
        for i in range(_JP_MAX_PLAT):
            body = _rect(f, s.plat_x[i], s.plat_y[i], s.plat_w[i], 3.0,
                         (jnp.uint8(100), jnp.uint8(140), jnp.uint8(90)))
            f = jnp.where(i < s.n_plat, body, f)
        f = _rect(f, s.carrot_x, s.carrot_y, 4.0, 4.0,
                  (jnp.uint8(240), jnp.uint8(140), jnp.uint8(50)))
        f = _rect(f, s.px, s.py, _JP_P, _JP_P,
                  (jnp.uint8(210), jnp.uint8(210), jnp.uint8(90)))
        return f

    def step(self, s: JumperState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a]

        px = jnp.clip(s.px + _JP_RUN * dx, 0.0, PG - _JP_P)
        pressing = dy < 0
        jumps_now = pressing & ~s.jump_held & (s.jumps > 0)
        vy = jnp.where(jumps_now, _JP_JUMP, s.vy)
        jumps = s.jumps - jumps_now.astype(jnp.int32)
        jump_held = pressing
        prev_bottom = s.py + _JP_P
        vy = vy + _JP_G
        py = s.py + vy
        idx = jnp.arange(_JP_MAX_PLAT)
        over = (px + _JP_P > s.plat_x) & (px < s.plat_x + s.plat_w) & (idx < s.n_plat)
        lands = (vy >= 0.0) & over & (prev_bottom <= s.plat_y) & (py + _JP_P >= s.plat_y)
        land_any = lands.any()
        land_y = jnp.where(lands, s.plat_y, jnp.inf).min()
        py = jnp.where(land_any, land_y - _JP_P, py)
        vy = jnp.where(land_any, 0.0, vy)
        jumps = jnp.where(land_any, 2, jumps)

        fell = py > PG
        carroted = ~fell & (px + _JP_P > s.carrot_x) & (px < s.carrot_x + 4.0) \
            & (py + _JP_P > s.carrot_y) & (py < s.carrot_y + 4.0)
        raw_reward = jnp.where(carroted, 10.0, 0.0)
        terminated = fell | carroted

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(px=px, py=py, vy=vy, jumps=jumps, jump_held=jump_held,
                       elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        return ns, self._render(ns), raw_reward, raw_reward, terminated, truncated, done
