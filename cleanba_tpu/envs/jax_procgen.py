"""Pure-JAX procgen-family envs (Bigfish, Maze) for the on-device engine.

Rules mirror the C++ clones (csrc/envs/bigfish.cc, maze.cc) and the procgen
protocol (csrc/envs/procgen_like.h): 64x64x3 RGB uint8 observations, the
15-action combo space, a fresh procedural level every episode, raw rewards,
1000-step truncation, EnvPool auto-reset semantics — the contract of the
reference's plain `envpool.make` procgen path
(legacy_scripts/cleanba_ppo_envpool_procgen.py:115-130).

One intentional delta vs the C++ bigfish: the C++ act() processes fish
sequentially (the player grows mid-step, affecting later collisions in the
same frame); the JAX port evaluates all collisions against the start-of-step
radius — a same-frame tie-break difference only.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

PG = 64

# Procgen 15-action combo space (procgen_like.h:33-40).
_PG_DX = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1, 0, 0, 0, 0, 0, 0], np.int32)
_PG_DY = np.array([1, 0, -1, 1, 0, -1, 1, 0, -1, 0, 0, 0, 0, 0, 0], np.int32)

_Y = np.arange(PG, dtype=np.int32)[:, None]
_X = np.arange(PG, dtype=np.int32)[None, :]


def _rect(f, fx, fy, fw, fh, rgb):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    x0 = jnp.maximum(0, jnp.asarray(fx).astype(jnp.int32))
    y0 = jnp.maximum(0, jnp.asarray(fy).astype(jnp.int32))
    x1 = jnp.minimum(PG, (jnp.asarray(fx) + fw).astype(jnp.int32))
    y1 = jnp.minimum(PG, (jnp.asarray(fy) + fh).astype(jnp.int32))
    m = ((y >= y0) & (y < y1) & (x >= x0) & (x < x1))[:, :, None]
    color = jnp.stack([c.astype(jnp.uint8) if hasattr(c, "astype") else jnp.uint8(c)
                       for c in rgb])
    return jnp.where(m, color[None, None, :], f)


# ---------------------------------------------------------------------------
# Bigfish (csrc/envs/bigfish.cc)
# ---------------------------------------------------------------------------

_BF_MAX_FISH = 14
_BF_START = 2.0
_BF_MAX = 12.0
_BF_GROW = 0.40
_BF_SPEED = 1.4


@flax.struct.dataclass
class BigfishState:
    px: jax.Array
    py: jax.Array
    pr: jax.Array
    f_alive: jax.Array  # [14] bool
    f_x: jax.Array
    f_y: jax.Array
    f_r: jax.Array
    f_vx: jax.Array
    spawn_prob: jax.Array
    speed_scale: jax.Array
    big_bias: jax.Array
    bg: jax.Array       # f32 shade
    elapsed: jax.Array
    key: jax.Array


class JaxBigfishEnv:
    """Functional bigfish; vmap for a batch. hard=True is BigfishHard-v0
    (the reference's procgen default)."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Bigfish-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> BigfishState:
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        base = 0.09 if self.hard else 0.05
        sbase = 1.0 if self.hard else 0.7
        z = jnp.zeros(_BF_MAX_FISH, jnp.float32)
        return BigfishState(
            px=jnp.float32(32.0), py=jnp.float32(32.0), pr=jnp.float32(_BF_START),
            f_alive=jnp.zeros(_BF_MAX_FISH, jnp.bool_),
            f_x=z, f_y=z, f_r=z, f_vx=z,
            spawn_prob=base + 0.04 * jax.random.uniform(k1),
            speed_scale=sbase + 0.5 * jax.random.uniform(k2),
            big_bias=jax.random.uniform(k3),
            bg=(30 + jax.random.randint(k4, (), 0, 50)).astype(jnp.float32),
            elapsed=jnp.int32(0),
            key=key,
        )

    def reset(self, key: jax.Array) -> Tuple[BigfishState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: BigfishState) -> jax.Array:
        f = jnp.stack(
            [jnp.full((PG, PG), 10, jnp.uint8),
             jnp.full((PG, PG), 40, jnp.uint8),
             jnp.broadcast_to(s.bg.astype(jnp.uint8), (PG, PG))], axis=-1,
        )
        for i in range(_BF_MAX_FISH):
            danger = jnp.where(s.f_r[i] >= s.pr, 200, 60).astype(jnp.uint8)
            safe = jnp.where(s.f_r[i] >= s.pr, 40, 190).astype(jnp.uint8)
            body = _rect(f, s.f_x[i] - s.f_r[i], s.f_y[i] - s.f_r[i],
                         2 * s.f_r[i], 2 * s.f_r[i], (danger, safe, jnp.uint8(40)))
            tx = jnp.where(s.f_vx[i] > 0, s.f_x[i] - s.f_r[i] - 1.5, s.f_x[i] + s.f_r[i])
            body = _rect(body, tx, s.f_y[i] - 1.0, 1.5, 2.0, (danger, safe, jnp.uint8(40)))
            f = jnp.where(s.f_alive[i], body, f)
        f = _rect(f, s.px - s.pr, s.py - s.pr, 2 * s.pr, 2 * s.pr,
                  (jnp.uint8(230), jnp.uint8(220), jnp.uint8(60)))
        return f

    def step(self, s: BigfishState, action: jax.Array):
        key, k_spawn, k_sp1, k_sp2, k_sp3, k_sp4, k_sp5, k_reset = jax.random.split(s.key, 8)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a].astype(jnp.float32)
        dy = jnp.asarray(_PG_DY)[a].astype(jnp.float32)

        px = jnp.clip(s.px + _BF_SPEED * dx, s.pr, PG - s.pr)
        py = jnp.clip(s.py + _BF_SPEED * dy, s.pr, PG - s.pr)

        # Spawn one enemy from a side wall with prob spawn_prob (first dead slot).
        do_spawn = (jax.random.uniform(k_spawn) < s.spawn_prob) & jnp.any(~s.f_alive)
        slot = jnp.argmax(~s.f_alive)
        from_left = jax.random.bernoulli(k_sp1)
        bigger = jax.random.uniform(k_sp2) < 0.25 + 0.35 * s.big_bias
        r_new = jnp.where(
            bigger,
            s.pr * (1.1 + 0.8 * jax.random.uniform(k_sp3)),
            jnp.maximum(1.0, s.pr * (0.3 + 0.6 * jax.random.uniform(k_sp3))),
        )
        r_new = jnp.minimum(r_new, 16.0)
        y_new = r_new + jax.random.uniform(k_sp4) * (PG - 2 * r_new)
        x_new = jnp.where(from_left, -r_new, PG + r_new)
        vx_new = jnp.where(from_left, 1.0, -1.0) * s.speed_scale * (
            0.4 + 0.8 * jax.random.uniform(k_sp5)
        )
        f_alive = s.f_alive.at[slot].set(jnp.where(do_spawn, True, s.f_alive[slot]))
        f_x = s.f_x.at[slot].set(jnp.where(do_spawn, x_new, s.f_x[slot]))
        f_y = s.f_y.at[slot].set(jnp.where(do_spawn, y_new, s.f_y[slot]))
        f_r = s.f_r.at[slot].set(jnp.where(do_spawn, r_new, s.f_r[slot]))
        f_vx = s.f_vx.at[slot].set(jnp.where(do_spawn, vx_new, s.f_vx[slot]))

        # Move fish; cull off-screen; collisions vs start-of-step radius.
        f_x = jnp.where(f_alive, f_x + f_vx, f_x)
        off = f_alive & ((f_x < -2.0 * f_r) | (f_x > PG + 2.0 * f_r))
        f_alive = f_alive & ~off
        ddx = f_x - px
        ddy = f_y - py
        touch = f_alive & (ddx * ddx + ddy * ddy <= (f_r + s.pr) ** 2)
        eaten = touch & (f_r < s.pr)
        deadly = touch & (f_r >= s.pr)
        n_eaten = jnp.sum(eaten).astype(jnp.float32)
        raw_reward = n_eaten
        pr = jnp.minimum(s.pr + _BF_GROW * n_eaten, _BF_MAX)
        level_done = pr >= _BF_MAX
        raw_reward = raw_reward + jnp.where(level_done & (n_eaten > 0), 10.0, 0.0)
        terminated = jnp.any(deadly) | (level_done & (n_eaten > 0))
        f_alive = f_alive & ~eaten

        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated
        ns = s.replace(
            px=px, py=py, pr=pr, f_alive=f_alive, f_x=f_x, f_y=f_y, f_r=f_r,
            f_vx=f_vx, elapsed=elapsed, key=key,
        )
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        obs = self._render(ns)
        # raw rewards; procgen protocol has no reward clip
        return ns, obs, raw_reward, raw_reward, terminated, truncated, done


# ---------------------------------------------------------------------------
# Maze (csrc/envs/maze.cc)
# ---------------------------------------------------------------------------

_MZ_MAX = 25


@flax.struct.dataclass
class MazeState:
    walls: jax.Array  # [25, 25] bool (cells outside dim are walls)
    dim: jax.Array    # i32, odd
    mx: jax.Array
    my: jax.Array
    cx: jax.Array
    cy: jax.Array
    elapsed: jax.Array
    key: jax.Array


def _maze_carve(key, dim):
    """Recursive backtracker with an explicit stack (maze.cc:74-107), as a
    bounded while_loop. `dim` is dynamic; cells outside [0, dim) stay walls."""
    walls = jnp.ones((_MZ_MAX, _MZ_MAX), jnp.bool_).at[1, 1].set(False)
    stack = jnp.zeros((_MZ_MAX * _MZ_MAX, 2), jnp.int32).at[0].set(jnp.array([1, 1]))
    d = jnp.array([[2, 0], [-2, 0], [0, 2], [0, -2]], jnp.int32)

    def cond(c):
        _, _, top, _ = c
        return top >= 0

    def body(c):
        walls, stack, top, key = c
        key, k_pick = jax.random.split(key)
        x = stack[top, 0]
        y = stack[top, 1]
        nx = x + d[:, 0]
        ny = y + d[:, 1]
        ok = (nx > 0) & (nx < dim) & (ny > 0) & (ny < dim) & walls[ny, nx]
        n = jnp.sum(ok).astype(jnp.int32)
        pick = jax.random.randint(k_pick, (), 0, jnp.maximum(n, 1))
        choice = jnp.argmax(jnp.cumsum(ok.astype(jnp.int32)) > pick)
        nx2 = nx[choice]
        ny2 = ny[choice]
        has = n > 0
        walls = walls.at[(y + ny2) // 2, (x + nx2) // 2].set(
            jnp.where(has, False, walls[(y + ny2) // 2, (x + nx2) // 2])
        )
        walls = walls.at[ny2, nx2].set(jnp.where(has, False, walls[ny2, nx2]))
        new_top = jnp.where(has, top + 1, top - 1)
        stack = stack.at[jnp.maximum(new_top, 0)].set(
            jnp.where(has, jnp.stack([nx2, ny2]), stack[jnp.maximum(new_top, 0)])
        )
        return walls, stack, new_top, key

    walls, _, _, _ = jax.lax.while_loop(cond, body, (walls, stack, jnp.int32(0), key))
    return walls


class JaxMazeEnv:
    """Functional maze; vmap for a batch. hard=True allows up to 25x25."""

    num_actions = 15
    obs_shape = (PG, PG, 3)
    obs_dtype = jnp.uint8

    def __init__(self, env_id: str = "Maze-v0", hard: bool = False,
                 max_episode_steps: int = 1000, **_):
        self.env_id = env_id
        self.hard = bool(hard)
        self.max_episode_steps = int(max_episode_steps)

    def _fresh(self, key) -> MazeState:
        k_dim, k_carve, k_cheese, key = jax.random.split(key, 4)
        max_dim = _MZ_MAX if self.hard else 15
        half = 2 + jax.random.randint(k_dim, (), 0, (max_dim - 3) // 2)
        dim = 2 * half + 1
        walls = _maze_carve(k_carve, dim)
        mx = jnp.int32(1)
        my = dim - 2
        # Cheese: 12 random odd-cell tries, keep the farthest open one.
        ks = jax.random.split(k_cheese, 24)
        tx = 1 + 2 * jax.random.randint(ks[0], (12,), 0, jnp.maximum((dim - 1) // 2, 1))
        ty = 1 + 2 * jax.random.randint(ks[1], (12,), 0, jnp.maximum((dim - 1) // 2, 1))
        open_try = ~walls[ty, tx] & ~((tx == mx) & (ty == my))
        dist = jnp.abs(tx - mx) + jnp.abs(ty - my)
        score = jnp.where(open_try, dist, -1)
        best = jnp.argmax(score)
        has_best = score[best] >= 0
        cx = jnp.where(has_best, tx[best], 1)
        cy = jnp.where(has_best, ty[best], 1)
        return MazeState(walls=walls, dim=dim, mx=mx, my=my, cx=cx, cy=cy,
                         elapsed=jnp.int32(0), key=key)

    def reset(self, key: jax.Array) -> Tuple[MazeState, jax.Array]:
        s = self._fresh(key)
        return s, self._render(s)

    def _render(self, s: MazeState) -> jax.Array:
        y, x = jnp.asarray(_Y), jnp.asarray(_X)
        cell = jnp.float32(PG) / s.dim.astype(jnp.float32)
        f = jnp.stack(
            [jnp.full((PG, PG), 25, jnp.uint8),
             jnp.full((PG, PG), 25, jnp.uint8),
             jnp.full((PG, PG), 28, jnp.uint8)], axis=-1,
        )
        # Open cells: map pixel -> cell (rect(x*cell, ..., cell+0.5) coverage).
        gx = (x.astype(jnp.float32) / cell).astype(jnp.int32)
        gy = (y.astype(jnp.float32) / cell).astype(jnp.int32)
        gxc = jnp.clip(gx, 0, _MZ_MAX - 1)
        gyc = jnp.clip(gy, 0, _MZ_MAX - 1)
        open_px = (gx < s.dim) & (gy < s.dim) & ~s.walls[gyc, gxc]
        f = jnp.where(open_px[:, :, None],
                      jnp.array([120, 120, 130], jnp.uint8)[None, None, :], f)
        f = _rect(f, s.cx * cell + cell * 0.2, s.cy * cell + cell * 0.2,
                  cell * 0.6, cell * 0.6, (jnp.uint8(240), jnp.uint8(200), jnp.uint8(40)))
        f = _rect(f, s.mx * cell + cell * 0.15, s.my * cell + cell * 0.15,
                  cell * 0.7, cell * 0.7, (jnp.uint8(200), jnp.uint8(80), jnp.uint8(70)))
        return f

    def step(self, s: MazeState, action: jax.Array):
        key, k_reset = jax.random.split(s.key)
        a = jnp.clip(action.astype(jnp.int32), 0, 14)
        dx = jnp.asarray(_PG_DX)[a]
        dy = jnp.asarray(_PG_DY)[a]

        def open_at(x, y):
            inside = (x >= 0) & (x < s.dim) & (y >= 0) & (y < s.dim)
            return inside & ~s.walls[jnp.clip(y, 0, _MZ_MAX - 1), jnp.clip(x, 0, _MZ_MAX - 1)]

        nx = s.mx + dx
        ny = s.my + dy
        # Diagonals resolve horizontal-first (maze.cc:38-42).
        diag = (dx != 0) & (dy != 0)
        h_open = open_at(s.mx + dx, s.my)
        ny = jnp.where(diag & h_open, s.my, ny)
        nx = jnp.where(diag & ~h_open, s.mx, nx)
        can = open_at(nx, ny)
        mx = jnp.where(can, nx, s.mx)
        my = jnp.where(can, ny, s.my)

        reached = (mx == s.cx) & (my == s.cy)
        raw_reward = jnp.where(reached, 10.0, 0.0)
        terminated = reached
        elapsed = s.elapsed + 1
        truncated = ~terminated & (elapsed >= self.max_episode_steps)
        done = terminated | truncated

        ns = s.replace(mx=mx, my=my, elapsed=elapsed, key=key)
        fresh = self._fresh(k_reset)
        ns = jax.tree.map(lambda n, o: jnp.where(done, n, o), fresh, ns)
        ns = ns.replace(key=key)
        obs = self._render(ns)
        return ns, obs, raw_reward, raw_reward, terminated, truncated, done
