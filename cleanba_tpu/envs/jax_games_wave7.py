"""Pure-JAX twins of the seventh wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/amidar.cc,
bank_heist.cc, up_n_down.cc, time_pilot.cc); reset frames are
pixel-identical across engines (tests/test_jax_engine.py). Each game exposes
the functional dict contract of jax_engine._BREAKOUT.

The engines draw different RNG streams, so trajectories diverge — rules,
scoring, and rendering are what must match, and do. Sequential C++ loops
with mid-loop state mutation (Amidar's collision break, UpNDown's car slots)
are unrolled statically or vectorized with masked selects.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["AMIDAR", "BANK_HEIST", "UP_N_DOWN", "TIME_PILOT"]


# ---------------------------------------------------------------------------
# Amidar (csrc/envs/amidar.cc)
# ---------------------------------------------------------------------------

_AM_ROWS, _AM_COLS, _AM_CELL = 13, 19, 4
_AM_OFFX, _AM_OFFY = 4, 14
_AM_ENEMIES = 5
_AM_LIVES = 3
_AM_JUMP_FRAMES = 30
_AM_JUMPS = 3
_AM_BOX_BONUS = 48.0

_AM_LATTICE = [
    "...................",
    ".##.###.###.###.##.",
    ".##.###.###.###.##.",
    "...................",
    ".#.##.###.###.##.#.",
    ".#.##.###.###.##.#.",
    "...................",
    ".###.###.#.###.###.",
    ".###.###.#.###.###.",
    "...................",
    ".##.##.#####.##.##.",
    ".##.##.#####.##.##.",
    "...................",
]
_AM_WALL = np.array([[c == "#" for c in row] for row in _AM_LATTICE], bool)
_AM_WALL_PAD = np.ones((_AM_ROWS + 2, _AM_COLS + 2), bool)
_AM_WALL_PAD[1:-1, 1:-1] = _AM_WALL

# Boxes (amidar.cc kBoxes): perimeter masks [21, R, C] for vectorized
# completion checks, plus fill masks for rendering.
_AM_BOXES = [
    (0, 0, 3, 3), (0, 3, 3, 7), (0, 7, 3, 11), (0, 11, 3, 15), (0, 15, 3, 18),
    (3, 0, 6, 2), (3, 2, 6, 5), (3, 5, 6, 9), (3, 9, 6, 13), (3, 13, 6, 16),
    (3, 16, 6, 18),
    (6, 0, 9, 4), (6, 4, 9, 8), (6, 8, 9, 10), (6, 10, 9, 14), (6, 14, 9, 18),
    (9, 0, 12, 3), (9, 3, 12, 6), (9, 6, 12, 12), (9, 12, 12, 15), (9, 15, 12, 18),
]
_AM_NBOXES = len(_AM_BOXES)


def _am_perims():
    per = np.zeros((_AM_NBOXES, _AM_ROWS, _AM_COLS), bool)
    for b, (r0, c0, r1, c1) in enumerate(_AM_BOXES):
        per[b, r0, c0:c1 + 1] = True
        per[b, r1, c0:c1 + 1] = True
        per[b, r0:r1 + 1, c0] = True
        per[b, r0:r1 + 1, c1] = True
    return per


_AM_PERIM = _am_perims()
_AM_DY = np.array([0, -1, 0, 0, 1], np.int32)
_AM_DX = np.array([0, 0, 1, -1, 0], np.int32)
_AM_PX0 = _AM_OFFX + 9 * _AM_CELL
_AM_PY0 = _AM_OFFY + 12 * _AM_CELL
_AM_EX0 = np.array([_AM_OFFX + (2 + e * 4) * _AM_CELL for e in range(_AM_ENEMIES)], np.int32)
_AM_EDIR0 = np.array([2 if e % 2 == 0 else 3 for e in range(_AM_ENEMIES)], np.int32)


def _am_rev(d):
    return jnp.where(d == 0, 0, 5 - d)


def _am_aligned(x, y):
    return ((x - _AM_OFFX) % _AM_CELL == 0) & ((y - _AM_OFFY) % _AM_CELL == 0)


def _am_can_go(x, y, d):
    r = (y - _AM_OFFY) // _AM_CELL + jnp.asarray(_AM_DY)[d]
    c = (x - _AM_OFFX) // _AM_CELL + jnp.asarray(_AM_DX)[d]
    open_ = ~jnp.asarray(_AM_WALL_PAD)[r + 1, c + 1]
    return (d != 0) & open_


@flax.struct.dataclass
class AmidarCore:
    painted: jax.Array   # [13, 19] bool
    box_done: jax.Array  # [21] bool
    px: jax.Array
    py: jax.Array
    pdir: jax.Array
    ex: jax.Array        # [5] i32
    ey: jax.Array
    edir: jax.Array
    jump_timer: jax.Array
    jumps_left: jax.Array
    frame: jax.Array
    lives: jax.Array
    score: jax.Array
    level: jax.Array
    over: jax.Array


def _am_entities():
    """place_entities values (amidar.cc:221-236)."""
    return dict(
        px=jnp.int32(_AM_PX0), py=jnp.int32(_AM_PY0), pdir=jnp.int32(0),
        ex=jnp.asarray(_AM_EX0), ey=jnp.full(_AM_ENEMIES, _AM_OFFY, jnp.int32),
        edir=jnp.asarray(_AM_EDIR0),
        jump_timer=jnp.int32(0), jumps_left=jnp.int32(_AM_JUMPS),
        frame=jnp.int32(0),
    )


def _am_reset(key):
    del key  # deterministic layout (amidar.cc:74-81)
    return AmidarCore(
        painted=jnp.zeros((_AM_ROWS, _AM_COLS), jnp.bool_),
        box_done=jnp.zeros(_AM_NBOXES, jnp.bool_),
        lives=jnp.int32(_AM_LIVES), score=jnp.int32(0),
        level=jnp.int32(0), over=jnp.bool_(False),
        **_am_entities(),
    )


def _am_pick_dir(e, ex, ey, edir, key):
    """Uniform non-reverse open direction (amidar.cc:205-214) — pure patrol."""
    rev = _am_rev(edir)
    dirs = jnp.arange(1, 5)
    open_ = jax.vmap(lambda d: _am_can_go(ex, ey, d))(dirs)
    options = open_ & (dirs != rev)
    n = options.sum()
    idx = jax.random.randint(key, (), 0, jnp.maximum(n, 1))
    cum = jnp.cumsum(options.astype(jnp.int32)) - 1
    uniform = dirs[jnp.argmax((cum == idx) & options)]
    return jnp.where(n == 0, rev, uniform)


def _am_act(s: AmidarCore, dx, dy, fire, key):
    """One raw frame (amidar.cc:83-151)."""
    fire = jnp.asarray(fire).astype(jnp.bool_)  # int32 from the action decode
    live = ~s.over
    frame = s.frame + 1

    do_jump = fire & (s.jump_timer == 0) & (s.jumps_left > 0)
    jump_timer = jnp.where(do_jump, _AM_JUMP_FRAMES, s.jump_timer)
    jumps_left = s.jumps_left - do_jump.astype(jnp.int32)
    jump_timer = jnp.maximum(jump_timer - 1, 0)
    frozen = jump_timer > 0

    # ---- player -----------------------------------------------------------
    want = jnp.where(
        dy < 0, 1, jnp.where(dy > 0, 4, jnp.where(dx > 0, 2, jnp.where(dx < 0, 3, 0)))
    ).astype(jnp.int32)
    at_cell = _am_aligned(s.px, s.py)
    pdir = jnp.where(at_cell & (want != 0) & _am_can_go(s.px, s.py, want), want, s.pdir)
    pdir = jnp.where(at_cell & ~_am_can_go(s.px, s.py, pdir), 0, pdir)
    px = s.px + jnp.asarray(_AM_DX)[pdir]
    py = s.py + jnp.asarray(_AM_DY)[pdir]

    # Paint on alignment; bank every box whose perimeter just completed.
    now_cell = _am_aligned(px, py)
    r = (py - _AM_OFFY) // _AM_CELL
    c = (px - _AM_OFFX) // _AM_CELL
    fresh = now_cell & ~s.painted[r, c]
    painted = s.painted.at[r, c].set(s.painted[r, c] | now_cell)
    reward = fresh.astype(jnp.float32)

    complete = jnp.all(painted[None] | ~jnp.asarray(_AM_PERIM), axis=(1, 2))
    newly = complete & ~s.box_done & fresh
    box_done = s.box_done | newly
    reward = reward + newly.sum().astype(jnp.float32) * _AM_BOX_BONUS
    cleared = jnp.all(box_done)
    level = s.level + cleared.astype(jnp.int32)
    painted = jnp.where(cleared, jnp.zeros_like(painted), painted)
    box_done = jnp.where(cleared, jnp.zeros_like(box_done), box_done)

    # ---- patrol (frozen while jumping) ------------------------------------
    keys = jax.random.split(key, _AM_ENEMIES)
    ex, ey, edir = s.ex, s.ey, s.edir
    new_ex, new_ey, new_edir = [], [], []
    for e in range(_AM_ENEMIES):
        moves = ~frozen & ((frame + e) % 5 != 0)
        at = _am_aligned(ex[e], ey[e])
        d = jnp.where(moves & at, _am_pick_dir(e, ex[e], ey[e], edir[e], keys[e]), edir[e])
        new_edir.append(d)
        new_ex.append(ex[e] + jnp.where(moves, jnp.asarray(_AM_DX)[d], 0))
        new_ey.append(ey[e] + jnp.where(moves, jnp.asarray(_AM_DY)[d], 0))
    ex = jnp.stack(new_ex)
    ey = jnp.stack(new_ey)
    edir = jnp.stack(new_edir)

    ddx, ddy = ex - px, ey - py
    hit = (
        ~frozen
        & (ddx > -_AM_CELL) & (ddx < _AM_CELL)
        & (ddy > -_AM_CELL) & (ddy < _AM_CELL)
    ).any()
    lives = s.lives - hit.astype(jnp.int32)
    over = s.over | (hit & (lives <= 0))

    ent = _am_entities()
    respawn = hit | cleared
    nxt = AmidarCore(
        painted=painted, box_done=box_done,
        px=jnp.where(respawn, ent["px"], px),
        py=jnp.where(respawn, ent["py"], py),
        pdir=jnp.where(respawn, ent["pdir"], pdir),
        ex=jnp.where(respawn, ent["ex"], ex),
        ey=jnp.where(respawn, ent["ey"], ey),
        edir=jnp.where(respawn, ent["edir"], edir),
        jump_timer=jnp.where(respawn, ent["jump_timer"], jump_timer),
        jumps_left=jnp.where(respawn, ent["jumps_left"], jumps_left),
        frame=jnp.where(respawn, ent["frame"], frame),
        lives=lives,
        score=s.score + reward.astype(jnp.int32),
        level=level, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), nxt, s)
    return out, jnp.where(live, reward, 0.0)


def _am_render(s: AmidarCore) -> jax.Array:
    """84x84 frame (amidar.cc:153-176)."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Completed boxes fill first so lattice lines draw over them.
    in_r = (y >= _AM_OFFY) & (y < _AM_OFFY + _AM_ROWS * _AM_CELL)
    in_c = (x >= _AM_OFFX) & (x < _AM_OFFX + _AM_COLS * _AM_CELL)
    rr = jnp.clip((y - _AM_OFFY) // _AM_CELL, 0, _AM_ROWS - 1)
    cc = jnp.clip((x - _AM_OFFX) // _AM_CELL, 0, _AM_COLS - 1)
    box_fill = np.zeros((_AM_NBOXES, _AM_ROWS, _AM_COLS), bool)
    for b, (r0, c0, r1, c1) in enumerate(_AM_BOXES):
        box_fill[b, r0:r1 + 1, c0:c1 + 1] = True
    done_cells = (s.box_done[:, None, None] & jnp.asarray(box_fill)).any(0)
    f = jnp.where(in_r & in_c & done_cells[rr, cc], jnp.uint8(90), f)
    on_path = in_r & in_c & ~jnp.asarray(_AM_WALL)[rr, cc]
    f = jnp.where(on_path, jnp.where(s.painted[rr, cc], jnp.uint8(180), jnp.uint8(60)), f)
    for e in range(_AM_ENEMIES):
        shade = jnp.where(s.jump_timer > 0, jnp.uint8(110), jnp.uint8(140 + 8 * e))
        m = _rect_mask(y, x, s.ex[e], s.ey[e], _AM_CELL, _AM_CELL)
        f = jnp.where(m, shade, f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _AM_CELL, _AM_CELL), jnp.uint8(224), f)
    tick = (y == 1) & (x >= 2) & (x < 2 + 2 * jnp.minimum(s.score // 20, 40)) & ((x - 2) % 2 == 0)
    f = jnp.where(tick, jnp.uint8(200), f)
    lm = (y == 81) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _AM_LIVES)) & ((x - 2) % 5 < 3)
    f = jnp.where(lm, jnp.uint8(160), f)
    return f


AMIDAR = dict(
    reset=_am_reset,
    act=_am_act,
    render=_am_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=10,
    # NOOP FIRE UP RIGHT LEFT DOWN UPFIRE RIGHTFIRE LEFTFIRE DOWNFIRE
    minimal_to_full=np.array([0, 1, 2, 3, 4, 5, 10, 11, 12, 13], np.int32),
)


# ---------------------------------------------------------------------------
# Bank Heist (csrc/envs/bank_heist.cc)
# ---------------------------------------------------------------------------

_BH_ROWS, _BH_COLS, _BH_CELL = 17, 19, 4
_BH_OFFX, _BH_OFFY = 4, 8
_BH_BANKS = 3
_BH_LIVES = 4
_BH_BANK_REWARD = 50.0
_BH_POLICE_DELAY = 60
_BH_FUSE = 40
_BH_FUEL_MAX = 2500

_BH_CITY = [
    "###################",
    "#B.......#.......B#",
    "#.##.###.#.###.##.#",
    "#.................#",
    "#.##.#.#####.#.##.#",
    "#....#...#...#....#",
    "####.###.#.###.####",
    "#.................#",
    "#.##.#.#####.#.##.#",
    "#....#...B...#....#",
    "#.##.###.#.###.##.#",
    "#.......P.........#",
    "##.#.#.#####.#.#.##",
    "#....#...#...#....#",
    "#.#######.#######.#",
    "#.................#",
    "###################",
]
_BH_WALL = np.array([[c == "#" for c in row] for row in _BH_CITY], bool)
_BH_WALL_PAD = np.ones((_BH_ROWS + 2, _BH_COLS + 2), bool)
_BH_WALL_PAD[1:-1, 1:-1] = _BH_WALL
_BH_BANK_RC = [(r, c) for r in range(_BH_ROWS) for c in range(_BH_COLS)
               if _BH_CITY[r][c] == "B"]
_BH_BANK_R = np.array([rc[0] for rc in _BH_BANK_RC], np.int32)
_BH_BANK_C = np.array([rc[1] for rc in _BH_BANK_RC], np.int32)
_BH_P_RC = divmod("".join(_BH_CITY).index("P"), _BH_COLS)
_BH_PX0 = _BH_OFFX + _BH_P_RC[1] * _BH_CELL
_BH_PY0 = _BH_OFFY + _BH_P_RC[0] * _BH_CELL
_BH_DY = np.array([0, -1, 0, 0, 1], np.int32)
_BH_DX = np.array([0, 0, 1, -1, 0], np.int32)


def _bh_rev(d):
    return jnp.where(d == 0, 0, 5 - d)


def _bh_aligned(x, y):
    return ((x - _BH_OFFX) % _BH_CELL == 0) & ((y - _BH_OFFY) % _BH_CELL == 0)


def _bh_can_go(x, y, d):
    r = (y - _BH_OFFY) // _BH_CELL + jnp.asarray(_BH_DY)[d]
    c = (x - _BH_OFFX) // _BH_CELL + jnp.asarray(_BH_DX)[d]
    open_ = ~jnp.asarray(_BH_WALL_PAD)[r + 1, c + 1]
    return (d != 0) & open_


def _bh_near(ax, ay, bx, by):
    """Blast radius test (bank_heist.cc near: 2-cell box)."""
    dx, dy = ax - bx, ay - by
    lim = 2 * _BH_CELL
    return (dx > -lim) & (dx < lim) & (dy > -lim) & (dy < lim)


@flax.struct.dataclass
class BankHeistCore:
    bank_live: jax.Array   # [3] bool
    cop_live: jax.Array    # [3] bool
    cop_x: jax.Array
    cop_y: jax.Array
    cop_dir: jax.Array
    cop_hold: jax.Array
    robbed: jax.Array
    dyn_live: jax.Array
    dyn_x: jax.Array
    dyn_y: jax.Array
    dyn_fuse: jax.Array
    px: jax.Array
    py: jax.Array
    pdir: jax.Array
    fuel: jax.Array
    frame: jax.Array
    lives: jax.Array
    score: jax.Array
    level: jax.Array
    over: jax.Array


def _bh_entities():
    """place_entities values (bank_heist.cc:246-259)."""
    return dict(
        px=jnp.int32(_BH_PX0), py=jnp.int32(_BH_PY0), pdir=jnp.int32(0),
        cop_live=jnp.zeros(_BH_BANKS, jnp.bool_),
        dyn_live=jnp.bool_(False),
        fuel=jnp.int32(_BH_FUEL_MAX), frame=jnp.int32(0),
    )


def _bh_reset(key):
    del key  # deterministic layout (bank_heist.cc:62-69)
    return BankHeistCore(
        bank_live=jnp.ones(_BH_BANKS, jnp.bool_),
        cop_x=jnp.zeros(_BH_BANKS, jnp.int32),
        cop_y=jnp.zeros(_BH_BANKS, jnp.int32),
        cop_dir=jnp.zeros(_BH_BANKS, jnp.int32),
        cop_hold=jnp.zeros(_BH_BANKS, jnp.int32),
        robbed=jnp.int32(0),
        dyn_x=jnp.int32(0), dyn_y=jnp.int32(0), dyn_fuse=jnp.int32(0),
        lives=jnp.int32(_BH_LIVES), score=jnp.int32(0),
        level=jnp.int32(0), over=jnp.bool_(False),
        **_bh_entities(),
    )


def _bh_pick_dir(cop_x, cop_y, cop_dir, level, px, py, key):
    """Police direction at a cell centre (bank_heist.cc:203-228)."""
    rev = _bh_rev(cop_dir)
    dirs = jnp.arange(1, 5)
    open_ = jax.vmap(lambda d: _bh_can_go(cop_x, cop_y, d))(dirs)
    options = open_ & (dirs != rev)
    n = options.sum()
    nx = cop_x + jnp.asarray(_BH_DX)[dirs] * _BH_CELL
    ny = cop_y + jnp.asarray(_BH_DY)[dirs] * _BH_CELL
    dist = jnp.abs(nx - px) + jnp.abs(ny - py)
    dist = jnp.where(options, dist, 1 << 30)
    best = dirs[jnp.argmin(dist)]
    k_choice, k_idx = jax.random.split(key)
    chase_p = 0.5 + 0.15 * jnp.minimum(level, 3).astype(jnp.float32)
    idx = jax.random.randint(k_idx, (), 0, jnp.maximum(n, 1))
    cum = jnp.cumsum(options.astype(jnp.int32)) - 1
    uniform = dirs[jnp.argmax((cum == idx) & options)]
    chosen = jnp.where(jax.random.uniform(k_choice) < chase_p, best, uniform)
    return jnp.where(n == 0, rev, chosen)


def _bh_act(s: BankHeistCore, dx, dy, fire, key):
    """One raw frame (bank_heist.cc:71-168).

    The C++ early-returns on fuel-out and on a dynamite self-hit; here each
    stage is computed under a mask so later stages are no-ops for that frame."""
    fire = jnp.asarray(fire).astype(jnp.bool_)  # int32 from the action decode
    live = ~s.over
    frame = s.frame + 1
    k_dyn, *k_cops = jax.random.split(key, _BH_BANKS + 1)

    # ---- player car -------------------------------------------------------
    want = jnp.where(
        dy < 0, 1, jnp.where(dy > 0, 4, jnp.where(dx > 0, 2, jnp.where(dx < 0, 3, 0)))
    ).astype(jnp.int32)
    at_cell = _bh_aligned(s.px, s.py)
    pdir = jnp.where(at_cell & (want != 0) & _bh_can_go(s.px, s.py, want), want, s.pdir)
    pdir = jnp.where(at_cell & ~_bh_can_go(s.px, s.py, pdir), 0, pdir)
    px = s.px + jnp.asarray(_BH_DX)[pdir]
    py = s.py + jnp.asarray(_BH_DY)[pdir]

    fuel = s.fuel - (pdir != 0).astype(jnp.int32)
    fuel_out = (pdir != 0) & (fuel <= 0)

    # ---- rob banks on alignment ------------------------------------------
    now_cell = _bh_aligned(px, py) & ~fuel_out
    r = (py - _BH_OFFY) // _BH_CELL
    c = (px - _BH_OFFX) // _BH_CELL
    robbing = (
        now_cell & s.bank_live
        & (jnp.asarray(_BH_BANK_R) == r) & (jnp.asarray(_BH_BANK_C) == c)
    )
    bank_live = s.bank_live & ~robbing
    reward = robbing.sum().astype(jnp.float32) * _BH_BANK_REWARD
    cop_live = s.cop_live | robbing
    cop_x = jnp.where(robbing, _BH_OFFX + jnp.asarray(_BH_BANK_C) * _BH_CELL, s.cop_x)
    cop_y = jnp.where(robbing, _BH_OFFY + jnp.asarray(_BH_BANK_R) * _BH_CELL, s.cop_y)
    cop_dir = jnp.where(robbing, 0, s.cop_dir)
    cop_hold = jnp.where(robbing, _BH_POLICE_DELAY, s.cop_hold)
    robbed = s.robbed + robbing.sum().astype(jnp.int32)

    cleared = now_cell & (robbed == _BH_BANKS)
    level = s.level + cleared.astype(jnp.int32)
    bank_live = jnp.where(cleared, jnp.ones_like(bank_live), bank_live)
    cop_live = jnp.where(cleared, jnp.zeros_like(cop_live), cop_live)
    robbed = jnp.where(cleared, 0, robbed)
    fuel = jnp.where(cleared, _BH_FUEL_MAX, fuel)

    # ---- dynamite ---------------------------------------------------------
    drop = fire & ~s.dyn_live & ~fuel_out
    dyn_live = s.dyn_live | drop
    dyn_x = jnp.where(drop, px, s.dyn_x)
    dyn_y = jnp.where(drop, py, s.dyn_y)
    dyn_fuse = jnp.where(drop, _BH_FUSE, s.dyn_fuse)
    ticking = dyn_live & ~fuel_out
    dyn_fuse = dyn_fuse - ticking.astype(jnp.int32)
    blast = ticking & (dyn_fuse <= 0)
    dyn_live = dyn_live & ~blast
    cop_live = cop_live & ~(blast & _bh_near(cop_x, cop_y, dyn_x, dyn_y))
    self_hit = blast & _bh_near(px, py, dyn_x, dyn_y)

    # ---- police pursuit (skipped on fuel-out / self-hit frames) -----------
    halted = fuel_out | self_hit
    new_cx, new_cy, new_cd, new_ch = [], [], [], []
    for b in range(_BH_BANKS):
        hold = cop_hold[b]
        on_duty = cop_live[b] & (hold == 0) & ((frame + b) % 5 != 0) & ~halted
        at = _bh_aligned(cop_x[b], cop_y[b])
        d = jnp.where(
            on_duty & at,
            _bh_pick_dir(cop_x[b], cop_y[b], cop_dir[b], level, px, py, k_cops[b]),
            cop_dir[b],
        )
        new_cd.append(d)
        new_cx.append(cop_x[b] + jnp.where(on_duty, jnp.asarray(_BH_DX)[d], 0))
        new_cy.append(cop_y[b] + jnp.where(on_duty, jnp.asarray(_BH_DY)[d], 0))
        new_ch.append(jnp.where(cop_live[b] & (hold > 0) & ~halted, hold - 1, hold))
    cop_x = jnp.stack(new_cx)
    cop_y = jnp.stack(new_cy)
    cop_dir = jnp.stack(new_cd)
    cop_hold = jnp.stack(new_ch)

    caught = (
        ~halted & cop_live & (cop_hold == 0)
        & (cop_x - px > -_BH_CELL) & (cop_x - px < _BH_CELL)
        & (cop_y - py > -_BH_CELL) & (cop_y - py < _BH_CELL)
    ).any()

    died = fuel_out | self_hit | caught
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))

    ent = _bh_entities()
    nxt = BankHeistCore(
        bank_live=bank_live,
        cop_live=jnp.where(died, ent["cop_live"], cop_live),
        cop_x=cop_x, cop_y=cop_y, cop_dir=cop_dir, cop_hold=cop_hold,
        robbed=robbed,
        dyn_live=jnp.where(died, ent["dyn_live"], dyn_live),
        dyn_x=dyn_x, dyn_y=dyn_y, dyn_fuse=dyn_fuse,
        px=jnp.where(died, ent["px"], px),
        py=jnp.where(died, ent["py"], py),
        pdir=jnp.where(died, ent["pdir"], pdir),
        fuel=jnp.where(died, ent["fuel"], fuel),
        frame=jnp.where(died, ent["frame"], frame),
        lives=lives,
        score=s.score + reward.astype(jnp.int32),
        level=level, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), nxt, s)
    return out, jnp.where(live, reward, 0.0)


def _bh_render(s: BankHeistCore) -> jax.Array:
    """84x84 frame (bank_heist.cc:170-195)."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    in_r = (y >= _BH_OFFY) & (y < _BH_OFFY + _BH_ROWS * _BH_CELL)
    in_c = (x >= _BH_OFFX) & (x < _BH_OFFX + _BH_COLS * _BH_CELL)
    rr = jnp.clip((y - _BH_OFFY) // _BH_CELL, 0, _BH_ROWS - 1)
    cc = jnp.clip((x - _BH_OFFX) // _BH_CELL, 0, _BH_COLS - 1)
    f = jnp.where(in_r & in_c & jnp.asarray(_BH_WALL)[rr, cc], jnp.uint8(60), f)
    for b in range(_BH_BANKS):
        bm = _rect_mask(y, x, _BH_OFFX + int(_BH_BANK_C[b]) * _BH_CELL,
                        _BH_OFFY + int(_BH_BANK_R[b]) * _BH_CELL, _BH_CELL, _BH_CELL)
        f = jnp.where(s.bank_live[b] & bm, jnp.uint8(190), f)
        cm = _rect_mask(y, x, s.cop_x[b], s.cop_y[b], _BH_CELL, _BH_CELL)
        shade = jnp.where(s.cop_hold[b] > 0, jnp.uint8(110), jnp.uint8(150))
        f = jnp.where(s.cop_live[b] & cm, shade, f)
    dm = _rect_mask(y, x, s.dyn_x + 1, s.dyn_y + 1, 2, 2)
    f = jnp.where(s.dyn_live & dm, jnp.uint8(255), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _BH_CELL, _BH_CELL), jnp.uint8(224), f)
    fuel_px = s.fuel * 80 // _BH_FUEL_MAX
    f = jnp.where((y == 82) & (x >= 2) & (x < 2 + fuel_px), jnp.uint8(120), f)
    tick = (y == 1) & (x >= 2) & (x < 2 + 2 * jnp.minimum(s.score // 50, 40)) & ((x - 2) % 2 == 0)
    f = jnp.where(tick, jnp.uint8(200), f)
    lm = (y == 3) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _BH_LIVES)) & ((x - 2) % 5 < 3)
    f = jnp.where(lm, jnp.uint8(160), f)
    return f


BANK_HEIST = dict(
    reset=_bh_reset,
    act=_bh_act,
    render=_bh_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Up'n Down (csrc/envs/up_n_down.cc)
# ---------------------------------------------------------------------------

_UD_PLAYER_Y = 60.0
_UD_CAR_W, _UD_CAR_H = 5.0, 4.0
_UD_SEG_ROWS = 32
_UD_ROAD_HALF = 7.0
_UD_LIVES = 4
_UD_JUMP_FRAMES = 24
_UD_FLAG_EVERY = 160.0
_UD_FLAG_REWARD = 10.0
_UD_SQUASH_REWARD = 100.0
_UD_CARS = 4
_UD_UP, _UD_CRUISE, _UD_BRAKE = 1.6, 0.7, 0.2


def _ud_seg_hash(seg, salt):
    """Mirror of up_n_down.cc seg_hash: uint32 avalanche -> [0, 1)."""
    h = seg.astype(jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(salt) * jnp.uint32(40503)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _ud_road_center(w):
    """Road centre x at world row w (up_n_down.cc road_center)."""
    seg = (w / _UD_SEG_ROWS).astype(jnp.int32)
    t = (w - seg.astype(jnp.float32) * _UD_SEG_ROWS) / jnp.float32(_UD_SEG_ROWS)
    c0 = 18.0 + _ud_seg_hash(seg, 1) * 48.0
    c1 = 18.0 + _ud_seg_hash(seg + 1, 1) * 48.0
    return c0 + (c1 - c0) * t


@flax.struct.dataclass
class UpNDownCore:
    dist: jax.Array
    jump: jax.Array
    next_flag: jax.Array
    car_live: jax.Array   # [4] bool
    car_w: jax.Array      # [4] f32 world row
    car_v: jax.Array
    spawn_clock: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _ud_reset(key):
    del key  # deterministic start (up_n_down.cc:56-66)
    return UpNDownCore(
        dist=jnp.float32(0.0),
        jump=jnp.int32(0),
        next_flag=jnp.float32(_UD_FLAG_EVERY),
        car_live=jnp.zeros(_UD_CARS, jnp.bool_),
        car_w=jnp.zeros(_UD_CARS, jnp.float32),
        car_v=jnp.zeros(_UD_CARS, jnp.float32),
        spawn_clock=jnp.int32(90),
        lives=jnp.int32(_UD_LIVES),
        score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _ud_act(s: UpNDownCore, dx, dy, fire, key):
    """One raw frame (up_n_down.cc:68-137). The car-slot loop is unrolled;
    the first free slot takes the spawn, the crash wipes every slot."""
    fire = jnp.asarray(fire).astype(jnp.bool_)  # int32 from the action decode
    del dx
    live = ~s.over
    k_clock, k_row, k_v, k_slot = jax.random.split(key, 4)

    v = jnp.where(dy < 0, _UD_UP, jnp.where(dy > 0, _UD_BRAKE, _UD_CRUISE))
    dist = s.dist + v

    start_jump = fire & (s.jump == 0)
    jump = jnp.where(start_jump, _UD_JUMP_FRAMES, s.jump)
    landing = jump == 1
    jump = jnp.maximum(jump - 1, 0)

    flag = dist >= s.next_flag
    reward = jnp.where(flag, _UD_FLAG_REWARD, 0.0)
    next_flag = jnp.where(flag, s.next_flag + _UD_FLAG_EVERY, s.next_flag)

    # ---- spawn into the first free slot ------------------------------------
    spawn_clock = s.spawn_clock - 1
    spawning = spawn_clock <= 0
    spawn_clock = jnp.where(
        spawning, 70 + jax.random.randint(k_clock, (), 0, 80), spawn_clock
    )
    free = ~s.car_live
    first_free = jnp.argmax(free)
    take = spawning & free.any()
    slot = (jnp.arange(_UD_CARS) == first_free) & take
    car_live = s.car_live | slot
    new_w = dist + (84.0 - _UD_PLAYER_Y) + 20.0 + jax.random.uniform(k_row) * 40.0
    new_v = 0.25 + jax.random.uniform(k_v) * 0.25
    car_w = jnp.where(slot, new_w, s.car_w)
    car_v = jnp.where(slot, new_v, s.car_v)

    # ---- traffic motion / collisions --------------------------------------
    car_w = car_w + jnp.where(car_live, car_v, 0.0)
    sy = 84.0 - (car_w - dist)
    fell = car_live & (sy > 84.0 + _UD_CAR_H)
    car_live = car_live & ~fell

    overlap = car_live & (sy - _UD_PLAYER_Y > -_UD_CAR_H) & (sy - _UD_PLAYER_Y < _UD_CAR_H)
    airborne = jump > 0
    squashed = overlap & ~airborne & landing
    crashed = (overlap & ~airborne & ~landing).any()
    reward = reward + squashed.sum().astype(jnp.float32) * _UD_SQUASH_REWARD
    car_live = car_live & ~squashed

    lives = s.lives - crashed.astype(jnp.int32)
    over = s.over | (crashed & (lives <= 0))
    car_live = jnp.where(crashed, jnp.zeros_like(car_live), car_live)
    jump = jnp.where(crashed, 0, jump)
    spawn_clock = jnp.where(crashed, 90, spawn_clock)

    nxt = UpNDownCore(
        dist=dist, jump=jump, next_flag=next_flag,
        car_live=car_live, car_w=car_w, car_v=car_v,
        spawn_clock=spawn_clock, lives=lives,
        score=s.score + reward.astype(jnp.int32), over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), nxt, s)
    return out, jnp.where(live, reward, 0.0)


def _ud_render(s: UpNDownCore) -> jax.Array:
    """84x84 frame (up_n_down.cc:139-171)."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Road: per-row centre from the shared course hash; C++ paints [x0, x1]
    # inclusive with truncated ints.
    w_row = s.dist + (84.0 - y.astype(jnp.float32))
    c_row = _ud_road_center(w_row)
    x0 = (c_row - _UD_ROAD_HALF).astype(jnp.int32)
    x1 = (c_row + _UD_ROAD_HALF).astype(jnp.int32)
    f = jnp.where((x >= x0) & (x <= x1), jnp.uint8(70), f)
    # The next three flags at the roadside.
    for k in range(3):
        w = s.next_flag + _UD_FLAG_EVERY * float(k)
        sy = 84.0 - (w - s.dist)
        c = _ud_road_center(w)
        m = _rect_mask(y, x, (c + _UD_ROAD_HALF).astype(jnp.int32) + 1,
                       sy.astype(jnp.int32), 2, 3)
        f = jnp.where((sy >= 0.0) & (sy < 83.0) & m, jnp.uint8(210), f)
    # Traffic.
    for i in range(_UD_CARS):
        syc = 84.0 - (s.car_w[i] - s.dist)
        cc = _ud_road_center(s.car_w[i])
        m = _rect_mask(y, x, (cc - _UD_CAR_W / 2), syc, int(_UD_CAR_W), int(_UD_CAR_H))
        vis = s.car_live[i] & (syc >= -_UD_CAR_H) & (syc < 84.0)
        f = jnp.where(vis & m, jnp.uint8(150), f)
    # The buggy: brighter and raised while jumping.
    c = _ud_road_center(s.dist + (84.0 - _UD_PLAYER_Y))
    py = _UD_PLAYER_Y - jnp.where(s.jump > 0, 3.0, 0.0)
    shade = jnp.where(s.jump > 0, jnp.uint8(255), jnp.uint8(224))
    m = _rect_mask(y, x, c - _UD_CAR_W / 2, py, int(_UD_CAR_W), int(_UD_CAR_H))
    f = jnp.where(m, shade, f)
    tick = (y == 1) & (x >= 2) & (x < 2 + 2 * jnp.minimum(s.score // 50, 40)) & ((x - 2) % 2 == 0)
    f = jnp.where(tick, jnp.uint8(200), f)
    lm = (y == 81) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _UD_LIVES)) & ((x - 2) % 5 < 3)
    f = jnp.where(lm, jnp.uint8(160), f)
    return f


UP_N_DOWN = dict(
    reset=_ud_reset,
    act=_ud_act,
    render=_ud_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=6,
    # NOOP FIRE UP DOWN UPFIRE DOWNFIRE
    minimal_to_full=np.array([0, 1, 2, 5, 10, 13], np.int32),
)


# ---------------------------------------------------------------------------
# Time Pilot (csrc/envs/time_pilot.cc)
# ---------------------------------------------------------------------------

_TP_CX, _TP_CY = 42.0, 42.0
_TP_ENEMIES = 6
_TP_PSHOTS = 2
_TP_ESHOTS = 3
_TP_SCROLL = 1.1
_TP_ESPEED = 0.8
_TP_SHOT_SPEED = 3.0
_TP_LIVES = 3
_TP_KILL = 100.0
_TP_WAVE_BONUS = 1000.0
_TP_WAVE_KILLS = 8
_TP_HOLD = 50

# Eight headings, joystick order (time_pilot.cc kHx/kHy).
_TP_HX = np.array([0.0, 0.714, 1.0, 0.714, 0.0, -0.714, -1.0, -0.714], np.float32)
_TP_HY = np.array([-1.0, -0.714, 0.0, 0.714, 1.0, 0.714, 0.0, -0.714], np.float32)
_TP_CLOUD_X = np.array([(k * 37 + 11) % 84 for k in range(24)], np.float32)
_TP_CLOUD_Y = np.array([(k * 53 + 29) % 84 for k in range(24)], np.float32)
_TP_RING = np.array([(e * 3) % 8 for e in range(_TP_ENEMIES)], np.int32)


def _tp_heading(dx, dy, fallback):
    """Joystick -> heading index (time_pilot.cc heading_from)."""
    return jnp.where(
        (dx == 0) & (dy == 0), fallback,
        jnp.where(
            dx == 0, jnp.where(dy < 0, 0, 4),
            jnp.where(
                dy == 0, jnp.where(dx > 0, 2, 6),
                jnp.where(dx > 0, jnp.where(dy < 0, 1, 3), jnp.where(dy < 0, 7, 5)),
            ),
        ),
    ).astype(jnp.int32)


@flax.struct.dataclass
class TimePilotCore:
    heading: jax.Array
    world_x: jax.Array
    world_y: jax.Array
    ex: jax.Array     # [6] f32
    ey: jax.Array
    evx: jax.Array
    evy: jax.Array
    ps_live: jax.Array  # [2] bool
    ps_x: jax.Array
    ps_y: jax.Array
    ps_vx: jax.Array
    ps_vy: jax.Array
    es_live: jax.Array  # [3] bool
    es_x: jax.Array
    es_y: jax.Array
    es_vx: jax.Array
    es_vy: jax.Array
    kills: jax.Array
    hold: jax.Array
    lives: jax.Array
    score: jax.Array
    era: jax.Array
    over: jax.Array


def _tp_ring_xy():
    ex = _TP_CX + _TP_HX[_TP_RING] * 28.0
    ey = _TP_CY + _TP_HY[_TP_RING] * 28.0
    return jnp.asarray(ex), jnp.asarray(ey)


def _tp_inward_v(ex, ey):
    dx, dy = _TP_CX - ex, _TP_CY - ey
    inv = 1.0 / (jnp.abs(dx) + jnp.abs(dy) + 1e-3)
    return dx * inv * _TP_ESPEED, dy * inv * _TP_ESPEED


def _tp_reset(key):
    del key  # deterministic first wave (time_pilot.cc spawn_enemy initial)
    ex, ey = _tp_ring_xy()
    evx, evy = _tp_inward_v(ex, ey)
    return TimePilotCore(
        heading=jnp.int32(0),
        world_x=jnp.float32(0.0), world_y=jnp.float32(0.0),
        ex=ex, ey=ey, evx=evx, evy=evy,
        ps_live=jnp.zeros(_TP_PSHOTS, jnp.bool_),
        ps_x=jnp.zeros(_TP_PSHOTS, jnp.float32),
        ps_y=jnp.zeros(_TP_PSHOTS, jnp.float32),
        ps_vx=jnp.zeros(_TP_PSHOTS, jnp.float32),
        ps_vy=jnp.zeros(_TP_PSHOTS, jnp.float32),
        es_live=jnp.zeros(_TP_ESHOTS, jnp.bool_),
        es_x=jnp.zeros(_TP_ESHOTS, jnp.float32),
        es_y=jnp.zeros(_TP_ESHOTS, jnp.float32),
        es_vx=jnp.zeros(_TP_ESHOTS, jnp.float32),
        es_vy=jnp.zeros(_TP_ESHOTS, jnp.float32),
        kills=jnp.int32(0), hold=jnp.int32(0),
        lives=jnp.int32(_TP_LIVES), score=jnp.int32(0),
        era=jnp.int32(0), over=jnp.bool_(False),
    )


def _tp_edge_spawn(key):
    """Random edge entry (time_pilot.cc spawn_enemy)."""
    k_edge, k_along = jax.random.split(key)
    edge = jax.random.randint(k_edge, (), 0, 4)
    along = jax.random.uniform(k_along) * 84.0
    ex = jnp.where(edge == 0, along, jnp.where(edge == 1, along,
                   jnp.where(edge == 2, -6.0, 90.0)))
    ey = jnp.where(edge == 0, -6.0, jnp.where(edge == 1, 90.0, along))
    return ex.astype(jnp.float32), ey.astype(jnp.float32)


def _tp_act(s: TimePilotCore, dx, dy, fire, key):
    """One raw frame (time_pilot.cc:63-172). Slot loops are vectorized; the
    'first free slot' C++ scans become argmax-over-free selections."""
    fire = jnp.asarray(fire).astype(jnp.bool_)  # int32 from the action decode
    live = ~s.over
    paused = s.hold > 0
    hold = jnp.maximum(s.hold - 1, 0)

    heading = _tp_heading(dx, dy, s.heading)
    wx = jnp.asarray(_TP_HX)[heading] * _TP_SCROLL
    wy = jnp.asarray(_TP_HY)[heading] * _TP_SCROLL
    world_x = s.world_x + wx
    world_y = s.world_y + wy

    k_spawn, k_shoot, k_which, k_re, k_ram = jax.random.split(key, 5)

    # ---- player fire: first free shot slot ---------------------------------
    free = ~s.ps_live
    slot = (jnp.arange(_TP_PSHOTS) == jnp.argmax(free)) & fire & free.any()
    ps_live = s.ps_live | slot
    ps_x = jnp.where(slot, _TP_CX, s.ps_x)
    ps_y = jnp.where(slot, _TP_CY, s.ps_y)
    ps_vx = jnp.where(slot, jnp.asarray(_TP_HX)[heading] * _TP_SHOT_SPEED, s.ps_vx)
    ps_vy = jnp.where(slot, jnp.asarray(_TP_HY)[heading] * _TP_SHOT_SPEED, s.ps_vy)

    # ---- enemies wheel toward the ship -------------------------------------
    ddx, ddy = _TP_CX - s.ex, _TP_CY - s.ey
    inv = 1.0 / (jnp.abs(ddx) + jnp.abs(ddy) + 1e-3)
    blend = 0.04 + 0.01 * jnp.minimum(s.era, 3).astype(jnp.float32)
    evx = s.evx + (ddx * inv * _TP_ESPEED - s.evx) * blend
    evy = s.evy + (ddy * inv * _TP_ESPEED - s.evy) * blend
    ex = s.ex + evx - wx
    ey = s.ey + evy - wy
    off = (ex < -20.0) | (ex > 104.0) | (ey < -20.0) | (ey > 104.0)
    re_keys = jax.random.split(k_re, _TP_ENEMIES)
    re_x, re_y = jax.vmap(_tp_edge_spawn)(re_keys)
    re_vx, re_vy = _tp_inward_v(re_x, re_y)
    ex = jnp.where(off, re_x, ex)
    ey = jnp.where(off, re_y, ey)
    evx = jnp.where(off, re_vx, evx)
    evy = jnp.where(off, re_vy, evy)

    # One aimed enemy shot per frame at most (C++ rolls per enemy; the twin
    # rolls once and picks a random live enemy — same 0.004/enemy rate).
    shooting = jax.random.uniform(k_shoot) < 0.004 * _TP_ENEMIES
    shooter = jax.random.randint(k_which, (), 0, _TP_ENEMIES)
    es_free = ~s.es_live
    es_slot = (jnp.arange(_TP_ESHOTS) == jnp.argmax(es_free)) & shooting & es_free.any()
    sx, sy_ = ex[shooter], ey[shooter]
    d2x, d2y = _TP_CX - sx, _TP_CY - sy_
    inv2 = 1.0 / (jnp.abs(d2x) + jnp.abs(d2y) + 1e-3)
    es_live = s.es_live | es_slot
    es_x = jnp.where(es_slot, sx, s.es_x)
    es_y = jnp.where(es_slot, sy_, s.es_y)
    es_vx = jnp.where(es_slot, d2x * inv2 * 2.0, s.es_vx)
    es_vy = jnp.where(es_slot, d2y * inv2 * 2.0, s.es_vy)

    # ---- player shots ------------------------------------------------------
    ps_x = ps_x + jnp.where(ps_live, ps_vx - wx, 0.0)
    ps_y = ps_y + jnp.where(ps_live, ps_vy - wy, 0.0)
    ps_gone = ps_live & ((ps_x < 0) | (ps_x >= 84) | (ps_y < 0) | (ps_y >= 84))
    ps_live = ps_live & ~ps_gone

    # shot x enemy hits: [shots, enemies]
    hx = ps_x[:, None] - ex[None, :]
    hy = ps_y[:, None] - ey[None, :]
    hits = (
        ps_live[:, None] & (hx > -3.5) & (hx < 3.5) & (hy > -3.0) & (hy < 3.0)
    )
    enemy_hit = hits.any(0)
    shot_spent = hits.any(1)
    ps_live = ps_live & ~shot_spent
    kills_now = enemy_hit.sum().astype(jnp.int32)
    reward = kills_now.astype(jnp.float32) * _TP_KILL
    kills = s.kills + kills_now
    dead_keys = jax.random.split(k_spawn, _TP_ENEMIES)
    dx_, dy_ = jax.vmap(_tp_edge_spawn)(dead_keys)
    dvx, dvy = _tp_inward_v(dx_, dy_)
    ex = jnp.where(enemy_hit, dx_, ex)
    ey = jnp.where(enemy_hit, dy_, ey)
    evx = jnp.where(enemy_hit, dvx, evx)
    evy = jnp.where(enemy_hit, dvy, evy)

    wave_done = kills >= _TP_WAVE_KILLS
    reward = reward + jnp.where(wave_done, _TP_WAVE_BONUS, 0.0)
    era = s.era + wave_done.astype(jnp.int32)
    kills = jnp.where(wave_done, 0, kills)
    ring_x, ring_y = _tp_ring_xy()
    ring_vx, ring_vy = _tp_inward_v(ring_x, ring_y)
    ex = jnp.where(wave_done, ring_x, ex)
    ey = jnp.where(wave_done, ring_y, ey)
    evx = jnp.where(wave_done, ring_vx, evx)
    evy = jnp.where(wave_done, ring_vy, evy)
    es_live = es_live & ~wave_done

    # ---- enemy shots and rammings ------------------------------------------
    es_x = es_x + jnp.where(es_live, es_vx - wx, 0.0)
    es_y = es_y + jnp.where(es_live, es_vy - wy, 0.0)
    es_gone = es_live & ((es_x < 0) | (es_x >= 84) | (es_y < 0) | (es_y >= 84))
    es_live = es_live & ~es_gone
    shot_hit = (
        es_live & (es_x - _TP_CX > -3.0) & (es_x - _TP_CX < 3.0)
        & (es_y - _TP_CY > -3.0) & (es_y - _TP_CY < 3.0)
    )
    es_live = es_live & ~shot_hit
    ram = (
        (ex - _TP_CX > -4.0) & (ex - _TP_CX < 4.0)
        & (ey - _TP_CY > -3.5) & (ey - _TP_CY < 3.5)
    )
    # Independent key from the off-screen respawns above: split() is
    # prefix-consistent, so deriving both families from k_re would alias
    # ram_keys[e] == re_keys[e+1] and stack two enemies onto one spawn point
    # whenever enemy e rams while enemy e+1 scrolls off in the same frame.
    ram_keys = jax.random.split(k_ram, _TP_ENEMIES)
    rx, ry = jax.vmap(_tp_edge_spawn)(ram_keys)
    rvx, rvy = _tp_inward_v(rx, ry)
    ex = jnp.where(ram, rx, ex)
    ey = jnp.where(ram, ry, ey)
    evx = jnp.where(ram, rvx, evx)
    evy = jnp.where(ram, rvy, evy)

    hit = shot_hit.any() | ram.any()
    lives = s.lives - hit.astype(jnp.int32)
    over = s.over | (hit & (lives <= 0))
    hold = jnp.where(hit, _TP_HOLD, hold)
    es_live = es_live & ~hit

    nxt = TimePilotCore(
        heading=heading, world_x=world_x, world_y=world_y,
        ex=ex, ey=ey, evx=evx, evy=evy,
        ps_live=ps_live, ps_x=ps_x, ps_y=ps_y, ps_vx=ps_vx, ps_vy=ps_vy,
        es_live=es_live, es_x=es_x, es_y=es_y, es_vx=es_vx, es_vy=es_vy,
        kills=kills, hold=hold, lives=lives,
        score=s.score + reward.astype(jnp.int32), era=era, over=over,
    )
    # A respawn pause freezes everything but the hold counter.
    frozen = jax.tree.map(lambda n, o: jnp.where(paused, o, n), nxt, s)
    frozen = frozen.replace(hold=jnp.where(paused, hold, nxt.hold))
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), frozen, s)
    return out, jnp.where(live & ~paused, reward, 0.0)


def _tp_render(s: TimePilotCore) -> jax.Array:
    """84x84 frame (time_pilot.cc:174-203)."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Cloud field (world-anchored parallax dots, 2x1).
    cx = (jnp.asarray(_TP_CLOUD_X) - s.world_x).astype(jnp.int32) % 84
    cy = (jnp.asarray(_TP_CLOUD_Y) - s.world_y).astype(jnp.int32) % 84
    for k in range(24):
        m = _rect_mask(y, x, cx[k], cy[k], 2, 1)
        f = jnp.where(m, jnp.uint8(50), f)
    for e in range(_TP_ENEMIES):
        m = _rect_mask(y, x, s.ex[e].astype(jnp.int32) - 2, s.ey[e].astype(jnp.int32) - 1, 5, 3)
        f = jnp.where(m, jnp.uint8(160), f)
    for i in range(_TP_PSHOTS):
        m = _rect_mask(y, x, s.ps_x[i].astype(jnp.int32), s.ps_y[i].astype(jnp.int32), 2, 2)
        f = jnp.where(s.ps_live[i] & m, jnp.uint8(255), f)
    for i in range(_TP_ESHOTS):
        m = _rect_mask(y, x, s.es_x[i].astype(jnp.int32), s.es_y[i].astype(jnp.int32), 2, 2)
        f = jnp.where(s.es_live[i] & m, jnp.uint8(120), f)
    show = s.hold % 2 == 0
    body = _rect_mask(y, x, int(_TP_CX) - 2, int(_TP_CY) - 2, 5, 4)
    f = jnp.where(show & body, jnp.uint8(224), f)
    pip_x = (_TP_CX + jnp.asarray(_TP_HX)[s.heading] * 3.0).astype(jnp.int32) - 1
    pip_y = (_TP_CY + jnp.asarray(_TP_HY)[s.heading] * 3.0).astype(jnp.int32) - 1
    pip = _rect_mask(y, x, pip_x, pip_y, 2, 2)
    f = jnp.where(show & pip, jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & (x < 2 + 2 * jnp.minimum(s.score // 200, 40)) & ((x - 2) % 2 == 0)
    f = jnp.where(tick, jnp.uint8(200), f)
    lm = (y == 81) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _TP_LIVES)) & ((x - 2) % 5 < 3)
    f = jnp.where(lm, jnp.uint8(160), f)
    return f


TIME_PILOT = dict(
    reset=_tp_reset,
    act=_tp_act,
    render=_tp_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=10,
    # NOOP FIRE UP RIGHT LEFT DOWN UPFIRE RIGHTFIRE LEFTFIRE DOWNFIRE
    minimal_to_full=np.array([0, 1, 2, 3, 4, 5, 10, 11, 12, 13], np.int32),
)
