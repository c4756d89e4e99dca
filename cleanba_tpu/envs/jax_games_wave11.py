"""Pure-JAX twins of the wave-11 C++ engine games: Surround, Defender,
Robotank, Gravitar.

Rules mirror the C++ engine game-for-game (csrc/envs/surround.cc,
defender.cc, robotank.cc, gravitar.cc) so the Anakin trainer covers the
same task set as the Sebulba host-env path; reset frames are pixel-identical
across engines (tests/test_jax_engine.py). Each game exposes the functional
dict contract of jax_engine._BREAKOUT: reset / act (one raw frame) /
render / lives / over.

Simultaneity note: the C++ games early-return on a life loss and break out
of entity loops on first hits; the JAX twins gate those updates with selects
and first-hit masks instead. Given the engines draw different RNG streams,
trajectories diverge anyway — rules, scoring, and rendering are what must
match, and do.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["SURROUND", "DEFENDER", "ROBOTANK", "GRAVITAR"]


def _first_true(mask):
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


_H16X = np.array([
    0.0, 0.3826834, 0.7071068, 0.9238795, 1.0,
    0.9238795, 0.7071068, 0.3826834, 0.0, -0.3826834,
    -0.7071068, -0.9238795, -1.0, -0.9238795, -0.7071068, -0.3826834,
], np.float32)
_H16Y = np.array([
    -1.0, -0.9238795, -0.7071068, -0.3826834, 0.0,
    0.3826834, 0.7071068, 0.9238795, 1.0, 0.9238795,
    0.7071068, 0.3826834, 0.0, -0.3826834, -0.7071068, -0.9238795,
], np.float32)


# ---------------------------------------------------------------------------
# Surround (csrc/envs/surround.cc)
# ---------------------------------------------------------------------------

_SR_COLS, _SR_ROWS = 26, 20
_SR_CELL = 3
_SR_OFFX, _SR_OFFY = 3, 12
_SR_WIN = 10
_SR_STEP = 6
_SR_DX = np.array([0, 1, 0, -1], np.int32)
_SR_DY = np.array([-1, 0, 1, 0], np.int32)


@flax.struct.dataclass
class SurroundCore:
    grid: jax.Array    # [20, 26] i32: 0 empty, 1 player trail, 2 ai trail
    px: jax.Array
    py: jax.Array
    p_dir: jax.Array
    ax: jax.Array
    ay: jax.Array
    a_dir: jax.Array
    clock: jax.Array
    p_score: jax.Array
    a_score: jax.Array
    over: jax.Array


def _sr_round_fields():
    return dict(
        grid=jnp.zeros((_SR_ROWS, _SR_COLS), jnp.int32),
        px=jnp.int32(4), py=jnp.int32(_SR_ROWS // 2), p_dir=jnp.int32(1),
        ax=jnp.int32(_SR_COLS - 5), ay=jnp.int32(_SR_ROWS // 2),
        a_dir=jnp.int32(3), clock=jnp.int32(0),
    )


def _sr_reset(key):
    del key  # fully deterministic (surround.cc reset_game)
    return SurroundCore(
        p_score=jnp.int32(0), a_score=jnp.int32(0), over=jnp.bool_(False),
        **_sr_round_fields(),
    )


def _sr_blocked(grid, x, y):
    off = (x < 0) | (x >= _SR_COLS) | (y < 0) | (y >= _SR_ROWS)
    return off | (grid[jnp.clip(y, 0, _SR_ROWS - 1),
                       jnp.clip(x, 0, _SR_COLS - 1)] != 0)


def _sr_room(grid, x, y, d):
    dx = jnp.asarray(_SR_DX)[d]
    dy = jnp.asarray(_SR_DY)[d]
    n = jnp.int32(0)
    open_so_far = jnp.bool_(True)
    for k in range(1, 7):
        open_here = open_so_far & ~_sr_blocked(grid, x + dx * k, y + dy * k)
        n = n + open_here.astype(jnp.int32)
        open_so_far = open_here
    return n


def _sr_act(s: SurroundCore, dx, dy, fire, key):
    del fire
    live = ~s.over
    k_whim, k_tie = jax.random.split(key)

    p_dir = jnp.where(
        dx > 0, 1, jnp.where(dx < 0, 3, jnp.where(dy < 0, 0,
                                                  jnp.where(dy > 0, 2, s.p_dir)))
    ).astype(jnp.int32)

    clock = s.clock + 1
    steps = clock >= _SR_STEP
    clock = jnp.where(steps, 0, clock)

    # AI steering.
    sdx, sdy = jnp.asarray(_SR_DX), jnp.asarray(_SR_DY)
    ahead = _sr_blocked(s.grid, s.ax + sdx[s.a_dir], s.ay + sdy[s.a_dir])
    whim = jax.random.uniform(k_whim) < 0.07
    rethink = steps & (ahead | whim)
    left = (s.a_dir + 3) & 3
    right = (s.a_dir + 1) & 3
    lroom = _sr_room(s.grid, s.ax, s.ay, left)
    rroom = _sr_room(s.grid, s.ax, s.ay, right)
    tie = jax.random.uniform(k_tie) < 0.5
    pick = jnp.where(lroom > rroom, left,
                     jnp.where(rroom > lroom, right, jnp.where(tie, left, right)))
    pick_ok = ~_sr_blocked(s.grid, s.ax + sdx[pick], s.ay + sdy[pick])
    opp = (pick + 2) & 3
    opp_ok = ~_sr_blocked(s.grid, s.ax + sdx[opp], s.ay + sdy[opp])
    a_dir = jnp.where(
        rethink,
        jnp.where(pick_ok, pick, jnp.where(opp_ok, opp, s.a_dir)),
        s.a_dir,
    )

    # Cell step.
    grid = jnp.where(
        steps,
        s.grid.at[s.py, s.px].set(1).at[s.ay, s.ax].set(2),
        s.grid,
    )
    px = jnp.where(steps, s.px + sdx[p_dir], s.px)
    py = jnp.where(steps, s.py + sdy[p_dir], s.py)
    ax = jnp.where(steps, s.ax + sdx[a_dir], s.ax)
    ay = jnp.where(steps, s.ay + sdy[a_dir], s.ay)

    p_crash = steps & _sr_blocked(grid, px, py)
    a_crash = steps & (_sr_blocked(grid, ax, ay) | ((px == ax) & (py == ay)))
    reward = jnp.where(a_crash & ~p_crash, 1.0,
                       jnp.where(p_crash & ~a_crash, -1.0, 0.0))
    p_score = s.p_score + (a_crash & ~p_crash).astype(jnp.int32)
    a_score = s.a_score + (p_crash & ~a_crash).astype(jnp.int32)
    crashed = p_crash | a_crash
    over = s.over | (crashed & ((p_score >= _SR_WIN) | (a_score >= _SR_WIN)))

    rf = _sr_round_fields()
    grid = jnp.where(crashed, rf["grid"], grid)
    px = jnp.where(crashed, rf["px"], px)
    py = jnp.where(crashed, rf["py"], py)
    p_dir = jnp.where(crashed, rf["p_dir"], p_dir)
    ax = jnp.where(crashed, rf["ax"], ax)
    ay = jnp.where(crashed, rf["ay"], ay)
    a_dir = jnp.where(crashed, rf["a_dir"], a_dir)
    clock = jnp.where(crashed, rf["clock"], clock)

    out = SurroundCore(grid=grid, px=px, py=py, p_dir=p_dir, ax=ax, ay=ay,
                       a_dir=a_dir, clock=clock, p_score=p_score,
                       a_score=a_score, over=over)
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _sr_render(s: SurroundCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    # Pixel -> cell (cells live at kOffX + c*3).
    c = (x - _SR_OFFX) // _SR_CELL
    r = (y - _SR_OFFY) // _SR_CELL
    in_grid = (c >= 0) & (c < _SR_COLS) & (r >= 0) & (r < _SR_ROWS) \
        & (x >= _SR_OFFX) & (y >= _SR_OFFY)
    frame_cells = (c >= -1) & (c <= _SR_COLS) & (r >= -1) & (r <= _SR_ROWS) \
        & (x >= _SR_OFFX - _SR_CELL) & (y >= _SR_OFFY - _SR_CELL) & ~in_grid
    f = jnp.where(frame_cells, jnp.uint8(90), jnp.uint8(0))
    cell = s.grid[jnp.clip(r, 0, _SR_ROWS - 1), jnp.clip(c, 0, _SR_COLS - 1)]
    f = jnp.where(in_grid & (cell == 1), jnp.uint8(200), f)
    f = jnp.where(in_grid & (cell == 2), jnp.uint8(150), f)
    f = jnp.where(in_grid & (c == s.px) & (r == s.py), jnp.uint8(255), f)
    f = jnp.where(in_grid & (c == s.ax) & (r == s.ay), jnp.uint8(170), f)
    pt = (y == 2) & (x >= 4) & ((x - 4) % 3 == 0) \
        & ((x - 4) // 3 < jnp.minimum(s.p_score, _SR_WIN))
    f = jnp.where(pt, jnp.uint8(200), f)
    at = (y == 2) & (x <= 79) & ((79 - x) % 3 == 0) \
        & ((79 - x) // 3 < jnp.minimum(s.a_score, _SR_WIN))
    f = jnp.where(at, jnp.uint8(150), f)
    return f


SURROUND = dict(
    reset=_sr_reset,
    act=_sr_act,
    render=_sr_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=5,
    minimal_to_full=np.array([0, 2, 3, 4, 5], np.int32),
)


# ---------------------------------------------------------------------------
# Defender (csrc/envs/defender.cc)
# ---------------------------------------------------------------------------

_DF_LANDERS = 4
_DF_HUM = 4
_DF_LW, _DF_LH = 5.0, 4.0
_DF_HW, _DF_HH = 3.0, 5.0
_DF_GROUND = 76.0
_DF_PW, _DF_PH = 7.0, 4.0
_DF_MX, _DF_MY = 1.3, 1.1
_DF_SHOT = 3.2
_DF_ESHOT = 1.6
_DF_SPAWN = 160
_DF_LIVES = 3


@flax.struct.dataclass
class DefenderCore:
    px: jax.Array
    py: jax.Array
    facing: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    lander_alive: jax.Array  # [4]
    mutant: jax.Array
    carrying: jax.Array      # -1 or humanoid index
    lx: jax.Array
    ly: jax.Array
    eshot_live: jax.Array
    eshot_x: jax.Array
    eshot_y: jax.Array
    eshot_vx: jax.Array
    hum_alive: jax.Array     # [4]
    hum_x: jax.Array
    spawn_clock: jax.Array
    wave: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _df_reset(key):
    del key  # fully deterministic (defender.cc reset_game)
    return DefenderCore(
        px=jnp.float32(10.0), py=jnp.float32(40.0), facing=jnp.float32(1.0),
        shot_live=jnp.bool_(False), shot_x=jnp.float32(0.0),
        shot_y=jnp.float32(0.0), shot_vx=jnp.float32(0.0),
        lander_alive=jnp.zeros(_DF_LANDERS, bool),
        mutant=jnp.zeros(_DF_LANDERS, bool),
        carrying=jnp.full(_DF_LANDERS, -1, jnp.int32),
        lx=jnp.zeros(_DF_LANDERS, jnp.float32),
        ly=jnp.zeros(_DF_LANDERS, jnp.float32),
        eshot_live=jnp.zeros(_DF_LANDERS, bool),
        eshot_x=jnp.zeros(_DF_LANDERS, jnp.float32),
        eshot_y=jnp.zeros(_DF_LANDERS, jnp.float32),
        eshot_vx=jnp.zeros(_DF_LANDERS, jnp.float32),
        hum_alive=jnp.ones(_DF_HUM, bool),
        hum_x=jnp.asarray([10.0 + h * 20.0 for h in range(_DF_HUM)], jnp.float32),
        spawn_clock=jnp.int32(_DF_SPAWN - 1),
        wave=jnp.int32(0), lives=jnp.int32(_DF_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _df_act(s: DefenderCore, dx, dy, fire, key):
    live = ~s.over
    k_spawn, k_fire = jax.random.split(key)
    espeed = 0.35 + 0.06 * s.wave.astype(jnp.float32)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _DF_MX, 2.0, 82.0 - _DF_PW)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * _DF_MY, 12.0, _DF_GROUND - _DF_PH)
    facing = jnp.where(dx != 0, jnp.sign(dx).astype(jnp.float32), s.facing)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _DF_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + _DF_PH / 2.0, s.shot_y)
    shot_vx = jnp.where(fires, facing * _DF_SHOT, s.shot_vx)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_live = shot_live & (shot_x >= 0.0) & (shot_x < 84.0)

    spawn_clock = s.spawn_clock + 1
    spawning = spawn_clock >= _DF_SPAWN
    spawn_clock = jnp.where(spawning, 0, spawn_clock)
    slot = _first_true(~s.lander_alive) & spawning
    new_x = jax.random.uniform(k_spawn) * 70.0 + 5.0
    lander_alive = s.lander_alive | slot
    mutant = s.mutant & ~slot
    carrying = jnp.where(slot, -1, s.carrying)
    lx = jnp.where(slot, new_x, s.lx)
    ly = jnp.where(slot, 12.0, s.ly)

    # Per-lander behavior.
    hdx = px - lx
    hdy = py - ly
    hn = jnp.sqrt(hdx * hdx + hdy * hdy) + 1e-3
    # Nearest living humanoid.
    dists = jnp.abs(s.hum_x[None, :] - lx[:, None]) \
        + jnp.where(s.hum_alive[None, :], 0.0, 1e9)
    target = jnp.argmin(dists, axis=1).astype(jnp.int32)
    best = jnp.min(dists, axis=1)
    has_target = s.hum_alive.any()
    tgt_x = s.hum_x[target]

    is_mut = lander_alive & mutant
    is_carry = lander_alive & ~mutant & (carrying >= 0)
    is_desc = lander_alive & ~mutant & (carrying < 0)

    lx = jnp.where(is_mut, lx + hdx / hn * (espeed * 2.2), lx)
    ly = jnp.where(is_mut, ly + hdy / hn * (espeed * 2.2), ly)
    ly = jnp.where(is_carry, ly - espeed, ly)
    hum_x = s.hum_x
    for e in range(_DF_LANDERS):
        ci = jnp.clip(s.carrying[e], 0, _DF_HUM - 1)
        hum_x = jnp.where(is_carry[e], hum_x.at[ci].set(lx[e] + 1.0), hum_x)
    mutates = is_carry & (ly <= 12.0)
    hum_alive = s.hum_alive
    for e in range(_DF_LANDERS):
        ci = jnp.clip(s.carrying[e], 0, _DF_HUM - 1)
        hum_alive = jnp.where(mutates[e], hum_alive.at[ci].set(False), hum_alive)
    carrying = jnp.where(mutates, -1, carrying)
    mutant = mutant | mutates

    lx = jnp.where(is_desc & has_target,
                   lx + jnp.sign(tgt_x - lx) * espeed * 0.7, lx)
    ly = jnp.where(is_desc, ly + espeed, ly)
    grabs = is_desc & has_target & (ly + _DF_LH >= _DF_GROUND - _DF_HH) \
        & (best < 3.0)
    carrying = jnp.where(grabs, target, carrying)
    dives = is_desc & ~has_target & (ly > _DF_GROUND)
    mutant = mutant | dives

    efires = (
        lander_alive & ~s.eshot_live & (jnp.abs(ly - py) < 5.0)
        & (jax.random.uniform(k_fire, (_DF_LANDERS,)) < 0.012)
    )
    eshot_live = s.eshot_live | efires
    eshot_x = jnp.where(efires, lx + _DF_LW / 2.0, s.eshot_x)
    eshot_y = jnp.where(efires, ly + _DF_LH / 2.0, s.eshot_y)
    eshot_vx = jnp.where(efires, jnp.where(px >= lx, _DF_ESHOT, -_DF_ESHOT),
                         s.eshot_vx)

    shot_hits = (
        shot_live & lander_alive
        & (shot_x >= lx) & (shot_x < lx + _DF_LW)
        & (shot_y >= ly) & (shot_y < ly + _DF_LH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    carrying = jnp.where(kill, -1, carrying)   # the humanoid drops free
    lander_alive = lander_alive & ~kill
    reward = kill.any().astype(jnp.float32) * 150.0
    score = s.score + jnp.where(kill.any(), 150, 0)

    rammed = (
        lander_alive
        & (px + _DF_PW > lx) & (px < lx + _DF_LW)
        & (py + _DF_PH > ly) & (py < ly + _DF_LH)
    ).any()

    eshot_x = jnp.where(eshot_live, eshot_x + eshot_vx, eshot_x)
    eshot_live = eshot_live & (eshot_x >= 0.0) & (eshot_x < 84.0)
    shelled = ~rammed & (
        eshot_live
        & (px + _DF_PW > eshot_x - 1.0) & (px < eshot_x + 1.0)
        & (py + _DF_PH > eshot_y - 1.0) & (py < eshot_y + 1.0)
    ).any()

    # Wave advance: field stayed clear through a full spawn period.
    waved = ~rammed & ~shelled & ~lander_alive.any() & (spawn_clock == 0)
    wave = s.wave + waved.astype(jnp.int32)

    died = rammed | shelled
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    px = jnp.where(died, 10.0, px)
    py = jnp.where(died, 40.0, py)
    facing = jnp.where(died, 1.0, facing)
    shot_live = jnp.where(died, False, shot_live)
    eshot_live = jnp.where(died, jnp.zeros_like(eshot_live), eshot_live)

    out = DefenderCore(
        px=px, py=py, facing=facing, shot_live=shot_live, shot_x=shot_x,
        shot_y=shot_y, shot_vx=shot_vx, lander_alive=lander_alive,
        mutant=mutant, carrying=carrying, lx=lx, ly=ly,
        eshot_live=eshot_live, eshot_x=eshot_x, eshot_y=eshot_y,
        eshot_vx=eshot_vx, hum_alive=hum_alive, hum_x=hum_x,
        spawn_clock=spawn_clock, wave=wave, lives=lives, score=score,
        over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _df_render(s: DefenderCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y >= int(_DF_GROUND)) & (y < int(_DF_GROUND) + 2),
                  jnp.uint8(100), f)
    for h in range(_DF_HUM):
        m = _rect_mask(y, x, s.hum_x[h], _DF_GROUND - _DF_HH, _DF_HW, _DF_HH) \
            & s.hum_alive[h]
        f = jnp.where(m, jnp.uint8(130), f)
    for e in range(_DF_LANDERS):
        shade = jnp.where(s.mutant[e], jnp.uint8(210), jnp.uint8(170))
        m = _rect_mask(y, x, s.lx[e], s.ly[e], _DF_LW, _DF_LH) & s.lander_alive[e]
        f = jnp.where(m, shade, f)
        em = _rect_mask(y, x, s.eshot_x[e] - 1.0, s.eshot_y[e] - 1.0, 2.0, 2.0) \
            & s.eshot_live[e]
        f = jnp.where(em, jnp.uint8(190), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _DF_PW, _DF_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 150, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _DF_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


DEFENDER = dict(
    reset=_df_reset,
    act=_df_act,
    render=_df_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Robotank (csrc/envs/robotank.cc)
# ---------------------------------------------------------------------------

_RT_EN = 3
_RT_TANK = 5.0
_RT_DRIVE = 0.9
_RT_ES = 0.45
_RT_ROT = 2
_RT_SHOT = 2.8
_RT_ESHOT = 1.6
_RT_EFIRE = 110
_RT_SPAWN = 240
_RT_SQUAD = 4
_RT_FOG_H = 14.0


@flax.struct.dataclass
class RobotankCore:
    px: jax.Array
    py: jax.Array
    heading: jax.Array
    rot_cd: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    enemy_live: jax.Array  # [3]
    ex: jax.Array
    ey: jax.Array
    efire: jax.Array
    eshot_live: jax.Array
    eshot_x: jax.Array
    eshot_y: jax.Array
    eshot_vx: jax.Array
    eshot_vy: jax.Array
    fog_y: jax.Array
    fog_v: jax.Array
    spawn_clock: jax.Array
    squad: jax.Array
    kills: jax.Array
    score: jax.Array
    over: jax.Array


def _rt_respawn_fields():
    return dict(
        px=jnp.float32(39.5), py=jnp.float32(39.5), heading=jnp.int32(0),
        rot_cd=jnp.int32(_RT_ROT - 1), shot_live=jnp.bool_(False),
        eshot_live=jnp.zeros(_RT_EN, bool),
    )


def _rt_reset(key):
    del key  # fully deterministic (robotank.cc reset_game)
    return RobotankCore(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        shot_vx=jnp.float32(0.0), shot_vy=jnp.float32(0.0),
        enemy_live=jnp.zeros(_RT_EN, bool),
        ex=jnp.zeros(_RT_EN, jnp.float32), ey=jnp.zeros(_RT_EN, jnp.float32),
        efire=jnp.zeros(_RT_EN, jnp.int32),
        eshot_x=jnp.zeros(_RT_EN, jnp.float32),
        eshot_y=jnp.zeros(_RT_EN, jnp.float32),
        eshot_vx=jnp.zeros(_RT_EN, jnp.float32),
        eshot_vy=jnp.zeros(_RT_EN, jnp.float32),
        fog_y=jnp.float32(20.0), fog_v=jnp.float32(0.2),
        spawn_clock=jnp.int32(_RT_SPAWN), squad=jnp.int32(_RT_SQUAD),
        kills=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
        **_rt_respawn_fields(),
    )


def _rt_act(s: RobotankCore, dx, dy, fire, key):
    live = ~s.over
    k_edge, k_t, k_f = jax.random.split(key, 3)
    hx = jnp.asarray(_H16X)
    hy = jnp.asarray(_H16Y)

    turning = dx != 0
    rot_cd = jnp.where(turning, s.rot_cd + 1, _RT_ROT - 1)
    turns = turning & (rot_cd >= _RT_ROT)
    rot_cd = jnp.where(turns, 0, rot_cd)
    heading = jnp.where(turns, (s.heading + jnp.where(dx > 0, 1, 15)) % 16,
                        s.heading)
    drive = jnp.where(dy < 0, _RT_DRIVE, jnp.where(dy > 0, -_RT_DRIVE, 0.0))
    px = jnp.clip(s.px + hx[heading] * drive, 2.0, 82.0 - _RT_TANK)
    py = jnp.clip(s.py + hy[heading] * drive, 2.0, 82.0 - _RT_TANK)

    fog_y = s.fog_y + s.fog_v
    fog_v = jnp.where((fog_y < 8.0) | (fog_y + _RT_FOG_H > 76.0), -s.fog_v, s.fog_v)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _RT_TANK / 2.0 + hx[heading] * 3.5, s.shot_x)
    shot_y = jnp.where(fires, py + _RT_TANK / 2.0 + hy[heading] * 3.5, s.shot_y)
    shot_vx = jnp.where(fires, hx[heading] * _RT_SHOT, s.shot_vx)
    shot_vy = jnp.where(fires, hy[heading] * _RT_SHOT, s.shot_vy)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_live = shot_live & (shot_x >= 0) & (shot_x < 84) & (shot_y >= 0) & (shot_y < 84)

    spawn_clock = s.spawn_clock + 1
    spawning = spawn_clock >= _RT_SPAWN
    spawn_clock = jnp.where(spawning, 0, spawn_clock)
    slot = _first_true(~s.enemy_live) & spawning
    edge = jax.random.randint(k_edge, (), 0, 4)
    t = 6.0 + jax.random.randint(k_t, (), 0, 66).astype(jnp.float32)
    new_ex = jnp.where(edge < 2, t, jnp.where(edge == 2, 3.0, 76.0))
    new_ey = jnp.where(edge == 0, 3.0, jnp.where(edge == 1, 76.0, t))
    new_fire = jax.random.randint(k_f, (), 0, _RT_EFIRE)
    enemy_live = s.enemy_live | slot
    ex = jnp.where(slot, new_ex, s.ex)
    ey = jnp.where(slot, new_ey, s.ey)
    efire = jnp.where(slot, new_fire, s.efire)
    eshot_live = s.eshot_live & ~slot

    ddx, ddy = px - ex, py - ey
    n = jnp.sqrt(ddx * ddx + ddy * ddy) + 1e-3
    closing = n > 18.0
    ex = jnp.where(enemy_live,
                   jnp.where(closing, ex + ddx / n * _RT_ES, ex - ddy / n * _RT_ES),
                   ex)
    ey = jnp.where(enemy_live,
                   jnp.where(closing, ey + ddy / n * _RT_ES, ey + ddx / n * _RT_ES),
                   ey)
    efire = jnp.where(enemy_live & ~s.eshot_live, efire + 1, efire)
    efires = enemy_live & ~s.eshot_live & (efire >= _RT_EFIRE)
    efire = jnp.where(efires, 0, efire)
    eshot_live = eshot_live | efires
    eshot_x = jnp.where(efires, ex + _RT_TANK / 2.0, s.eshot_x)
    eshot_y = jnp.where(efires, ey + _RT_TANK / 2.0, s.eshot_y)
    eshot_vx = jnp.where(efires, ddx / n * _RT_ESHOT, s.eshot_vx)
    eshot_vy = jnp.where(efires, ddy / n * _RT_ESHOT, s.eshot_vy)

    shot_hits = (
        shot_live & enemy_live
        & (shot_x >= ex) & (shot_x < ex + _RT_TANK)
        & (shot_y >= ey) & (shot_y < ey + _RT_TANK)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    enemy_live = enemy_live & ~kill
    killed = kill.any()
    reward = killed.astype(jnp.float32)
    score = s.score + killed.astype(jnp.int32)
    kills = s.kills + killed.astype(jnp.int32)
    squad = jnp.where(killed & (kills % 12 == 0) & (s.squad < _RT_SQUAD),
                      s.squad + 1, s.squad)

    eshot_x = jnp.where(eshot_live, eshot_x + eshot_vx, eshot_x)
    eshot_y = jnp.where(eshot_live, eshot_y + eshot_vy, eshot_y)
    eshot_live = eshot_live & (eshot_x >= 0) & (eshot_x < 84) \
        & (eshot_y >= 0) & (eshot_y < 84)
    shelled = (
        eshot_live
        & (px + _RT_TANK > eshot_x - 1.0) & (px < eshot_x + 1.0)
        & (py + _RT_TANK > eshot_y - 1.0) & (py < eshot_y + 1.0)
    ).any()

    squad = squad - shelled.astype(jnp.int32)
    over = s.over | (shelled & (squad <= 0))
    re = _rt_respawn_fields()
    px = jnp.where(shelled, re["px"], px)
    py = jnp.where(shelled, re["py"], py)
    heading = jnp.where(shelled, re["heading"], heading)
    rot_cd = jnp.where(shelled, re["rot_cd"], rot_cd)
    shot_live = jnp.where(shelled, re["shot_live"], shot_live)
    eshot_live = jnp.where(shelled, re["eshot_live"], eshot_live)

    out = RobotankCore(
        px=px, py=py, heading=heading, rot_cd=rot_cd, shot_live=shot_live,
        shot_x=shot_x, shot_y=shot_y, shot_vx=shot_vx, shot_vy=shot_vy,
        enemy_live=enemy_live, ex=ex, ey=ey, efire=efire,
        eshot_live=eshot_live, eshot_x=eshot_x, eshot_y=eshot_y,
        eshot_vx=eshot_vx, eshot_vy=eshot_vy, fog_y=fog_y, fog_v=fog_v,
        spawn_clock=spawn_clock, squad=squad, kills=kills, score=score,
        over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _rt_render(s: RobotankCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    for e in range(_RT_EN):
        fogged = (s.ey[e] + _RT_TANK > s.fog_y) & (s.ey[e] < s.fog_y + _RT_FOG_H)
        em = _rect_mask(y, x, s.ex[e], s.ey[e], _RT_TANK, _RT_TANK) \
            & s.enemy_live[e] & ~fogged
        f = jnp.where(em, jnp.uint8(170), f)
        sm = _rect_mask(y, x, s.eshot_x[e] - 1.0, s.eshot_y[e] - 1.0, 2.0, 2.0) \
            & s.eshot_live[e]
        f = jnp.where(sm, jnp.uint8(210), f)
    fog_rows = (y >= s.fog_y.astype(jnp.int32)) \
        & (y < (s.fog_y + _RT_FOG_H).astype(jnp.int32)) \
        & ((y - s.fog_y.astype(jnp.int32)) % 3 == 0) \
        & (x >= 2) & (x < 82) & (x % 2 == 0)
    f = jnp.where(fog_rows, jnp.uint8(50), f)
    pm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(pm, jnp.uint8(220), f)
    hx = jnp.asarray(_H16X)[s.heading]
    hy = jnp.asarray(_H16Y)[s.heading]
    hull = _rect_mask(y, x, s.px, s.py, _RT_TANK, _RT_TANK)
    barrel = _rect_mask(y, x, s.px + 1.5 + hx * 3.5, s.py + 1.5 + hy * 3.5,
                        2.0, 2.0)
    f = jnp.where(hull | barrel, jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.squad, _RT_SQUAD)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


ROBOTANK = dict(
    reset=_rt_reset,
    act=_rt_act,
    render=_rt_render,
    lives=lambda s: s.squad,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Gravitar (csrc/envs/gravitar.cc)
# ---------------------------------------------------------------------------

_GV_STAR = (42.0, 42.0, 5.0)
_GV_GRAV = 9.0
_GV_THRUST = 0.07
_GV_MAXV = 1.4
_GV_ROT = 3
_GV_BUNK = 4
_GV_BX = np.array([20.0, 58.0, 20.0, 58.0], np.float32)
_GV_BY = np.array([22.0, 22.0, 58.0, 58.0], np.float32)
_GV_BW, _GV_BH = 6.0, 4.0
_GV_SHOT = 2.4
_GV_BSHOT = 1.2
_GV_BFIRE = 150
_GV_LIVES = 3
_GV_INVULN = 50


@flax.struct.dataclass
class GravitarCore:
    px: jax.Array
    py: jax.Array
    vx: jax.Array
    vy: jax.Array
    heading: jax.Array
    rot_cd: jax.Array
    invuln: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    bunk_alive: jax.Array  # [4]
    bfire: jax.Array
    bshot_live: jax.Array
    bshot_x: jax.Array
    bshot_y: jax.Array
    bshot_vx: jax.Array
    bshot_vy: jax.Array
    level: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _gv_respawn_fields():
    return dict(
        px=jnp.float32(10.0), py=jnp.float32(14.0),
        vx=jnp.float32(0.6), vy=jnp.float32(0.0),
        heading=jnp.int32(4), rot_cd=jnp.int32(_GV_ROT - 1),
        shot_live=jnp.bool_(False), invuln=jnp.int32(_GV_INVULN),
        bshot_live=jnp.zeros(_GV_BUNK, bool),
    )


def _gv_level_fields():
    return dict(
        bunk_alive=jnp.ones(_GV_BUNK, bool),
        bfire=jnp.asarray([37 * b for b in range(_GV_BUNK)], jnp.int32),
        bshot_live=jnp.zeros(_GV_BUNK, bool),
    )


def _gv_reset(key):
    del key  # fully deterministic (gravitar.cc reset_game)
    f = dict(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        shot_vx=jnp.float32(0.0), shot_vy=jnp.float32(0.0),
        bshot_x=jnp.zeros(_GV_BUNK, jnp.float32),
        bshot_y=jnp.zeros(_GV_BUNK, jnp.float32),
        bshot_vx=jnp.zeros(_GV_BUNK, jnp.float32),
        bshot_vy=jnp.zeros(_GV_BUNK, jnp.float32),
        level=jnp.int32(0), lives=jnp.int32(_GV_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False),
    )
    f.update(_gv_level_fields())
    f.update(_gv_respawn_fields())
    return GravitarCore(**f)


def _gv_act(s: GravitarCore, dx, dy, fire, key):
    del key  # fully deterministic
    live = ~s.over
    grav = _GV_GRAV * (1.0 + 0.2 * s.level.astype(jnp.float32))
    hx = jnp.asarray(_H16X)
    hy = jnp.asarray(_H16Y)

    turning = dx != 0
    rot_cd = jnp.where(turning, s.rot_cd + 1, _GV_ROT - 1)
    turns = turning & (rot_cd >= _GV_ROT)
    rot_cd = jnp.where(turns, 0, rot_cd)
    heading = jnp.where(turns, (s.heading + jnp.where(dx > 0, 1, 15)) % 16,
                        s.heading)
    thrusting = dy < 0
    vx = s.vx + jnp.where(thrusting, hx[heading] * _GV_THRUST, 0.0)
    vy = s.vy + jnp.where(thrusting, hy[heading] * _GV_THRUST, 0.0)
    sx = _GV_STAR[0] - (s.px + 2.0)
    sy = _GV_STAR[1] - (s.py + 2.0)
    r2 = sx * sx + sy * sy + 16.0
    r = jnp.sqrt(r2)
    vx = vx + sx / r * grav / r2
    vy = vy + sy / r * grav / r2
    sp = jnp.sqrt(vx * vx + vy * vy)
    scale = jnp.where(sp > _GV_MAXV, _GV_MAXV / jnp.maximum(sp, 1e-6), 1.0)
    vx, vy = vx * scale, vy * scale
    px = s.px + vx
    py = s.py + vy
    invuln = jnp.maximum(s.invuln - 1, 0)
    vx = jnp.where((px < 2.0) | (px > 78.0), -vx, vx)
    vy = jnp.where((py < 10.0) | (py > 78.0), -vy, vy)
    px = jnp.clip(px, 2.0, 78.0)
    py = jnp.clip(py, 10.0, 78.0)

    starred = (invuln == 0) & (r < _GV_STAR[2] + 3.0)

    fires = ~starred & (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + 2.0 + hx[heading] * 3.0, s.shot_x)
    shot_y = jnp.where(fires, py + 2.0 + hy[heading] * 3.0, s.shot_y)
    shot_vx = jnp.where(fires, hx[heading] * _GV_SHOT, s.shot_vx)
    shot_vy = jnp.where(fires, hy[heading] * _GV_SHOT, s.shot_vy)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_live = shot_live & (shot_x >= 0) & (shot_x < 84) & (shot_y >= 0) & (shot_y < 84)

    bx, by = jnp.asarray(_GV_BX), jnp.asarray(_GV_BY)
    bfire = jnp.where(s.bunk_alive & ~s.bshot_live, s.bfire + 1, s.bfire)
    bfires = ~starred & s.bunk_alive & ~s.bshot_live & (bfire >= _GV_BFIRE)
    bfire = jnp.where(bfires, 0, bfire)
    bdx = px + 2.0 - (bx + _GV_BW / 2.0)
    bdy = py + 2.0 - (by + _GV_BH / 2.0)
    bn = jnp.sqrt(bdx * bdx + bdy * bdy) + 1e-3
    bshot_live = s.bshot_live | bfires
    bshot_x = jnp.where(bfires, bx + _GV_BW / 2.0, s.bshot_x)
    bshot_y = jnp.where(bfires, by + _GV_BH / 2.0, s.bshot_y)
    bshot_vx = jnp.where(bfires, bdx / bn * _GV_BSHOT, s.bshot_vx)
    bshot_vy = jnp.where(bfires, bdy / bn * _GV_BSHOT, s.bshot_vy)

    shot_hits = (
        shot_live & s.bunk_alive
        & (shot_x >= bx) & (shot_x < bx + _GV_BW)
        & (shot_y >= by) & (shot_y < by + _GV_BH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    bunk_alive = s.bunk_alive & ~kill
    reward = kill.any().astype(jnp.float32) * 250.0
    score = s.score + jnp.where(kill.any(), 250, 0)

    bunked = ~starred & (invuln == 0) & (
        bunk_alive
        & (px + 4.0 > bx) & (px < bx + _GV_BW)
        & (py + 4.0 > by) & (py < by + _GV_BH)
    ).any()

    bshot_x = jnp.where(bshot_live, bshot_x + bshot_vx, bshot_x)
    bshot_y = jnp.where(bshot_live, bshot_y + bshot_vy, bshot_y)
    bshot_live = bshot_live & (bshot_x >= 0) & (bshot_x < 84) \
        & (bshot_y >= 0) & (bshot_y < 84)
    shelled = ~starred & ~bunked & (invuln == 0) & (
        bshot_live
        & (px + 4.0 > bshot_x - 1.0) & (px < bshot_x + 1.0)
        & (py + 4.0 > bshot_y - 1.0) & (py < bshot_y + 1.0)
    ).any()

    died = starred | bunked | shelled
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    cleared = ~died & ~bunk_alive.any()
    level = s.level + cleared.astype(jnp.int32)

    lf = _gv_level_fields()
    bunk_alive = jnp.where(cleared, lf["bunk_alive"], bunk_alive)
    bfire = jnp.where(cleared, lf["bfire"], bfire)
    bshot_live = jnp.where(cleared, lf["bshot_live"], bshot_live)
    invuln = jnp.where(cleared, _GV_INVULN, invuln)

    re = _gv_respawn_fields()
    px = jnp.where(died, re["px"], px)
    py = jnp.where(died, re["py"], py)
    vx = jnp.where(died, re["vx"], vx)
    vy = jnp.where(died, re["vy"], vy)
    heading = jnp.where(died, re["heading"], heading)
    rot_cd = jnp.where(died, re["rot_cd"], rot_cd)
    shot_live = jnp.where(died, re["shot_live"], shot_live)
    invuln = jnp.where(died, re["invuln"], invuln)
    bshot_live = jnp.where(died, re["bshot_live"], bshot_live)

    out = GravitarCore(
        px=px, py=py, vx=vx, vy=vy, heading=heading, rot_cd=rot_cd,
        invuln=invuln, shot_live=shot_live, shot_x=shot_x, shot_y=shot_y,
        shot_vx=shot_vx, shot_vy=shot_vy, bunk_alive=bunk_alive, bfire=bfire,
        bshot_live=bshot_live, bshot_x=bshot_x, bshot_y=bshot_y,
        bshot_vx=bshot_vx, bshot_vy=bshot_vy, level=level, lives=lives,
        score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _gv_render(s: GravitarCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where(
        _rect_mask(y, x, _GV_STAR[0] - _GV_STAR[2], _GV_STAR[1] - _GV_STAR[2],
                   2 * _GV_STAR[2], 2 * _GV_STAR[2]),
        jnp.uint8(230), f,
    )
    for b in range(_GV_BUNK):
        bm = _rect_mask(y, x, float(_GV_BX[b]), float(_GV_BY[b]),
                        _GV_BW, _GV_BH) & s.bunk_alive[b]
        f = jnp.where(bm, jnp.uint8(140), f)
        sm = _rect_mask(y, x, s.bshot_x[b] - 1.0, s.bshot_y[b] - 1.0, 2.0, 2.0) \
            & s.bshot_live[b]
        f = jnp.where(sm, jnp.uint8(210), f)
    pm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(pm, jnp.uint8(220), f)
    visible = (s.invuln % 2) == 0
    hx = jnp.asarray(_H16X)[s.heading]
    hy = jnp.asarray(_H16Y)[s.heading]
    body = _rect_mask(y, x, s.px, s.py, 4.0, 4.0) & visible
    nose = _rect_mask(y, x, s.px + 1.0 + hx * 3.0, s.py + 1.0 + hy * 3.0,
                      2.0, 2.0) & visible
    f = jnp.where(body | nose, jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 250, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _GV_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


GRAVITAR = dict(
    reset=_gv_reset,
    act=_gv_act,
    render=_gv_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
