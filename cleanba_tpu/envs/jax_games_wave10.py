"""Pure-JAX twins of the wave-10 C++ engine games: Tutankham, Venture,
IceHockey, BattleZone.

Rules mirror the C++ engine game-for-game (csrc/envs/tutankham.cc,
venture.cc, ice_hockey.cc, battlezone.cc) so the Anakin trainer covers the
same task set as the Sebulba host-env path; reset frames are pixel-identical
across engines (tests/test_jax_engine.py). Each game exposes the functional
dict contract of jax_engine._BREAKOUT: reset / act (one raw frame) / render /
lives / over.

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
from cleanba_tpu.envs.jax_games_wave9c import _PAD, _box_hits, _pad_mask, _pixel_hit

__all__ = ["TUTANKHAM", "VENTURE", "ICE_HOCKEY", "BATTLEZONE"]


def _first_true(mask):
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


# ---------------------------------------------------------------------------
# Tutankham (csrc/envs/tutankham.cc)
# ---------------------------------------------------------------------------

_TU_ROWS = 5
_TU_ROW_Y = np.array([12, 26, 40, 54, 68], np.int32)
_TU_CORR_H = 6
_TU_SHAFT_X = np.array([8, 64, 28, 48, 12, 60, 38], np.int32)
_TU_SHAFT_A = np.array([0, 0, 1, 2, 3, 3, 1], np.int32)
_TU_SHAFT_B = np.array([1, 1, 2, 3, 4, 4, 3], np.int32)
_TU_TREAS = 6
_TU_TX = np.array([20.0, 70.0, 8.0, 55.0, 30.0, 74.0], np.float32)
_TU_TROW = np.array([0, 1, 2, 2, 4, 3], np.int32)
_TU_CRE = 6
_TU_SPAWN = 200
_TU_PW = _TU_PH = 4
_TU_WALK = 0.9
_TU_SHOT_V = 2.5
_TU_LIVES = 3


def _tu_build_walls() -> np.ndarray:
    w = np.ones((SCREEN, SCREEN), bool)
    for r in range(_TU_ROWS):
        w[_TU_ROW_Y[r]:_TU_ROW_Y[r] + _TU_CORR_H, 6:78] = False
    for s in range(len(_TU_SHAFT_X)):
        w[_TU_ROW_Y[_TU_SHAFT_A[s]]:_TU_ROW_Y[_TU_SHAFT_B[s]] + _TU_CORR_H,
          _TU_SHAFT_X[s]:_TU_SHAFT_X[s] + 6] = False
    return w


_TU_WALLS = _tu_build_walls()
_TU_WALLS_PAD = _pad_mask(_TU_WALLS)


@flax.struct.dataclass
class TutankhamCore:
    px: jax.Array
    py: jax.Array
    facing: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    cre_live: jax.Array   # [6]
    cre_x: jax.Array
    cre_y: jax.Array
    treas_live: jax.Array
    spawn_clock: jax.Array
    level: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _tu_respawn_fields():
    return dict(
        px=jnp.float32(40.0), py=jnp.float32(float(_TU_ROW_Y[2] + 1)),
        facing=jnp.float32(1.0), shot_live=jnp.bool_(False),
        cre_live=jnp.zeros(_TU_CRE, bool), spawn_clock=jnp.int32(0),
    )


def _tu_reset(key):
    del key  # fully deterministic (tutankham.cc reset_game)
    return TutankhamCore(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        shot_vx=jnp.float32(0.0),
        cre_x=jnp.zeros(_TU_CRE, jnp.float32),
        cre_y=jnp.zeros(_TU_CRE, jnp.float32),
        treas_live=jnp.ones(_TU_TREAS, bool),
        level=jnp.int32(0), lives=jnp.int32(_TU_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False), **_tu_respawn_fields(),
    )


def _tu_act(s: TutankhamCore, dx, dy, fire, key):
    live = ~s.over
    walls = jnp.asarray(_TU_WALLS)
    walls_pad = jnp.asarray(_TU_WALLS_PAD)
    k_side, k_wander, k_axis, k_dir = jax.random.split(key, 4)
    cspeed = 0.5 + 0.1 * s.level.astype(jnp.float32)

    nx = s.px + dx.astype(jnp.float32) * _TU_WALK
    px = jnp.where(_box_hits(walls_pad, nx, s.py, _TU_PW, _TU_PH), s.px, nx)
    ny = s.py + dy.astype(jnp.float32) * _TU_WALK
    py = jnp.where(_box_hits(walls_pad, px, ny, _TU_PW, _TU_PH), s.py, ny)
    facing = jnp.where(dx != 0, jnp.sign(dx).astype(jnp.float32), s.facing)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _TU_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + _TU_PH / 2.0, s.shot_y)
    shot_vx = jnp.where(fires, facing * _TU_SHOT_V, s.shot_vx)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_live = shot_live & ~(
        (shot_x < 0) | (shot_x >= 84) | _pixel_hit(walls, shot_x, shot_y)
    )

    # Portals.
    spawn_clock = s.spawn_clock + 1
    spawning = spawn_clock >= _TU_SPAWN
    spawn_clock = jnp.where(spawning, 0, spawn_clock)
    slot = _first_true(~s.cre_live) & spawning
    topside = jax.random.uniform(k_side) < 0.5
    cre_live = s.cre_live | slot
    cre_x = jnp.where(slot, jnp.where(topside, 7.0, 73.0), s.cre_x)
    cre_y = jnp.where(
        slot,
        jnp.where(topside, float(_TU_ROW_Y[0] + 1), float(_TU_ROW_Y[4] + 1)),
        s.cre_y,
    )

    # Creatures chase with occasional wander.
    ddx, ddy = px - cre_x, py - cre_y
    horiz = jnp.abs(ddx) >= jnp.abs(ddy)
    sx = jnp.where(horiz, jnp.sign(ddx), 0.0)
    sy = jnp.where(horiz, 0.0, jnp.sign(ddy))
    wanders = jax.random.uniform(k_wander, (_TU_CRE,)) < 0.1
    axis_h = jax.random.uniform(k_axis, (_TU_CRE,)) < 0.5
    sgn = jnp.where(jax.random.uniform(k_dir, (_TU_CRE,)) < 0.5, 1.0, -1.0)
    sx = jnp.where(wanders, jnp.where(axis_h, sgn, 0.0), sx)
    sy = jnp.where(wanders, jnp.where(axis_h, 0.0, sgn), sy)
    cx_try = cre_x + sx * cspeed
    cy_try = cre_y + sy * cspeed
    x_block = jax.vmap(lambda x_, y_: _box_hits(walls_pad, x_, y_, 4, 4))(cx_try, cre_y)
    y_block = jax.vmap(lambda x_, y_: _box_hits(walls_pad, x_, y_, 4, 4))(cre_x, cy_try)
    x_moves = cre_live & (sx != 0.0) & ~x_block
    y_moves = cre_live & ~x_moves & (sy != 0.0) & ~y_block
    cre_x = jnp.where(x_moves, cx_try, cre_x)
    cre_y = jnp.where(y_moves, cy_try, cre_y)

    shot_hits = (
        shot_live & cre_live
        & (shot_x >= cre_x) & (shot_x < cre_x + 4.0)
        & (shot_y >= cre_y) & (shot_y < cre_y + 4.0)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    cre_live = cre_live & ~kill
    reward = kill.any().astype(jnp.float32) * 5.0
    score = s.score + jnp.where(kill.any(), 5, 0)

    touched = (
        cre_live
        & (px + _TU_PW > cre_x) & (px < cre_x + 4.0)
        & (py + _TU_PH > cre_y) & (py < cre_y + 4.0)
    ).any()

    ty = jnp.asarray(_TU_ROW_Y)[jnp.asarray(_TU_TROW)].astype(jnp.float32) + 1.0
    tx = jnp.asarray(_TU_TX)
    grabs = ~touched & s.treas_live & (px + _TU_PW > tx) & (px < tx + 3.0) \
        & (py + _TU_PH > ty) & (py < ty + 3.0)
    treas_live = s.treas_live & ~grabs
    n_grab = grabs.sum().astype(jnp.int32)
    reward = reward + n_grab.astype(jnp.float32) * 20.0
    score = score + n_grab * 20

    died = touched
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    cleared = ~died & ~treas_live.any()
    level = s.level + cleared.astype(jnp.int32)
    treas_live = jnp.where(cleared, jnp.ones_like(treas_live), treas_live)

    re = _tu_respawn_fields()
    px = jnp.where(died, re["px"], px)
    py = jnp.where(died, re["py"], py)
    facing = jnp.where(died, re["facing"], facing)
    shot_live = jnp.where(died, re["shot_live"], shot_live)
    cre_live = jnp.where(died, re["cre_live"], cre_live)
    spawn_clock = jnp.where(died, re["spawn_clock"], spawn_clock)

    out = TutankhamCore(
        px=px, py=py, facing=facing, shot_live=shot_live, shot_x=shot_x,
        shot_y=shot_y, shot_vx=shot_vx, cre_live=cre_live, cre_x=cre_x,
        cre_y=cre_y, treas_live=treas_live, spawn_clock=spawn_clock,
        level=level, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _tu_render(s: TutankhamCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.where(jnp.asarray(_TU_WALLS), jnp.uint8(90), jnp.uint8(0))
    for t in range(_TU_TREAS):
        m = _rect_mask(y, x, float(_TU_TX[t]), float(_TU_ROW_Y[_TU_TROW[t]] + 1),
                       3.0, 3.0) & s.treas_live[t]
        f = jnp.where(m, jnp.uint8(210), f)
    for c in range(_TU_CRE):
        m = _rect_mask(y, x, s.cre_x[c], s.cre_y[c], 4.0, 4.0) & s.cre_live[c]
        f = jnp.where(m, jnp.uint8(170), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _TU_PW, _TU_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 5, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _TU_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


TUTANKHAM = dict(
    reset=_tu_reset,
    act=_tu_act,
    render=_tu_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=8,
    minimal_to_full=np.array([0, 2, 3, 4, 5, 11, 12, 1], np.int32),
)


# ---------------------------------------------------------------------------
# Venture (csrc/envs/venture.cc)
# ---------------------------------------------------------------------------

_VN_ROOMS = 4
_VN_RX = np.array([6.0, 48.0, 6.0, 48.0], np.float32)
_VN_RY = np.array([6.0, 6.0, 48.0, 48.0], np.float32)
_VN_RW, _VN_RH = 30.0, 28.0
_VN_HALL = 4  # 2 active at level 0, +1 per level (venture.cc)
_VN_HW = _VN_HH = 8.0
_VN_GOB = 2
_VN_GW = _VN_GH = 5.0
_VN_PW = _VN_PH = 3.0
_VN_WALK = 1.0
_VN_SHOT_V = 2.5
_VN_LIVES = 3


def _vn_wall_mask() -> np.ndarray:
    """Wall-pixel mask: 2-px room bands minus the hall-facing door gap."""
    w = np.zeros((SCREEN, SCREEN), bool)
    for r in range(_VN_ROOMS):
        x0, y0 = int(_VN_RX[r]), int(_VN_RY[r])
        x1, y1 = x0 + int(_VN_RW), y0 + int(_VN_RH)
        w[y0:y1, x0:x1] = True
        w[y0 + 2:y1 - 2, x0 + 2:x1 - 2] = False
        door_x0 = x1 - 2 if r % 2 == 0 else x0
        dm0 = y0 + int(_VN_RH // 2) - 3
        w[dm0:dm0 + 6, door_x0:door_x0 + 2] = False
    return w


_VN_WALLS = _vn_wall_mask()
_VN_WALLS_PAD = _pad_mask(_VN_WALLS)


@flax.struct.dataclass
class VentureCore:
    px: jax.Array
    py: jax.Array
    face_dx: jax.Array
    face_dy: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    hm_x: jax.Array      # [2]
    hm_y: jax.Array
    hm_vx: jax.Array
    hm_vy: jax.Array
    gob_live: jax.Array  # [8]
    gob_x: jax.Array
    gob_y: jax.Array
    gob_dir: jax.Array
    room_done: jax.Array
    last_room: jax.Array      # -1 = hall (venture.cc anti-camping intruder)
    room_timer: jax.Array
    intruder_live: jax.Array
    ix: jax.Array
    iy: jax.Array
    level: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _vn_level_fields():
    gx, gy, gd = [], [], []
    for r in range(_VN_ROOMS):
        for g in range(_VN_GOB):
            gx.append(_VN_RX[r] + 4.0 + g * 14.0)
            gy.append(_VN_RY[r] + 5.0 + g * 12.0)
            gd.append(1.0 if g % 2 == 0 else -1.0)
    return dict(
        room_done=jnp.zeros(_VN_ROOMS, bool),
        gob_live=jnp.ones(_VN_ROOMS * _VN_GOB, bool),
        gob_x=jnp.asarray(np.array(gx, np.float32)),
        gob_y=jnp.asarray(np.array(gy, np.float32)),
        gob_dir=jnp.asarray(np.array(gd, np.float32)),
        hm_x=jnp.asarray(np.array([38.0, 38.0, 2.0, 74.0], np.float32)),
        hm_y=jnp.asarray(np.array([2.0, 74.0, 38.0, 38.0], np.float32)),
        hm_vx=jnp.asarray(np.array([1.0, -1.0, 1.0, -1.0], np.float32)),
        hm_vy=jnp.asarray(np.array([1.0, -1.0, -1.0, 1.0], np.float32)),
    )


def _vn_reset(key):
    del key  # fully deterministic (venture.cc reset_game)
    return VentureCore(
        px=jnp.float32(41.0), py=jnp.float32(41.0),
        face_dx=jnp.float32(0.0), face_dy=jnp.float32(-1.0),
        shot_live=jnp.bool_(False), shot_x=jnp.float32(0.0),
        shot_y=jnp.float32(0.0), shot_vx=jnp.float32(0.0),
        shot_vy=jnp.float32(0.0), level=jnp.int32(0),
        last_room=jnp.int32(-1), room_timer=jnp.int32(0),
        intruder_live=jnp.bool_(False), ix=jnp.float32(0.0), iy=jnp.float32(0.0),
        lives=jnp.int32(_VN_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_vn_level_fields(),
    )


def _vn_in_any_room(x, y):
    rx, ry = jnp.asarray(_VN_RX), jnp.asarray(_VN_RY)
    return (
        (x >= rx + 2.0) & (x + _VN_PW <= rx + _VN_RW - 2.0)
        & (y >= ry + 2.0) & (y + _VN_PH <= ry + _VN_RH - 2.0)
    ).any()


def _vn_act(s: VentureCore, dx, dy, fire, key):
    del key  # fully deterministic
    live = ~s.over
    hspeed = 0.35 + 0.25 * s.level.astype(jnp.float32)
    gspeed = 0.5 + 0.3 * s.level.astype(jnp.float32)
    walls = jnp.asarray(_VN_WALLS)
    walls_pad = jnp.asarray(_VN_WALLS_PAD)

    nx = s.px + dx.astype(jnp.float32) * _VN_WALK
    px = jnp.where(_box_hits(walls_pad, nx, s.py, 3, 3), s.px, nx)
    ny = s.py + dy.astype(jnp.float32) * _VN_WALK
    py = jnp.where(_box_hits(walls_pad, px, ny, 3, 3), s.py, ny)
    px = jnp.clip(px, 0.0, 84.0 - _VN_PW)
    py = jnp.clip(py, 0.0, 84.0 - _VN_PH)
    moved = (dx != 0) | (dy != 0)
    face_dx = jnp.where(moved, dx.astype(jnp.float32), s.face_dx)
    face_dy = jnp.where(moved, dy.astype(jnp.float32), s.face_dy)

    inside = _vn_in_any_room(px, py)
    fires = (fire > 0) & ~s.shot_live & inside
    n = jnp.abs(face_dx) + jnp.abs(face_dy)
    n = jnp.where(n > 0, n, 1.0)
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _VN_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + _VN_PH / 2.0, s.shot_y)
    shot_vx = jnp.where(fires, face_dx / n * _VN_SHOT_V, s.shot_vx)
    shot_vy = jnp.where(fires, face_dy / n * _VN_SHOT_V, s.shot_vy)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_live = shot_live & ~(
        (shot_x < 0) | (shot_x >= 84) | (shot_y < 0) | (shot_y >= 84)
        | _pixel_hit(walls, shot_x, shot_y)
    )

    # 2 hallmonsters at level 0, reinforcements +1 per level (venture.cc).
    hm_active = jnp.arange(_VN_HALL) < jnp.minimum(2 + s.level, _VN_HALL)
    hm_x = jnp.where(hm_active, s.hm_x + s.hm_vx * hspeed, s.hm_x)
    hm_y = jnp.where(hm_active, s.hm_y + s.hm_vy * hspeed, s.hm_y)
    hm_vx = jnp.where(hm_active & ((hm_x < 0.0) | (hm_x + _VN_HW > 84.0)),
                      -s.hm_vx, s.hm_vx)
    hm_vy = jnp.where(hm_active & ((hm_y < 0.0) | (hm_y + _VN_HH > 84.0)),
                      -s.hm_vy, s.hm_vy)
    stalked = ~inside & (
        hm_active
        & (px + _VN_PW > hm_x) & (px < hm_x + _VN_HW)
        & (py + _VN_PH > hm_y) & (py < hm_y + _VN_HH)
    ).any()

    room_of_gob = jnp.repeat(jnp.arange(_VN_ROOMS), _VN_GOB)
    active = s.gob_live & ~s.room_done[room_of_gob]
    gob_x = jnp.where(active, s.gob_x + s.gob_dir * gspeed, s.gob_x)
    lo = jnp.asarray(_VN_RX)[room_of_gob] + 3.0
    hi = jnp.asarray(_VN_RX)[room_of_gob] + _VN_RW - 3.0 - _VN_GW
    gob_dir = jnp.where(active & (gob_x < lo), 1.0,
                        jnp.where(active & (gob_x > hi), -1.0, s.gob_dir))
    gob_x = jnp.clip(gob_x, lo, hi)
    shot_hits = (
        shot_live & active
        & (shot_x >= gob_x) & (shot_x < gob_x + _VN_GW)
        & (shot_y >= s.gob_y) & (shot_y < s.gob_y + _VN_GH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    gob_live = s.gob_live & ~kill
    active = active & ~kill
    gobbed = ~stalked & (
        active
        & (px + _VN_PW > gob_x) & (px < gob_x + _VN_GW)
        & (py + _VN_PH > s.gob_y) & (py < s.gob_y + _VN_GH)
    ).any()

    tx = jnp.asarray(_VN_RX) + _VN_RW / 2.0 - 2.0
    ty = jnp.asarray(_VN_RY) + _VN_RH / 2.0 - 2.0
    grabs = ~stalked & ~gobbed & ~s.room_done \
        & (px + _VN_PW > tx) & (px < tx + 4.0) \
        & (py + _VN_PH > ty) & (py < ty + 4.0)
    room_done = s.room_done | grabs
    n_grab = grabs.sum().astype(jnp.int32)
    reward = n_grab.astype(jnp.float32) * 200.0
    score = s.score + n_grab * 200

    # Hallmonster intrusion (venture.cc round-5 anti-camping rule): linger
    # past the dwell budget and an invincible hallmonster enters through the
    # door, chasing until contact or until the player leaves the room.
    rx, ry = jnp.asarray(_VN_RX), jnp.asarray(_VN_RY)
    in_r = (
        (px >= rx + 2.0) & (px + _VN_PW <= rx + _VN_RW - 2.0)
        & (py >= ry + 2.0) & (py + _VN_PH <= ry + _VN_RH - 2.0)
    )
    cur = jnp.where(in_r.any(), jnp.argmax(in_r).astype(jnp.int32), jnp.int32(-1))
    changed = cur != s.last_room
    room_timer = jnp.where(changed, 0, s.room_timer)
    intr_live = s.intruder_live & ~changed
    inroom = cur >= 0
    room_timer = jnp.where(inroom, room_timer + 1, room_timer)
    limit = jnp.maximum(jnp.int32(40), 150 - 12 * s.level)
    spawn = inroom & ~intr_live & (room_timer >= limit)
    curc = jnp.maximum(cur, 0)
    door_ix = jnp.where(curc % 2 == 0, rx[curc] + _VN_RW - 2.0 - _VN_HW,
                        rx[curc] + 2.0)
    ix = jnp.where(spawn, door_ix, s.ix)
    iy = jnp.where(spawn, ry[curc] + _VN_RH / 2.0 - _VN_HH / 2.0, s.iy)
    intr_live = intr_live | spawn
    chase = intr_live & inroom
    ispeed = hspeed + 0.2
    ix = jnp.where(chase, ix + jnp.sign(px - ix) * ispeed, ix)
    iy = jnp.where(chase, iy + jnp.sign(py - iy) * ispeed, iy)
    intruded = ~stalked & ~gobbed & chase & (
        (px + _VN_PW > ix) & (px < ix + _VN_HW)
        & (py + _VN_PH > iy) & (py < iy + _VN_HH)
    )

    died = stalked | gobbed | intruded
    last_room = jnp.where(died, jnp.int32(-1), cur)
    room_timer = jnp.where(died, 0, room_timer)
    intr_live = intr_live & ~died
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    cleared = ~died & room_done.all()
    level = s.level + cleared.astype(jnp.int32)

    lf = _vn_level_fields()
    room_done = jnp.where(cleared, lf["room_done"], room_done)
    gob_live = jnp.where(cleared, lf["gob_live"], gob_live)
    gob_x = jnp.where(cleared, lf["gob_x"], gob_x)
    gob_y = jnp.where(cleared, lf["gob_y"], s.gob_y)
    gob_dir = jnp.where(cleared, lf["gob_dir"], gob_dir)
    hm_x = jnp.where(cleared, lf["hm_x"], hm_x)
    hm_y = jnp.where(cleared, lf["hm_y"], hm_y)
    hm_vx = jnp.where(cleared, lf["hm_vx"], hm_vx)
    hm_vy = jnp.where(cleared, lf["hm_vy"], hm_vy)
    px = jnp.where(died | cleared, 41.0, px)
    py = jnp.where(died | cleared, 41.0, py)
    face_dx = jnp.where(died | cleared, 0.0, face_dx)
    face_dy = jnp.where(died | cleared, -1.0, face_dy)
    shot_live = jnp.where(died | cleared, False, shot_live)

    out = VentureCore(
        px=px, py=py, face_dx=face_dx, face_dy=face_dy, shot_live=shot_live,
        shot_x=shot_x, shot_y=shot_y, shot_vx=shot_vx, shot_vy=shot_vy,
        hm_x=hm_x, hm_y=hm_y, hm_vx=hm_vx, hm_vy=hm_vy, gob_live=gob_live,
        gob_x=gob_x, gob_y=gob_y, gob_dir=gob_dir, room_done=room_done,
        last_room=last_room, room_timer=room_timer, intruder_live=intr_live,
        ix=ix, iy=iy,
        level=level, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _vn_render(s: VentureCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    # Static: walls 90 over background 0, inner floor 20.
    inner = np.zeros((SCREEN, SCREEN), bool)
    for r in range(_VN_ROOMS):
        x0, y0 = int(_VN_RX[r]), int(_VN_RY[r])
        inner[y0 + 2:y0 + int(_VN_RH) - 2, x0 + 2:x0 + int(_VN_RW) - 2] = True
        door_x0 = x0 + int(_VN_RW) - 2 if r % 2 == 0 else x0
        dm0 = y0 + int(_VN_RH // 2) - 3
        inner[dm0:dm0 + 6, door_x0:door_x0 + 2] = True
    f = jnp.where(jnp.asarray(_VN_WALLS), jnp.uint8(90), jnp.uint8(0))
    f = jnp.where(jnp.asarray(inner), jnp.uint8(20), f)
    room_of_gob = np.repeat(np.arange(_VN_ROOMS), _VN_GOB)
    for r in range(_VN_ROOMS):
        tm = _rect_mask(y, x, float(_VN_RX[r] + _VN_RW / 2 - 2),
                        float(_VN_RY[r] + _VN_RH / 2 - 2), 4.0, 4.0) \
            & ~s.room_done[r]
        f = jnp.where(tm, jnp.uint8(230), f)
    for i in range(_VN_ROOMS * _VN_GOB):
        gm = _rect_mask(y, x, s.gob_x[i], s.gob_y[i], _VN_GW, _VN_GH) \
            & s.gob_live[i] & ~s.room_done[room_of_gob[i]]
        f = jnp.where(gm, jnp.uint8(150), f)
    for h in range(_VN_HALL):
        hm = _rect_mask(y, x, s.hm_x[h], s.hm_y[h], _VN_HW, _VN_HH) \
            & (h < 2 + jnp.minimum(s.level, 2))
        f = jnp.where(hm, jnp.uint8(180), f)
    im = _rect_mask(y, x, s.ix, s.iy, _VN_HW, _VN_HH) & s.intruder_live
    f = jnp.where(im, jnp.uint8(180), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _VN_PW, _VN_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 200, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 44) & (x < 44 + 5 * jnp.minimum(s.lives, _VN_LIVES)) \
        & ((x - 44) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


VENTURE = dict(
    reset=_vn_reset,
    act=_vn_act,
    render=_vn_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Ice Hockey (csrc/envs/ice_hockey.cc)
# ---------------------------------------------------------------------------

_IH_L, _IH_R, _IH_T, _IH_B = 6.0, 78.0, 10.0, 74.0
_IH_GL, _IH_GR = 34.0, 50.0
_IH_SK = 5.0
_IH_PK = 2.0
_IH_PS = 1.1
_IH_AS = 0.9
_IH_SHOT = 2.2
_IH_FR = 0.985
_IH_REACH = 4.0
_IH_FRAMES = 12000
_IH_HOLD = 30


# Goalie + faceoff shot delay (ice_hockey.cc round-5 calibration).
_IH_GW, _IH_GH, _IH_GSPD = 5.0, 3.0, 0.7
_IH_COOL = 30


@flax.struct.dataclass
class IceHockeyCore:
    px: jax.Array
    py: jax.Array
    ax: jax.Array
    ay: jax.Array
    puck_x: jax.Array
    puck_y: jax.Array
    puck_vx: jax.Array
    puck_vy: jax.Array
    ai_hold: jax.Array
    gx: jax.Array
    shot_cool: jax.Array
    score_us: jax.Array
    score_them: jax.Array
    frame: jax.Array
    over: jax.Array


def _ih_faceoff_fields():
    return dict(
        px=jnp.float32(39.0), py=jnp.float32(58.0),
        ax=jnp.float32(39.0), ay=jnp.float32(22.0),
        puck_x=jnp.float32(41.0), puck_y=jnp.float32(41.0),
        puck_vx=jnp.float32(0.0), puck_vy=jnp.float32(0.0),
        ai_hold=jnp.int32(0),
        gx=jnp.float32((_IH_GL + _IH_GR) / 2.0 - _IH_GW / 2.0),
        shot_cool=jnp.int32(_IH_COOL),
    )


def _ih_reset(key):
    del key  # fully deterministic (ice_hockey.cc reset_game)
    return IceHockeyCore(
        score_us=jnp.int32(0), score_them=jnp.int32(0), frame=jnp.int32(0),
        over=jnp.bool_(False), **_ih_faceoff_fields(),
    )


def _ih_clamp(x, y):
    return (
        jnp.clip(x, _IH_L + 1.0, _IH_R - 1.0 - _IH_SK),
        jnp.clip(y, _IH_T + 1.0, _IH_B - 1.0 - _IH_SK),
    )


def _ih_act(s: IceHockeyCore, dx, dy, fire, key):
    live = ~s.over
    frame = s.frame + 1

    px, py = _ih_clamp(s.px + dx.astype(jnp.float32) * _IH_PS,
                       s.py + dy.astype(jnp.float32) * _IH_PS)
    tx = s.puck_x - _IH_SK / 2.0
    ty = s.puck_y - _IH_SK / 2.0
    adx, ady = tx - s.ax, ty - s.ay
    an = jnp.sqrt(adx * adx + ady * ady) + 1e-3
    ax, ay = _ih_clamp(s.ax + adx / an * _IH_AS, s.ay + ady / an * _IH_AS)
    # The goalie shadows the puck along the top mouth (ice_hockey.cc).
    shot_cool = jnp.maximum(s.shot_cool - 1, 0)
    want = s.puck_x + _IH_PK / 2.0 - _IH_GW / 2.0
    gxp = jnp.clip(s.gx + jnp.clip(want - s.gx, -_IH_GSPD, _IH_GSPD),
                   _IH_GL, _IH_GR - _IH_GW)

    def d2(cx, cy):
        ddx = s.puck_x + _IH_PK / 2.0 - cx
        ddy = s.puck_y + _IH_PK / 2.0 - cy
        return ddx * ddx + ddy * ddy

    # Possession only of a slow puck, so shots escape the shooter's stick
    # (ice_hockey.cc).
    slow = s.puck_vx ** 2 + s.puck_vy ** 2 < 1.0
    pd = d2(px + _IH_SK / 2.0, py + _IH_SK / 2.0)
    ad = d2(ax + _IH_SK / 2.0, ay + _IH_SK / 2.0)
    p_has = slow & (pd <= _IH_REACH ** 2) & (pd <= ad)
    a_has = slow & ~p_has & (ad <= _IH_REACH ** 2)
    loose = ~p_has & ~a_has

    # Player possession.
    shoots = p_has & (fire > 0) & (shot_cool == 0)
    # Aimable shot: LEFT/RIGHT+FIRE pulls the target toward a post
    # (ice_hockey.cc).
    gx = (_IH_GL + _IH_GR) / 2.0 + 6.0 * dx.astype(jnp.float32)
    sdx = gx - (px + _IH_SK / 2.0)
    sdy = _IH_T - (py - 1.5)
    sm = jnp.sqrt(sdx * sdx + sdy * sdy) + 1e-3
    # AI possession (the wind-up counter persists through loose-puck play,
    # resetting only when the player takes the puck — ice_hockey.cc).
    ai_hold = jnp.where(a_has, s.ai_hold + 1, jnp.where(p_has, 0, s.ai_hold))
    ai_shoots = a_has & (ai_hold >= _IH_HOLD) & (shot_cool == 0)
    ai_hold = jnp.where(ai_shoots, 0, ai_hold)
    jitter = (jax.random.uniform(key) - 0.5) * 10.0
    agx = gx + jitter
    adx2 = agx - (ax + _IH_SK / 2.0)
    ady2 = _IH_B - (ay + _IH_SK + 0.5)
    am = jnp.sqrt(adx2 * adx2 + ady2 * ady2) + 1e-3

    puck_x = jnp.where(p_has, px + _IH_SK / 2.0,
                       jnp.where(a_has, ax + _IH_SK / 2.0, s.puck_x))
    puck_y = jnp.where(p_has, py - 1.5,
                       jnp.where(a_has, ay + _IH_SK + 0.5, s.puck_y))
    puck_vx = jnp.where(shoots, sdx / sm * _IH_SHOT,
                        jnp.where(ai_shoots, adx2 / am * _IH_SHOT,
                                  jnp.where(loose, s.puck_vx, 0.0)))
    puck_vy = jnp.where(shoots, sdy / sm * _IH_SHOT,
                        jnp.where(ai_shoots, ady2 / am * _IH_SHOT,
                                  jnp.where(loose, s.puck_vy, 0.0)))

    # Loose-puck physics; a freshly-fired shot also moves this frame.
    fired = shoots | ai_shoots
    puck_x = jnp.where(loose | fired, puck_x + puck_vx, puck_x)
    puck_y = jnp.where(loose | fired, puck_y + puck_vy, puck_y)
    puck_vx = jnp.where(loose, puck_vx * _IH_FR, puck_vx)
    puck_vy = jnp.where(loose, puck_vy * _IH_FR, puck_vy)
    puck_vx = jnp.where(
        loose & ((puck_x < _IH_L) | (puck_x + _IH_PK > _IH_R)), -puck_vx, puck_vx
    )
    in_mouth = (puck_x >= _IH_GL) & (puck_x + _IH_PK <= _IH_GR)
    puck_vy = jnp.where(
        loose & ~in_mouth & ((puck_y < _IH_T) | (puck_y + _IH_PK > _IH_B)),
        -puck_vy, puck_vy,
    )
    puck_x = jnp.clip(puck_x, _IH_L, _IH_R - _IH_PK)
    # The goalie blocks upward shots crossing its crease box.
    blocked = (
        loose & (puck_vy < 0.0)
        & (puck_y <= _IH_T + 2.0) & (puck_y + _IH_PK >= _IH_T - 2.0)
        & (puck_x + _IH_PK > gxp) & (puck_x < gxp + _IH_GW)
    )
    puck_vy = jnp.where(blocked, -puck_vy * 0.8, puck_vy)
    puck_y = jnp.where(blocked, _IH_T + 2.5, puck_y)
    we_score = loose & in_mouth & (puck_y < _IH_T - 2.0)
    they_score = loose & ~we_score & in_mouth & (puck_y + _IH_PK > _IH_B + 2.0)
    reward = jnp.where(we_score, 1.0, 0.0) - jnp.where(they_score, 1.0, 0.0)
    score_us = s.score_us + we_score.astype(jnp.int32)
    score_them = s.score_them + they_score.astype(jnp.int32)

    goal = we_score | they_score
    fo = _ih_faceoff_fields()
    px = jnp.where(goal, fo["px"], px)
    py = jnp.where(goal, fo["py"], py)
    ax = jnp.where(goal, fo["ax"], ax)
    ay = jnp.where(goal, fo["ay"], ay)
    puck_x = jnp.where(goal, fo["puck_x"], puck_x)
    puck_y = jnp.where(goal, fo["puck_y"], puck_y)
    puck_vx = jnp.where(goal, fo["puck_vx"], puck_vx)
    puck_vy = jnp.where(goal, fo["puck_vy"], puck_vy)
    ai_hold = jnp.where(goal, fo["ai_hold"], ai_hold)
    gxp = jnp.where(goal, fo["gx"], gxp)
    shot_cool = jnp.where(goal, fo["shot_cool"], shot_cool)

    over = s.over | (frame >= _IH_FRAMES)
    out = IceHockeyCore(
        px=px, py=py, ax=ax, ay=ay, puck_x=puck_x, puck_y=puck_y,
        puck_vx=puck_vx, puck_vy=puck_vy, ai_hold=ai_hold,
        gx=gxp, shot_cool=shot_cool,
        score_us=score_us, score_them=score_them, frame=frame, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _ih_render(s: IceHockeyCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    goal_cols = (x >= _IH_GL) & (x < _IH_GR)
    boards = (
        ((y == int(_IH_T)) | (y == int(_IH_B)))
        & (x >= int(_IH_L)) & (x < int(_IH_R)) & ~goal_cols
    ) | (
        ((x == int(_IH_L)) | (x == int(_IH_R)))
        & (y >= int(_IH_T)) & (y < int(_IH_B))
    )
    f = jnp.where(boards, jnp.uint8(100), f)
    mouths = goal_cols & ((y == int(_IH_T) - 2) | (y == int(_IH_B) + 2))
    f = jnp.where(mouths, jnp.uint8(60), f)
    f = jnp.where(_rect_mask(y, x, s.ax, s.ay, _IH_SK, _IH_SK), jnp.uint8(150), f)
    f = jnp.where(_rect_mask(y, x, s.gx, _IH_T - 1.0, _IH_GW, _IH_GH),
                  jnp.uint8(170), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _IH_SK, _IH_SK), jnp.uint8(255), f)
    f = jnp.where(_rect_mask(y, x, s.puck_x, s.puck_y, _IH_PK, _IH_PK),
                  jnp.uint8(220), f)
    ours = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score_us, 20))
    f = jnp.where(ours, jnp.uint8(200), f)
    theirs = (y == 1) & (x <= 81) & ((81 - x) % 2 == 0) \
        & ((81 - x) // 2 < jnp.minimum(s.score_them, 20))
    f = jnp.where(theirs, jnp.uint8(140), f)
    return f


ICE_HOCKEY = dict(
    reset=_ih_reset,
    act=_ih_act,
    render=_ih_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Battle Zone (csrc/envs/battlezone.cc)
# ---------------------------------------------------------------------------

_BZN_HX = np.array([
    0.0, 0.3826834, 0.7071068, 0.9238795, 1.0,
    0.9238795, 0.7071068, 0.3826834, 0.0, -0.3826834,
    -0.7071068, -0.9238795, -1.0, -0.9238795, -0.7071068, -0.3826834,
], np.float32)
_BZN_HY = np.array([
    -1.0, -0.9238795, -0.7071068, -0.3826834, 0.0,
    0.3826834, 0.7071068, 0.9238795, 1.0, 0.9238795,
    0.7071068, 0.3826834, 0.0, -0.3826834, -0.7071068, -0.9238795,
], np.float32)
_BZN_EN = 2
_BZN_TANK = 6.0
_BZN_DRIVE = 0.8
_BZN_ES = 0.4
_BZN_ROT = 3
_BZN_SHOT = 2.5
_BZN_ESHOT = 1.8
_BZN_EFIRE = 140
_BZN_SPAWN = 300
_BZN_PYR = 3
_BZN_PX = np.array([16.0, 60.0, 38.0], np.float32)
_BZN_PY = np.array([20.0, 28.0, 60.0], np.float32)
_BZN_PW = _BZN_PH = 8.0
_BZN_LIVES = 3


def _bzn_hits_pyr(fx, fy, size):
    return (
        (fx + size > jnp.asarray(_BZN_PX)) & (fx < jnp.asarray(_BZN_PX) + _BZN_PW)
        & (fy + size > jnp.asarray(_BZN_PY)) & (fy < jnp.asarray(_BZN_PY) + _BZN_PH)
    ).any()


@flax.struct.dataclass
class BattleZoneCore:
    px: jax.Array
    py: jax.Array
    heading: jax.Array
    rot_cd: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    enemy_live: jax.Array  # [2]
    ex: jax.Array
    ey: jax.Array
    efire: jax.Array
    eshot_live: jax.Array
    eshot_x: jax.Array
    eshot_y: jax.Array
    eshot_vx: jax.Array
    eshot_vy: jax.Array
    spawn_clock: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _bzn_respawn_fields():
    return dict(
        px=jnp.float32(39.0), py=jnp.float32(39.0), heading=jnp.int32(0),
        rot_cd=jnp.int32(_BZN_ROT - 1), shot_live=jnp.bool_(False),
        eshot_live=jnp.zeros(_BZN_EN, bool),
    )


def _bzn_reset(key):
    del key  # fully deterministic (battlezone.cc reset_game)
    return BattleZoneCore(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        shot_vx=jnp.float32(0.0), shot_vy=jnp.float32(0.0),
        enemy_live=jnp.zeros(_BZN_EN, bool),
        ex=jnp.zeros(_BZN_EN, jnp.float32), ey=jnp.zeros(_BZN_EN, jnp.float32),
        efire=jnp.zeros(_BZN_EN, jnp.int32),
        eshot_x=jnp.zeros(_BZN_EN, jnp.float32),
        eshot_y=jnp.zeros(_BZN_EN, jnp.float32),
        eshot_vx=jnp.zeros(_BZN_EN, jnp.float32),
        eshot_vy=jnp.zeros(_BZN_EN, jnp.float32),
        spawn_clock=jnp.int32(_BZN_SPAWN),  # first enemy arrives immediately
        lives=jnp.int32(_BZN_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_bzn_respawn_fields(),
    )


def _bzn_act(s: BattleZoneCore, dx, dy, fire, key):
    live = ~s.over
    k_edge, k_t = jax.random.split(key)
    hx = jnp.asarray(_BZN_HX)
    hy = jnp.asarray(_BZN_HY)

    turning = dx != 0
    rot_cd = jnp.where(turning, s.rot_cd + 1, _BZN_ROT - 1)
    turns = turning & (rot_cd >= _BZN_ROT)
    rot_cd = jnp.where(turns, 0, rot_cd)
    heading = jnp.where(
        turns, (s.heading + jnp.where(dx > 0, 1, 15)) % 16, s.heading
    )
    drive = jnp.where(dy < 0, _BZN_DRIVE, jnp.where(dy > 0, -_BZN_DRIVE, 0.0))
    npx = s.px + hx[heading] * drive
    npy = s.py + hy[heading] * drive
    can = ~_bzn_hits_pyr(npx, npy, _BZN_TANK) & (npx >= 2.0) \
        & (npx <= 82.0 - _BZN_TANK) & (npy >= 2.0) & (npy <= 82.0 - _BZN_TANK)
    px = jnp.where(can, npx, s.px)
    py = jnp.where(can, npy, s.py)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _BZN_TANK / 2.0 + hx[heading] * 4.0, s.shot_x)
    shot_y = jnp.where(fires, py + _BZN_TANK / 2.0 + hy[heading] * 4.0, s.shot_y)
    shot_vx = jnp.where(fires, hx[heading] * _BZN_SHOT, s.shot_vx)
    shot_vy = jnp.where(fires, hy[heading] * _BZN_SHOT, s.shot_vy)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_live = shot_live & ~(
        (shot_x < 0) | (shot_x >= 84) | (shot_y < 0) | (shot_y >= 84)
        | _bzn_hits_pyr(shot_x - 1.0, shot_y - 1.0, 2.0)
    )

    spawn_clock = s.spawn_clock + 1
    spawning = spawn_clock >= _BZN_SPAWN
    spawn_clock = jnp.where(spawning, 0, spawn_clock)
    slot = _first_true(~s.enemy_live) & spawning
    edge = jax.random.randint(k_edge, (), 0, 4)
    t = 6.0 + jax.random.randint(k_t, (), 0, 66).astype(jnp.float32)
    new_ex = jnp.where(edge < 2, t, jnp.where(edge == 2, 2.0, 76.0))
    new_ey = jnp.where(edge == 0, 2.0, jnp.where(edge == 1, 76.0, t))
    enemy_live = s.enemy_live | slot
    ex = jnp.where(slot, new_ex, s.ex)
    ey = jnp.where(slot, new_ey, s.ey)
    efire = jnp.where(slot, 0, s.efire)
    eshot_live = s.eshot_live & ~slot

    ddx, ddy = px - ex, py - ey
    n = jnp.sqrt(ddx * ddx + ddy * ddy) + 1e-3
    nex = ex + ddx / n * _BZN_ES
    ney = ey + ddy / n * _BZN_ES
    blocked = jax.vmap(lambda x_, y_: _bzn_hits_pyr(x_, y_, _BZN_TANK))(nex, ney)
    ex = jnp.where(enemy_live & ~blocked, nex, ex)
    ey = jnp.where(enemy_live & ~blocked, ney, ey)
    efire = jnp.where(enemy_live & ~s.eshot_live, efire + 1, efire)
    efires = enemy_live & ~s.eshot_live & (efire >= _BZN_EFIRE) & (n < 70.0)
    efire = jnp.where(efires, 0, efire)
    eshot_live = eshot_live | efires
    eshot_x = jnp.where(efires, ex + _BZN_TANK / 2.0, s.eshot_x)
    eshot_y = jnp.where(efires, ey + _BZN_TANK / 2.0, s.eshot_y)
    eshot_vx = jnp.where(efires, ddx / n * _BZN_ESHOT, s.eshot_vx)
    eshot_vy = jnp.where(efires, ddy / n * _BZN_ESHOT, s.eshot_vy)

    shot_hits = (
        shot_live & enemy_live
        & (shot_x >= ex) & (shot_x < ex + _BZN_TANK)
        & (shot_y >= ey) & (shot_y < ey + _BZN_TANK)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    enemy_live = enemy_live & ~kill
    reward = kill.any().astype(jnp.float32) * 1000.0
    score = s.score + jnp.where(kill.any(), 1000, 0)

    rammed = (
        enemy_live
        & (px + _BZN_TANK > ex) & (px < ex + _BZN_TANK)
        & (py + _BZN_TANK > ey) & (py < ey + _BZN_TANK)
    ).any()

    eshot_x = jnp.where(eshot_live, eshot_x + eshot_vx, eshot_x)
    eshot_y = jnp.where(eshot_live, eshot_y + eshot_vy, eshot_y)
    dead = (
        (eshot_x < 0) | (eshot_x >= 84) | (eshot_y < 0) | (eshot_y >= 84)
        | jax.vmap(lambda x_, y_: _bzn_hits_pyr(x_ - 1.0, y_ - 1.0, 2.0))(eshot_x, eshot_y)
    )
    eshot_live = eshot_live & ~dead
    shelled = ~rammed & (
        eshot_live
        & (px + _BZN_TANK > eshot_x - 1.0) & (px < eshot_x + 1.0)
        & (py + _BZN_TANK > eshot_y - 1.0) & (py < eshot_y + 1.0)
    ).any()

    died = rammed | shelled
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    re = _bzn_respawn_fields()
    px = jnp.where(died, re["px"], px)
    py = jnp.where(died, re["py"], py)
    heading = jnp.where(died, re["heading"], heading)
    rot_cd = jnp.where(died, re["rot_cd"], rot_cd)
    shot_live = jnp.where(died, re["shot_live"], shot_live)
    eshot_live = jnp.where(died, re["eshot_live"], eshot_live)

    out = BattleZoneCore(
        px=px, py=py, heading=heading, rot_cd=rot_cd, shot_live=shot_live,
        shot_x=shot_x, shot_y=shot_y, shot_vx=shot_vx, shot_vy=shot_vy,
        enemy_live=enemy_live, ex=ex, ey=ey, efire=efire,
        eshot_live=eshot_live, eshot_x=eshot_x, eshot_y=eshot_y,
        eshot_vx=eshot_vx, eshot_vy=eshot_vy, spawn_clock=spawn_clock,
        lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _bzn_render(s: BattleZoneCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    for p in range(_BZN_PYR):
        f = jnp.where(_rect_mask(y, x, float(_BZN_PX[p]), float(_BZN_PY[p]),
                                 _BZN_PW, _BZN_PH), jnp.uint8(110), f)
    for e in range(_BZN_EN):
        em = _rect_mask(y, x, s.ex[e], s.ey[e], _BZN_TANK, _BZN_TANK) \
            & s.enemy_live[e]
        f = jnp.where(em, jnp.uint8(170), f)
        sm = _rect_mask(y, x, s.eshot_x[e] - 1.0, s.eshot_y[e] - 1.0, 2.0, 2.0) \
            & s.eshot_live[e]
        f = jnp.where(sm, jnp.uint8(210), f)
    pm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(pm, jnp.uint8(220), f)
    hx = jnp.asarray(_BZN_HX)[s.heading]
    hy = jnp.asarray(_BZN_HY)[s.heading]
    hull = _rect_mask(y, x, s.px, s.py, _BZN_TANK, _BZN_TANK)
    barrel = _rect_mask(y, x, s.px + 2.0 + hx * 4.0, s.py + 2.0 + hy * 4.0,
                        2.0, 2.0)
    f = jnp.where(hull | barrel, jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 1000, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _BZN_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


BATTLEZONE = dict(
    reset=_bzn_reset,
    act=_bzn_act,
    render=_bzn_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
