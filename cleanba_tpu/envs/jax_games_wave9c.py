"""Pure-JAX twins of the wave-9c C++ engine games: Berzerk, WizardOfWor.

Rules mirror the C++ engine game-for-game (csrc/envs/berzerk.cc,
wizard_of_wor.cc) so the Anakin trainer covers the same task set as the
Sebulba host-env path; reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract
of jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

Wall collision uses an 8-px zero-padded wall mask and a dynamic_slice the
size of the entity box — identical semantics to the C++ pixel loop, which
treats out-of-screen pixels as empty.

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

__all__ = ["BERZERK", "WIZARD_OF_WOR"]

_PAD = 8


def _pad_mask(mask: np.ndarray) -> np.ndarray:
    out = np.zeros((SCREEN + 2 * _PAD, SCREEN + 2 * _PAD), bool)
    out[_PAD:_PAD + SCREEN, _PAD:_PAD + SCREEN] = mask
    return out


def _box_hits(padded_walls, fx, fy, w: int, h: int):
    """Any wall pixel under the [int(fx), int(fx)+w) x [int(fy), int(fy)+h)
    box (berzerk.cc box_hits_wall with out-of-screen pixels empty)."""
    x0 = fx.astype(jnp.int32) + _PAD
    y0 = fy.astype(jnp.int32) + _PAD
    win = jax.lax.dynamic_slice(padded_walls, (y0, x0), (h, w))
    return win.any()


def _pixel_hit(walls, fx, fy):
    """C++ single-pixel wall test with its bounds pre-check."""
    off = (fx < 0) | (fx >= SCREEN) | (fy < 0) | (fy >= SCREEN)
    xi = jnp.clip(fx.astype(jnp.int32), 0, SCREEN - 1)
    yi = jnp.clip(fy.astype(jnp.int32), 0, SCREEN - 1)
    return ~off & walls[yi, xi]


def _first_true(mask):
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


# ---------------------------------------------------------------------------
# Berzerk (csrc/envs/berzerk.cc)
# ---------------------------------------------------------------------------

_BZ_ROBOTS = 5
_BZ_RX0 = np.array([8.0, 70.0, 8.0, 70.0, 30.0], np.float32)
_BZ_RY0 = np.array([8.0, 8.0, 70.0, 70.0, 20.0], np.float32)
_BZ_RW, _BZ_RH = 4, 6
_BZ_RSPEED = 0.4
_BZ_PW, _BZ_PH = 4, 6
_BZ_WALK = 0.8
_BZ_SHOT_V = 2.5
_BZ_RSHOT_V = 1.5
_BZ_OTTO_FRAMES = 1200
_BZ_OTTO_SPEED = 0.6
_BZ_LIVES = 3
_BZ_SPAWN = (40.0, 72.0)


def _bz_build_walls(variant: int) -> np.ndarray:
    w = np.zeros((SCREEN, SCREEN), bool)
    w[0:2, :] = w[82:84, :] = True
    w[:, 0:2] = w[:, 82:84] = True
    w[0:2, 38:46] = w[82:84, 38:46] = False
    w[38:46, 0:2] = w[38:46, 82:84] = False
    v = variant & 3
    if v == 0:
        w[20:64, 20:22] = w[20:64, 62:64] = True
    elif v == 1:
        w[30:32, 10:74] = w[52:54, 10:74] = True
    elif v == 2:
        w[10:36, 41:43] = True
        w[48:66, 41:43] = True
    else:
        w[41:43, 10:34] = w[41:43, 50:74] = True
    return w


_BZ_WALLS = np.stack([_bz_build_walls(v) for v in range(4)])          # [4,84,84]
_BZ_WALLS_PAD = np.stack([_pad_mask(m) for m in _BZ_WALLS])


@flax.struct.dataclass
class BerzerkCore:
    px: jax.Array
    py: jax.Array
    face_dx: jax.Array
    face_dy: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    rx: jax.Array          # [5]
    ry: jax.Array
    robot_alive: jax.Array
    rshot_live: jax.Array
    rshot_x: jax.Array
    rshot_y: jax.Array
    rshot_vx: jax.Array
    rshot_vy: jax.Array
    otto_x: jax.Array
    otto_y: jax.Array
    frame: jax.Array
    room: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _bz_room_fields():
    return dict(
        px=jnp.float32(_BZ_SPAWN[0]), py=jnp.float32(_BZ_SPAWN[1]),
        face_dx=jnp.float32(0.0), face_dy=jnp.float32(-1.0),
        shot_live=jnp.bool_(False), frame=jnp.int32(0),
        otto_x=jnp.float32(2.0), otto_y=jnp.float32(2.0),
        rx=jnp.asarray(_BZ_RX0), ry=jnp.asarray(_BZ_RY0),
        robot_alive=jnp.ones(_BZ_ROBOTS, bool),
        rshot_live=jnp.zeros(_BZ_ROBOTS, bool),
    )


def _bz_reset(key):
    del key  # fully deterministic (berzerk.cc reset_game)
    return BerzerkCore(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        shot_vx=jnp.float32(0.0), shot_vy=jnp.float32(0.0),
        rshot_x=jnp.zeros(_BZ_ROBOTS, jnp.float32),
        rshot_y=jnp.zeros(_BZ_ROBOTS, jnp.float32),
        rshot_vx=jnp.zeros(_BZ_ROBOTS, jnp.float32),
        rshot_vy=jnp.zeros(_BZ_ROBOTS, jnp.float32),
        room=jnp.int32(0), lives=jnp.int32(_BZ_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False), **_bz_room_fields(),
    )


def _bz_act(s: BerzerkCore, dx, dy, fire, key):
    live = ~s.over
    walls = jnp.asarray(_BZ_WALLS)[s.room & 3]
    walls_pad = jnp.asarray(_BZ_WALLS_PAD)[s.room & 3]
    k_rfire = key
    frame = s.frame + 1

    px = s.px + dx.astype(jnp.float32) * _BZ_WALK
    py = s.py + dy.astype(jnp.float32) * _BZ_WALK
    moved = (dx != 0) | (dy != 0)
    face_dx = jnp.where(moved, dx.astype(jnp.float32), s.face_dx)
    face_dy = jnp.where(moved, dy.astype(jnp.float32), s.face_dy)

    # Exit through a gap (center crossing) -> next room, sweep bonus if clear.
    cx, cy = px + _BZ_PW / 2.0, py + _BZ_PH / 2.0
    exits = (cx < 2.0) | (cx > 82.0) | (cy < 2.0) | (cy > 82.0)
    swept = exits & ~s.robot_alive.any()
    reward = jnp.where(swept, 10.0 * _BZ_ROBOTS, 0.0)
    score = s.score + jnp.where(swept, 10 * _BZ_ROBOTS, 0)
    room = s.room + exits.astype(jnp.int32)

    # Electrified walls.
    zapped = ~exits & _box_hits(walls_pad, px, py, _BZ_PW, _BZ_PH)

    ok = ~exits & ~zapped
    # Player shot.
    fires = ok & (fire > 0) & ~s.shot_live
    n = jnp.abs(face_dx) + jnp.abs(face_dy)
    n = jnp.where(n > 0, n, 1.0)
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _BZ_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + _BZ_PH / 2.0, s.shot_y)
    shot_vx = jnp.where(fires, face_dx / n * _BZ_SHOT_V, s.shot_vx)
    shot_vy = jnp.where(fires, face_dy / n * _BZ_SHOT_V, s.shot_vy)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_live = shot_live & ~(
        (shot_x < 0) | (shot_x >= 84) | (shot_y < 0) | (shot_y >= 84)
        | _pixel_hit(walls, shot_x, shot_y)
    )

    # Robots step along the dominant axis every other frame; a wall is fatal.
    alive = s.robot_alive
    stepping = (frame % 2) == 0
    ddx, ddy = px - s.rx, py - s.ry
    horiz = jnp.abs(ddx) >= jnp.abs(ddy)
    step = _BZ_RSPEED * 2.0
    nrx = s.rx + jnp.where(horiz, jnp.sign(ddx) * step, 0.0)
    nry = s.ry + jnp.where(horiz, 0.0, jnp.sign(ddy) * step)
    into_wall = jax.vmap(
        lambda x_, y_: _box_hits(walls_pad, x_, y_, _BZ_RW, _BZ_RH)
    )(nrx, nry)
    walled = alive & stepping & into_wall
    rx = jnp.where(alive & stepping & ~into_wall, nrx, s.rx)
    ry = jnp.where(alive & stepping & ~into_wall, nry, s.ry)
    alive = alive & ~walled
    n_wall = walled.sum().astype(jnp.int32)

    # Robot fire (alive, aligned, coin flip).
    aligned = (jnp.abs(rx - px) < 3.0) | (jnp.abs(ry - py) < 3.0)
    rolls = jax.random.uniform(k_rfire, (_BZ_ROBOTS,))
    rfires = alive & ~s.rshot_live & aligned & (rolls < 0.01)
    rshot_live = s.rshot_live | rfires
    rddx, rddy = px - rx, py - ry
    rhoriz = jnp.abs(rddx) >= jnp.abs(rddy)
    rshot_x = jnp.where(rfires, rx + _BZ_RW / 2.0, s.rshot_x)
    rshot_y = jnp.where(rfires, ry + _BZ_RH / 2.0, s.rshot_y)
    rshot_vx = jnp.where(
        rfires, jnp.where(rhoriz, jnp.sign(rddx) * _BZ_RSHOT_V, 0.0), s.rshot_vx
    )
    rshot_vy = jnp.where(
        rfires, jnp.where(rhoriz, 0.0, jnp.sign(rddy) * _BZ_RSHOT_V), s.rshot_vy
    )

    # Player shot kills the first overlapped robot.
    shot_hits = (
        shot_live & alive
        & (shot_x >= rx) & (shot_x < rx + _BZ_RW)
        & (shot_y >= ry) & (shot_y < ry + _BZ_RH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    alive = alive & ~kill
    n_kill = kill.sum().astype(jnp.int32)
    pay = (n_wall + n_kill) * 50
    reward = reward + jnp.where(ok, pay.astype(jnp.float32), 0.0)
    score = score + jnp.where(ok, pay, 0)

    touched = ok & (
        alive
        & (px + _BZ_PW > rx) & (px < rx + _BZ_RW)
        & (py + _BZ_PH > ry) & (py < ry + _BZ_RH)
    ).any()

    # Robot shots fly.
    rshot_x = jnp.where(rshot_live, rshot_x + rshot_vx, rshot_x)
    rshot_y = jnp.where(rshot_live, rshot_y + rshot_vy, rshot_y)
    dead_shot = (
        (rshot_x < 0) | (rshot_x >= 84) | (rshot_y < 0) | (rshot_y >= 84)
        | jax.vmap(lambda x_, y_: _pixel_hit(walls, x_, y_))(rshot_x, rshot_y)
    )
    rshot_live = rshot_live & ~dead_shot
    shot_me = ok & ~touched & (
        rshot_live
        & (px + _BZ_PW > rshot_x - 1.0) & (px < rshot_x + 1.0)
        & (py + _BZ_PH > rshot_y - 1.0) & (py < rshot_y + 1.0)
    ).any()

    # Evil Otto.
    odx, ody = px - s.otto_x, py - s.otto_y
    on = jnp.abs(odx) + jnp.abs(ody)
    omove = (frame >= _BZ_OTTO_FRAMES) & (on > 0.1)
    otto_x = jnp.where(omove, s.otto_x + odx / jnp.maximum(on, 0.1) * _BZ_OTTO_SPEED, s.otto_x)
    otto_y = jnp.where(omove, s.otto_y + ody / jnp.maximum(on, 0.1) * _BZ_OTTO_SPEED, s.otto_y)
    otto_hit = ok & ~touched & ~shot_me & (frame >= _BZ_OTTO_FRAMES) & (
        (px + _BZ_PW > otto_x) & (px < otto_x + 4.0)
        & (py + _BZ_PH > otto_y) & (py < otto_y + 4.0)
    )

    died = zapped | touched | shot_me | otto_hit
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))

    # Death or exit re-enters a room (death re-arms the same one).
    reenter = died | exits
    rf = _bz_room_fields()
    out = BerzerkCore(
        px=jnp.where(reenter, rf["px"], px),
        py=jnp.where(reenter, rf["py"], py),
        face_dx=jnp.where(reenter, rf["face_dx"], face_dx),
        face_dy=jnp.where(reenter, rf["face_dy"], face_dy),
        shot_live=jnp.where(reenter, rf["shot_live"], shot_live),
        shot_x=shot_x, shot_y=shot_y, shot_vx=shot_vx, shot_vy=shot_vy,
        rx=jnp.where(reenter, rf["rx"], rx),
        ry=jnp.where(reenter, rf["ry"], ry),
        robot_alive=jnp.where(reenter, rf["robot_alive"], alive),
        rshot_live=jnp.where(reenter, rf["rshot_live"], rshot_live),
        rshot_x=rshot_x, rshot_y=rshot_y, rshot_vx=rshot_vx, rshot_vy=rshot_vy,
        otto_x=jnp.where(reenter, rf["otto_x"], otto_x),
        otto_y=jnp.where(reenter, rf["otto_y"], otto_y),
        frame=jnp.where(reenter, rf["frame"], frame),
        room=room, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _bz_render(s: BerzerkCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    walls = jnp.asarray(_BZ_WALLS)[s.room & 3]
    f = jnp.where(walls, jnp.uint8(110), jnp.uint8(0))
    for r in range(_BZ_ROBOTS):
        rm = _rect_mask(y, x, s.rx[r], s.ry[r], _BZ_RW, _BZ_RH) & s.robot_alive[r]
        f = jnp.where(rm, jnp.uint8(170), f)
        sm = _rect_mask(y, x, s.rshot_x[r] - 1.0, s.rshot_y[r] - 1.0, 2.0, 2.0) \
            & s.rshot_live[r]
        f = jnp.where(sm, jnp.uint8(210), f)
    pm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(pm, jnp.uint8(220), f)
    om = _rect_mask(y, x, s.otto_x, s.otto_y, 4.0, 4.0) & (s.frame >= _BZ_OTTO_FRAMES)
    f = jnp.where(om, jnp.uint8(240), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _BZ_PW, _BZ_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 50, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 83) & (x >= 36) & (x < 36 + 5 * jnp.minimum(s.lives, _BZ_LIVES)) \
        & ((x - 36) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


BERZERK = dict(
    reset=_bz_reset,
    act=_bz_act,
    render=_bz_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Wizard of Wor (csrc/envs/wizard_of_wor.cc)
# ---------------------------------------------------------------------------

_WW_MONSTERS = 6
_WW_MX0 = np.array([8.0, 38.0, 68.0, 18.0, 38.0, 62.0], np.float32)
_WW_MY0 = np.array([5.0, 5.0, 5.0, 45.0, 45.0, 45.0], np.float32)
_WW_MD0 = np.array([1, 3, 1, 3, 1, 3], np.int32)
_WW_MW = _WW_MH = 5
_WW_PW = _WW_PH = 5
_WW_WALK = 0.9
_WW_SHOT_V = 2.5
_WW_MSHOT_V = 2.0
_WW_LIVES = 3
_WW_SPAWN = (39.0, 74.0)
_WW_DX = np.array([0, 1, 0, -1], np.float32)
_WW_DY = np.array([-1, 0, 1, 0], np.float32)


def _ww_build_walls() -> np.ndarray:
    w = np.zeros((SCREEN, SCREEN), bool)
    w[0:2, :] = w[82:84, :] = True
    w[:, 0:2] = w[:, 82:84] = True
    w[12:32, 12:14] = w[12:32, 70:72] = True
    w[52:72, 12:14] = w[52:72, 70:72] = True
    w[22:24, 24:60] = w[60:62, 24:60] = True
    w[34:50, 30:32] = w[34:50, 52:54] = True
    w[40:42, 40:44] = True
    return w


_WW_WALLS = _ww_build_walls()
_WW_WALLS_PAD = _pad_mask(_WW_WALLS)


@flax.struct.dataclass
class WizardCore:
    px: jax.Array
    py: jax.Array
    face_dx: jax.Array
    face_dy: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    mx: jax.Array        # [6]
    my: jax.Array
    mdir: jax.Array
    mon_alive: jax.Array
    mshot_live: jax.Array
    mshot_x: jax.Array
    mshot_y: jax.Array
    mshot_vx: jax.Array
    mshot_vy: jax.Array
    frame: jax.Array
    dungeon: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _ww_reset(key):
    del key  # fully deterministic (wizard_of_wor.cc reset_game)
    return WizardCore(
        px=jnp.float32(_WW_SPAWN[0]), py=jnp.float32(_WW_SPAWN[1]),
        face_dx=jnp.float32(0.0), face_dy=jnp.float32(-1.0),
        shot_live=jnp.bool_(False), shot_x=jnp.float32(0.0),
        shot_y=jnp.float32(0.0), shot_vx=jnp.float32(0.0),
        shot_vy=jnp.float32(0.0),
        mx=jnp.asarray(_WW_MX0), my=jnp.asarray(_WW_MY0),
        mdir=jnp.asarray(_WW_MD0), mon_alive=jnp.ones(_WW_MONSTERS, bool),
        mshot_live=jnp.zeros(_WW_MONSTERS, bool),
        mshot_x=jnp.zeros(_WW_MONSTERS, jnp.float32),
        mshot_y=jnp.zeros(_WW_MONSTERS, jnp.float32),
        mshot_vx=jnp.zeros(_WW_MONSTERS, jnp.float32),
        mshot_vy=jnp.zeros(_WW_MONSTERS, jnp.float32),
        frame=jnp.int32(0), dungeon=jnp.int32(0),
        lives=jnp.int32(_WW_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _ww_act(s: WizardCore, dx, dy, fire, key):
    live = ~s.over
    walls = jnp.asarray(_WW_WALLS)
    walls_pad = jnp.asarray(_WW_WALLS_PAD)
    k_think, k_chase, k_rand, k_fire = jax.random.split(key, 4)
    frame = s.frame + 1
    mspeed = 0.5 + 0.1 * s.dungeon.astype(jnp.float32)

    # Player: per-axis moves, blocked by walls.
    nx = s.px + dx.astype(jnp.float32) * _WW_WALK
    px = jnp.where(_box_hits(walls_pad, nx, s.py, _WW_PW, _WW_PH), s.px, nx)
    ny = s.py + dy.astype(jnp.float32) * _WW_WALK
    py = jnp.where(_box_hits(walls_pad, px, ny, _WW_PW, _WW_PH), s.py, ny)
    moved = (dx != 0) | (dy != 0)
    face_dx = jnp.where(moved, dx.astype(jnp.float32), s.face_dx)
    face_dy = jnp.where(moved, dy.astype(jnp.float32), s.face_dy)

    fires = (fire > 0) & ~s.shot_live
    n = jnp.abs(face_dx) + jnp.abs(face_dy)
    n = jnp.where(n > 0, n, 1.0)
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _WW_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + _WW_PH / 2.0, s.shot_y)
    shot_vx = jnp.where(fires, face_dx / n * _WW_SHOT_V, s.shot_vx)
    shot_vy = jnp.where(fires, face_dy / n * _WW_SHOT_V, s.shot_vy)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_live = shot_live & ~(
        (shot_x < 0) | (shot_x >= 84) | (shot_y < 0) | (shot_y >= 84)
        | _pixel_hit(walls, shot_x, shot_y)
    )

    # Monsters roam: blocked or 2% per frame -> rethink heading (50% chase).
    alive = s.mon_alive
    dirs_dx = jnp.asarray(_WW_DX)
    dirs_dy = jnp.asarray(_WW_DY)
    step_x = s.mx + dirs_dx[s.mdir] * mspeed
    step_y = s.my + dirs_dy[s.mdir] * mspeed
    blocked = jax.vmap(
        lambda x_, y_: _box_hits(walls_pad, x_, y_, _WW_MW, _WW_MH)
    )(step_x, step_y)
    rethink = blocked | (jax.random.uniform(k_think, (_WW_MONSTERS,)) < 0.02)
    chase = jax.random.uniform(k_chase, (_WW_MONSTERS,)) < 0.5
    ddx, ddy = px - s.mx, py - s.my
    chase_dir = jnp.where(
        jnp.abs(ddx) >= jnp.abs(ddy),
        jnp.where(ddx > 0, 1, 3), jnp.where(ddy > 0, 2, 0),
    ).astype(jnp.int32)
    rand_dir = jax.random.randint(k_rand, (_WW_MONSTERS,), 0, 4)
    want = jnp.where(chase, chase_dir, rand_dir)
    # Try want, want+1, want+2, want+3; first unblocked wins (no move if all
    # four are blocked, matching the C++ fallback loop).
    best_dir = s.mdir
    best_x, best_y = s.mx, s.my
    found = jnp.zeros(_WW_MONSTERS, bool)
    for k in range(4):
        d = (want + k) & 3
        tx = s.mx + dirs_dx[d] * mspeed
        ty = s.my + dirs_dy[d] * mspeed
        ok_d = ~jax.vmap(
            lambda x_, y_: _box_hits(walls_pad, x_, y_, _WW_MW, _WW_MH)
        )(tx, ty)
        take = ~found & ok_d
        best_dir = jnp.where(take, d, best_dir)
        best_x = jnp.where(take, tx, best_x)
        best_y = jnp.where(take, ty, best_y)
        found = found | ok_d
    mdir = jnp.where(alive & rethink, best_dir, s.mdir)
    mx = jnp.where(alive, jnp.where(rethink, best_x, step_x), s.mx)
    my = jnp.where(alive, jnp.where(rethink, best_y, step_y), s.my)

    # Monster fire.
    aligned = (jnp.abs(mx - px) < 3.0) | (jnp.abs(my - py) < 3.0)
    mfires = (
        alive & ~s.mshot_live & aligned
        & (jax.random.uniform(k_fire, (_WW_MONSTERS,)) < 0.012)
    )
    mshot_live = s.mshot_live | mfires
    mddx, mddy = px - mx, py - my
    mhoriz = jnp.abs(mddx) >= jnp.abs(mddy)
    mshot_x = jnp.where(mfires, mx + _WW_MW / 2.0, s.mshot_x)
    mshot_y = jnp.where(mfires, my + _WW_MH / 2.0, s.mshot_y)
    mshot_vx = jnp.where(
        mfires, jnp.where(mhoriz, jnp.sign(mddx) * _WW_MSHOT_V, 0.0), s.mshot_vx
    )
    mshot_vy = jnp.where(
        mfires, jnp.where(mhoriz, 0.0, jnp.sign(mddy) * _WW_MSHOT_V), s.mshot_vy
    )

    shot_hits = (
        shot_live & alive
        & (shot_x >= mx) & (shot_x < mx + _WW_MW)
        & (shot_y >= my) & (shot_y < my + _WW_MH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    alive = alive & ~kill
    n_kill = kill.sum().astype(jnp.int32)
    reward = (n_kill * 100).astype(jnp.float32)
    score = s.score + n_kill * 100

    touched = (
        alive
        & (px + _WW_PW > mx) & (px < mx + _WW_MW)
        & (py + _WW_PH > my) & (py < my + _WW_MH)
    ).any()

    mshot_x = jnp.where(mshot_live, mshot_x + mshot_vx, mshot_x)
    mshot_y = jnp.where(mshot_live, mshot_y + mshot_vy, mshot_y)
    dead_shot = (
        (mshot_x < 0) | (mshot_x >= 84) | (mshot_y < 0) | (mshot_y >= 84)
        | jax.vmap(lambda x_, y_: _pixel_hit(walls, x_, y_))(mshot_x, mshot_y)
    )
    mshot_live = mshot_live & ~dead_shot
    shot_me = ~touched & (
        mshot_live
        & (px + _WW_PW > mshot_x - 1.0) & (px < mshot_x + 1.0)
        & (py + _WW_PH > mshot_y - 1.0) & (py < mshot_y + 1.0)
    ).any()

    died = touched | shot_me
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))

    cleared = ~died & ~alive.any()
    dungeon = s.dungeon + cleared.astype(jnp.int32)
    # start_dungeon on clear; respawn on death (monsters stay).
    alive = jnp.where(cleared, jnp.ones_like(alive), alive)
    mx = jnp.where(cleared, jnp.asarray(_WW_MX0), mx)
    my = jnp.where(cleared, jnp.asarray(_WW_MY0), my)
    mdir = jnp.where(cleared, jnp.asarray(_WW_MD0), mdir)
    frame = jnp.where(cleared, 0, frame)
    mshot_live = jnp.where(cleared | died, jnp.zeros_like(mshot_live), mshot_live)
    px = jnp.where(died, _WW_SPAWN[0], px)
    py = jnp.where(died, _WW_SPAWN[1], py)
    face_dx = jnp.where(died, 0.0, face_dx)
    face_dy = jnp.where(died, -1.0, face_dy)
    shot_live = jnp.where(died, False, shot_live)

    out = WizardCore(
        px=px, py=py, face_dx=face_dx, face_dy=face_dy, shot_live=shot_live,
        shot_x=shot_x, shot_y=shot_y, shot_vx=shot_vx, shot_vy=shot_vy,
        mx=mx, my=my, mdir=mdir, mon_alive=alive, mshot_live=mshot_live,
        mshot_x=mshot_x, mshot_y=mshot_y, mshot_vx=mshot_vx, mshot_vy=mshot_vy,
        frame=frame, dungeon=dungeon, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _ww_render(s: WizardCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.where(jnp.asarray(_WW_WALLS), jnp.uint8(110), jnp.uint8(0))
    for m in range(_WW_MONSTERS):
        visible = ((s.frame + m * 13) % 60) < 40
        mm = _rect_mask(y, x, s.mx[m], s.my[m], _WW_MW, _WW_MH) \
            & s.mon_alive[m] & visible
        f = jnp.where(mm, jnp.uint8(170), f)
        sm = _rect_mask(y, x, s.mshot_x[m] - 1.0, s.mshot_y[m] - 1.0, 2.0, 2.0) \
            & s.mshot_live[m]
        f = jnp.where(sm, jnp.uint8(210), f)
    pm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(pm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _WW_PW, _WW_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 83) & (x >= 36) & (x < 36 + 5 * jnp.minimum(s.lives, _WW_LIVES)) \
        & ((x - 36) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


WIZARD_OF_WOR = dict(
    reset=_ww_reset,
    act=_ww_act,
    render=_ww_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
