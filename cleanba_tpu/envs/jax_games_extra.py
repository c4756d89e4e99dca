"""Pure-JAX twins of the second wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/freeway.cc, boxing.cc,
seaquest.cc, qbert.cc) so the Anakin trainer covers the same task set as the
Sebulba host-env path; reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract of
jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

Simultaneity note: the C++ games early-return on a life loss (skipping the
remaining entity updates for that raw frame); the JAX twins gate those
updates with selects instead. Given the engines draw different RNG streams,
trajectories diverge anyway — rules, scoring, and rendering are what must
match, and do.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["FREEWAY", "BOXING", "SEAQUEST", "QBERT"]


# ---------------------------------------------------------------------------
# Freeway (csrc/envs/freeway.cc)
# ---------------------------------------------------------------------------

_FW_LANES = 10
_FW_ROAD_TOP = 10
_FW_LANE_H = 6
_FW_CAR_W, _FW_CAR_H = 8, 4
_FW_CHICKEN_X = 42.0
_FW_CHICKEN_W = _FW_CHICKEN_H = 4
_FW_START_Y = 76.0
_FW_GOAL_Y = 8.0
_FW_GAME_FRAMES = 2304  # ALE-equivalent crossing budget (freeway.cc r5 note)
_FW_CHICKEN_SPEED = 1.0
_FW_SPEED = np.array([0.6, 0.9, 1.2, 0.5, 0.8, 0.8, 0.5, 1.2, 0.9, 0.6], np.float32)
_FW_DIR = np.array([-1.0] * 5 + [1.0] * 5, np.float32)
_FW_LANE_Y = np.array([_FW_ROAD_TOP + l * _FW_LANE_H + 1 for l in range(_FW_LANES)], np.float32)
_FW_SHADE = np.array([130 + 10 * (l % 5) for l in range(_FW_LANES)], np.uint8)


@flax.struct.dataclass
class FreewayCore:
    car_x: jax.Array     # [10] f32
    chicken_y: jax.Array
    score: jax.Array
    frame: jax.Array
    over: jax.Array


def _fw_reset(key):
    del key  # fully deterministic (freeway.cc:41-47)
    return FreewayCore(
        car_x=jnp.asarray([(l * 37) % 84 for l in range(_FW_LANES)], jnp.float32),
        chicken_y=jnp.float32(_FW_START_Y),
        score=jnp.int32(0),
        frame=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _fw_act(s: FreewayCore, dx, dy, fire, key):
    del dx, fire, key
    live = ~s.over
    chicken_y = jnp.clip(
        s.chicken_y + dy.astype(jnp.float32) * _FW_CHICKEN_SPEED,
        _FW_GOAL_Y - 2, _FW_START_Y,
    )
    car_x = s.car_x + jnp.asarray(_FW_DIR) * jnp.asarray(_FW_SPEED)
    car_x = jnp.where(car_x < -_FW_CAR_W, car_x + 84.0 + _FW_CAR_W, car_x)
    car_x = jnp.where(car_x > 84.0, car_x - (84.0 + _FW_CAR_W), car_x)

    lane_y = jnp.asarray(_FW_LANE_Y)
    overlap = (
        (chicken_y + _FW_CHICKEN_H > lane_y) & (chicken_y < lane_y + _FW_CAR_H)
        & (_FW_CHICKEN_X + _FW_CHICKEN_W > car_x) & (_FW_CHICKEN_X < car_x + _FW_CAR_W)
    )
    hit = jnp.any(overlap)
    chicken_y = jnp.where(hit, jnp.minimum(chicken_y + 12.0, _FW_START_Y), chicken_y)

    crossed = chicken_y <= _FW_GOAL_Y
    reward = jnp.where(crossed, 1.0, 0.0)
    score = s.score + crossed.astype(jnp.int32)
    chicken_y = jnp.where(crossed, _FW_START_Y, chicken_y)

    frame = s.frame + 1
    over = s.over | (frame >= _FW_GAME_FRAMES)
    out = FreewayCore(car_x=car_x, chicken_y=chicken_y, score=score, frame=frame, over=over)
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _fw_render(s: FreewayCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    road_bot = _FW_ROAD_TOP + _FW_LANES * _FW_LANE_H
    f = jnp.where((y == 8) | (y == 9) | (y == road_bot) | (y == road_bot + 1),
                  jnp.uint8(100), f)
    # Dashed dividers at each interior lane boundary.
    divider_rows = np.zeros(SCREEN, bool)
    for l in range(1, _FW_LANES):
        divider_rows[_FW_ROAD_TOP + l * _FW_LANE_H] = True
    f = jnp.where(jnp.asarray(divider_rows)[:, None] & (x % 6 < 3), jnp.uint8(60), f)
    # Score ticks.
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    # Cars then the chicken (draw order = overwrite order, freeway.cc render).
    for l in range(_FW_LANES):
        m = _rect_mask(y, x, s.car_x[l], float(_FW_LANE_Y[l]), _FW_CAR_W, _FW_CAR_H)
        f = jnp.where(m, jnp.uint8(int(_FW_SHADE[l])), f)
    f = jnp.where(
        _rect_mask(y, x, _FW_CHICKEN_X, s.chicken_y, _FW_CHICKEN_W, _FW_CHICKEN_H),
        jnp.uint8(224), f,
    )
    return f


FREEWAY = dict(
    reset=_fw_reset,
    act=_fw_act,
    render=_fw_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=3,
    minimal_to_full=np.array([0, 2, 5], np.int32),  # NOOP UP DOWN
)


# ---------------------------------------------------------------------------
# Boxing (csrc/envs/boxing.cc)
# ---------------------------------------------------------------------------

_BX_RING_L, _BX_RING_R = 8.0, 76.0
_BX_RING_T, _BX_RING_B = 12.0, 72.0
_BX_W, _BX_H = 6, 8
_BX_PSPEED, _BX_CSPEED = 1.2, 0.9
_BX_RANGE = 11.0
_BX_COOLDOWN = 10
_BX_KNOCK = 5.0
_BX_KO = 100
_BX_GAME_FRAMES = 7200


@flax.struct.dataclass
class BoxingCore:
    px: jax.Array
    py: jax.Array
    cx: jax.Array
    cy: jax.Array
    p_score: jax.Array
    c_score: jax.Array
    p_cool: jax.Array
    c_cool: jax.Array
    frame: jax.Array
    over: jax.Array


def _bx_reset(key):
    del key  # deterministic corners (boxing.cc:32-39)
    return BoxingCore(
        px=jnp.float32(16.0), py=jnp.float32(38.0),
        cx=jnp.float32(62.0), cy=jnp.float32(38.0),
        p_score=jnp.int32(0), c_score=jnp.int32(0),
        p_cool=jnp.int32(0), c_cool=jnp.int32(0),
        frame=jnp.int32(0), over=jnp.bool_(False),
    )


def _bx_knock(tx, ty, fx, fy):
    tx = jnp.clip(tx + jnp.where(tx >= fx, _BX_KNOCK, -_BX_KNOCK), _BX_RING_L, _BX_RING_R)
    ty = jnp.clip(ty + jnp.where(ty >= fy, _BX_KNOCK, -_BX_KNOCK), _BX_RING_T, _BX_RING_B)
    return tx, ty


def _bx_act(s: BoxingCore, dx, dy, fire, key):
    live = ~s.over
    px = jnp.clip(s.px + _BX_PSPEED * dx.astype(jnp.float32), _BX_RING_L, _BX_RING_R)
    py = jnp.clip(s.py + _BX_PSPEED * dy.astype(jnp.float32), _BX_RING_T, _BX_RING_B)
    ddx, ddy = px - s.cx, py - s.cy
    cx = jnp.where(jnp.abs(ddx) > 2.0,
                   jnp.clip(s.cx + jnp.where(ddx > 0, _BX_CSPEED, -_BX_CSPEED),
                            _BX_RING_L, _BX_RING_R), s.cx)
    cy = jnp.where(jnp.abs(ddy) > 2.0,
                   jnp.clip(s.cy + jnp.where(ddy > 0, _BX_CSPEED, -_BX_CSPEED),
                            _BX_RING_T, _BX_RING_B), s.cy)
    dist = jnp.sqrt((px - cx) ** 2 + (py - cy) ** 2)
    p_cool = jnp.maximum(s.p_cool - 1, 0)
    c_cool = jnp.maximum(s.c_cool - 1, 0)

    # Player punch.
    p_throw = (fire > 0) & (p_cool == 0)
    p_land = p_throw & (dist < _BX_RANGE)
    p_cool = jnp.where(p_throw, _BX_COOLDOWN, p_cool)
    p_score = s.p_score + p_land.astype(jnp.int32)
    kx, ky = _bx_knock(cx, cy, px, py)
    cx = jnp.where(p_land, kx, cx)
    cy = jnp.where(p_land, ky, cy)
    over = s.over | (p_land & (p_score >= _BX_KO))

    # CPU punch (uses the pre-knockback distance, boxing.cc:56,70).
    c_land = ~over & (c_cool == 0) & (dist < _BX_RANGE)
    c_cool = jnp.where(
        c_land, _BX_COOLDOWN + jax.random.randint(key, (), 0, 16), c_cool
    )
    c_score = s.c_score + c_land.astype(jnp.int32)
    kx, ky = _bx_knock(px, py, cx, cy)
    px = jnp.where(c_land, kx, px)
    py = jnp.where(c_land, ky, py)
    over = over | (c_land & (c_score >= _BX_KO))

    reward = p_land.astype(jnp.float32) - c_land.astype(jnp.float32)
    frame = s.frame + 1
    over = over | (frame >= _BX_GAME_FRAMES)
    out = BoxingCore(px=px, py=py, cx=cx, cy=cy, p_score=p_score, c_score=c_score,
                     p_cool=p_cool, c_cool=c_cool, frame=frame, over=over)
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _bx_render(s: BoxingCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    mat = (y >= 8) & (y < 78) & (x >= 4) & (x < 80)
    f = jnp.where(mat, jnp.uint8(70), f)
    rope = mat & ((y == 8) | (y == 77) | (x == 4) | (x == 79))
    f = jnp.where(rope, jnp.uint8(160), f)
    p_tick = (y == 2) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.p_score, 40))
    f = jnp.where(p_tick, jnp.uint8(255), f)
    c_tick = (y == 2) & (x <= 81) & ((81 - x) % 2 == 0) \
        & ((81 - x) // 2 < jnp.minimum(s.c_score, 40))
    f = jnp.where(c_tick, jnp.uint8(110), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _BX_W, _BX_H), jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.cx, s.cy, _BX_W, _BX_H), jnp.uint8(110), f)
    p_glove = (s.p_cool > _BX_COOLDOWN - 3) & _rect_mask(
        y, x, s.px + jnp.where(s.cx > s.px, float(_BX_W), -3.0), s.py + 2, 3, 2
    )
    f = jnp.where(p_glove, jnp.uint8(255), f)
    c_glove = (s.c_cool > _BX_COOLDOWN - 3) & _rect_mask(
        y, x, s.cx + jnp.where(s.px > s.cx, float(_BX_W), -3.0), s.cy + 2, 3, 2
    )
    f = jnp.where(c_glove, jnp.uint8(140), f)
    return f


BOXING = dict(
    reset=_bx_reset,
    act=_bx_act,
    render=_bx_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Seaquest (csrc/envs/seaquest.cc)
# ---------------------------------------------------------------------------

_SQ_SURFACE = 12.0
_SQ_PW, _SQ_PH = 8, 4
_SQ_SPEED = 1.25
_SQ_XMIN, _SQ_XMAX = 2.0, 74.0
_SQ_YMIN, _SQ_YMAX = _SQ_SURFACE, 76.0
_SQ_NE, _SQ_ND = 4, 2
_SQ_EW, _SQ_EH = 6, 3
_SQ_DW, _SQ_DH = 4, 3
_SQ_TSPEED = 3.0
_SQ_MAX_O2 = 1024
_SQ_MAX_HELD = 6


@flax.struct.dataclass
class SeaquestCore:
    px: jax.Array
    py: jax.Array
    facing: jax.Array
    t_live: jax.Array
    t_x: jax.Array
    t_y: jax.Array
    t_dir: jax.Array
    e_live: jax.Array    # [4]
    e_x: jax.Array
    e_y: jax.Array
    e_dir: jax.Array
    e_speed: jax.Array
    d_live: jax.Array    # [2]
    d_x: jax.Array
    d_y: jax.Array
    d_dir: jax.Array
    spawn_clock: jax.Array
    diver_clock: jax.Array
    oxygen: jax.Array
    held: jax.Array
    lives: jax.Array
    over: jax.Array


def _sq_respawn_fields():
    return dict(
        px=jnp.float32(38.0), py=jnp.float32(_SQ_SURFACE),
        facing=jnp.int32(1), t_live=jnp.bool_(False),
        t_x=jnp.float32(0), t_y=jnp.float32(0), t_dir=jnp.int32(1),
        oxygen=jnp.int32(_SQ_MAX_O2),
    )


def _sq_reset(key):
    del key  # deterministic spawn clocks (seaquest.cc:33-43)
    zf = lambda n: jnp.zeros((n,), jnp.float32)
    return SeaquestCore(
        **_sq_respawn_fields(),
        e_live=jnp.zeros((_SQ_NE,), jnp.bool_),
        e_x=zf(_SQ_NE), e_y=zf(_SQ_NE), e_dir=zf(_SQ_NE), e_speed=zf(_SQ_NE),
        d_live=jnp.zeros((_SQ_ND,), jnp.bool_),
        d_x=zf(_SQ_ND), d_y=zf(_SQ_ND), d_dir=zf(_SQ_ND),
        spawn_clock=jnp.int32(60), diver_clock=jnp.int32(120),
        held=jnp.int32(0), lives=jnp.int32(3), over=jnp.bool_(False),
    )


def _sq_overlap(ax, ay, aw, ah, bx, by, bw, bh):
    return (ax < bx + bw) & (ax + aw > bx) & (ay < by + bh) & (ay + ah > by)


def _sq_act(s: SeaquestCore, dx, dy, fire, key):
    live = ~s.over
    orig = s
    k_ey, k_edir, k_espeed, k_eclk, k_dy, k_ddir, k_dclk = jax.random.split(key, 7)

    px = jnp.clip(s.px + _SQ_SPEED * dx.astype(jnp.float32), _SQ_XMIN, _SQ_XMAX)
    py = jnp.clip(s.py + _SQ_SPEED * dy.astype(jnp.float32), _SQ_YMIN, _SQ_YMAX)
    facing = jnp.where(dx != 0, dx.astype(jnp.int32), s.facing)

    # Torpedo launch + flight.
    launch = (fire > 0) & ~s.t_live
    t_live = s.t_live | launch
    t_x = jnp.where(launch, jnp.where(facing > 0, px + _SQ_PW, px - 3.0), s.t_x)
    t_y = jnp.where(launch, py + 1.0, s.t_y)
    t_dir = jnp.where(launch, facing, s.t_dir)
    t_x = jnp.where(t_live, t_x + _SQ_TSPEED * t_dir.astype(jnp.float32), t_x)
    t_live = t_live & (t_x >= -3.0) & (t_x <= 84.0)

    # Enemy spawn in the first dead slot.
    spawn_clock = s.spawn_clock - 1
    do_spawn = (spawn_clock <= 0) & jnp.any(~s.e_live)
    slot = jnp.argmax(~s.e_live)
    new_ey = 20.0 + jax.random.randint(k_ey, (), 0, 52).astype(jnp.float32)
    new_edir = jnp.where(jax.random.bernoulli(k_edir), 1.0, -1.0)
    new_ex = jnp.where(new_edir > 0, -float(_SQ_EW), 84.0)
    new_espeed = 0.6 + 0.1 * jax.random.randint(k_espeed, (), 0, 5).astype(jnp.float32)
    sel = jnp.arange(_SQ_NE) == slot
    e_live = jnp.where(do_spawn & sel, True, s.e_live)
    e_x = jnp.where(do_spawn & sel, new_ex, s.e_x)
    e_y = jnp.where(do_spawn & sel, new_ey, s.e_y)
    e_dir = jnp.where(do_spawn & sel, new_edir, s.e_dir)
    e_speed = jnp.where(do_spawn & sel, new_espeed, s.e_speed)
    spawn_clock = jnp.where(
        spawn_clock <= 0, 40 + jax.random.randint(k_eclk, (), 0, 40), spawn_clock
    )

    # Diver spawn.
    diver_clock = s.diver_clock - 1
    d_spawn = (diver_clock <= 0) & jnp.any(~s.d_live)
    d_slot = jnp.argmax(~s.d_live)
    new_dy = 24.0 + jax.random.randint(k_dy, (), 0, 44).astype(jnp.float32)
    new_ddir = jnp.where(jax.random.bernoulli(k_ddir), 1.0, -1.0)
    new_dx = jnp.where(new_ddir > 0, -float(_SQ_DW), 84.0)
    dsel = jnp.arange(_SQ_ND) == d_slot
    d_live = jnp.where(d_spawn & dsel, True, s.d_live)
    d_x = jnp.where(d_spawn & dsel, new_dx, s.d_x)
    d_y = jnp.where(d_spawn & dsel, new_dy, s.d_y)
    d_dir = jnp.where(d_spawn & dsel, new_ddir, s.d_dir)
    diver_clock = jnp.where(
        diver_clock <= 0, 80 + jax.random.randint(k_dclk, (), 0, 80), diver_clock
    )

    # Enemies advance; torpedo kills the first overlapping one (+20).
    e_x = jnp.where(e_live, e_x + e_dir * e_speed, e_x)
    e_live = e_live & (e_x >= -_SQ_EW - 2) & (e_x <= 86.0)
    t_hits = t_live & e_live & _sq_overlap(t_x, t_y, 3, 1, e_x, e_y, _SQ_EW, _SQ_EH)
    any_t_hit = jnp.any(t_hits)
    first_hit = jnp.argmax(t_hits)
    e_live = e_live & ~((jnp.arange(_SQ_NE) == first_hit) & any_t_hit)
    t_live = t_live & ~any_t_hit
    reward = jnp.where(any_t_hit, 20.0, 0.0)

    # Player-enemy collision -> life lost.
    p_hits = e_live & _sq_overlap(px, py, _SQ_PW, _SQ_PH, e_x, e_y, _SQ_EW, _SQ_EH)
    crashed = jnp.any(p_hits)
    e_live = e_live & ~p_hits

    # Divers drift; pickup on contact (gated off on a crash frame).
    d_x = jnp.where(d_live, d_x + d_dir * 0.4, d_x)
    d_live = d_live & (d_x >= -_SQ_DW - 2) & (d_x <= 86.0)
    grabs = ~crashed & d_live & (s.held < _SQ_MAX_HELD) & _sq_overlap(
        px, py, _SQ_PW, _SQ_PH, d_x, d_y, _SQ_DW, _SQ_DH
    )
    # At most one pickup per frame matters for held-count parity.
    n_grab = jnp.minimum(jnp.sum(grabs), _SQ_MAX_HELD - s.held)
    held = s.held + n_grab.astype(jnp.int32)
    d_live = d_live & ~grabs

    # Oxygen (skipped on a crash frame, seaquest.cc early return).
    underwater = py > _SQ_SURFACE + 2.0
    oxygen = jnp.where(~crashed & underwater, s.oxygen - 1, s.oxygen)
    suffocated = ~crashed & underwater & (oxygen <= 0)
    at_surface = ~crashed & ~underwater
    cash = at_surface & (held > 0) & (oxygen < _SQ_MAX_O2)
    reward = reward + jnp.where(cash, 50.0 * held.astype(jnp.float32), 0.0)
    held = jnp.where(cash, 0, held)
    oxygen = jnp.where(at_surface, jnp.minimum(oxygen + 8, _SQ_MAX_O2), oxygen)

    lost = crashed | suffocated
    lives = s.lives - lost.astype(jnp.int32)
    over = s.over | (lost & (lives <= 0))
    respawn = lost & (lives > 0)
    rf = _sq_respawn_fields()
    out = SeaquestCore(
        px=jnp.where(respawn, rf["px"], px),
        py=jnp.where(respawn, rf["py"], py),
        facing=jnp.where(respawn, rf["facing"], facing),
        t_live=jnp.where(respawn, rf["t_live"], t_live),
        t_x=jnp.where(respawn, rf["t_x"], t_x),
        t_y=jnp.where(respawn, rf["t_y"], t_y),
        t_dir=jnp.where(respawn, rf["t_dir"], t_dir),
        e_live=e_live, e_x=e_x, e_y=e_y, e_dir=e_dir, e_speed=e_speed,
        d_live=d_live, d_x=d_x, d_y=d_y, d_dir=d_dir,
        spawn_clock=spawn_clock, diver_clock=diver_clock,
        oxygen=jnp.where(respawn, rf["oxygen"], oxygen),
        held=held, lives=lives, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, orig)
    return out, jnp.where(live, reward, 0.0)


def _sq_render(s: SeaquestCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.where(y < int(_SQ_SURFACE), jnp.uint8(150), jnp.uint8(40))
    f = jnp.broadcast_to(f, (SCREEN, SCREEN))
    o2 = ((y == 80) | (y == 81)) & (x >= 4) & (x < 4 + 76 * s.oxygen // _SQ_MAX_O2)
    f = jnp.where(o2, jnp.uint8(230), f)
    l = (x - 2) // 5
    f = jnp.where((y == 1) & (x >= 2) & (l < s.lives) & (l >= 0) & ((x - 2) % 5 < 3),
                  jnp.uint8(255), f)
    d = (x - 2) // 5
    f = jnp.where((y == 3) & (x >= 2) & (d < s.held) & (d >= 0) & ((x - 2) % 5 < 3),
                  jnp.uint8(180), f)
    for i in range(_SQ_ND):
        m = s.d_live[i] & _rect_mask(y, x, s.d_x[i], s.d_y[i], _SQ_DW, _SQ_DH)
        f = jnp.where(m, jnp.uint8(180), f)
    for i in range(_SQ_NE):
        m = s.e_live[i] & _rect_mask(y, x, s.e_x[i], s.e_y[i], _SQ_EW, _SQ_EH)
        f = jnp.where(m, jnp.uint8(90), f)
    t = s.t_live & _rect_mask(y, x, s.t_x, s.t_y, 3, 1)
    f = jnp.where(t, jnp.uint8(255), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _SQ_PW, _SQ_PH), jnp.uint8(200), f)
    return f


SEAQUEST = dict(
    reset=_sq_reset,
    act=_sq_act,
    render=_sq_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Q*bert (csrc/envs/qbert.cc)
# ---------------------------------------------------------------------------

_QB_ROWS = 6
_QB_HOP = 8
_QB_BALL_HOP = 10
_QB_CUBE_W, _QB_FACE, _QB_BODY = 10, 4, 3
# Lower-triangular validity mask over the [6, 6] (r, c) grid.
_QB_VALID = np.tril(np.ones((_QB_ROWS, _QB_ROWS), bool))


def _qb_cube_x(r, c):
    return 41 + (2 * c - r) * 7 - _QB_CUBE_W // 2


def _qb_cube_y(r):
    return 14 + r * 9


@flax.struct.dataclass
class QbertCore:
    visited: jax.Array   # [6, 6] bool (lower triangle used)
    lives: jax.Array
    over: jax.Array
    round: jax.Array
    pr: jax.Array
    pc: jax.Array
    tr: jax.Array
    tc: jax.Array
    hop_timer: jax.Array
    ball_live: jax.Array
    br: jax.Array
    bc: jax.Array
    ball_timer: jax.Array
    ball_spawn: jax.Array


def _qb_reset(key):
    del key  # deterministic (qbert.cc:28-41)
    visited = jnp.zeros((_QB_ROWS, _QB_ROWS), jnp.bool_).at[0, 0].set(True)
    return QbertCore(
        visited=visited, lives=jnp.int32(3), over=jnp.bool_(False),
        round=jnp.int32(0), pr=jnp.int32(0), pc=jnp.int32(0),
        tr=jnp.int32(0), tc=jnp.int32(0), hop_timer=jnp.int32(0),
        ball_live=jnp.bool_(False), br=jnp.int32(0), bc=jnp.int32(0),
        ball_timer=jnp.int32(0), ball_spawn=jnp.int32(90),
    )


def _qb_act(s: QbertCore, dx, dy, fire, key):
    del fire
    live = ~s.over
    orig = s
    k_bc, k_bdir, k_bclk = jax.random.split(key, 3)
    reward = jnp.float32(0.0)

    # --- player hop state machine -------------------------------------
    hopping = s.hop_timer > 0
    hop_timer = jnp.where(hopping, s.hop_timer - 1, s.hop_timer)
    landing = hopping & (hop_timer == 0)
    pr = jnp.where(landing, s.tr, s.pr)
    pc = jnp.where(landing, s.tc, s.pc)
    fell = landing & ((pr < 0) | (pr >= _QB_ROWS) | (pc < 0) | (pc > pr))
    prc = jnp.clip(pr, 0, _QB_ROWS - 1)
    pcc = jnp.clip(pc, 0, _QB_ROWS - 1)
    fresh = landing & ~fell & ~s.visited[prc, pcc]
    visited = s.visited.at[prc, pcc].set(
        jnp.where(fresh, True, s.visited[prc, pcc])
    )
    reward = reward + jnp.where(fresh, 25.0, 0.0)
    cleared = fresh & jnp.all(visited | ~jnp.asarray(_QB_VALID))
    reward = reward + jnp.where(cleared, 100.0, 0.0)
    visited = jnp.where(
        cleared,
        jnp.zeros_like(visited).at[prc, pcc].set(True),
        visited,
    )
    round_ = s.round + cleared.astype(jnp.int32)
    ball_live = s.ball_live & ~cleared
    ball_spawn = jnp.where(
        cleared,
        jnp.where(90 > 30 + 10 * round_, 90 - 10 * round_, 30),
        s.ball_spawn,
    )

    # Idle: read the joystick (classic diagonal mapping, qbert.cc:66-79).
    idle = ~hopping
    up = (dy < 0) & (dx >= 0)
    down = ~up & (dy > 0) & (dx <= 0)
    right = ~up & ~down & (dx > 0)
    left = ~up & ~down & ~right & (dx < 0)
    move = idle & (up | down | right | left)
    dr = jnp.where(up | left, -1, 1)
    dc = jnp.where(up | down, 0, jnp.where(right, 1, -1))
    tr = jnp.where(move, pr + dr, s.tr)
    tc = jnp.where(move, pc + dc, s.tc)
    hop_timer = jnp.where(move, _QB_HOP, hop_timer)

    # --- ball ----------------------------------------------------------
    spawn_tick = ~ball_live & ~fell
    ball_spawn = jnp.where(spawn_tick, ball_spawn - 1, ball_spawn)
    spawn = spawn_tick & (ball_spawn <= 0)
    br = jnp.where(spawn, 1, s.br)
    bc = jnp.where(spawn, jax.random.randint(k_bc, (), 0, 2), s.bc)
    ball_timer = jnp.where(spawn, _QB_BALL_HOP, s.ball_timer)
    ball_live = ball_live | spawn

    hop_tick = ball_live & ~spawn & ~fell
    ball_timer = jnp.where(hop_tick, ball_timer - 1, ball_timer)
    ball_hops = hop_tick & (ball_timer <= 0)
    ball_timer = jnp.where(ball_hops, _QB_BALL_HOP, ball_timer)
    br = jnp.where(ball_hops, br + 1, br)
    bc = jnp.where(ball_hops, bc + jax.random.randint(k_bdir, (), 0, 2), bc)
    ball_out = ball_live & (br >= _QB_ROWS)
    ball_live = ball_live & ~ball_out
    ball_spawn = jnp.where(
        ball_out, 60 + jax.random.randint(k_bclk, (), 0, 60), ball_spawn
    )

    # --- collisions / life loss ----------------------------------------
    caught = ball_live & (hop_timer == 0) & (br == pr) & (bc == pc) & ~fell
    lost = fell | caught
    lives = s.lives - lost.astype(jnp.int32)
    over = s.over | (lost & (lives <= 0))
    respawn = lost & (lives > 0)
    pr = jnp.where(respawn, 0, pr)
    pc = jnp.where(respawn, 0, pc)
    hop_timer = jnp.where(respawn, 0, hop_timer)
    ball_live = ball_live & ~respawn
    ball_spawn = jnp.where(respawn, 90, ball_spawn)

    out = QbertCore(
        visited=visited, lives=lives, over=over, round=round_,
        pr=pr, pc=pc, tr=tr, tc=tc, hop_timer=hop_timer,
        ball_live=ball_live, br=br, bc=bc,
        ball_timer=ball_timer, ball_spawn=ball_spawn,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, orig)
    return out, jnp.where(live, reward, 0.0)


def _qb_render(s: QbertCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Cubes (static positions -> unrolled masks).
    for r in range(_QB_ROWS):
        for c in range(r + 1):
            cx, cy = _qb_cube_x(r, c), _qb_cube_y(r)
            face_m = (y >= cy) & (y < cy + _QB_FACE) & (x >= cx) & (x < cx + _QB_CUBE_W)
            shade = jnp.where(s.visited[r, c], jnp.uint8(190), jnp.uint8(90))
            f = jnp.where(face_m, shade, f)
            body_m = (
                (y >= cy + _QB_FACE) & (y < cy + _QB_FACE + _QB_BODY)
                & (x >= cx + 1) & (x < cx + _QB_CUBE_W - 1)
            )
            f = jnp.where(body_m, jnp.uint8(50), f)
    l = (x - 2) // 5
    f = jnp.where((y == 1) & (x >= 2) & (l < s.lives) & (l >= 0) & ((x - 2) % 5 < 3),
                  jnp.uint8(255), f)
    # Ball (under the player).
    bx = 41 + (2 * s.bc - s.br) * 7 - 1
    by = 14 + s.br * 9 - 5
    ball_m = s.ball_live & (y >= by) & (y < by + 3) & (x >= bx) & (x < bx + 3)
    f = jnp.where(ball_m, jnp.uint8(140), f)
    # Player (lifted while hopping, clamped on the fall-off frame).
    r = jnp.where(s.hop_timer > 0, s.tr, s.pr)
    c = jnp.where(s.hop_timer > 0, s.tc, s.pc)
    rr = jnp.clip(r, 0, _QB_ROWS - 1)
    cc = jnp.clip(c, 0, rr)
    lift = jnp.where(s.hop_timer > 0, 3, 0)
    pxx = 41 + (2 * cc - rr) * 7 - 2
    pyy = 14 + rr * 9 - 6 - lift
    p_m = (y >= pyy) & (y < pyy + 5) & (x >= pxx) & (x < pxx + 4)
    f = jnp.where(p_m, jnp.uint8(230), f)
    return f


QBERT = dict(
    reset=_qb_reset,
    act=_qb_act,
    render=_qb_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=6,
    minimal_to_full=np.array([0, 1, 2, 3, 4, 5], np.int32),
)
