"""Pure-JAX twins of the wave-12 C++ engine games: DoubleDunk, Hero,
YarsRevenge, Krull.

Rules mirror the C++ engine game-for-game (csrc/envs/double_dunk.cc,
hero.cc, yars_revenge.cc, krull.cc) so the Anakin trainer covers the same
task set as the Sebulba host-env path; reset frames are pixel-identical
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

__all__ = ["DOUBLE_DUNK", "HERO", "YARS_REVENGE", "KRULL"]


def _first_true(mask):
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


# ---------------------------------------------------------------------------
# Double Dunk (csrc/envs/double_dunk.cc)
# ---------------------------------------------------------------------------

_DD_L, _DD_R, _DD_T, _DD_B = 8.0, 76.0, 14.0, 76.0
_DD_HX, _DD_HY = 42.0, 16.0
_DD_ARC = 52.0
_DD_PS = 5.0
_DD_BALL = 2.0
_DD_PV = 1.1
_DD_AV = 0.85
_DD_SHOT = 2.0
_DD_REACH = 4.0
_DD_FRAMES = 12000
_DD_AI_DIST = 22.0


@flax.struct.dataclass
class DoubleDunkCore:
    px: jax.Array
    py: jax.Array
    ax: jax.Array
    ay: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array
    ball_vx: jax.Array
    ball_vy: jax.Array
    holder: jax.Array    # 0 loose, 1 player, 2 AI
    shooter: jax.Array
    from_three: jax.Array
    score_diff: jax.Array
    frame: jax.Array
    over: jax.Array


def _dd_tip_fields(player_ball):
    return dict(
        px=jnp.float32(30.0), py=jnp.float32(60.0),
        ax=jnp.float32(50.0), ay=jnp.float32(60.0),
        holder=jnp.where(player_ball, 1, 2).astype(jnp.int32),
        shooter=jnp.int32(0), from_three=jnp.bool_(False),
        ball_x=jnp.float32(41.0), ball_y=jnp.float32(60.0),
        ball_vx=jnp.float32(0.0), ball_vy=jnp.float32(0.0),
    )


def _dd_reset(key):
    del key  # fully deterministic (double_dunk.cc reset_game)
    return DoubleDunkCore(
        score_diff=jnp.int32(0), frame=jnp.int32(0), over=jnp.bool_(False),
        **_dd_tip_fields(jnp.bool_(True)),
    )


def _dd_clamp(x, y):
    return (jnp.clip(x, _DD_L + 1.0, _DD_R - 1.0 - _DD_PS),
            jnp.clip(y, _DD_T + 1.0, _DD_B - 1.0 - _DD_PS))


def _dd_act(s: DoubleDunkCore, dx, dy, fire, key):
    live = ~s.over
    frame = s.frame + 1

    px, py = _dd_clamp(s.px + dx.astype(jnp.float32) * _DD_PV,
                       s.py + dy.astype(jnp.float32) * _DD_PV)
    tx = jnp.where(s.holder == 2, _DD_HX - _DD_PS / 2.0, px)
    ty = jnp.where(s.holder == 2, _DD_HY + 4.0, py)
    adx, ady = tx - s.ax, ty - s.ay
    an = jnp.sqrt(adx * adx + ady * ady) + 1e-3
    ax, ay = _dd_clamp(s.ax + adx / an * _DD_AV, s.ay + ady / an * _DD_AV)

    loose = s.holder == 0
    p_hold = s.holder == 1
    a_hold = s.holder == 2

    # Loose flight.
    ball_x = jnp.where(loose, s.ball_x + s.ball_vx, s.ball_x)
    ball_y = jnp.where(loose, s.ball_y + s.ball_vy, s.ball_y)
    ball_vx = jnp.where(loose, s.ball_vx * 0.97, s.ball_vx)
    ball_vy = jnp.where(loose, s.ball_vy * 0.97, s.ball_vy)
    ball_vx = jnp.where(loose & ((ball_x < _DD_L) | (ball_x + _DD_BALL > _DD_R)),
                        -ball_vx, ball_vx)
    ball_vy = jnp.where(loose & ((ball_y < _DD_T) | (ball_y + _DD_BALL > _DD_B)),
                        -ball_vy, ball_vy)
    basket = loose & (s.shooter != 0) \
        & (jnp.abs(ball_x + _DD_BALL / 2.0 - _DD_HX) < 3.0) \
        & (jnp.abs(ball_y + _DD_BALL / 2.0 - _DD_HY) < 3.0)
    pts = jnp.where(s.from_three, 3, 2)
    we_score = basket & (s.shooter == 1)
    they_score = basket & (s.shooter == 2)
    reward = jnp.where(we_score, pts, 0).astype(jnp.float32) \
        - jnp.where(they_score, pts, 0).astype(jnp.float32)
    score_diff = s.score_diff + jnp.where(we_score, pts, 0) \
        - jnp.where(they_score, pts, 0)

    # Slow loose ball gets picked up.
    sp2 = ball_vx * ball_vx + ball_vy * ball_vy

    def d2(cx, cy):
        ddx = ball_x + _DD_BALL / 2.0 - cx
        ddy = ball_y + _DD_BALL / 2.0 - cy
        return ddx * ddx + ddy * ddy

    pd = d2(px + _DD_PS / 2.0, py + _DD_PS / 2.0)
    ad = d2(ax + _DD_PS / 2.0, ay + _DD_PS / 2.0)
    pickable = loose & ~basket & (sp2 < 1.0)
    p_takes = pickable & (pd <= _DD_REACH ** 2) & (pd <= ad)
    a_takes = pickable & ~p_takes & (ad <= _DD_REACH ** 2)
    shooter = jnp.where(pickable, 0, s.shooter)
    holder = jnp.where(p_takes, 1, jnp.where(a_takes, 2, s.holder))
    holder = jnp.where(pickable & ~p_takes & ~a_takes, 0, holder)

    # Held ball rides; shots launch toward the hoop (with AI jitter).
    ball_x = jnp.where(p_hold, px + _DD_PS / 2.0,
                       jnp.where(a_hold, ax + _DD_PS / 2.0, ball_x))
    ball_y = jnp.where(p_hold, py - 1.0, jnp.where(a_hold, ay - 1.0, ball_y))
    p_shoots = p_hold & (fire > 0)
    hd = jnp.abs(ax + _DD_PS / 2.0 - _DD_HX) + jnp.abs(ay - _DD_HY)
    a_shoots = a_hold & (hd < _DD_AI_DIST)
    jx = (jax.random.uniform(key) - 0.5) * jnp.where(a_shoots, 4.0, 2.0)
    sdx = _DD_HX + jx - ball_x
    sdy = _DD_HY - ball_y
    sn = jnp.sqrt(sdx * sdx + sdy * sdy) + 1e-3
    shoots = p_shoots | a_shoots
    from_three = jnp.where(
        shoots, jnp.where(p_shoots, py >= _DD_ARC, ay >= _DD_ARC), s.from_three
    )
    shooter = jnp.where(p_shoots, 1, jnp.where(a_shoots, 2, shooter))
    holder = jnp.where(shoots, 0, holder)
    ball_vx = jnp.where(shoots, sdx / sn * _DD_SHOT, ball_vx)
    ball_vy = jnp.where(shoots, sdy / sn * _DD_SHOT, ball_vy)
    ball_x = jnp.where(shoots, ball_x + ball_vx, ball_x)
    ball_y = jnp.where(shoots, ball_y + ball_vy, ball_y)

    # Scoring resets to a tip-off (conceding side takes the ball).
    tip = _dd_tip_fields(they_score)
    scored = we_score | they_score
    px = jnp.where(scored, tip["px"], px)
    py = jnp.where(scored, tip["py"], py)
    ax = jnp.where(scored, tip["ax"], ax)
    ay = jnp.where(scored, tip["ay"], ay)
    holder = jnp.where(scored, jnp.where(we_score, 2, 1), holder)
    shooter = jnp.where(scored, 0, shooter)
    from_three = jnp.where(scored, False, from_three)
    ball_x = jnp.where(scored, tip["ball_x"], ball_x)
    ball_y = jnp.where(scored, tip["ball_y"], ball_y)
    ball_vx = jnp.where(scored, 0.0, ball_vx)
    ball_vy = jnp.where(scored, 0.0, ball_vy)

    over = s.over | (frame >= _DD_FRAMES)
    out = DoubleDunkCore(
        px=px, py=py, ax=ax, ay=ay, ball_x=ball_x, ball_y=ball_y,
        ball_vx=ball_vx, ball_vy=ball_vy, holder=holder, shooter=shooter,
        from_three=from_three, score_diff=score_diff, frame=frame, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _dd_render(s: DoubleDunkCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    bounds = (
        ((y == int(_DD_T)) | (y == int(_DD_B)))
        & (x >= int(_DD_L)) & (x < int(_DD_R))
    ) | (
        ((x == int(_DD_L)) | (x == int(_DD_R)))
        & (y >= int(_DD_T)) & (y < int(_DD_B))
    )
    f = jnp.where(bounds, jnp.uint8(90), f)
    arc = (y == int(_DD_ARC)) & (x >= int(_DD_L)) & (x < int(_DD_R)) & (x % 3 == 0)
    f = jnp.where(arc, jnp.uint8(60), f)
    f = jnp.where(_rect_mask(y, x, _DD_HX - 3.0, _DD_HY - 1.0, 6.0, 2.0),
                  jnp.uint8(200), f)
    f = jnp.where(_rect_mask(y, x, s.ax, s.ay, _DD_PS, _DD_PS), jnp.uint8(150), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _DD_PS, _DD_PS), jnp.uint8(255), f)
    f = jnp.where(_rect_mask(y, x, s.ball_x, s.ball_y, _DD_BALL, _DD_BALL),
                  jnp.uint8(220), f)
    sd = s.score_diff
    up = (y == 2) & (x >= 44) & ((x - 44) % 2 == 0) \
        & ((x - 44) // 2 < jnp.minimum(jnp.maximum(sd, 0), 20))
    f = jnp.where(up, jnp.uint8(200), f)
    dn = (y == 2) & (x <= 40) & ((40 - x) % 2 == 0) \
        & ((40 - x) // 2 < jnp.minimum(jnp.maximum(-sd, 0), 20))
    f = jnp.where(dn, jnp.uint8(140), f)
    return f


DOUBLE_DUNK = dict(
    reset=_dd_reset,
    act=_dd_act,
    render=_dd_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# H.E.R.O. (csrc/envs/hero.cc)
# ---------------------------------------------------------------------------

_HR_FLOORS = 5
_HR_FY = np.array([16.0, 31.0, 46.0, 61.0, 76.0], np.float32)
_HR_GAPX = np.array([60.0, 14.0, 60.0, 14.0], np.float32)
_HR_GAPW = 12.0
_HR_WALLX = np.array([-1.0, 40.0, -1.0, 44.0, 30.0], np.float32)
_HR_WALLW = 4.0
_HR_CRIT = 4
_HR_CFLOOR = np.array([1, 2, 3, 4], np.int32)
_HR_CX0 = np.array([20.0, 60.0, 30.0, 55.0], np.float32)
_HR_CW, _HR_CH = 4.0, 3.0
_HR_PW, _HR_PH = 4.0, 6.0
_HR_MX = 1.0
_HR_THRUST = 0.22
_HR_G = 0.12
_HR_MAXF = 1.4
_HR_SHOT = 2.6
_HR_DYN = 40
_HR_POWER = 6000
_HR_LIVES = 3
_HR_MINERX = 64.0


@flax.struct.dataclass
class HeroCore:
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    facing: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    dyn_timer: jax.Array
    dyn_band: jax.Array
    visited: jax.Array   # [5] per-life floor-descent bonus markers
    wall_up: jax.Array   # [5]
    crit_live: jax.Array
    crit_x: jax.Array
    crit_dir: jax.Array
    power_used: jax.Array
    level: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _hr_respawn_fields():
    return dict(
        px=jnp.float32(6.0), py=jnp.float32(float(_HR_FY[0]) - _HR_PH),
        vy=jnp.float32(0.0), facing=jnp.float32(1.0),
        shot_live=jnp.bool_(False), dyn_timer=jnp.int32(0),
        dyn_band=jnp.int32(-1), power_used=jnp.int32(0),
        visited=jnp.asarray([True, False, False, False, False]),
    )


def _hr_level_fields():
    return dict(
        wall_up=jnp.asarray(_HR_WALLX >= 0.0),
        crit_live=jnp.ones(_HR_CRIT, bool),
        crit_x=jnp.asarray(_HR_CX0),
        crit_dir=jnp.asarray([1.0, -1.0, 1.0, -1.0], jnp.float32),
    )


def _hr_reset(key):
    del key  # fully deterministic (hero.cc reset_game)
    return HeroCore(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        shot_vx=jnp.float32(0.0), level=jnp.int32(0),
        lives=jnp.int32(_HR_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_hr_respawn_fields(), **_hr_level_fields(),
    )


def _hr_band(y):
    fy = jnp.asarray(_HR_FY)
    inband = (y >= fy - 13.0) & (y < fy)
    return jnp.where(inband.any(), jnp.argmax(inband).astype(jnp.int32), -1)


def _hr_act(s: HeroCore, dx, dy, fire, key):
    del key  # fully deterministic
    live = ~s.over
    cspeed = 0.45 + 0.1 * s.level.astype(jnp.float32)
    fy = jnp.asarray(_HR_FY)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _HR_MX, 2.0, 82.0 - _HR_PW)
    facing = jnp.where(dx != 0, jnp.sign(dx).astype(jnp.float32), s.facing)
    vy = s.vy + jnp.where(dy < 0, -_HR_THRUST, 0.0) + _HR_G
    vy = jnp.clip(vy, -1.6, _HR_MAXF)
    ny = s.py + vy
    cx = px + _HR_PW / 2.0
    gaps = jnp.concatenate([
        (cx >= jnp.asarray(_HR_GAPX)) & (cx < jnp.asarray(_HR_GAPX) + _HR_GAPW),
        jnp.array([False]),
    ])
    lands = (vy >= 0.0) & (s.py + _HR_PH <= fy) & (ny + _HR_PH >= fy) & ~gaps
    bumps = (vy < 0.0) & (s.py >= fy + 2.0) & (ny < fy + 2.0) & ~gaps
    land_y = jnp.where(lands, fy - _HR_PH, jnp.inf).min()
    bump_y = jnp.where(bumps, fy + 2.0, -jnp.inf).max()
    ny = jnp.where(lands.any(), land_y, jnp.where(bumps.any(), bump_y, ny))
    vy = jnp.where(lands.any() | bumps.any(), 0.0, vy)
    py = jnp.clip(ny, 8.0, 78.0)
    # First landing on each deeper floor per life pays the descent bonus.
    fresh_floors = lands & ~s.visited
    visited = s.visited | fresh_floors
    n_fresh = fresh_floors.sum().astype(jnp.int32)
    descent_pay = n_fresh * 50

    band = _hr_band(py)
    bandc = jnp.clip(band, 0, _HR_FLOORS - 1)
    wx = jnp.asarray(_HR_WALLX)[bandc]
    in_wall = (band >= 0) & s.wall_up[bandc] & (wx >= 0.0) \
        & (px + _HR_PW > wx) & (px < wx + _HR_WALLW)
    push_left = px + _HR_PW / 2.0 < wx + _HR_WALLW / 2.0
    px = jnp.where(in_wall, jnp.where(push_left, wx - _HR_PW, wx + _HR_WALLW), px)

    # Laser.
    fires = (fire > 0) & (dy <= 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _HR_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + 2.0, s.shot_y)
    shot_vx = jnp.where(fires, facing * _HR_SHOT, s.shot_vx)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    sband = _hr_band(shot_y)
    sbandc = jnp.clip(sband, 0, _HR_FLOORS - 1)
    swx = jnp.asarray(_HR_WALLX)[sbandc]
    s_hits_wall = (sband >= 0) & s.wall_up[sbandc] & (swx >= 0.0) \
        & (shot_x >= swx) & (shot_x < swx + _HR_WALLW)
    shot_live = shot_live & (shot_x >= 0) & (shot_x < 84) & ~s_hits_wall

    # Dynamite.
    plants = (fire > 0) & (dy > 0) & (s.dyn_timer == 0) & (band >= 0) \
        & s.wall_up[bandc]
    dyn_timer = jnp.where(plants, _HR_DYN, jnp.maximum(s.dyn_timer - 1, 0))
    dyn_band = jnp.where(plants, band, s.dyn_band)
    blows = (s.dyn_timer == 1) & (dyn_band >= 0)
    dbc = jnp.clip(dyn_band, 0, _HR_FLOORS - 1)
    dwx = jnp.asarray(_HR_WALLX)[dbc]
    clear_of_blast = (jnp.abs(px - dwx) > 6.0) | (_hr_band(py) != dyn_band)
    wall_up = jnp.where(blows & s.wall_up[dbc] & clear_of_blast,
                        s.wall_up.at[dbc].set(False), s.wall_up)
    blasted = blows & s.wall_up[dbc] & ~clear_of_blast

    # Critters.
    crit_x = jnp.where(s.crit_live, s.crit_x + s.crit_dir * cspeed, s.crit_x)
    crit_dir = jnp.where(s.crit_live & (crit_x < 4.0), 1.0,
                         jnp.where(s.crit_live & (crit_x > 76.0), -1.0, s.crit_dir))
    crit_x = jnp.clip(crit_x, 4.0, 76.0)
    cy = fy[jnp.asarray(_HR_CFLOOR)] - _HR_CH
    shot_hits = (
        shot_live & s.crit_live
        & (shot_x >= crit_x) & (shot_x < crit_x + _HR_CW)
        & (shot_y >= cy) & (shot_y < cy + _HR_CH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    crit_live = s.crit_live & ~kill
    reward = kill.any().astype(jnp.float32) * 75.0 + descent_pay.astype(jnp.float32)
    score = s.score + jnp.where(kill.any(), 75, 0) + descent_pay

    bitten = ~blasted & (
        crit_live
        & (px + _HR_PW > crit_x) & (px < crit_x + _HR_CW)
        & (py + _HR_PH > cy) & (py < cy + _HR_CH)
    ).any()

    my = fy[_HR_FLOORS - 1] - 6.0
    rescued = ~blasted & ~bitten \
        & (px + _HR_PW > _HR_MINERX) & (px < _HR_MINERX + 4.0) \
        & (py + _HR_PH > my) & (py < my + 6.0)
    reward = reward + jnp.where(rescued, 1000.0, 0.0)
    score = score + jnp.where(rescued, 1000, 0)
    level = s.level + rescued.astype(jnp.int32)

    power_used = s.power_used + 1
    drained = ~blasted & ~bitten & ~rescued & (power_used >= _HR_POWER)
    died = blasted | bitten | drained
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))

    lf = _hr_level_fields()
    wall_up = jnp.where(rescued, lf["wall_up"], wall_up)
    crit_live = jnp.where(rescued, lf["crit_live"], crit_live)
    crit_x = jnp.where(rescued, lf["crit_x"], crit_x)
    crit_dir = jnp.where(rescued, lf["crit_dir"], crit_dir)
    re = _hr_respawn_fields()
    rsp = died | rescued
    px = jnp.where(rsp, re["px"], px)
    py = jnp.where(rsp, re["py"], py)
    vy = jnp.where(rsp, re["vy"], vy)
    facing = jnp.where(rsp, re["facing"], facing)
    shot_live = jnp.where(rsp, re["shot_live"], shot_live)
    dyn_timer = jnp.where(rsp, re["dyn_timer"], dyn_timer)
    dyn_band = jnp.where(rsp, re["dyn_band"], dyn_band)
    power_used = jnp.where(rsp, re["power_used"], power_used)
    visited = jnp.where(rsp, re["visited"], visited)

    out = HeroCore(
        px=px, py=py, vy=vy, facing=facing, shot_live=shot_live,
        shot_x=shot_x, shot_y=shot_y, shot_vx=shot_vx, dyn_timer=dyn_timer,
        dyn_band=dyn_band, visited=visited, wall_up=wall_up, crit_live=crit_live,
        crit_x=crit_x, crit_dir=crit_dir, power_used=power_used, level=level,
        lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _hr_render(s: HeroCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    for fl in range(_HR_FLOORS):
        y0 = int(_HR_FY[fl])
        row = (y >= y0) & (y < y0 + 2) & (x >= 2) & (x < 82)
        if fl < _HR_FLOORS - 1:
            row = row & ~((x >= int(_HR_GAPX[fl])) & (x < int(_HR_GAPX[fl] + _HR_GAPW)))
        f = jnp.where(row, jnp.uint8(100), f)
        if _HR_WALLX[fl] >= 0.0:
            wm = _rect_mask(y, x, float(_HR_WALLX[fl]), float(_HR_FY[fl]) - 13.0,
                            _HR_WALLW, 13.0) & s.wall_up[fl]
            f = jnp.where(wm, jnp.uint8(130), f)
    for c in range(_HR_CRIT):
        m = _rect_mask(y, x, s.crit_x[c], float(_HR_FY[_HR_CFLOOR[c]]) - _HR_CH,
                       _HR_CW, _HR_CH) & s.crit_live[c]
        f = jnp.where(m, jnp.uint8(170), f)
    f = jnp.where(_rect_mask(y, x, _HR_MINERX, float(_HR_FY[-1]) - 6.0, 4.0, 6.0),
                  jnp.uint8(210), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y, 2.0, 2.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    dbc = jnp.clip(s.dyn_band, 0, _HR_FLOORS - 1)
    dm = _rect_mask(y, x, jnp.asarray(_HR_WALLX)[dbc] - 2.0,
                    jnp.asarray(_HR_FY)[dbc] - 4.0, 2.0, 2.0) \
        & (s.dyn_timer > 0) & (s.dyn_band >= 0)
    f = jnp.where(dm, jnp.uint8(240), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _HR_PW, _HR_PH), jnp.uint8(255), f)
    left = (_HR_POWER - s.power_used) * 60 // _HR_POWER
    meter = (y == 3) & (x >= 2) & (x < 2 + left)
    f = jnp.where(meter, jnp.uint8(160), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 75, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _HR_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


HERO = dict(
    reset=_hr_reset,
    act=_hr_act,
    render=_hr_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Yars' Revenge (csrc/envs/yars_revenge.cc)
# ---------------------------------------------------------------------------

_YR_COLS, _YR_ROWS = 4, 10
_YR_SX, _YR_SY = 66.0, 22.0
_YR_CW = _YR_CH = 4.0
_YR_QX, _YR_QY = 78.0, 40.0
_YR_YW = _YR_YH = 4.0
_YR_MOVE = 1.2
_YR_MIS_V = 0.55
_YR_SWIRL_V = 2.2
_YR_SWIRL_P = 600
_YR_CANNON_V = 2.5
_YR_COST = 4
_YR_LIVES = 3


@flax.struct.dataclass
class YarsCore:
    shield: jax.Array    # [10, 4] bool
    px: jax.Array
    py: jax.Array
    mis_x: jax.Array
    mis_y: jax.Array
    swirl_live: jax.Array
    swirl_x: jax.Array
    swirl_y: jax.Array
    swirl_vx: jax.Array
    swirl_vy: jax.Array
    cannon_live: jax.Array
    cannon_x: jax.Array
    cannon_y: jax.Array
    charge: jax.Array
    frame: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _yr_respawn_fields():
    return dict(
        px=jnp.float32(10.0), py=jnp.float32(40.0),
        mis_x=jnp.float32(70.0), mis_y=jnp.float32(10.0),
        swirl_live=jnp.bool_(False), cannon_live=jnp.bool_(False),
        frame=jnp.int32(0),
    )


def _yr_reset(key):
    del key  # fully deterministic (yars_revenge.cc reset_game)
    return YarsCore(
        shield=jnp.ones((_YR_ROWS, _YR_COLS), bool),
        swirl_x=jnp.float32(0.0), swirl_y=jnp.float32(0.0),
        swirl_vx=jnp.float32(0.0), swirl_vy=jnp.float32(0.0),
        cannon_x=jnp.float32(0.0), cannon_y=jnp.float32(0.0),
        charge=jnp.int32(0), lives=jnp.int32(_YR_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False), **_yr_respawn_fields(),
    )


def _yr_cell(fx, fy):
    c = ((fx - _YR_SX) / _YR_CW).astype(jnp.int32)
    r = ((fy - _YR_SY) / _YR_CH).astype(jnp.int32)
    ok = (c >= 0) & (c < _YR_COLS) & (r >= 0) & (r < _YR_ROWS) \
        & (fx >= _YR_SX) & (fy >= _YR_SY)
    return jnp.clip(r, 0, _YR_ROWS - 1), jnp.clip(c, 0, _YR_COLS - 1), ok


def _yr_act(s: YarsCore, dx, dy, fire, key):
    del key  # fully deterministic
    live = ~s.over
    frame = s.frame + 1

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _YR_MOVE, 2.0, 80.0 - _YR_YW)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * _YR_MOVE, 10.0, 80.0 - _YR_YH)

    r, c, ok = _yr_cell(px + _YR_YW / 2.0, py + _YR_YH / 2.0)
    nibbles = ok & s.shield[r, c]
    shield = jnp.where(nibbles, s.shield.at[r, c].set(False), s.shield)
    charge = s.charge + nibbles.astype(jnp.int32)
    reward = jnp.where(nibbles, 69.0, 0.0)
    score = s.score + jnp.where(nibbles, 69, 0)

    fires = (fire > 0) & ~s.cannon_live & (charge >= _YR_COST)
    charge = jnp.where(fires, charge - _YR_COST, charge)
    cannon_live = s.cannon_live | fires
    cannon_x = jnp.where(fires, 0.0, s.cannon_x)
    cannon_y = jnp.where(fires, py + _YR_YH / 2.0, s.cannon_y)
    cannon_x = jnp.where(cannon_live, cannon_x + _YR_CANNON_V, cannon_x)
    cr, cc, cok = _yr_cell(cannon_x, cannon_y)
    spends = cannon_live & cok & shield[cr, cc]
    shield = jnp.where(spends, shield.at[cr, cc].set(False), shield)
    reward = reward + jnp.where(spends, 69.0, 0.0)
    score = score + jnp.where(spends, 69, 0)
    qhits = cannon_live & ~spends & (cannon_x >= _YR_QX - 2.0) \
        & (jnp.abs(cannon_y - (_YR_QY + 3.0)) < 5.0)
    reward = reward + jnp.where(qhits, 2000.0, 0.0)
    score = score + jnp.where(qhits, 2000, 0)
    shield = jnp.where(qhits, jnp.ones_like(shield), shield)
    charge = jnp.where(qhits, 0, charge)
    cannon_live = cannon_live & ~spends & ~qhits & (cannon_x < 84.0)

    mdx = px + _YR_YW / 2.0 - s.mis_x
    mdy = py + _YR_YH / 2.0 - s.mis_y
    mn = jnp.sqrt(mdx * mdx + mdy * mdy) + 1e-3
    mis_x = s.mis_x + mdx / mn * _YR_MIS_V
    mis_y = s.mis_y + mdy / mn * _YR_MIS_V
    missiled = (px + _YR_YW > mis_x - 1.0) & (px < mis_x + 1.0) \
        & (py + _YR_YH > mis_y - 1.0) & (py < mis_y + 1.0)

    launches = ~s.swirl_live & (frame % _YR_SWIRL_P == 0)
    sdx = px - _YR_QX
    sdy = py - (_YR_QY + 3.0)
    sn = jnp.sqrt(sdx * sdx + sdy * sdy) + 1e-3
    swirl_live = s.swirl_live | launches
    swirl_x = jnp.where(launches, _YR_QX, s.swirl_x)
    swirl_y = jnp.where(launches, _YR_QY + 3.0, s.swirl_y)
    swirl_vx = jnp.where(launches, sdx / sn * _YR_SWIRL_V, s.swirl_vx)
    swirl_vy = jnp.where(launches, sdy / sn * _YR_SWIRL_V, s.swirl_vy)
    swirl_x = jnp.where(swirl_live, swirl_x + swirl_vx, swirl_x)
    swirl_y = jnp.where(swirl_live, swirl_y + swirl_vy, swirl_y)
    swirl_off = swirl_live & (
        (swirl_x < -4.0) | (swirl_x >= 88.0) | (swirl_y < -4.0) | (swirl_y >= 88.0)
    )
    swirl_live = swirl_live & ~swirl_off
    swirled = ~missiled & swirl_live \
        & (px + _YR_YW > swirl_x - 2.0) & (px < swirl_x + 2.0) \
        & (py + _YR_YH > swirl_y - 2.0) & (py < swirl_y + 2.0)

    died = missiled | swirled
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    re = _yr_respawn_fields()
    px = jnp.where(died, re["px"], px)
    py = jnp.where(died, re["py"], py)
    mis_x = jnp.where(died, re["mis_x"], mis_x)
    mis_y = jnp.where(died, re["mis_y"], mis_y)
    swirl_live = jnp.where(died, re["swirl_live"], swirl_live)
    cannon_live = jnp.where(died, re["cannon_live"], cannon_live)
    frame = jnp.where(died, re["frame"], frame)

    out = YarsCore(
        shield=shield, px=px, py=py, mis_x=mis_x, mis_y=mis_y,
        swirl_live=swirl_live, swirl_x=swirl_x, swirl_y=swirl_y,
        swirl_vx=swirl_vx, swirl_vy=swirl_vy, cannon_live=cannon_live,
        cannon_x=cannon_x, cannon_y=cannon_y, charge=charge, frame=frame,
        lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _yr_render(s: YarsCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Shield cells (3x3 visible within each 4x4 cell).
    c = ((x - int(_YR_SX)) // int(_YR_CW))
    r = ((y - int(_YR_SY)) // int(_YR_CH))
    in_block = (x >= int(_YR_SX)) & (c >= 0) & (c < _YR_COLS) \
        & (y >= int(_YR_SY)) & (r >= 0) & (r < _YR_ROWS)
    sub = ((x - int(_YR_SX)) % int(_YR_CW) < int(_YR_CW) - 1) \
        & ((y - int(_YR_SY)) % int(_YR_CH) < int(_YR_CH) - 1)
    cell_on = s.shield[jnp.clip(r, 0, _YR_ROWS - 1), jnp.clip(c, 0, _YR_COLS - 1)]
    f = jnp.where(in_block & sub & cell_on, jnp.uint8(150), f)
    f = jnp.where(_rect_mask(y, x, _YR_QX, _YR_QY, 4.0, 6.0), jnp.uint8(200), f)
    cm = _rect_mask(y, x, s.cannon_x - 2.0, s.cannon_y - 1.0, 4.0, 2.0) \
        & s.cannon_live
    f = jnp.where(cm, jnp.uint8(240), f)
    f = jnp.where(_rect_mask(y, x, s.mis_x - 1.0, s.mis_y - 1.0, 2.0, 2.0),
                  jnp.uint8(210), f)
    sm = _rect_mask(y, x, s.swirl_x - 2.0, s.swirl_y - 2.0, 4.0, 4.0) & s.swirl_live
    f = jnp.where(sm, jnp.uint8(230), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _YR_YW, _YR_YH), jnp.uint8(255), f)
    chg = (y == 3) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.charge, 20))
    f = jnp.where(chg, jnp.uint8(180), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 69, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _YR_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


YARS_REVENGE = dict(
    reset=_yr_reset,
    act=_yr_act,
    render=_yr_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Krull (csrc/envs/krull.cc)
# ---------------------------------------------------------------------------

_KR_SLAY = 4
_KR_SW = _KR_SH = 5.0
_KR_PW, _KR_PH = 4.0, 5.0
_KR_WALK = 1.0
_KR_GV = 2.5
_KR_RANGE = 26.0
_KR_SPAWN = 120
_KR_SQUAD = 8
_KR_LIVES = 3


@flax.struct.dataclass
class KrullCore:
    px: jax.Array
    py: jax.Array
    face_dx: jax.Array
    face_dy: jax.Array
    glaive: jax.Array    # 0 held, 1 outbound, 2 returning
    gx: jax.Array
    gy: jax.Array
    gvx: jax.Array
    gvy: jax.Array
    gdist: jax.Array
    slayer_live: jax.Array
    sx: jax.Array
    sy: jax.Array
    spawn_clock: jax.Array
    squad_kills: jax.Array
    wave: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _kr_respawn_fields():
    return dict(
        px=jnp.float32(40.0), py=jnp.float32(45.0),
        face_dx=jnp.float32(1.0), face_dy=jnp.float32(0.0),
        glaive=jnp.int32(0), slayer_live=jnp.zeros(_KR_SLAY, bool),
        spawn_clock=jnp.int32(_KR_SPAWN),
    )


def _kr_reset(key):
    del key  # fully deterministic (krull.cc reset_game)
    return KrullCore(
        gx=jnp.float32(0.0), gy=jnp.float32(0.0), gvx=jnp.float32(0.0),
        gvy=jnp.float32(0.0), gdist=jnp.float32(0.0),
        sx=jnp.zeros(_KR_SLAY, jnp.float32), sy=jnp.zeros(_KR_SLAY, jnp.float32),
        squad_kills=jnp.int32(0), wave=jnp.int32(0),
        lives=jnp.int32(_KR_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_kr_respawn_fields(),
    )


def _kr_act(s: KrullCore, dx, dy, fire, key):
    live = ~s.over
    k_edge, k_t = jax.random.split(key)
    sspeed = 0.5 + 0.08 * s.wave.astype(jnp.float32)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _KR_WALK, 4.0, 80.0 - _KR_PW)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * _KR_WALK, 10.0, 80.0 - _KR_PH)
    moved = (dx != 0) | (dy != 0)
    face_dx = jnp.where(moved, dx.astype(jnp.float32), s.face_dx)
    face_dy = jnp.where(moved, dy.astype(jnp.float32), s.face_dy)

    throws = (fire > 0) & (s.glaive == 0)
    n = jnp.abs(face_dx) + jnp.abs(face_dy)
    n = jnp.where(n > 0, n, 1.0)
    glaive = jnp.where(throws, 1, s.glaive)
    gx = jnp.where(throws, px + _KR_PW / 2.0, s.gx)
    gy = jnp.where(throws, py + _KR_PH / 2.0, s.gy)
    gvx = jnp.where(throws, face_dx / n * _KR_GV, s.gvx)
    gvy = jnp.where(throws, face_dy / n * _KR_GV, s.gvy)
    gdist = jnp.where(throws, 0.0, s.gdist)
    out_leg = glaive == 1
    gx = jnp.where(out_leg, gx + gvx, gx)
    gy = jnp.where(out_leg, gy + gvy, gy)
    gdist = jnp.where(out_leg, gdist + _KR_GV, gdist)
    turns = out_leg & (
        (gdist >= _KR_RANGE) | (gx < 2.0) | (gx >= 82.0) | (gy < 8.0) | (gy >= 82.0)
    )
    glaive = jnp.where(turns, 2, glaive)
    back_leg = glaive == 2
    hdx = px + _KR_PW / 2.0 - gx
    hdy = py + _KR_PH / 2.0 - gy
    hn = jnp.sqrt(hdx * hdx + hdy * hdy)
    caught = back_leg & (hn < _KR_GV)
    glaive = jnp.where(caught, 0, glaive)
    gx = jnp.where(back_leg & ~caught, gx + hdx / jnp.maximum(hn, 1e-3) * _KR_GV, gx)
    gy = jnp.where(back_leg & ~caught, gy + hdy / jnp.maximum(hn, 1e-3) * _KR_GV, gy)

    spawn_clock = s.spawn_clock + 1
    spawning = spawn_clock >= _KR_SPAWN
    spawn_clock = jnp.where(spawning, 0, spawn_clock)
    slot = _first_true(~s.slayer_live) & spawning
    edge = jax.random.randint(k_edge, (), 0, 4)
    t = 8.0 + jax.random.randint(k_t, (), 0, 64).astype(jnp.float32)
    new_x = jnp.where(edge < 2, t, jnp.where(edge == 2, 4.0, 76.0))
    new_y = jnp.where(edge == 0, 10.0, jnp.where(edge == 1, 76.0, t))
    slayer_live = s.slayer_live | slot
    sx = jnp.where(slot, new_x, s.sx)
    sy = jnp.where(slot, new_y, s.sy)

    ddx, ddy = px - sx, py - sy
    dn = jnp.sqrt(ddx * ddx + ddy * ddy) + 1e-3
    sx = jnp.where(slayer_live, sx + ddx / dn * sspeed, sx)
    sy = jnp.where(slayer_live, sy + ddy / dn * sspeed, sy)

    cuts = (
        (glaive != 0) & slayer_live
        & (gx >= sx) & (gx < sx + _KR_SW)
        & (gy >= sy) & (gy < sy + _KR_SH)
    )
    slayer_live = slayer_live & ~cuts
    n_cut = cuts.sum().astype(jnp.int32)
    reward = n_cut.astype(jnp.float32) * 150.0
    score = s.score + n_cut * 150
    squad_kills = s.squad_kills + n_cut
    squads = squad_kills >= _KR_SQUAD
    squad_kills = jnp.where(squads, 0, squad_kills)
    wave = s.wave + squads.astype(jnp.int32)
    reward = reward + jnp.where(squads, 500.0, 0.0)
    score = score + jnp.where(squads, 500, 0)

    caught_by = (
        slayer_live
        & (px + _KR_PW > sx) & (px < sx + _KR_SW)
        & (py + _KR_PH > sy) & (py < sy + _KR_SH)
    ).any()

    lives = s.lives - caught_by.astype(jnp.int32)
    over = s.over | (caught_by & (lives <= 0))
    re = _kr_respawn_fields()
    px = jnp.where(caught_by, re["px"], px)
    py = jnp.where(caught_by, re["py"], py)
    face_dx = jnp.where(caught_by, re["face_dx"], face_dx)
    face_dy = jnp.where(caught_by, re["face_dy"], face_dy)
    glaive = jnp.where(caught_by, re["glaive"], glaive)
    slayer_live = jnp.where(caught_by, re["slayer_live"], slayer_live)
    spawn_clock = jnp.where(caught_by, re["spawn_clock"], spawn_clock)

    out = KrullCore(
        px=px, py=py, face_dx=face_dx, face_dy=face_dy, glaive=glaive,
        gx=gx, gy=gy, gvx=gvx, gvy=gvy, gdist=gdist,
        slayer_live=slayer_live, sx=sx, sy=sy, spawn_clock=spawn_clock,
        squad_kills=squad_kills, wave=wave, lives=lives, score=score,
        over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _kr_render(s: KrullCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where(y == 81, jnp.uint8(70), f)
    for i in range(_KR_SLAY):
        m = _rect_mask(y, x, s.sx[i], s.sy[i], _KR_SW, _KR_SH) & s.slayer_live[i]
        f = jnp.where(m, jnp.uint8(170), f)
    gm = _rect_mask(y, x, s.gx - 2.0, s.gy - 2.0, 4.0, 4.0) & (s.glaive != 0)
    f = jnp.where(gm, jnp.uint8(230), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _KR_PW, _KR_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 150, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 83) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _KR_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


KRULL = dict(
    reset=_kr_reset,
    act=_kr_act,
    render=_kr_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
