"""Pure-JAX twins of the fourth wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/atlantis.cc,
bowling.cc, fishing_derby.cc, crazy_climber.cc) so the Anakin trainer covers
the same task set as the Sebulba host-env path; reset frames are
pixel-identical across engines (tests/test_jax_engine.py). Each game exposes
the functional dict contract of jax_engine._BREAKOUT: reset / act (one raw
frame) / render / lives / over.

The engines draw independent RNG streams (PCG32 vs threefry), so
trajectories diverge after the first stochastic event — rules, scoring, and
rendering are what must match, and do.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["ATLANTIS", "BOWLING", "FISHING_DERBY", "CRAZY_CLIMBER"]


# ---------------------------------------------------------------------------
# Atlantis (csrc/envs/atlantis.cc)
# ---------------------------------------------------------------------------

_AT_BANDS = 4
_AT_SHIPS = 4
_AT_SHIP_W, _AT_SHIP_H = 7, 4
_AT_CITY = 6
_AT_CITY_W, _AT_CITY_H = 8, 5
_AT_CITY_Y = 76.0
_AT_BAND_Y = np.array([12.0, 24.0, 36.0, 48.0], np.float32)
_AT_BAND_SPEED = np.array([0.5, 0.65, 0.8, 1.0], np.float32)
_AT_BAND_SCORE = np.array([100.0, 200.0, 500.0, 1000.0], np.float32)
_AT_CITY_X = np.array([4.0, 17.0, 30.0, 46.0, 59.0, 72.0], np.float32)
_AT_GUN = dict(cx=41.0, cy=70.0, lx=6.0, ly=74.0, rx=77.0, ry=74.0)
# Per-gun muzzle and velocity tables, indexed center/left/right.
_AT_MUZ_X = np.array([41.0, 6.0, 77.0], np.float32)
_AT_MUZ_Y = np.array([70.0, 74.0, 74.0], np.float32)
_AT_VX = np.array([0.0, 1.5, -1.5], np.float32)
_AT_VY = np.array([-2.5, -2.2, -2.2], np.float32)


@flax.struct.dataclass
class AtlantisCore:
    x: jax.Array        # [4] f32 ship x
    dir: jax.Array      # [4] f32
    band: jax.Array     # [4] i32
    live: jax.Array     # [4] bool
    timer: jax.Array    # [4] i32
    sx: jax.Array       # [3] f32 shot x
    sy: jax.Array
    svx: jax.Array
    svy: jax.Array
    shot_live: jax.Array  # [3] bool
    city: jax.Array     # [6] bool
    score: jax.Array
    over: jax.Array


def _at_reset(key):
    del key  # deterministic layout (atlantis.cc:45-56)
    return AtlantisCore(
        x=jnp.full((_AT_SHIPS,), -float(_AT_SHIP_W), jnp.float32),
        dir=jnp.ones((_AT_SHIPS,), jnp.float32),
        band=jnp.zeros((_AT_SHIPS,), jnp.int32),
        live=jnp.asarray([True, False, False, False]),
        timer=jnp.asarray([30, 70, 110, 150], jnp.int32),
        sx=jnp.zeros((3,), jnp.float32),
        sy=jnp.zeros((3,), jnp.float32),
        svx=jnp.zeros((3,), jnp.float32),
        svy=jnp.zeros((3,), jnp.float32),
        shot_live=jnp.zeros((3,), bool),
        city=jnp.ones((_AT_CITY,), bool),
        score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _at_act(s: AtlantisCore, dx, dy, fire, key):
    del dy
    live_game = ~s.over
    reward = jnp.float32(0.0)

    # Fire control: FIRE = center, LEFTFIRE = left gun, RIGHTFIRE = right gun.
    g = jnp.where(dx < 0, 1, jnp.where(dx > 0, 2, 0))
    want = (fire > 0) & ~s.shot_live[g]
    shot_live = s.shot_live.at[g].set(s.shot_live[g] | want)
    sx = jnp.where(want, s.sx.at[g].set(jnp.asarray(_AT_MUZ_X)[g]), s.sx)
    sy = jnp.where(want, s.sy.at[g].set(jnp.asarray(_AT_MUZ_Y)[g]), s.sy)
    svx = jnp.where(want, s.svx.at[g].set(jnp.asarray(_AT_VX)[g]), s.svx)
    svy = jnp.where(want, s.svy.at[g].set(jnp.asarray(_AT_VY)[g]), s.svy)

    # Shots fly (the shot spawned this frame advances too, atlantis.cc:79-84).
    sx = jnp.where(shot_live, sx + svx, sx)
    sy = jnp.where(shot_live, sy + svy, sy)
    shot_live = shot_live & (sy >= -2.0) & (sx >= -2.0) & (sx <= 84.0)

    ship_x, ship_dir, band = s.x, s.dir, s.band
    ship_live, timer, city = s.live, s.timer, s.city
    keys = jax.random.split(key, _AT_SHIPS * 2)

    for i in range(_AT_SHIPS):
        k_dir, k_timer = keys[2 * i], keys[2 * i + 1]
        alive = ship_live[i]
        # Dead slot: count down, then respawn at the top band.
        t = timer[i] - 1
        spawn = ~alive & (t <= 0)
        new_dir = jnp.where(jax.random.uniform(k_dir) < 0.5, 1.0, -1.0)
        spawn_x = jnp.where(new_dir > 0, -float(_AT_SHIP_W), 84.0)
        timer = timer.at[i].set(jnp.where(alive, timer[i], t))
        ship_live = ship_live.at[i].set(alive | spawn)
        band = band.at[i].set(jnp.where(spawn, 0, band[i]))
        ship_dir = ship_dir.at[i].set(jnp.where(spawn, new_dir, ship_dir[i]))
        ship_x = ship_x.at[i].set(jnp.where(spawn, spawn_x, ship_x[i]))

        # Live ship: sweep; surviving a pass drops one band or zaps the city.
        xi = ship_x[i] + jnp.where(alive, ship_dir[i] * jnp.asarray(_AT_BAND_SPEED)[band[i]], 0.0)
        crossed = alive & jnp.where(ship_dir[i] > 0, xi > 84.0, xi < -float(_AT_SHIP_W))
        at_bottom = band[i] == _AT_BANDS - 1
        zap = crossed & at_bottom
        # Death ray takes the leftmost surviving installation.
        zap_idx = jnp.argmax(city)
        city = jnp.where(zap & jnp.any(city), city.at[zap_idx].set(False), city)
        ship_live = ship_live.at[i].set(ship_live[i] & ~zap)
        timer = timer.at[i].set(jnp.where(
            zap, 60 + jax.random.randint(k_timer, (), 0, 60), timer[i]))
        descend = crossed & ~at_bottom
        band = band.at[i].set(jnp.where(descend, band[i] + 1, band[i]))
        flipped = jnp.where(descend, -ship_dir[i], ship_dir[i])
        ship_dir = ship_dir.at[i].set(flipped)
        xi = jnp.where(descend, jnp.where(flipped > 0, -float(_AT_SHIP_W), 84.0), xi)
        ship_x = ship_x.at[i].set(xi)

        # Shot vs ship (checked after the move, atlantis.cc:103-115).
        by = jnp.asarray(_AT_BAND_Y)[band[i]]
        hit_g = (
            shot_live & ship_live[i]
            & (sx + 1 > ship_x[i]) & (sx < ship_x[i] + _AT_SHIP_W)
            & (sy + 2 > by) & (sy < by + _AT_SHIP_H)
        )
        hit = jnp.any(hit_g)
        pts = jnp.where(hit, jnp.asarray(_AT_BAND_SCORE)[band[i]], 0.0)
        reward = reward + pts
        # Only the first hitting shot dies with the ship (sequential C++ loop).
        first = jnp.argmax(hit_g)
        shot_live = shot_live.at[first].set(shot_live[first] & ~hit)
        ship_live = ship_live.at[i].set(ship_live[i] & ~hit)
        timer = timer.at[i].set(jnp.where(
            hit, 60 + jax.random.randint(jax.random.fold_in(k_timer, 1), (), 0, 60),
            timer[i]))

    score = s.score + reward.astype(jnp.int32)
    over = s.over | ~jnp.any(city)
    out = AtlantisCore(
        x=ship_x, dir=ship_dir, band=band, live=ship_live, timer=timer,
        sx=sx, sy=sy, svx=svx, svy=svy, shot_live=shot_live,
        city=city, score=score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _at_render(s: AtlantisCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Score ticks (one per 1000 points).
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 1000, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    # City installations.
    for c in range(_AT_CITY):
        m = s.city[c] & _rect_mask(y, x, float(_AT_CITY_X[c]), _AT_CITY_Y,
                                   _AT_CITY_W, _AT_CITY_H)
        f = jnp.where(m, jnp.uint8(200), f)
    # Guns.
    f = jnp.where(_rect_mask(y, x, _AT_GUN["cx"] - 1, _AT_GUN["cy"], 3, 4), jnp.uint8(180), f)
    f = jnp.where(_rect_mask(y, x, _AT_GUN["lx"] - 1, _AT_GUN["ly"], 3, 3), jnp.uint8(180), f)
    f = jnp.where(_rect_mask(y, x, _AT_GUN["rx"] - 1, _AT_GUN["ry"], 3, 3), jnp.uint8(180), f)
    # Ships (deeper bands brighter).
    for i in range(_AT_SHIPS):
        m = s.live[i] & _rect_mask(y, x, s.x[i], jnp.asarray(_AT_BAND_Y)[s.band[i]],
                                   _AT_SHIP_W, _AT_SHIP_H)
        f = jnp.where(m, (120 + 25 * s.band[i]).astype(jnp.uint8), f)
    # Shots.
    for g in range(3):
        m = s.shot_live[g] & _rect_mask(y, x, s.sx[g], s.sy[g], 1, 2)
        f = jnp.where(m, jnp.uint8(224), f)
    return f


ATLANTIS = dict(
    reset=_at_reset,
    act=_at_act,
    render=_at_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=4,
    minimal_to_full=np.array([0, 1, 11, 12], np.int32),  # NOOP FIRE RIGHTFIRE LEFTFIRE
)


# ---------------------------------------------------------------------------
# Bowling (csrc/envs/bowling.cc)
# ---------------------------------------------------------------------------

_BW_PINS = 10
_BW_LANE_TOP, _BW_LANE_BOT = 35.0, 61.0
_BW_AIM_X = 8.0
_BW_BALL_V = 1.6
_BW_CURVE = 0.22
_BW_FRAMES = 10
_BW_PIN_X = np.array([66, 70, 70, 74, 74, 74, 78, 78, 78, 78], np.float32)
_BW_PIN_Y = np.array([48, 44.5, 51.5, 41, 48, 55, 37.5, 44.5, 51.5, 58.5], np.float32)


@flax.struct.dataclass
class BowlingCore:
    standing: jax.Array  # [10] bool
    ball_x: jax.Array
    ball_y: jax.Array
    vy: jax.Array
    rolling: jax.Array
    curved: jax.Array
    tenth_extra: jax.Array
    pins_this_roll: jax.Array
    frame_no: jax.Array
    roll_in_frame: jax.Array
    bonus1: jax.Array
    bonus2: jax.Array
    score: jax.Array
    over: jax.Array


def _bw_reset(key):
    del key  # deterministic layout (bowling.cc:45-59)
    return BowlingCore(
        standing=jnp.ones((_BW_PINS,), bool),
        ball_x=jnp.float32(_BW_AIM_X),
        ball_y=jnp.float32(48.0),
        vy=jnp.float32(0.0),
        rolling=jnp.bool_(False),
        curved=jnp.bool_(False),
        tenth_extra=jnp.bool_(False),
        pins_this_roll=jnp.int32(0),
        frame_no=jnp.int32(0),
        roll_in_frame=jnp.int32(0),
        bonus1=jnp.int32(0),
        bonus2=jnp.int32(0),
        score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _bw_act(s: BowlingCore, dx, dy, fire, key):
    del dx, key
    live = ~s.over
    aiming = ~s.rolling

    # --- Aim branch (bowling.cc:66-76): move the release row; FIRE bowls.
    aim_y = jnp.clip(s.ball_y + dy.astype(jnp.float32),
                     _BW_LANE_TOP + 1, _BW_LANE_BOT - 1)
    released = aiming & (fire > 0)

    # --- Roll branch (bowling.cc:79-99): one hook per roll, then plough on.
    do_curve = s.rolling & ~s.curved & (dy != 0)
    vy = jnp.where(do_curve, _BW_CURVE * dy.astype(jnp.float32), s.vy)
    curved = s.curved | do_curve
    roll_x = s.ball_x + _BW_BALL_V
    roll_y = s.ball_y + vy
    hit_wall_top = roll_y < _BW_LANE_TOP + 1
    hit_wall_bot = roll_y > _BW_LANE_BOT - 1
    roll_y = jnp.clip(roll_y, _BW_LANE_TOP + 1, _BW_LANE_BOT - 1)
    vy = jnp.where(hit_wall_top | hit_wall_bot, 0.0, vy)

    pdx = roll_x - jnp.asarray(_BW_PIN_X)
    pdy = roll_y - jnp.asarray(_BW_PIN_Y)
    struck = s.standing & (pdx > -3.0) & (pdx < 3.0) & (pdy > -3.5) & (pdy < 3.5)
    standing_roll = s.standing & ~struck
    pins_roll = s.pins_this_roll + struck.sum().astype(jnp.int32)

    # --- Roll end (bowling.cc::finish_roll).
    done_roll = s.rolling & (roll_x > 82.0)
    roll_reward = pins_roll.astype(jnp.float32) * (1.0 + s.bonus1.astype(jnp.float32))
    bonus1 = s.bonus2
    bonus2 = jnp.int32(0)
    down = (~standing_roll).sum().astype(jnp.int32)
    strike = (s.roll_in_frame == 0) & (down == _BW_PINS)
    spare = (s.roll_in_frame == 1) & (down == _BW_PINS)
    bonus1 = bonus1 + strike.astype(jnp.int32) + spare.astype(jnp.int32)
    bonus2 = bonus2 + strike.astype(jnp.int32)
    rif = s.roll_in_frame + 1
    tenth = s.frame_no == _BW_FRAMES - 1
    earned_extra = strike | spare | s.tenth_extra
    tenth_extra = s.tenth_extra | (tenth & (strike | spare))
    frame_done = jnp.where(
        tenth,
        rif >= jnp.where(earned_extra, 3, 2),
        strike | (rif >= 2),
    )
    fresh_rack_tenth = tenth & (down == _BW_PINS) & (rif < 3)
    standing_end = jnp.where(frame_done | fresh_rack_tenth,
                             jnp.ones_like(standing_roll), standing_roll)
    frame_no = s.frame_no + frame_done.astype(jnp.int32)
    rif = jnp.where(frame_done, 0, rif)
    over_end = frame_no >= _BW_FRAMES

    # --- Select between the three phases.
    reward = jnp.where(done_roll, roll_reward, 0.0)
    out = BowlingCore(
        standing=jnp.where(aiming, s.standing,
                           jnp.where(done_roll, standing_end, standing_roll)),
        ball_x=jnp.where(aiming | done_roll, _BW_AIM_X, roll_x),
        ball_y=jnp.where(aiming, aim_y, roll_y),
        vy=jnp.where(released, 0.0, jnp.where(aiming, s.vy, vy)),
        rolling=jnp.where(aiming, released, ~done_roll),
        curved=jnp.where(released, False, jnp.where(aiming, s.curved, curved)),
        tenth_extra=jnp.where(done_roll, tenth_extra, s.tenth_extra),
        pins_this_roll=jnp.where(released | done_roll, 0,
                                 jnp.where(aiming, s.pins_this_roll, pins_roll)),
        frame_no=jnp.where(done_roll, frame_no, s.frame_no),
        roll_in_frame=jnp.where(done_roll, rif, s.roll_in_frame),
        bonus1=jnp.where(done_roll, bonus1, s.bonus1),
        bonus2=jnp.where(done_roll, bonus2, s.bonus2),
        score=s.score + jnp.where(done_roll, roll_reward, 0.0).astype(jnp.int32),
        over=s.over | (done_roll & over_end),
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _bw_render(s: BowlingCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y == int(_BW_LANE_TOP - 1)) | (y == int(_BW_LANE_BOT + 1)),
                  jnp.uint8(100), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 10, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    marker = (y == 3) & (x >= 2) & ((x - 2) % 3 == 0) \
        & ((x - 2) // 3 < jnp.minimum(s.frame_no, _BW_FRAMES))
    f = jnp.where(marker, jnp.uint8(120), f)
    for p in range(_BW_PINS):
        m = s.standing[p] & _rect_mask(y, x, float(_BW_PIN_X[p]) - 1,
                                       float(_BW_PIN_Y[p]) - 1, 2, 2)
        f = jnp.where(m, jnp.uint8(200), f)
    f = jnp.where(_rect_mask(y, x, s.ball_x - 1, s.ball_y - 1, 3, 3), jnp.uint8(224), f)
    return f


BOWLING = dict(
    reset=_bw_reset,
    act=_bw_act,
    render=_bw_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=6,
    minimal_to_full=np.array([0, 1, 2, 5, 10, 13], np.int32),
)


# ---------------------------------------------------------------------------
# Fishing Derby (csrc/envs/fishing_derby.cc)
# ---------------------------------------------------------------------------

_FD_ROWS = 6
_FD_FISH_W, _FD_FISH_H = 5.0, 3.0
_FD_HOOK_SPEED = 0.7
_FD_REEL = 1.2
_FD_CPU_SPEED = 0.6
_FD_CPU_REEL = 0.9
_FD_WIN = 99
_FD_ROW_Y = np.array([38.0, 45.0, 52.0, 59.0, 66.0, 73.0], np.float32)
_FD_ROW_SPEED = np.array([0.8, 0.7, 0.6, 0.5, 0.45, 0.4], np.float32)
_FD_ROW_VALUE = np.array([2, 2, 4, 4, 6, 6], np.int32)
_FD_ROW_DIR = np.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0], np.float32)


@flax.struct.dataclass
class FishingDerbyCore:
    fish_x: jax.Array   # [6] f32
    holder: jax.Array   # [6] i32: 0 free, 1 player, 2 cpu
    hx: jax.Array
    hy: jax.Array
    cx: jax.Array
    cy: jax.Array
    shark_x: jax.Array
    shark_dir: jax.Array
    my_score: jax.Array
    cpu_score: jax.Array
    over: jax.Array


def _fd_reset(key):
    del key  # deterministic layout (fishing_derby.cc:38-48)
    return FishingDerbyCore(
        fish_x=jnp.asarray([(r * 29 + 11) % 84 for r in range(_FD_ROWS)], jnp.float32),
        holder=jnp.zeros((_FD_ROWS,), jnp.int32),
        hx=jnp.float32(20.0), hy=jnp.float32(40.0),
        cx=jnp.float32(64.0), cy=jnp.float32(40.0),
        shark_x=jnp.float32(0.0), shark_dir=jnp.float32(1.0),
        my_score=jnp.int32(0), cpu_score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _fd_sgn(v):
    return jnp.where(v > 0.3, 1.0, jnp.where(v < -0.3, -1.0, 0.0))


def _fd_overlap(hx, hy, fx, fy):
    return (hx + 1 > fx) & (hx - 1 < fx + _FD_FISH_W) \
        & (hy + 3 > fy) & (hy < fy + _FD_FISH_H)


def _fd_act(s: FishingDerbyCore, dx, dy, fire, key):
    live = ~s.over
    reward = jnp.float32(0.0)
    k_steal = jax.random.split(key, _FD_ROWS + 2)

    # Player hook: free movement; FIRE reels straight up.
    hx = jnp.clip(s.hx + dx.astype(jnp.float32) * _FD_HOOK_SPEED, 4.0, 40.0)
    hy = s.hy + dy.astype(jnp.float32) * _FD_HOOK_SPEED - jnp.where(fire > 0, _FD_REEL, 0.0)
    hy = jnp.clip(hy, 34.0, 78.0)

    # CPU angler: nearest free fish, then a steady reel.
    holder = s.holder
    cpu_holds = jnp.any(holder == 2)
    fdx = s.fish_x - s.cx
    fdy = jnp.asarray(_FD_ROW_Y) - s.cy
    dist = jnp.where(holder == 0, fdx * fdx + fdy * fdy, jnp.inf)
    best = jnp.argmin(dist)
    any_free = jnp.any(holder == 0)
    cx = s.cx + jnp.where(~cpu_holds & any_free, _FD_CPU_SPEED * _fd_sgn(fdx[best]), 0.0)
    cy = s.cy + jnp.where(cpu_holds, -_FD_CPU_REEL,
                          jnp.where(any_free, _FD_CPU_SPEED * _fd_sgn(fdy[best]), 0.0))
    cx = jnp.clip(cx, 44.0, 80.0)
    cy = jnp.clip(cy, 34.0, 78.0)

    # Fish swim and wrap; hooked fish ride their hook; a free hook snags the
    # first fish it touches (row order, fishing_derby.cc:86-105).
    fish_x = s.fish_x
    for r in range(_FD_ROWS):
        held = holder[r]
        swim = fish_x[r] + _FD_ROW_DIR[r] * _FD_ROW_SPEED[r]
        swim = jnp.where(swim > 84.0, -_FD_FISH_W, swim)
        swim = jnp.where(swim < -_FD_FISH_W, 84.0, swim)
        fx = jnp.where(held == 1, hx - 2.0, jnp.where(held == 2, cx - 2.0, swim))
        fish_x = fish_x.at[r].set(fx)
        free = held == 0
        p_free = ~jnp.any(holder == 1)
        c_free = ~jnp.any(holder == 2)
        p_hook = free & p_free & _fd_overlap(hx, hy, fx, _FD_ROW_Y[r])
        c_hook = free & c_free & ~p_hook & _fd_overlap(cx, cy, fx, _FD_ROW_Y[r])
        holder = holder.at[r].set(jnp.where(p_hook, 1, jnp.where(c_hook, 2, held)))

    # Shark patrols under the surface and steals shallow hooked fish.
    shark_x = s.shark_x + s.shark_dir * 0.9
    shark_dir = jnp.where(shark_x > 77.0, -1.0, jnp.where(shark_x < 0.0, 1.0, s.shark_dir))
    shark_x = jnp.clip(shark_x, 0.0, 77.0)
    for r in range(_FD_ROWS):
        fy = jnp.where(holder[r] == 1, hy, cy)
        stolen = (holder[r] != 0) & (fy < 40.0) \
            & (fish_x[r] + _FD_FISH_W > shark_x) & (fish_x[r] < shark_x + 7.0)
        side = jnp.where(jax.random.uniform(k_steal[r]) < 0.5, -_FD_FISH_W, 84.0)
        fish_x = fish_x.at[r].set(jnp.where(stolen, side, fish_x[r]))
        holder = holder.at[r].set(jnp.where(stolen, 0, holder[r]))

    # Landing at the surface scores the fish's row value.
    values = jnp.asarray(_FD_ROW_VALUE)
    mine = holder == 1
    land_p = jnp.any(mine) & (hy <= 34.5)
    p_val = jnp.where(land_p, (values * mine).sum(), 0)
    theirs = holder == 2
    land_c = jnp.any(theirs) & (cy <= 34.5)
    c_val = jnp.where(land_c, (values * theirs).sum(), 0)
    reward = reward + p_val.astype(jnp.float32) - c_val.astype(jnp.float32)
    side_p = jnp.where(jax.random.uniform(k_steal[_FD_ROWS]) < 0.5, -_FD_FISH_W, 84.0)
    side_c = jnp.where(jax.random.uniform(k_steal[_FD_ROWS + 1]) < 0.5, -_FD_FISH_W, 84.0)
    fish_x = jnp.where(land_p & mine, side_p, fish_x)
    fish_x = jnp.where(land_c & theirs, side_c, fish_x)
    holder = jnp.where(land_p & mine, 0, holder)
    holder = jnp.where(land_c & theirs, 0, holder)
    my_score = s.my_score + p_val
    cpu_score = s.cpu_score + c_val

    over = s.over | (my_score >= _FD_WIN) | (cpu_score >= _FD_WIN)
    out = FishingDerbyCore(
        fish_x=fish_x, holder=holder, hx=hx, hy=hy, cx=cx, cy=cy,
        shark_x=shark_x, shark_dir=shark_dir,
        my_score=my_score, cpu_score=cpu_score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _fd_render(s: FishingDerbyCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y == 30) | (y == 31), jnp.uint8(100), f)
    tick_p = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.my_score // 5, 20))
    f = jnp.where(tick_p, jnp.uint8(200), f)
    tick_c = (y == 3) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.cpu_score // 5, 20))
    f = jnp.where(tick_c, jnp.uint8(120), f)
    # Fishing lines from rod tips down to the hooks.
    line_p = (x == 20) & (y >= 4) & (y <= s.hy.astype(jnp.int32))
    line_c = (x == 64) & (y >= 4) & (y <= s.cy.astype(jnp.int32))
    f = jnp.where(line_p | line_c, jnp.uint8(60), f)
    f = jnp.where(_rect_mask(y, x, s.shark_x, 33.0, 7, 3), jnp.uint8(90), f)
    for r in range(_FD_ROWS):
        fy = jnp.where(s.holder[r] == 1, s.hy,
                       jnp.where(s.holder[r] == 2, s.cy, _FD_ROW_Y[r]))
        m = _rect_mask(y, x, s.fish_x[r], fy, _FD_FISH_W, _FD_FISH_H)
        f = jnp.where(m, jnp.uint8(170), f)
    f = jnp.where(_rect_mask(y, x, s.hx - 1, s.hy, 2, 3), jnp.uint8(224), f)
    f = jnp.where(_rect_mask(y, x, s.cx - 1, s.cy, 2, 3), jnp.uint8(150), f)
    return f


FISHING_DERBY = dict(
    reset=_fd_reset,
    act=_fd_act,
    render=_fd_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Crazy Climber (csrc/envs/crazy_climber.cc)
# ---------------------------------------------------------------------------

_CC_BLD_L, _CC_BLD_R = 20.0, 64.0
_CC_WIN_COLS, _CC_WIN_ROWS = 6, 13
_CC_WIN_W, _CC_WIN_H = 5, 4
_CC_PW, _CC_PH = 4, 5
_CC_START_X, _CC_START_Y = 40.0, 75.0
_CC_ROOF_Y = 6.0
_CC_OBJECTS = 2
_CC_LIVES = 5
_CC_ROW_PTS = 100.0
_CC_ROOF_BONUS = 2000.0
_CC_WIN_X = np.array([22 + 7 * j for j in range(_CC_WIN_COLS)], np.float32)
_CC_WIN_Y = np.array([6 + 6 * i for i in range(_CC_WIN_ROWS)], np.float32)


@flax.struct.dataclass
class CrazyClimberCore:
    px: jax.Array
    py: jax.Array
    best_y: jax.Array
    obj_x: jax.Array    # [2] f32
    obj_y: jax.Array
    obj_live: jax.Array
    obj_timer: jax.Array
    building: jax.Array
    lives: jax.Array
    score: jax.Array
    frame: jax.Array
    over: jax.Array


def _cc_reset(key):
    del key  # deterministic layout (crazy_climber.cc:39-50)
    return CrazyClimberCore(
        px=jnp.float32(_CC_START_X),
        py=jnp.float32(_CC_START_Y),
        best_y=jnp.float32(_CC_START_Y),
        obj_x=jnp.zeros((_CC_OBJECTS,), jnp.float32),
        obj_y=jnp.zeros((_CC_OBJECTS,), jnp.float32),
        obj_live=jnp.zeros((_CC_OBJECTS,), bool),
        obj_timer=jnp.asarray([30, 80], jnp.int32),
        building=jnp.int32(0),
        lives=jnp.int32(_CC_LIVES),
        score=jnp.int32(0),
        frame=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _cc_window_closed(frame, i, j):
    return ((frame // 50) + i + 2 * j) % 5 == 0


def _cc_in_closed_window(frame, x, y):
    wi = jnp.arange(_CC_WIN_ROWS)[:, None]
    wj = jnp.arange(_CC_WIN_COLS)[None, :]
    closed = _cc_window_closed(frame, wi, wj)
    wx = jnp.asarray(_CC_WIN_X)[None, :]
    wy = jnp.asarray(_CC_WIN_Y)[:, None]
    hit = (x + _CC_PW > wx) & (x < wx + _CC_WIN_W) \
        & (y + _CC_PH > wy) & (y < wy + _CC_WIN_H)
    return jnp.any(closed & hit)


def _cc_act(s: CrazyClimberCore, dx, dy, fire, key):
    del fire
    live = ~s.over
    frame = s.frame + 1
    k_obj = jax.random.split(key, _CC_OBJECTS * 2)

    # Climb, with shut windows blocking the way up and slamming on handholds.
    nx = jnp.clip(s.px + dx.astype(jnp.float32), _CC_BLD_L, _CC_BLD_R - _CC_PW)
    ny = jnp.clip(s.py + dy.astype(jnp.float32), 4.0, _CC_START_Y)
    blocked = (ny < s.py) & _cc_in_closed_window(frame, nx, ny)
    ny = jnp.where(blocked, s.py, ny)
    px, py = nx, ny
    slammed = _cc_in_closed_window(frame, px, py)
    py = jnp.where(slammed, jnp.clip(py + 6.0, 4.0, _CC_START_Y), py)

    obj_x, obj_y = s.obj_x, s.obj_y
    obj_live, obj_timer = s.obj_live, s.obj_timer
    lives, best_y = s.lives, s.best_y
    died = jnp.bool_(False)
    reward = jnp.float32(0.0)

    for o in range(_CC_OBJECTS):
        k_col, k_t = k_obj[2 * o], k_obj[2 * o + 1]
        alive = obj_live[o]
        # Dead slot: count down, then drop from a random column.
        t = obj_timer[o] - 1
        spawn = ~alive & (t <= 0)
        col = jax.random.randint(k_col, (), 0, _CC_WIN_COLS)
        obj_timer = obj_timer.at[o].set(jnp.where(alive, obj_timer[o], t))
        obj_live = obj_live.at[o].set(alive | spawn)
        obj_x = obj_x.at[o].set(jnp.where(spawn, jnp.asarray(_CC_WIN_X)[col], obj_x[o]))
        obj_y = obj_y.at[o].set(jnp.where(spawn, 0.0, obj_y[o]))

        # Falling.
        fall = obj_y[o] + jnp.where(alive, 1.0 + 0.2 * s.building.astype(jnp.float32), 0.0)
        off = alive & (fall > 84.0)
        obj_y = obj_y.at[o].set(fall)
        obj_live = obj_live.at[o].set(obj_live[o] & ~off)
        obj_timer = obj_timer.at[o].set(jnp.where(
            off, 40 + jax.random.randint(k_t, (), 0, 40), obj_timer[o]))

        # Hit: lose a grip and drop to the street (crazy_climber.cc:86-96).
        hit = obj_live[o] & alive & ~off & ~died \
            & (obj_x[o] + 3 > px) & (obj_x[o] < px + _CC_PW) \
            & (obj_y[o] + 3 > py) & (obj_y[o] < py + _CC_PH)
        obj_live = obj_live.at[o].set(obj_live[o] & ~hit)
        obj_timer = obj_timer.at[o].set(jnp.where(
            hit, 40 + jax.random.randint(jax.random.fold_in(k_t, 1), (), 0, 40),
            obj_timer[o]))
        lives = lives - hit.astype(jnp.int32)
        died = died | (hit & (lives <= 0))
        respawn = hit & (lives > 0)
        px = jnp.where(respawn, _CC_START_X, px)
        py = jnp.where(respawn, _CC_START_Y, py)
        best_y = jnp.where(respawn, _CC_START_Y, best_y)

    # Progress pay: +100 per new row of height (skipped on a fatal hit).
    rows = jnp.maximum(jnp.floor((best_y - py) / 6.0), 0.0)
    rows = jnp.where(died, 0.0, rows)
    best_y = best_y - 6.0 * rows
    reward = reward + _CC_ROW_PTS * rows
    # Roof: bonus, then a faster building.
    topped = ~died & (py <= _CC_ROOF_Y)
    reward = reward + jnp.where(topped, _CC_ROOF_BONUS, 0.0)
    building = s.building + topped.astype(jnp.int32)
    px = jnp.where(topped, _CC_START_X, px)
    py = jnp.where(topped, _CC_START_Y, py)
    best_y = jnp.where(topped, _CC_START_Y, best_y)

    out = CrazyClimberCore(
        px=px, py=py, best_y=best_y,
        obj_x=obj_x, obj_y=obj_y, obj_live=obj_live, obj_timer=obj_timer,
        building=building, lives=lives,
        score=s.score + reward.astype(jnp.int32),
        frame=frame, over=s.over | died,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _cc_render(s: CrazyClimberCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Building face.
    face = (y >= 4) & (y <= 80) & (x >= int(_CC_BLD_L)) & (x < int(_CC_BLD_R))
    f = jnp.where(face, jnp.uint8(40), f)
    # Windows: open bright, shut dark.
    wi = jnp.arange(_CC_WIN_ROWS)[:, None]
    wj = jnp.arange(_CC_WIN_COLS)[None, :]
    closed = _cc_window_closed(s.frame, wi, wj)  # [rows, cols]
    for i in range(_CC_WIN_ROWS):
        for j in range(_CC_WIN_COLS):
            m = _rect_mask(y, x, float(_CC_WIN_X[j]), float(_CC_WIN_Y[i]),
                           _CC_WIN_W, _CC_WIN_H)
            f = jnp.where(m, jnp.where(closed[i, j], jnp.uint8(70), jnp.uint8(120)), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 500, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    life = (y == 82) & (x >= 2) & ((x - 2) % 5 < 3) \
        & ((x - 2) // 5 < jnp.minimum(s.lives, _CC_LIVES))
    f = jnp.where(life, jnp.uint8(160), f)
    for o in range(_CC_OBJECTS):
        m = s.obj_live[o] & _rect_mask(y, x, s.obj_x[o], s.obj_y[o], 3, 3)
        f = jnp.where(m, jnp.uint8(190), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _CC_PW, _CC_PH), jnp.uint8(224), f)
    return f


CRAZY_CLIMBER = dict(
    reset=_cc_reset,
    act=_cc_act,
    render=_cc_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=9,
    minimal_to_full=np.array([0, 2, 3, 4, 5, 6, 7, 8, 9], np.int32),
)
