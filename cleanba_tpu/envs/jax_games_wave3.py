"""Pure-JAX twins of the third wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/asterix.cc,
mspacman.cc, demon_attack.cc, enduro.cc) so the Anakin trainer covers the
same task set as the Sebulba host-env path; reset frames are pixel-identical
across engines (tests/test_jax_engine.py). Each game exposes the functional
dict contract of jax_engine._BREAKOUT: reset / act (one raw frame) / render /
lives / over.

Simultaneity note (same caveat as jax_games_extra): where the C++ games
early-return or mutate state mid-loop (MsPacman's sequential ghost-collision
loop, Asterix's lane loop resetting the player on a bomb hit), the JAX twins
either unroll the same loop statically with selects (Asterix lanes, MsPacman
ghosts, DemonAttack bomb slots) or vectorize it. The engines draw different
RNG streams, so trajectories diverge regardless — rules, scoring, and
rendering are what must match, and do.
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["ASTERIX", "MSPACMAN", "DEMON_ATTACK", "ENDURO"]


# ---------------------------------------------------------------------------
# Asterix (csrc/envs/asterix.cc)
# ---------------------------------------------------------------------------

_AX_LANES = 8
_AX_LANE_TOP = 14
_AX_LANE_H = 8
_AX_OBJ_W, _AX_OBJ_H = 6, 4
_AX_PLAYER_W, _AX_PLAYER_H = 5, 6
_AX_PX0 = 40.0
_AX_PY0 = float(_AX_LANE_TOP + 3 * _AX_LANE_H + 1)
_AX_XMIN, _AX_XMAX = 2.0, 84.0 - 2.0 - _AX_PLAYER_W
_AX_YMIN = float(_AX_LANE_TOP + 1)
_AX_YMAX = float(_AX_LANE_TOP + (_AX_LANES - 1) * _AX_LANE_H + 1)
_AX_LIVES = 3
_AX_GOOD_REWARD = 50.0
_AX_GAP = 20.0
_AX_SPEED = np.array([0.7, 0.5, 0.9, 0.6, 0.8, 0.5, 1.0, 0.7], np.float32)
_AX_DIR = np.array([1.0 if l % 2 == 0 else -1.0 for l in range(_AX_LANES)], np.float32)
_AX_LANE_Y = np.array(
    [_AX_LANE_TOP + l * _AX_LANE_H + 1 for l in range(_AX_LANES)], np.float32
)


@flax.struct.dataclass
class AsterixCore:
    obj_x: jax.Array   # [8] f32
    bomb: jax.Array    # [8] bool
    px: jax.Array
    py: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _ax_reset(key):
    del key  # deterministic layout (asterix.cc:41-53)
    return AsterixCore(
        obj_x=jnp.asarray([(l * 31 + 7) % 84 for l in range(_AX_LANES)], jnp.float32),
        bomb=jnp.zeros(_AX_LANES, jnp.bool_),
        px=jnp.float32(_AX_PX0),
        py=jnp.float32(_AX_PY0),
        lives=jnp.int32(_AX_LIVES),
        score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _ax_bomb_prob(score):
    return jnp.where(score >= 2000, jnp.float32(0.35), jnp.float32(0.2))


def _ax_act(s: AsterixCore, dx, dy, fire, key):
    """One raw frame (asterix.cc:55-94). The lane loop is unrolled statically
    to keep the C++ semantics: a bomb hit resets the player mid-loop, so later
    lanes test against the respawn position."""
    del fire
    live = ~s.over
    px = jnp.clip(s.px + dx.astype(jnp.float32), _AX_XMIN, _AX_XMAX)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * 2.0, _AX_YMIN, _AX_YMAX)

    obj_x, bomb = s.obj_x, s.bomb
    lives, score = s.lives, s.score
    reward = jnp.float32(0.0)
    keys = jax.random.split(key, _AX_LANES)
    for l in range(_AX_LANES):
        d = float(_AX_DIR[l])
        ox = obj_x[l] + d * float(_AX_SPEED[l])
        respawn = (ox > 84.0 + _AX_GAP) | (ox < -_AX_OBJ_W - _AX_GAP)
        k_re, k_col = jax.random.split(keys[l])
        entry = jnp.float32(-_AX_OBJ_W if d > 0 else 84.0)
        ox = jnp.where(respawn, entry, ox)
        new_bomb = jax.random.uniform(k_re) < _ax_bomb_prob(score)
        bl = jnp.where(respawn, new_bomb, bomb[l])

        lane_y = float(_AX_LANE_Y[l])
        overlap = (
            (py + _AX_PLAYER_H > lane_y) & (py < lane_y + _AX_OBJ_H)
            & (px + _AX_PLAYER_W > ox) & (px < ox + _AX_OBJ_W)
        )
        hit_bomb = overlap & bl
        hit_good = overlap & ~bl
        lives = lives - hit_bomb.astype(jnp.int32)
        died = hit_bomb & (lives <= 0)
        px = jnp.where(hit_bomb, _AX_PX0, px)
        py = jnp.where(hit_bomb, _AX_PY0, py)
        reward = reward + jnp.where(hit_good, _AX_GOOD_REWARD, 0.0)
        score = score + jnp.where(hit_good, jnp.int32(_AX_GOOD_REWARD), 0)
        exit_x = jnp.float32(-_AX_OBJ_W - _AX_GAP if d > 0 else 84.0 + _AX_GAP)
        ox = jnp.where(overlap, exit_x, ox)
        col_bomb = jax.random.uniform(k_col) < _ax_bomb_prob(score)
        bl = jnp.where(overlap, col_bomb, bl)

        obj_x = obj_x.at[l].set(ox)
        bomb = bomb.at[l].set(bl)
        s = s.replace(over=s.over | died)

    out = AsterixCore(
        obj_x=obj_x, bomb=bomb, px=px, py=py, lives=lives, score=score,
        over=s.over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _ax_render(s: AsterixCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Lane divider dots (asterix.cc:99-103).
    divider_rows = np.zeros(SCREEN, bool)
    for l in range(_AX_LANES + 1):
        yy = _AX_LANE_TOP + l * _AX_LANE_H - 1
        if 0 <= yy < SCREEN:
            divider_rows[yy] = True
    f = jnp.where(jnp.asarray(divider_rows)[:, None] & (x % 4 == 0), jnp.uint8(50), f)
    # Score ticks (one per 500 points).
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 500, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    # Lives markers bottom-left.
    lx = (x - 2) % 5
    lmark = (y == 81) & (x >= 2) & (lx < 3) \
        & ((x - 2) // 5 < jnp.minimum(s.lives, _AX_LIVES))
    f = jnp.where(lmark, jnp.uint8(160), f)
    # Objects: good items bright, bombs dark.
    for l in range(_AX_LANES):
        m = _rect_mask(y, x, s.obj_x[l], float(_AX_LANE_Y[l]), _AX_OBJ_W, _AX_OBJ_H)
        f = jnp.where(m, jnp.where(s.bomb[l], jnp.uint8(90), jnp.uint8(180)), f)
    # Player on top.
    f = jnp.where(
        _rect_mask(y, x, s.px, s.py, _AX_PLAYER_W, _AX_PLAYER_H), jnp.uint8(224), f
    )
    return f


ASTERIX = dict(
    reset=_ax_reset,
    act=_ax_act,
    render=_ax_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=9,
    # NOOP UP RIGHT LEFT DOWN UPRIGHT UPLEFT DOWNRIGHT DOWNLEFT
    minimal_to_full=np.array([0, 2, 3, 4, 5, 6, 7, 8, 9], np.int32),
)


# ---------------------------------------------------------------------------
# DemonAttack (csrc/envs/demon_attack.cc)
# ---------------------------------------------------------------------------

_DA_DEMONS = 6
_DA_RANKS = 3
_DA_DEMON_W, _DA_DEMON_H = 7, 4
_DA_PLAYER_W, _DA_PLAYER_H = 5, 4
_DA_PLAYER_Y = 76.0
_DA_PXMIN, _DA_PXMAX = 2.0, 84.0 - 2.0 - _DA_PLAYER_W
_DA_MAX_BOMBS = 8
_DA_BOMB_V = 1.2
_DA_MISSILE_V = 3.0
_DA_LIVES = 3
_DA_RANK_Y = np.array([14.0, 26.0, 38.0], np.float32)
_DA_AMP = np.array([24.0, 18.0, 12.0], np.float32)
_DA_OSC = np.array([0.40, 0.55, 0.70], np.float32)
_DA_RANK = np.array([d // 2 for d in range(_DA_DEMONS)], np.int32)
_DA_SIDE = np.array([-1.0 if d % 2 == 0 else 1.0 for d in range(_DA_DEMONS)], np.float32)
_DA_PHASE0 = (np.arange(_DA_DEMONS, dtype=np.float32) * np.float32(0.7)).astype(np.float32)


def _da_tri(p):
    """Triangle wave in [-1, 1] with period 4 (demon_attack.cc:40-44)."""
    p = p - jnp.trunc(p / 4.0) * 4.0
    p = jnp.where(p < 0, p + 4.0, p)
    return jnp.where(p < 2.0, p - 1.0, 3.0 - p)


def _da_spawn_x(phase):
    """Demon x from its oscillation phase (demon_attack.cc:78-80,179)."""
    return (
        jnp.float32(38.0)
        + jnp.asarray(_DA_SIDE) * 4.0
        + jnp.asarray(_DA_AMP)[jnp.asarray(_DA_RANK)] * _da_tri(phase)
    )


@flax.struct.dataclass
class DemonAttackCore:
    px: jax.Array
    missile_live: jax.Array
    mx: jax.Array
    my: jax.Array
    alive: jax.Array      # [6] bool
    dx: jax.Array         # [6] f32
    bomb_live: jax.Array  # [8] bool
    bx: jax.Array         # [8] f32
    by: jax.Array         # [8] f32
    lives: jax.Array
    score: jax.Array
    wave: jax.Array
    frame: jax.Array
    over: jax.Array


def _da_reset(key):
    del key  # deterministic staggered phases (demon_attack.cc:173-181)
    return DemonAttackCore(
        px=jnp.float32(40.0),
        missile_live=jnp.bool_(False),
        mx=jnp.float32(0.0),
        my=jnp.float32(0.0),
        alive=jnp.ones(_DA_DEMONS, jnp.bool_),
        dx=_da_spawn_x(jnp.asarray(_DA_PHASE0)),
        bomb_live=jnp.zeros(_DA_MAX_BOMBS, jnp.bool_),
        bx=jnp.zeros(_DA_MAX_BOMBS, jnp.float32),
        by=jnp.zeros(_DA_MAX_BOMBS, jnp.float32),
        lives=jnp.int32(_DA_LIVES),
        score=jnp.int32(0),
        wave=jnp.int32(0),
        frame=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _da_act(s: DemonAttackCore, dx, dy, fire, key):
    """One raw frame (demon_attack.cc:60-137)."""
    del dy
    live = ~s.over
    frame = s.frame + 1

    px = jnp.clip(s.px + dx.astype(jnp.float32), _DA_PXMIN, _DA_PXMAX)
    launch = (fire > 0) & ~s.missile_live
    missile_live = s.missile_live | launch
    mx = jnp.where(launch, px + _DA_PLAYER_W / 2.0, s.mx)
    my = jnp.where(launch, jnp.float32(_DA_PLAYER_Y), s.my)

    # Demons weave on deterministic triangle tracks.
    wave_f = s.wave.astype(jnp.float32)
    phase = jnp.asarray(_DA_PHASE0) + jnp.asarray(_DA_OSC)[jnp.asarray(_DA_RANK)] \
        * (1.0 + 0.1 * wave_f) * frame.astype(jnp.float32) * 0.04
    demon_x = jnp.where(s.alive, _da_spawn_x(phase), s.dx)

    # Bombs drop with a wave-scaled probability; each dropping demon fills the
    # first free slot (demon_attack.cc:82-90), unrolled over the 6 demons.
    k_drop, key = jax.random.split(key)
    p_drop = 0.004 + 0.002 * jnp.minimum(wave_f, 4.0)
    drops = s.alive & (jax.random.uniform(k_drop, (_DA_DEMONS,)) < p_drop)
    bomb_live, bx, by = s.bomb_live, s.bx, s.by
    for d in range(_DA_DEMONS):
        slot = jnp.argmin(bomb_live)  # first free slot (False < True)
        can = drops[d] & ~bomb_live[slot]
        bomb_live = bomb_live.at[slot].set(bomb_live[slot] | can)
        bx = bx.at[slot].set(jnp.where(can, demon_x[d] + _DA_DEMON_W / 2.0, bx[slot]))
        by = by.at[slot].set(
            jnp.where(can, float(_DA_RANK_Y[d // 2]) + _DA_DEMON_H, by[slot])
        )

    # Missile travels and kills the first demon it overlaps.
    my = jnp.where(missile_live, my - _DA_MISSILE_V, my)
    missile_live = missile_live & (my >= 4.0)
    rank_y = jnp.asarray(_DA_RANK_Y)[jnp.asarray(_DA_RANK)]
    hit = (
        missile_live & s.alive
        & (mx >= demon_x) & (mx < demon_x + _DA_DEMON_W)
        & (my >= rank_y) & (my < rank_y + _DA_DEMON_H)
    )
    any_hit = jnp.any(hit)
    first = jnp.argmax(hit)
    alive = s.alive & ~(hit & (jnp.arange(_DA_DEMONS) == first))
    missile_live = missile_live & ~any_hit
    r_killed = jnp.asarray(_DA_RANK)[first].astype(jnp.float32)
    pts = jnp.where(
        any_hit,
        10.0 * (_DA_RANKS - r_killed) + 10.0 * jnp.minimum(wave_f, 3.0),
        0.0,
    )
    reward = pts
    score = s.score + pts.astype(jnp.int32)

    # Bombs fall; one hit costs a life and clears the sky of bombs.
    by = jnp.where(bomb_live, by + _DA_BOMB_V, by)
    bomb_live = bomb_live & (by <= 84.0)
    bomb_hit = jnp.any(
        bomb_live
        & (bx >= px) & (bx < px + _DA_PLAYER_W)
        & (by >= _DA_PLAYER_Y) & (by < _DA_PLAYER_Y + _DA_PLAYER_H)
    )
    lives = s.lives - bomb_hit.astype(jnp.int32)
    over = s.over | (bomb_hit & (lives <= 0))
    px = jnp.where(bomb_hit, 40.0, px)
    bomb_live = jnp.where(bomb_hit, jnp.zeros_like(bomb_live), bomb_live)
    missile_live = missile_live & ~bomb_hit

    # Wave cleared: respawn the ranks.
    cleared = ~jnp.any(alive)
    wave = s.wave + cleared.astype(jnp.int32)
    alive = jnp.where(cleared, jnp.ones_like(alive), alive)
    demon_x = jnp.where(cleared, _da_spawn_x(jnp.asarray(_DA_PHASE0)), demon_x)

    out = DemonAttackCore(
        px=px, missile_live=missile_live, mx=mx, my=my, alive=alive, dx=demon_x,
        bomb_live=bomb_live, bx=bx, by=by, lives=lives, score=score, wave=wave,
        frame=frame, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _da_render(s: DemonAttackCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Ground line.
    f = jnp.where(y == 82, jnp.uint8(70), f)
    # Score ticks (one per 100 points).
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    # Lives markers.
    lmark = (y == 83) & (x >= 2) & ((x - 2) % 5 < 3) \
        & ((x - 2) // 5 < jnp.minimum(s.lives, _DA_LIVES))
    f = jnp.where(lmark, jnp.uint8(160), f)
    # Demons (brighter when higher rank).
    for d in range(_DA_DEMONS):
        r = d // 2
        m = s.alive[d] & _rect_mask(
            y, x, s.dx[d], float(_DA_RANK_Y[r]), _DA_DEMON_W, _DA_DEMON_H
        )
        f = jnp.where(m, jnp.uint8(190 - 25 * r), f)
    # Bombs and missile.
    for b in range(_DA_MAX_BOMBS):
        m = s.bomb_live[b] & _rect_mask(y, x, s.bx[b], s.by[b], 1, 3)
        f = jnp.where(m, jnp.uint8(120), f)
    f = jnp.where(s.missile_live & _rect_mask(y, x, s.mx, s.my, 1, 4), jnp.uint8(255), f)
    # Player.
    f = jnp.where(
        _rect_mask(y, x, s.px, _DA_PLAYER_Y, _DA_PLAYER_W, _DA_PLAYER_H),
        jnp.uint8(224), f,
    )
    return f


DEMON_ATTACK = dict(
    reset=_da_reset,
    act=_da_act,
    render=_da_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=6,
    # NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    minimal_to_full=np.array([0, 1, 3, 4, 11, 12], np.int32),
)


# ---------------------------------------------------------------------------
# Enduro (csrc/envs/enduro.cc)
# ---------------------------------------------------------------------------

_EN_ROAD_L, _EN_ROAD_R = 20.0, 64.0
_EN_LANES = 4
_EN_LANE_W = (_EN_ROAD_R - _EN_ROAD_L) / _EN_LANES
_EN_CAR_W, _EN_CAR_H = 6, 5
_EN_PLAYER_Y = 70.0
_EN_PXMIN = _EN_ROAD_L + 1.0
_EN_PXMAX = _EN_ROAD_R - 1.0 - _EN_CAR_W
_EN_VMAX = 6.0
_EN_TRAFFIC_V = 2.0
_EN_YSCALE = 0.5
_EN_MAX_CARS = 8
_EN_GAME_FRAMES = 32768


@flax.struct.dataclass
class EnduroCore:
    px: jax.Array
    v: jax.Array
    car_live: jax.Array  # [8] bool
    cx: jax.Array        # [8] f32
    cy: jax.Array        # [8] f32
    spawn_timer: jax.Array
    passed: jax.Array
    frame: jax.Array
    over: jax.Array


def _en_reset(key):
    del key  # deterministic start (enduro.cc:37-45)
    return EnduroCore(
        px=jnp.float32(40.0),
        v=jnp.float32(0.0),
        car_live=jnp.zeros(_EN_MAX_CARS, jnp.bool_),
        cx=jnp.zeros(_EN_MAX_CARS, jnp.float32),
        cy=jnp.zeros(_EN_MAX_CARS, jnp.float32),
        spawn_timer=jnp.int32(40),
        passed=jnp.int32(0),
        frame=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _en_act(s: EnduroCore, dx, dy, fire, key):
    """One raw frame (enduro.cc:47-102)."""
    live = ~s.over
    frame = s.frame + 1

    # Throttle (FIRE), brake (DOWN), and coasting drag.
    v = s.v + jnp.where(
        fire > 0, jnp.float32(0.05), jnp.where(dy > 0, jnp.float32(-0.10), jnp.float32(-0.01))
    )
    v = jnp.clip(v, 0.0, _EN_VMAX)

    # Steering authority scales with speed.
    px = jnp.clip(s.px + dx.astype(jnp.float32) * (0.4 + 0.2 * v), _EN_PXMIN, _EN_PXMAX)

    # Traffic streams toward the player at the relative speed.
    rel = (v - _EN_TRAFFIC_V) * _EN_YSCALE
    cy = jnp.where(s.car_live, s.cy + rel, s.cy)
    overtaken = s.car_live & (cy > 84.0)
    outran = s.car_live & (cy < 8.0)
    car_live = s.car_live & ~overtaken & ~outran
    n_passed = overtaken.sum().astype(jnp.int32)
    passed = s.passed + n_passed
    reward = n_passed.astype(jnp.float32)

    # Spawn traffic ahead on a densifying schedule (random lane).
    spawn_timer = s.spawn_timer - 1
    do_spawn = spawn_timer <= 0
    interval = jnp.maximum(80 - 6 * (passed // 20), 28)
    spawn_timer = jnp.where(do_spawn, interval, spawn_timer)
    slot = jnp.argmin(car_live)
    can = do_spawn & ~car_live[slot]
    lane = jax.random.randint(key, (), 0, _EN_LANES)
    car_live = car_live.at[slot].set(car_live[slot] | can)
    cx = s.cx.at[slot].set(
        jnp.where(can, _EN_ROAD_L + 2.0 + lane.astype(jnp.float32) * _EN_LANE_W, s.cx[slot])
    )
    cy = cy.at[slot].set(jnp.where(can, jnp.float32(10.0), cy[slot]))

    # Collision: the crash kills your speed and removes the wreck.
    crash = car_live & (
        (px + _EN_CAR_W > cx) & (px < cx + _EN_CAR_W)
        & (_EN_PLAYER_Y + _EN_CAR_H > cy) & (_EN_PLAYER_Y < cy + _EN_CAR_H)
    )
    v = jnp.where(jnp.any(crash), jnp.float32(0.5), v)
    car_live = car_live & ~crash

    over = s.over | (frame >= _EN_GAME_FRAMES)
    out = EnduroCore(
        px=px, v=v, car_live=car_live, cx=cx, cy=cy, spawn_timer=spawn_timer,
        passed=passed, frame=frame, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _en_render(s: EnduroCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    road = (y >= 8) & (y < 80)
    # Road edges.
    edge = road & ((x == int(_EN_ROAD_L) - 1) | (x == int(_EN_ROAD_R) + _EN_CAR_W))
    f = jnp.where(edge, jnp.uint8(110), f)
    # Dashed center lines; dash phase scrolls with distance.
    scroll = (s.v * s.frame.astype(jnp.float32) * _EN_YSCALE).astype(jnp.int32) % 8
    lane_cols = np.zeros(SCREEN, bool)
    for l in range(1, _EN_LANES):
        lane_cols[int(_EN_ROAD_L + l * _EN_LANE_W)] = True
    dash = road & jnp.asarray(lane_cols)[None, :] & ((y + scroll) % 8 >= 4)
    f = jnp.where(dash, jnp.uint8(60), f)
    # Speed bar along the bottom.
    bar = (y == 82) & (x >= 2) & (x - 2 < (s.v / _EN_VMAX * 80.0).astype(jnp.int32))
    f = jnp.where(bar, jnp.uint8(150), f)
    # Score ticks (one per 5 cars passed).
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.passed // 5, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    # Traffic then the player.
    for c in range(_EN_MAX_CARS):
        m = s.car_live[c] & _rect_mask(y, x, s.cx[c], s.cy[c], _EN_CAR_W, _EN_CAR_H)
        f = jnp.where(m, jnp.uint8(140), f)
    f = jnp.where(
        _rect_mask(y, x, s.px, _EN_PLAYER_Y, _EN_CAR_W, _EN_CAR_H), jnp.uint8(224), f
    )
    return f


ENDURO = dict(
    reset=_en_reset,
    act=_en_act,
    render=_en_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=9,
    # NOOP FIRE RIGHT LEFT DOWN DOWNRIGHT DOWNLEFT RIGHTFIRE LEFTFIRE
    minimal_to_full=np.array([0, 1, 3, 4, 5, 8, 9, 11, 12], np.int32),
)


# ---------------------------------------------------------------------------
# MsPacman (csrc/envs/mspacman.cc)
# ---------------------------------------------------------------------------

_MP_ROWS, _MP_COLS = 17, 19
_MP_CELL = 4
_MP_OFFX, _MP_OFFY = 4, 8
_MP_GHOSTS = 4
_MP_LIVES = 3
_MP_FRIGHT = 360
_MP_HOLD = 60
_MP_MAZE = [
    "###################",
    "#........#........#",
    "#.##.###.#.###.##.#",
    "#o...............o#",
    "#.##.#.#####.#.##.#",
    "#....#....#....#..#",
    "####.###.#.###.####",
    "#........G........#",
    "#.##.#.#####.#.##.#",
    "#....#...#...#....#",
    "#.##.###.#.###.##.#",
    "#o......P........o#",
    "##.#.#.#####.#.#.##",
    "#....#...#...#....#",
    "#.#######.#######.#",
    "#.................#",
    "###################",
]
_MP_WALL = np.array([[c == "#" for c in row] for row in _MP_MAZE], bool)
_MP_PELLET0 = np.array([[c == "." for c in row] for row in _MP_MAZE], bool)
_MP_POWER0 = np.array([[c == "o" for c in row] for row in _MP_MAZE], bool)
_MP_NPELLETS = int(_MP_PELLET0.sum() + _MP_POWER0.sum())
_MP_PAC_RC = divmod(("".join(_MP_MAZE)).index("P"), _MP_COLS)
_MP_GHOST_RC = divmod(("".join(_MP_MAZE)).index("G"), _MP_COLS)
_MP_PAC_XY = (_MP_OFFX + _MP_PAC_RC[1] * _MP_CELL, _MP_OFFY + _MP_PAC_RC[0] * _MP_CELL)
_MP_SPAWN_XY = (_MP_OFFX + _MP_GHOST_RC[1] * _MP_CELL, _MP_OFFY + _MP_GHOST_RC[0] * _MP_CELL)
# Directions: 0 none, 1 up, 2 right, 3 left, 4 down.
_MP_DY = np.array([0, -1, 0, 0, 1], np.int32)
_MP_DX = np.array([0, 0, 1, -1, 0], np.int32)
# Walls padded so out-of-range lookups read as wall.
_MP_WALL_PAD = np.ones((_MP_ROWS + 2, _MP_COLS + 2), bool)
_MP_WALL_PAD[1:-1, 1:-1] = _MP_WALL


def _mp_rev(d):
    return jnp.where(d == 0, 0, 5 - d)


def _mp_aligned(x, y):
    return ((x - _MP_OFFX) % _MP_CELL == 0) & ((y - _MP_OFFY) % _MP_CELL == 0)


def _mp_can_go(x, y, d):
    """Open-cell test one cell over from (x, y) in direction d
    (mspacman.cc:195-199); d=0 returns False."""
    r = (y - _MP_OFFY) // _MP_CELL + jnp.asarray(_MP_DY)[d]
    c = (x - _MP_OFFX) // _MP_CELL + jnp.asarray(_MP_DX)[d]
    open_ = ~jnp.asarray(_MP_WALL_PAD)[r + 1, c + 1]
    return (d != 0) & open_


@flax.struct.dataclass
class MsPacmanCore:
    pellet: jax.Array        # [17, 19] bool
    power: jax.Array         # [17, 19] bool
    pellets_left: jax.Array
    pac_x: jax.Array
    pac_y: jax.Array
    pac_dir: jax.Array
    gx: jax.Array            # [4] i32
    gy: jax.Array            # [4] i32
    gdir: jax.Array          # [4] i32
    hold: jax.Array          # [4] i32
    fright: jax.Array
    chain: jax.Array
    frame: jax.Array
    lives: jax.Array
    score: jax.Array
    level: jax.Array
    over: jax.Array


def _mp_entities():
    """place_entities values (mspacman.cc:249-270)."""
    return dict(
        pac_x=jnp.int32(_MP_PAC_XY[0]),
        pac_y=jnp.int32(_MP_PAC_XY[1]),
        pac_dir=jnp.int32(0),
        gx=jnp.full(_MP_GHOSTS, _MP_SPAWN_XY[0], jnp.int32),
        gy=jnp.full(_MP_GHOSTS, _MP_SPAWN_XY[1], jnp.int32),
        gdir=jnp.arange(1, _MP_GHOSTS + 1, dtype=jnp.int32),
        hold=jnp.zeros(_MP_GHOSTS, jnp.int32),
        fright=jnp.int32(0),
        chain=jnp.int32(0),
        frame=jnp.int32(0),
    )


def _mp_reset(key):
    del key  # deterministic layout (mspacman.cc:60-67)
    return MsPacmanCore(
        pellet=jnp.asarray(_MP_PELLET0),
        power=jnp.asarray(_MP_POWER0),
        pellets_left=jnp.int32(_MP_NPELLETS),
        lives=jnp.int32(_MP_LIVES),
        score=jnp.int32(0),
        level=jnp.int32(0),
        over=jnp.bool_(False),
        **_mp_entities(),
    )


def _mp_pick_dir(g, gx, gy, gdir, fright, pac_x, pac_y, key):
    """Ghost direction choice at a cell center (mspacman.cc:212-235)."""
    rev = _mp_rev(gdir)
    dirs = jnp.arange(1, 5)
    open_ = jax.vmap(lambda d: _mp_can_go(gx, gy, d))(dirs)
    options = open_ & (dirs != rev)
    n = options.sum()

    # Chase scoring: minimize (maximize when frightened) Manhattan distance of
    # the next cell to pacman; first-in-order wins ties (strict < in C++).
    nx = gx + jnp.asarray(_MP_DX)[dirs] * _MP_CELL
    ny = gy + jnp.asarray(_MP_DY)[dirs] * _MP_CELL
    dist = jnp.abs(nx - pac_x) + jnp.abs(ny - pac_y)
    sc = jnp.where(fright > 0, -dist, dist)
    sc = jnp.where(options, sc, 1 << 30)
    best = dirs[jnp.argmin(sc)]

    k_choice, k_idx = jax.random.split(key)
    chase_p = 0.45 + 0.1 * float(g)
    # Uniform pick among the n open options.
    idx = jax.random.randint(k_idx, (), 0, jnp.maximum(n, 1))
    cum = jnp.cumsum(options.astype(jnp.int32)) - 1
    uniform = dirs[jnp.argmax((cum == idx) & options)]
    chosen = jnp.where(jax.random.uniform(k_choice) < chase_p, best, uniform)
    return jnp.where(n == 0, rev, chosen)


def _mp_act(s: MsPacmanCore, dx, dy, fire, key):
    """One raw frame (mspacman.cc:69-151)."""
    del fire
    live = ~s.over
    frame = s.frame + 1

    # ---- pacman: vertical intent wins ties --------------------------------
    want = jnp.where(
        dy < 0, 1, jnp.where(dy > 0, 4, jnp.where(dx > 0, 2, jnp.where(dx < 0, 3, 0)))
    ).astype(jnp.int32)
    at_cell = _mp_aligned(s.pac_x, s.pac_y)
    turn = at_cell & (want != 0) & _mp_can_go(s.pac_x, s.pac_y, want)
    pac_dir = jnp.where(turn, want, s.pac_dir)
    blocked = at_cell & ~_mp_can_go(s.pac_x, s.pac_y, pac_dir)
    pac_dir = jnp.where(blocked, 0, pac_dir)
    pac_x = s.pac_x + jnp.asarray(_MP_DX)[pac_dir]
    pac_y = s.pac_y + jnp.asarray(_MP_DY)[pac_dir]

    # Eat pellets at cell alignment.
    reward = jnp.float32(0.0)
    r = (pac_y - _MP_OFFY) // _MP_CELL
    c = (pac_x - _MP_OFFX) // _MP_CELL
    now_aligned = _mp_aligned(pac_x, pac_y)
    ate_pellet = now_aligned & s.pellet[r, c]
    ate_power = now_aligned & ~ate_pellet & s.power[r, c]
    pellet = s.pellet.at[r, c].set(s.pellet[r, c] & ~ate_pellet)
    power = s.power.at[r, c].set(s.power[r, c] & ~ate_power)
    pellets_left = s.pellets_left - ate_pellet - ate_power
    reward = reward + jnp.where(ate_pellet, 10.0, 0.0) + jnp.where(ate_power, 50.0, 0.0)
    fright = jnp.where(ate_power, _MP_FRIGHT, s.fright)
    chain = jnp.where(ate_power, 0, s.chain)
    gdir = jnp.where(ate_power & (s.hold == 0), _mp_rev(s.gdir), s.gdir)

    # ---- ghosts ------------------------------------------------------------
    fright = jnp.maximum(fright - (fright > 0), 0)
    hold = jnp.maximum(s.hold - (s.hold > 0), 0)
    gx, gy = s.gx, s.gy
    gkeys = jax.random.split(key, _MP_GHOSTS)
    for g in range(_MP_GHOSTS):
        parked = s.hold[g] > 0
        # Speed pattern (mspacman.cc:204-207): frightened every other frame,
        # normal skips every 5th; staggered by ghost index.
        moves = jnp.where(
            fright > 0, (frame + g) % 2 == 0, (frame + g) % 5 != 0
        ) & ~parked
        pick = moves & _mp_aligned(gx[g], gy[g])
        nd = _mp_pick_dir(g, gx[g], gy[g], gdir[g], fright, pac_x, pac_y, gkeys[g])
        d = jnp.where(pick, nd, gdir[g])
        gdir = gdir.at[g].set(d)
        gx = gx.at[g].set(gx[g] + jnp.where(moves, jnp.asarray(_MP_DX)[d], 0))
        gy = gy.at[g].set(gy[g] + jnp.where(moves, jnp.asarray(_MP_DY)[d], 0))

    # ---- collisions (sequential with break-on-death, mspacman.cc:123-140) --
    lives = s.lives
    over = s.over
    died = jnp.bool_(False)
    for g in range(_MP_GHOSTS):
        ddx = gx[g] - pac_x
        ddy = gy[g] - pac_y
        near = (
            (ddx > -_MP_CELL) & (ddx < _MP_CELL) & (ddy > -_MP_CELL) & (ddy < _MP_CELL)
        )
        collide = near & (hold[g] == 0) & ~died
        eat = collide & (fright > 0)
        reward = reward + jnp.where(
            eat, 200.0 * (2 ** jnp.minimum(chain, 3)).astype(jnp.float32), 0.0
        )
        chain = chain + eat.astype(jnp.int32)
        gx = gx.at[g].set(jnp.where(eat, _MP_SPAWN_XY[0], gx[g]))
        gy = gy.at[g].set(jnp.where(eat, _MP_SPAWN_XY[1], gy[g]))
        gdir = gdir.at[g].set(jnp.where(eat, 1 + (g % 4), gdir[g]))
        hold = hold.at[g].set(jnp.where(eat, _MP_HOLD, hold[g]))
        deadly = collide & (fright == 0)
        lives = lives - deadly.astype(jnp.int32)
        over = over | (deadly & (lives <= 0))
        died = died | deadly

    # ---- level clear --------------------------------------------------------
    advance = (pellets_left == 0) & ~over
    level = s.level + advance.astype(jnp.int32)
    pellet = jnp.where(advance, jnp.asarray(_MP_PELLET0), pellet)
    power = jnp.where(advance, jnp.asarray(_MP_POWER0), power)
    pellets_left = jnp.where(advance, _MP_NPELLETS, pellets_left)

    # place_entities on death or level clear (mspacman.cc:136,146).
    replace = died | advance
    ent = _mp_entities()
    out = MsPacmanCore(
        pellet=pellet, power=power, pellets_left=pellets_left,
        pac_x=jnp.where(replace, ent["pac_x"], pac_x),
        pac_y=jnp.where(replace, ent["pac_y"], pac_y),
        pac_dir=jnp.where(replace, ent["pac_dir"], pac_dir),
        gx=jnp.where(replace, ent["gx"], gx),
        gy=jnp.where(replace, ent["gy"], gy),
        gdir=jnp.where(replace, ent["gdir"], gdir),
        hold=jnp.where(replace, ent["hold"], hold),
        fright=jnp.where(replace, ent["fright"], fright),
        chain=jnp.where(replace, ent["chain"], chain),
        frame=jnp.where(replace, ent["frame"], frame),
        lives=lives,
        score=s.score + reward.astype(jnp.int32),
        level=level,
        over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _mp_render(s: MsPacmanCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Maze cells: map each pixel to its cell.
    in_maze = (
        (y >= _MP_OFFY) & (y < _MP_OFFY + _MP_ROWS * _MP_CELL)
        & (x >= _MP_OFFX) & (x < _MP_OFFX + _MP_COLS * _MP_CELL)
    )
    r = jnp.clip((y - _MP_OFFY) // _MP_CELL, 0, _MP_ROWS - 1)
    c = jnp.clip((x - _MP_OFFX) // _MP_CELL, 0, _MP_COLS - 1)
    f = jnp.where(in_maze & jnp.asarray(_MP_WALL)[r, c], jnp.uint8(60), f)
    # Pellets draw a 2x2 dot at cell offset (1, 1); power fills the cell.
    sub = ((y - _MP_OFFY) % _MP_CELL >= 1) & ((y - _MP_OFFY) % _MP_CELL < 3) \
        & ((x - _MP_OFFX) % _MP_CELL >= 1) & ((x - _MP_OFFX) % _MP_CELL < 3)
    f = jnp.where(in_maze & s.pellet[r, c] & sub, jnp.uint8(140), f)
    f = jnp.where(in_maze & s.power[r, c], jnp.uint8(170), f)
    # Ghosts (ascending index = draw order), then pacman.
    for g in range(_MP_GHOSTS):
        shade = jnp.where(
            s.hold[g] > 0, jnp.uint8(80),
            jnp.where(s.fright > 0, jnp.uint8(100), jnp.uint8(185 + 10 * g)),
        )
        m = _rect_mask(y, x, s.gx[g], s.gy[g], _MP_CELL, _MP_CELL)
        f = jnp.where(m, shade, f)
    f = jnp.where(
        _rect_mask(y, x, s.pac_x, s.pac_y, _MP_CELL, _MP_CELL), jnp.uint8(224), f
    )
    # Score ticks (one per 200 points) and lives markers.
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 200, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    lmark = (y == 81) & (x >= 2) & ((x - 2) % 5 < 3) \
        & ((x - 2) // 5 < jnp.minimum(s.lives, _MP_LIVES))
    f = jnp.where(lmark, jnp.uint8(160), f)
    return f


MSPACMAN = dict(
    reset=_mp_reset,
    act=_mp_act,
    render=_mp_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=9,
    # NOOP UP RIGHT LEFT DOWN UPRIGHT UPLEFT DOWNRIGHT DOWNLEFT
    minimal_to_full=np.array([0, 2, 3, 4, 5, 6, 7, 8, 9], np.int32),
)
