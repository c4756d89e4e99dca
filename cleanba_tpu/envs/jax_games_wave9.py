"""Pure-JAX twins of the wave-9 C++ engine games: Skiing, Frostbite,
Kangaroo.

Rules mirror the C++ engine game-for-game (csrc/envs/skiing.cc,
frostbite.cc, kangaroo.cc) so the Anakin trainer covers the same task set as
the Sebulba host-env path; reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract
of jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

Simultaneity note: the C++ games early-return on a life loss (skipping the
remaining entity updates for that raw frame); the JAX twins gate those
updates with selects instead. Given the engines draw different RNG streams,
trajectories diverge anyway — rules, scoring, and rendering are what must
match, and do.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["SKIING", "FROSTBITE", "KANGAROO"]


# ---------------------------------------------------------------------------
# Skiing (csrc/envs/skiing.cc)
# ---------------------------------------------------------------------------

_SK_GATES = 20
_SK_SKIER_Y = 20.0
_SK_SKIER_W, _SK_SKIER_H = 4.0, 5.0
_SK_STEER = 1.2
_SK_SCROLL = 1.0
_SK_GATE_HALF = 8.0
_SK_POLE_W, _SK_POLE_H = 2.0, 6.0
_SK_FIRST_Y = 100.0
_SK_GAP = 90.0
_SK_FINISH_PAD = 40.0
_SK_MISS = -1000.0
_SK_GATE_CX = np.array([20 + (i * 37) % 45 for i in range(_SK_GATES)], np.float32)
_SK_GATE_Y = np.array([_SK_FIRST_Y + i * _SK_GAP for i in range(_SK_GATES)], np.float32)
_SK_FINISH_Y = float(_SK_FIRST_Y + _SK_GATES * _SK_GAP + _SK_FINISH_PAD)


@flax.struct.dataclass
class SkiingCore:
    x: jax.Array
    world_y: jax.Array
    next_gate: jax.Array
    passed: jax.Array
    over: jax.Array


def _sk_reset(key):
    del key  # fully deterministic (skiing.cc reset_game)
    return SkiingCore(
        x=jnp.float32(42.0), world_y=jnp.float32(0.0),
        next_gate=jnp.int32(0), passed=jnp.int32(0), over=jnp.bool_(False),
    )


def _sk_act(s: SkiingCore, dx, dy, fire, key):
    del dy, fire, key
    live = ~s.over
    x = jnp.clip(s.x + dx.astype(jnp.float32) * _SK_STEER, 4.0, 78.0)
    world_y = s.world_y + _SK_SCROLL

    reward = jnp.float32(-1.0)
    gate_y = jnp.asarray(_SK_GATE_Y)[jnp.minimum(s.next_gate, _SK_GATES - 1)]
    crossing = (s.next_gate < _SK_GATES) & (world_y + _SK_SKIER_Y >= gate_y)
    cx = jnp.asarray(_SK_GATE_CX)[jnp.minimum(s.next_gate, _SK_GATES - 1)]
    passes = jnp.abs(x + _SK_SKIER_W / 2.0 - cx) < _SK_GATE_HALF
    reward = reward + jnp.where(crossing & ~passes, _SK_MISS, 0.0)
    passed = s.passed + (crossing & passes).astype(jnp.int32)
    next_gate = s.next_gate + crossing.astype(jnp.int32)

    over = s.over | (world_y + _SK_SKIER_Y >= _SK_FINISH_Y)
    out = SkiingCore(x=x, world_y=world_y, next_gate=next_gate,
                     passed=passed, over=over)
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _sk_render(s: SkiingCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((x == 1) | (x == 82), jnp.uint8(90), f)
    for i in range(_SK_GATES):
        gy = jnp.float32(_SK_GATE_Y[i]) - s.world_y
        shade = jnp.where(i < s.next_gate, jnp.uint8(60), jnp.uint8(180))
        cx = float(_SK_GATE_CX[i])
        lm = _rect_mask(y, x, cx - _SK_GATE_HALF - _SK_POLE_W / 2.0, gy,
                        _SK_POLE_W, _SK_POLE_H)
        rm = _rect_mask(y, x, cx + _SK_GATE_HALF - _SK_POLE_W / 2.0, gy,
                        _SK_POLE_W, _SK_POLE_H)
        visible = (gy >= -_SK_POLE_H) & (gy < SCREEN)
        f = jnp.where(visible & (lm | rm), shade, f)
    fy = jnp.float32(_SK_FINISH_Y) - s.world_y
    finish = (fy >= 0.0) & (fy < SCREEN) & (y == fy.astype(jnp.int32)) \
        & (x >= 2) & (x < 82)
    f = jnp.where(finish, jnp.uint8(140), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.passed, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    f = jnp.where(_rect_mask(y, x, s.x, _SK_SKIER_Y, _SK_SKIER_W, _SK_SKIER_H),
                  jnp.uint8(224), f)
    return f


SKIING = dict(
    reset=_sk_reset,
    act=_sk_act,
    render=_sk_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=3,
    minimal_to_full=np.array([0, 3, 4], np.int32),  # NOOP RIGHT LEFT
)


# ---------------------------------------------------------------------------
# Frostbite (csrc/envs/frostbite.cc)
# ---------------------------------------------------------------------------

_FB_ROWS = 4
_FB_FLOES = 3
_FB_ROW_Y = np.array([44.0, 54.0, 64.0, 74.0], np.float32)
_FB_FLOE_W, _FB_FLOE_H = 18.0, 5.0
_FB_WRAP = 84.0 + _FB_FLOE_W
_FB_SHORE_Y = 34.0
_FB_PW, _FB_PH = 4.0, 6.0
_FB_WALK = 1.0
_FB_JUMP_CD = 8
_FB_TEMP_MAX = 45
_FB_TEMP_FRAMES = 32
_FB_IGLOO_NEED = 12
_FB_BIRDS = 2
_FB_BIRD_ROW = np.array([1, 3], np.int32)
_FB_BIRD_W, _FB_BIRD_H = 6.0, 4.0
_FB_LIVES = 4
_FB_FLOE_X0 = np.array(
    [[(j * 28 + r * 13) % 84 for j in range(_FB_FLOES)] for r in range(_FB_ROWS)],
    np.float32,
)
_FB_BIRD_X0 = np.array([10.0, 50.0], np.float32)
_FB_ROW_DIR = np.array([1.0, -1.0, 1.0, -1.0], np.float32)
_FB_ROW_SPEED = np.array([0.5 + 0.1 * r for r in range(_FB_ROWS)], np.float32)
_FB_BIRD_DIR = np.array([-_FB_ROW_DIR[r] for r in _FB_BIRD_ROW], np.float32)


@flax.struct.dataclass
class FrostbiteCore:
    floe_x: jax.Array    # [4, 3] f32
    bird_x: jax.Array    # [2] f32
    x: jax.Array
    row: jax.Array       # i32: -1 shore, 0..3 floe rows
    visited: jax.Array   # [4] bool
    igloo: jax.Array
    temp: jax.Array
    temp_frame: jax.Array
    jump_cd: jax.Array
    level: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _fb_respawn_fields():
    return dict(
        x=jnp.float32(40.0), row=jnp.int32(-1), jump_cd=jnp.int32(0),
        temp=jnp.int32(_FB_TEMP_MAX), temp_frame=jnp.int32(0),
    )


def _fb_reset(key):
    del key  # fully deterministic (frostbite.cc reset_game/reset_level)
    return FrostbiteCore(
        floe_x=jnp.asarray(_FB_FLOE_X0), bird_x=jnp.asarray(_FB_BIRD_X0),
        visited=jnp.zeros(_FB_ROWS, bool), igloo=jnp.int32(0),
        level=jnp.int32(0), lives=jnp.int32(_FB_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False), **_fb_respawn_fields(),
    )


def _fb_floe_under(floe_x, row, px):
    """Index of the floe under the player's center on `row`, else -1."""
    cx = px + _FB_PW / 2.0
    rowx = floe_x[jnp.maximum(row, 0)]
    on = (cx >= rowx) & (cx < rowx + _FB_FLOE_W)
    return jnp.where(on.any(), jnp.argmax(on).astype(jnp.int32), jnp.int32(-1))


def _fb_act(s: FrostbiteCore, dx, dy, fire, key):
    del fire, key
    live = ~s.over
    speed_scale = 1.0 + 0.15 * s.level.astype(jnp.float32)

    # Floes drift and wrap; birds fly against their row.
    v = jnp.asarray(_FB_ROW_SPEED) * speed_scale * jnp.asarray(_FB_ROW_DIR)
    floe_x = s.floe_x + v[:, None]
    floe_x = jnp.where(floe_x < -_FB_FLOE_W, floe_x + _FB_WRAP, floe_x)
    floe_x = jnp.where(floe_x > 84.0, floe_x - _FB_WRAP, floe_x)
    bird_x = s.bird_x + 0.8 * speed_scale * jnp.asarray(_FB_BIRD_DIR)
    bird_x = jnp.where(bird_x < -_FB_BIRD_W, bird_x + 84.0 + _FB_BIRD_W, bird_x)
    bird_x = jnp.where(bird_x > 84.0, bird_x - (84.0 + _FB_BIRD_W), bird_x)

    # Rider carry, then walking.
    carry = jnp.where(
        s.row >= 0,
        jnp.asarray(_FB_ROW_SPEED)[jnp.maximum(s.row, 0)] * speed_scale
        * jnp.asarray(_FB_ROW_DIR)[jnp.maximum(s.row, 0)],
        0.0,
    )
    x = jnp.clip(s.x + carry + dx.astype(jnp.float32) * _FB_WALK,
                 2.0, 84.0 - 2.0 - _FB_PW)

    jump_cd = jnp.maximum(s.jump_cd - 1, 0)
    # Jump one row (dy != 0); row -1 is the shore.
    target = s.row + dy
    jumps = (jump_cd == 0) & (dy != 0) & (target >= -1) & (target < _FB_ROWS)
    row = jnp.where(jumps, target, s.row)
    jump_cd = jnp.where(jumps, _FB_JUMP_CD, jump_cd)
    landed_floe = _fb_floe_under(floe_x, row, x)
    drowned = jumps & (row >= 0) & (landed_floe < 0)
    fresh = jumps & (row >= 0) & ~drowned & ~s.visited[jnp.maximum(row, 0)]
    reward = jnp.where(fresh, 10.0, 0.0)
    score = s.score + jnp.where(fresh, 10, 0)
    visited = jnp.where(
        fresh, s.visited.at[jnp.maximum(row, 0)].set(True), s.visited
    )
    cycle = visited.all()
    igloo = jnp.where(cycle, s.igloo + 4, s.igloo)
    visited = jnp.where(cycle, jnp.zeros_like(visited), visited)
    # Into the igloo: level bonus = 160 + remaining temperature.
    completed = jumps & (row == -1) & (s.igloo >= _FB_IGLOO_NEED)
    bonus = (160 + s.temp).astype(jnp.float32)
    reward = reward + jnp.where(completed, bonus, 0.0)
    score = score + jnp.where(completed, 160 + s.temp, 0)

    alive_path = ~drowned & ~completed
    # Standing on a floe that drifted from under you (non-jump frames too).
    stranded = alive_path & (row >= 0) & (_fb_floe_under(floe_x, row, x) < 0)
    # Bird collision (player and bird share a row; boxes at row_y - h).
    same_row = jnp.asarray(_FB_BIRD_ROW) == row
    ox = (x + _FB_PW > bird_x) & (x < bird_x + _FB_BIRD_W)
    hit_bird = alive_path & ~stranded & (same_row & ox).any()
    # Temperature clock.
    temp_frame = s.temp_frame + 1
    ticks = temp_frame >= _FB_TEMP_FRAMES
    temp_frame = jnp.where(ticks, 0, temp_frame)
    temp = jnp.where(ticks, s.temp - 1, s.temp)
    froze = alive_path & ~stranded & ~hit_bird & ticks & (temp <= 0)

    died = drowned | stranded | hit_bird | froze
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    level = s.level + completed.astype(jnp.int32)

    # Level completion resets the board; death respawns the player.
    refresh = completed  # reset_level: floes, birds, visited, igloo
    floe_x = jnp.where(refresh, jnp.asarray(_FB_FLOE_X0), floe_x)
    bird_x = jnp.where(refresh, jnp.asarray(_FB_BIRD_X0), bird_x)
    visited = jnp.where(refresh, jnp.zeros_like(visited), visited)
    igloo = jnp.where(refresh, 0, igloo)
    rsp = died | refresh
    re = _fb_respawn_fields()
    x = jnp.where(rsp, re["x"], x)
    row = jnp.where(rsp, re["row"], row)
    jump_cd = jnp.where(rsp, re["jump_cd"], jump_cd)
    temp = jnp.where(rsp, re["temp"], temp)
    temp_frame = jnp.where(rsp, re["temp_frame"], temp_frame)

    out = FrostbiteCore(
        floe_x=floe_x, bird_x=bird_x, x=x, row=row, visited=visited,
        igloo=igloo, temp=temp, temp_frame=temp_frame, jump_cd=jump_cd,
        level=level, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _fb_render(s: FrostbiteCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y >= 40) & (y < 80), jnp.uint8(30), f)
    f = jnp.where((y >= 36) & (y < 40), jnp.uint8(110), f)
    pieces = (y == 35) & (x >= 60) & (x < 60 + jnp.minimum(s.igloo, _FB_IGLOO_NEED))
    f = jnp.where(pieces, jnp.uint8(200), f)
    dome = _rect_mask(y, x, 58.0, 28.0, 16.0, 7.0) & (s.igloo >= _FB_IGLOO_NEED)
    f = jnp.where(dome, jnp.uint8(200), f)
    for r in range(_FB_ROWS):
        shade = jnp.where(s.visited[r], jnp.uint8(120), jnp.uint8(230))
        for j in range(_FB_FLOES):
            m = _rect_mask(y, x, s.floe_x[r, j], float(_FB_ROW_Y[r]),
                           _FB_FLOE_W, _FB_FLOE_H)
            f = jnp.where(m, shade, f)
    for b in range(_FB_BIRDS):
        m = _rect_mask(y, x, s.bird_x[b],
                       float(_FB_ROW_Y[_FB_BIRD_ROW[b]]) - _FB_BIRD_H,
                       _FB_BIRD_W, _FB_BIRD_H)
        f = jnp.where(m, jnp.uint8(160), f)
    py = jnp.where(
        s.row < 0, jnp.float32(_FB_SHORE_Y - _FB_PH),
        jnp.asarray(_FB_ROW_Y)[jnp.maximum(s.row, 0)] - _FB_PH,
    )
    f = jnp.where(_rect_mask(y, x, s.x, py, _FB_PW, _FB_PH), jnp.uint8(255), f)
    bar = (y == 3) & (x >= 2) & (x < 2 + jnp.minimum(s.temp, 60))
    f = jnp.where(bar, jnp.uint8(160), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 10, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _FB_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


FROSTBITE = dict(
    reset=_fb_reset,
    act=_fb_act,
    render=_fb_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=5,
    minimal_to_full=np.array([0, 2, 3, 4, 5], np.int32),  # NOOP UP RIGHT LEFT DOWN
)


# ---------------------------------------------------------------------------
# Kangaroo (csrc/envs/kangaroo.cc)
# ---------------------------------------------------------------------------

_KG_FLOORS = 3
_KG_STAND_Y = np.array([76.0, 54.0, 32.0, 14.0], np.float32)
_KG_LADDER_X = np.array([64.0, 12.0, 64.0], np.float32)
_KG_LADDER_W = 6.0
_KG_PW, _KG_PH = 5.0, 8.0
_KG_WALK = 1.2
_KG_CLIMB = 1.2
_KG_MONKEYS = 3
_KG_MONKEY_X0 = np.array([20.0, 60.0, 30.0], np.float32)
_KG_MONKEY_D0 = np.array([1.0, -1.0, 1.0], np.float32)
_KG_MW, _KG_MH = 5.0, 7.0
_KG_HOLD = 100
_KG_PUNCH_CD = 12
_KG_REACH = 10.0
_KG_AW, _KG_AH, _KG_AV = 3.0, 2.0, 1.5
_KG_FRUITS = 3
_KG_FRUIT_FLOOR = np.array([0, 1, 2], np.int32)
_KG_FRUIT_X = np.array([24.0, 46.0, 60.0], np.float32)
_KG_FW, _KG_FH = 3.0, 3.0
_KG_TIMER = 6000
_KG_LIVES = 3
_KG_APPLE_PERIOD = np.array([140 + 37 * m for m in range(_KG_MONKEYS)], np.int32)


@flax.struct.dataclass
class KangarooCore:
    x: jax.Array
    y: jax.Array
    floor: jax.Array     # i32 0..3 (3 = top platform, transient)
    climbing: jax.Array
    punch_cd: jax.Array
    monkey_x: jax.Array  # [3] f32
    monkey_dir: jax.Array
    monkey_hold: jax.Array
    apple_live: jax.Array
    apple_timer: jax.Array
    apple_x: jax.Array
    apple_vx: jax.Array
    fruit_live: jax.Array
    timer: jax.Array
    level: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _kg_respawn_fields():
    return dict(
        x=jnp.float32(8.0), y=jnp.float32(_KG_STAND_Y[0]), floor=jnp.int32(0),
        climbing=jnp.bool_(False), punch_cd=jnp.int32(0), timer=jnp.int32(0),
        monkey_x=jnp.asarray(_KG_MONKEY_X0), monkey_dir=jnp.asarray(_KG_MONKEY_D0),
        monkey_hold=jnp.zeros(_KG_MONKEYS, jnp.int32),
        apple_live=jnp.zeros(_KG_MONKEYS, bool),
        apple_timer=jnp.zeros(_KG_MONKEYS, jnp.int32),
        apple_x=jnp.zeros(_KG_MONKEYS, jnp.float32),
        apple_vx=jnp.zeros(_KG_MONKEYS, jnp.float32),
    )


def _kg_reset(key):
    del key  # fully deterministic (kangaroo.cc reset_game/reset_level)
    return KangarooCore(
        fruit_live=jnp.ones(_KG_FRUITS, bool), level=jnp.int32(0),
        lives=jnp.int32(_KG_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_kg_respawn_fields(),
    )


def _kg_at_ladder(x, fl):
    lx = jnp.asarray(_KG_LADDER_X)[jnp.clip(fl, 0, _KG_FLOORS - 1)]
    return jnp.abs(x + _KG_PW / 2.0 - (lx + _KG_LADDER_W / 2.0)) < 4.0


def _kg_act(s: KangarooCore, dx, dy, fire, key):
    del key
    live = ~s.over
    lvl_f = s.level.astype(jnp.float32)
    mspeed = 0.6 + 0.35 * lvl_f
    punch_cd = jnp.maximum(s.punch_cd - 1, 0)
    stand = jnp.asarray(_KG_STAND_Y)
    dyf = dy.astype(jnp.float32)

    # -- climbing / walking --------------------------------------------------
    cl = s.climbing
    y_cl = s.y + dyf * _KG_CLIMB
    top = stand[jnp.clip(s.floor + 1, 0, _KG_FLOORS)]
    bot = stand[jnp.clip(s.floor, 0, _KG_FLOORS)]
    reach_top = cl & (y_cl <= top)
    reach_bot = cl & ~reach_top & (y_cl >= bot)
    floor_cl = jnp.where(reach_top, s.floor + 1, s.floor)
    y_cl = jnp.where(reach_top, top, jnp.where(reach_bot, bot, y_cl))
    climbing_cl = cl & ~reach_top & ~reach_bot
    rescued = reach_top & (floor_cl == _KG_FLOORS)

    x_wk = jnp.clip(s.x + dx.astype(jnp.float32) * _KG_WALK, 4.0, 79.0 - _KG_PW)
    up_start = ~cl & (dy < 0) & (s.floor < _KG_FLOORS) & _kg_at_ladder(x_wk, s.floor)
    down_start = ~cl & ~up_start & (dy > 0) & (s.floor > 0) \
        & _kg_at_ladder(x_wk, s.floor - 1)
    floor_wk = jnp.where(down_start, s.floor - 1, s.floor)
    snap_x = jnp.asarray(_KG_LADDER_X)[jnp.clip(floor_wk, 0, _KG_FLOORS - 1)] \
        + (_KG_LADDER_W - _KG_PW) / 2.0
    starts = up_start | down_start
    x_wk = jnp.where(starts, snap_x, x_wk)
    y_wk = jnp.where(starts, s.y + dyf * _KG_CLIMB, s.y)

    x = jnp.where(cl, s.x, x_wk)
    y = jnp.where(cl, y_cl, y_wk)
    floor = jnp.where(cl, floor_cl, floor_wk)
    climbing = jnp.where(cl, climbing_cl, starts)

    # Rescue bonus ticks down with level time (arcade bonus clock, mirrors
    # kangaroo.cc): 2000 at level start, -100 every 300 raw frames, floor 100.
    bonus = jnp.maximum(jnp.int32(100), 2000 - 100 * (s.timer // 300))
    reward = jnp.where(rescued, bonus.astype(jnp.float32), 0.0)
    score = s.score + jnp.where(rescued, bonus, 0)

    # -- monkeys -------------------------------------------------------------
    held = s.monkey_hold > 0
    hold = jnp.where(held, s.monkey_hold - 1, s.monkey_hold)
    respawn_m = held & (hold == 0)
    mx = jnp.where(held, s.monkey_x, s.monkey_x + s.monkey_dir * mspeed)
    mdir = s.monkey_dir
    mdir = jnp.where(~held & (mx < 6.0), 1.0, mdir)
    mdir = jnp.where(~held & (mx > 73.0), -1.0, mdir)
    mx = jnp.where(~held, jnp.clip(mx, 6.0, 73.0), mx)
    mx = jnp.where(respawn_m, jnp.asarray(_KG_MONKEY_X0), mx)
    mdir = jnp.where(respawn_m, jnp.asarray(_KG_MONKEY_D0), mdir)
    apple_live = jnp.where(respawn_m, False, s.apple_live)
    apple_timer = jnp.where(respawn_m, 0, s.apple_timer)

    # -- punch ---------------------------------------------------------------
    punches = (fire > 0) & (punch_cd == 0) & ~climbing & ~rescued
    in_reach = (
        (jnp.arange(_KG_MONKEYS) == floor)
        & (hold == 0) & ~respawn_m
        & (jnp.abs(mx + _KG_MW / 2.0 - (x + _KG_PW / 2.0)) < _KG_REACH)
    )
    hits = punches & in_reach
    punch_cd = jnp.where(punches, _KG_PUNCH_CD, punch_cd)
    hold = jnp.where(hits, _KG_HOLD, hold)
    n_hit = hits.sum().astype(jnp.int32)
    reward = reward + n_hit.astype(jnp.float32) * 200.0
    score = score + n_hit * 200

    # -- monkey contact (lethal, kangaroo.cc contact check after the punch;
    # climbing is safe, a same-frame punch saves the player) ------------------
    contact = (
        ~climbing & ~rescued
        & (jnp.arange(_KG_MONKEYS) == floor) & (hold == 0)
        & (mx + _KG_MW > x) & (mx < x + _KG_PW)
    ).any()

    # -- apples (period shrinks / speed grows with level, kangaroo.cc ramp) ---
    active_m = hold == 0
    period = jnp.maximum(jnp.int32(24),
                         jnp.asarray(_KG_APPLE_PERIOD) - 24 * s.level)
    apple_timer = jnp.where(active_m & ~apple_live, apple_timer + 1, apple_timer)
    throws = active_m & ~apple_live & (apple_timer >= period)
    apple_timer = jnp.where(throws, 0, apple_timer)
    ax0 = mx + _KG_MW / 2.0
    av = _KG_AV + 0.3 * lvl_f
    avx = jnp.where(x >= ax0, av, -av)
    apple_x = jnp.where(throws, ax0, s.apple_x)
    apple_vx = jnp.where(throws, avx, s.apple_vx)
    apple_live = apple_live | throws
    moving = apple_live & ~throws
    apple_x = jnp.where(moving, apple_x + apple_vx, apple_x)
    offscreen = apple_live & ((apple_x < -_KG_AW) | (apple_x > 84.0))
    apple_live = apple_live & ~offscreen
    ay = stand[:_KG_MONKEYS] - _KG_PH + 2.0
    py = y - _KG_PH
    ox = (x + _KG_PW > apple_x) & (x < apple_x + _KG_AW)
    oy = (py + _KG_PH > ay) & (py < ay + _KG_AH)
    struck = ~rescued & ~contact & (apple_live & ox & oy).any()

    # -- fruit ---------------------------------------------------------------
    fy = stand[jnp.asarray(_KG_FRUIT_FLOOR)] - _KG_PH + 2.0
    fox = (x + _KG_PW > jnp.asarray(_KG_FRUIT_X)) \
        & (x < jnp.asarray(_KG_FRUIT_X) + _KG_FW)
    foy = (py + _KG_PH > fy) & (py < fy + _KG_FH)
    grabs = (
        s.fruit_live & ~climbing & ~rescued & ~contact & ~struck
        & (jnp.asarray(_KG_FRUIT_FLOOR) == floor) & fox & foy
    )
    fruit_live = s.fruit_live & ~grabs
    n_grab = grabs.sum().astype(jnp.int32)
    reward = reward + n_grab.astype(jnp.float32) * 100.0
    score = score + n_grab * 100

    # -- timer / deaths / resets ----------------------------------------------
    timer = s.timer + 1
    timed_out = ~rescued & ~contact & ~struck & (timer >= _KG_TIMER)
    died = contact | struck | timed_out
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    level = s.level + rescued.astype(jnp.int32)
    fruit_live = jnp.where(rescued, jnp.ones_like(fruit_live), fruit_live)

    rsp = died | rescued
    re = _kg_respawn_fields()
    x = jnp.where(rsp, re["x"], x)
    y = jnp.where(rsp, re["y"], y)
    floor = jnp.where(rsp, re["floor"], floor)
    climbing = jnp.where(rsp, re["climbing"], climbing)
    punch_cd = jnp.where(rsp, re["punch_cd"], punch_cd)
    timer = jnp.where(rsp, re["timer"], timer)
    mx = jnp.where(rsp, re["monkey_x"], mx)
    mdir = jnp.where(rsp, re["monkey_dir"], mdir)
    hold = jnp.where(rsp, re["monkey_hold"], hold)
    apple_live = jnp.where(rsp, re["apple_live"], apple_live)
    apple_timer = jnp.where(rsp, re["apple_timer"], apple_timer)
    apple_x = jnp.where(rsp, re["apple_x"], apple_x)
    apple_vx = jnp.where(rsp, re["apple_vx"], apple_vx)

    out = KangarooCore(
        x=x, y=y, floor=floor, climbing=climbing, punch_cd=punch_cd,
        monkey_x=mx, monkey_dir=mdir, monkey_hold=hold,
        apple_live=apple_live, apple_timer=apple_timer,
        apple_x=apple_x, apple_vx=apple_vx, fruit_live=fruit_live,
        timer=timer, level=level, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _kg_static_background():
    """Floors, ladders, joey — constant scenery (kangaroo.cc render)."""
    f = np.zeros((SCREEN, SCREEN), np.uint8)
    for fl in range(_KG_FLOORS + 1):
        y0 = int(_KG_STAND_Y[fl])
        x0, x1 = (30, 54) if fl == _KG_FLOORS else (2, 82)
        f[y0:min(y0 + 3, SCREEN), x0:x1] = 100
    for fl in range(_KG_FLOORS):
        ytop = int(_KG_STAND_Y[fl + 1]) + 3
        ybot = int(_KG_STAND_Y[fl])
        lx = int(_KG_LADDER_X[fl])
        for yy in range(ytop, ybot, 2):
            f[yy, lx:lx + int(_KG_LADDER_W)] = 80
    # Joey on the top platform.
    f[int(_KG_STAND_Y[_KG_FLOORS] - 6.0):int(_KG_STAND_Y[_KG_FLOORS]), 40:44] = 230
    return f


_KG_BG = _kg_static_background()


def _kg_render(s: KangarooCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.asarray(_KG_BG)
    stand = jnp.asarray(_KG_STAND_Y)
    for t in range(_KG_FRUITS):
        m = _rect_mask(y, x, float(_KG_FRUIT_X[t]),
                       float(_KG_STAND_Y[_KG_FRUIT_FLOOR[t]]) - _KG_PH + 2.0,
                       _KG_FW, _KG_FH) & s.fruit_live[t]
        f = jnp.where(m, jnp.uint8(210), f)
    for m_i in range(_KG_MONKEYS):
        mm = _rect_mask(y, x, s.monkey_x[m_i],
                        float(_KG_STAND_Y[m_i]) - _KG_MH, _KG_MW, _KG_MH) \
            & (s.monkey_hold[m_i] == 0)
        f = jnp.where(mm, jnp.uint8(150), f)
        am = _rect_mask(y, x, s.apple_x[m_i],
                        float(_KG_STAND_Y[m_i]) - _KG_PH + 2.0, _KG_AW, _KG_AH) \
            & s.apple_live[m_i]
        f = jnp.where(am, jnp.uint8(180), f)
    f = jnp.where(_rect_mask(y, x, s.x, s.y - _KG_PH, _KG_PW, _KG_PH),
                  jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _KG_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


KANGAROO = dict(
    reset=_kg_reset,
    act=_kg_act,
    render=_kg_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
