"""Pure-JAX twins of the wave-9b C++ engine games: ChopperCommand,
Jamesbond, Zaxxon.

Rules mirror the C++ engine game-for-game (csrc/envs/chopper_command.cc,
jamesbond.cc, zaxxon.cc) so the Anakin trainer covers the same task set as
the Sebulba host-env path; reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract
of jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

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

__all__ = ["CHOPPER_COMMAND", "JAMESBOND", "ZAXXON"]


def _first_true(mask):
    """Keep only the first True along the last axis (C++ loop-break)."""
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


# ---------------------------------------------------------------------------
# Chopper Command (csrc/envs/chopper_command.cc)
# ---------------------------------------------------------------------------

_CC_ENEMIES = 4
_CC_ROW_Y = np.array([26.0, 40.0, 54.0, 33.0], np.float32)
_CC_EX0 = np.array([10.0, 60.0, 30.0, 75.0], np.float32)
_CC_ED0 = np.array([1.0, -1.0, 1.0, -1.0], np.float32)
_CC_EW, _CC_EH = 6.0, 4.0
_CC_TRUCKS = 4
_CC_TRUCK_Y, _CC_TW, _CC_TH = 74.0, 6.0, 4.0
_CC_PW, _CC_PH = 7.0, 4.0
_CC_MX, _CC_MY = 1.2, 1.0
_CC_SHOT_V = 3.0
_CC_ESHOT_V = 2.0
_CC_BOMB_V = 1.5
_CC_LIVES = 3
_CC_TRUCK_X0 = np.array([8.0 + t * 20 for t in range(_CC_TRUCKS)], np.float32)
_CC_PTS = np.array([100, 200, 100, 200], np.int32)  # jets 100, helis 200


@flax.struct.dataclass
class ChopperCore:
    px: jax.Array
    py: jax.Array
    facing: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    ex: jax.Array          # [4]
    edir: jax.Array
    enemy_alive: jax.Array
    eshot_live: jax.Array
    eshot_x: jax.Array
    eshot_y: jax.Array
    eshot_vx: jax.Array
    bomb_live: jax.Array
    bomb_x: jax.Array
    bomb_y: jax.Array
    truck_x: jax.Array     # [4]
    truck_alive: jax.Array
    wave: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _cc_wave_fields():
    return dict(
        ex=jnp.asarray(_CC_EX0), edir=jnp.asarray(_CC_ED0),
        enemy_alive=jnp.ones(_CC_ENEMIES, bool),
        eshot_live=jnp.zeros(_CC_ENEMIES, bool),
        bomb_live=jnp.zeros(_CC_ENEMIES, bool),
    )


def _cc_reset(key):
    del key  # fully deterministic (chopper_command.cc reset_game)
    return ChopperCore(
        px=jnp.float32(20.0), py=jnp.float32(50.0), facing=jnp.float32(1.0),
        shot_live=jnp.bool_(False), shot_x=jnp.float32(0.0),
        shot_y=jnp.float32(0.0), shot_vx=jnp.float32(0.0),
        eshot_x=jnp.zeros(_CC_ENEMIES, jnp.float32),
        eshot_y=jnp.zeros(_CC_ENEMIES, jnp.float32),
        eshot_vx=jnp.zeros(_CC_ENEMIES, jnp.float32),
        bomb_x=jnp.zeros(_CC_ENEMIES, jnp.float32),
        bomb_y=jnp.zeros(_CC_ENEMIES, jnp.float32),
        truck_x=jnp.asarray(_CC_TRUCK_X0),
        truck_alive=jnp.ones(_CC_TRUCKS, bool),
        wave=jnp.int32(0), lives=jnp.int32(_CC_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False), **_cc_wave_fields(),
    )


def _cc_act(s: ChopperCore, dx, dy, fire, key):
    live = ~s.over
    k_strafe, k_bomb = jax.random.split(key)
    espeed = 0.7 + 0.15 * s.wave.astype(jnp.float32)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _CC_MX, 4.0, 80.0 - _CC_PW)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * _CC_MY, 16.0, 68.0)
    facing = jnp.where(dx != 0, jnp.sign(dx).astype(jnp.float32), s.facing)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _CC_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py + _CC_PH / 2.0, s.shot_y)
    shot_vx = jnp.where(fires, facing * _CC_SHOT_V, s.shot_vx)
    # The C++ shot advances on its spawn frame too (chopper_command.cc).
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_live = shot_live & (shot_x >= 0.0) & (shot_x <= 84.0)

    truck_x = s.truck_x - 0.3
    truck_x = jnp.where(truck_x < -_CC_TW, truck_x + 84.0 + _CC_TW, truck_x)
    truck_alive = s.truck_alive

    # Enemies move (alive only).
    alive = s.enemy_alive
    ex = jnp.where(alive, s.ex + s.edir * espeed, s.ex)
    ex = jnp.where(alive & (ex < -_CC_EW), ex + 84.0 + _CC_EW, ex)
    ex = jnp.where(alive & (ex > 84.0), ex - (84.0 + _CC_EW), ex)
    ey = jnp.asarray(_CC_ROW_Y)

    # Strafe spawns (pre-kill alive mask, like the C++ ordering).
    strafes = (
        alive & ~s.eshot_live & (jnp.abs(ey - py) < 6.0)
        & (jax.random.uniform(k_strafe, (_CC_ENEMIES,)) < 0.008)
    )
    eshot_live = s.eshot_live | strafes
    eshot_x = jnp.where(strafes, ex + _CC_EW / 2.0, s.eshot_x)
    eshot_y = jnp.where(strafes, ey + _CC_EH / 2.0, s.eshot_y)
    eshot_vx = jnp.where(
        strafes, jnp.where(px >= ex, _CC_ESHOT_V, -_CC_ESHOT_V), s.eshot_vx
    )
    # Bomb spawns: a living truck roughly underneath.
    truck_under = (
        jnp.abs(truck_x[None, :] - ex[:, None]) < 5.0
    ) & truck_alive[None, :]
    bombs_want = (
        alive & ~s.bomb_live & truck_under.any(axis=1)
        & (jax.random.uniform(k_bomb, (_CC_ENEMIES,)) < 0.004)
    )
    bomb_live = s.bomb_live | bombs_want
    bomb_x = jnp.where(bombs_want, ex + _CC_EW / 2.0, s.bomb_x)
    bomb_y = jnp.where(bombs_want, ey + _CC_EH, s.bomb_y)

    # Player shot kills the first overlapped enemy.
    shot_hits = (
        shot_live & alive
        & (shot_x >= ex) & (shot_x < ex + _CC_EW)
        & (shot_y >= ey) & (shot_y < ey + _CC_EH)
    )
    kill = _first_true(shot_hits)
    killed_any = kill.any()
    shot_live = shot_live & ~killed_any
    alive = alive & ~kill
    pts = jnp.where(kill, jnp.asarray(_CC_PTS), 0).sum()
    reward = pts.astype(jnp.float32)
    score = s.score + pts

    # Ram: any surviving enemy overlapping the player.
    ram = (
        alive
        & (px + _CC_PW > ex) & (px < ex + _CC_EW)
        & (py + _CC_PH > ey) & (py < ey + _CC_EH)
    ).any()

    # Enemy shots fly (including on their spawn frame); hit player?
    eshot_x = jnp.where(eshot_live, eshot_x + eshot_vx, eshot_x)
    eshot_off = eshot_live & ((eshot_x < 0.0) | (eshot_x > 84.0))
    eshot_live = eshot_live & ~eshot_off
    pshot_hit = (
        eshot_live
        & (px + _CC_PW > eshot_x - 1.0) & (px < eshot_x + 1.0)
        & (py + _CC_PH > eshot_y - 1.0) & (py < eshot_y + 1.0)
    )
    struck = ~ram & pshot_hit.any()

    # Bombs fall (including on their spawn frame); landing kills the first
    # truck in range (per bomb, in order).
    bomb_y = jnp.where(bomb_live, bomb_y + _CC_BOMB_V, bomb_y)
    landing = bomb_live & (bomb_y >= _CC_TRUCK_Y)
    bomb_live = bomb_live & ~landing
    for e in range(_CC_ENEMIES):
        in_range = (
            landing[e] & truck_alive
            & (jnp.abs(truck_x + _CC_TW / 2.0 - bomb_x[e]) < 5.0)
        )
        truck_alive = truck_alive & ~_first_true(in_range)

    died = ram | struck
    # Wave cleared (no survivors): truck bonus, next wave.
    cleared = ~died & ~alive.any()
    bonus = jnp.where(cleared, truck_alive.sum().astype(jnp.int32) * 100, 0)
    reward = reward + bonus.astype(jnp.float32)
    score = score + bonus
    wave = s.wave + cleared.astype(jnp.int32)

    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))

    # Death respawns the player but leaves the enemy formation in place
    # (chopper_command.cc respawn vs start_wave); only a cleared wave
    # repositions the enemies.
    wf = _cc_wave_fields()
    restart = died | cleared
    ex = jnp.where(cleared, wf["ex"], ex)
    edir = jnp.where(cleared, wf["edir"], s.edir)
    alive = jnp.where(cleared, wf["enemy_alive"], alive)
    eshot_live = jnp.where(restart, wf["eshot_live"], eshot_live)
    bomb_live = jnp.where(restart, wf["bomb_live"], bomb_live)
    px = jnp.where(died, 20.0, px)
    py = jnp.where(died, 50.0, py)
    facing = jnp.where(died, 1.0, facing)
    shot_live = jnp.where(died, False, shot_live)

    out = ChopperCore(
        px=px, py=py, facing=facing, shot_live=shot_live, shot_x=shot_x,
        shot_y=shot_y, shot_vx=shot_vx, ex=ex, edir=edir, enemy_alive=alive,
        eshot_live=eshot_live, eshot_x=eshot_x, eshot_y=eshot_y,
        eshot_vx=eshot_vx, bomb_live=bomb_live, bomb_x=bomb_x, bomb_y=bomb_y,
        truck_x=truck_x, truck_alive=truck_alive, wave=wave, lives=lives,
        score=score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _cc_render(s: ChopperCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y >= 78) & (y < 80), jnp.uint8(100), f)
    for t in range(_CC_TRUCKS):
        m = _rect_mask(y, x, s.truck_x[t], _CC_TRUCK_Y, _CC_TW, _CC_TH) \
            & s.truck_alive[t]
        f = jnp.where(m, jnp.uint8(120), f)
    for e in range(_CC_ENEMIES):
        m = _rect_mask(y, x, s.ex[e], float(_CC_ROW_Y[e]), _CC_EW, _CC_EH) \
            & s.enemy_alive[e]
        f = jnp.where(m, jnp.uint8(170 if e % 2 == 0 else 150), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    for e in range(_CC_ENEMIES):
        em = _rect_mask(y, x, s.eshot_x[e] - 1.0, s.eshot_y[e] - 1.0, 2.0, 2.0) \
            & s.eshot_live[e]
        f = jnp.where(em, jnp.uint8(210), f)
        bm = _rect_mask(y, x, s.bomb_x[e] - 1.0, s.bomb_y[e], 2.0, 3.0) \
            & s.bomb_live[e]
        f = jnp.where(bm, jnp.uint8(200), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _CC_PW, _CC_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _CC_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


CHOPPER_COMMAND = dict(
    reset=_cc_reset,
    act=_cc_act,
    render=_cc_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# James Bond 007 (csrc/envs/jamesbond.cc)
# ---------------------------------------------------------------------------

_JB_PX = 16.0
_JB_PW, _JB_PH = 6.0, 5.0
_JB_MOVE = 1.0
_JB_SCROLL = 1.0
_JB_SLOTS = 4
_JB_SPAWN = 90
_JB_SHOT_VX, _JB_SHOT_VY = 2.0, -1.0
_JB_LIVES = 3
_JB_TYPES = np.array([0, 1, 2, 1], np.int32)
_JB_W = np.array([10.0, 6.0, 6.0], np.float32)   # by type
_JB_H = np.array([6.0, 4.0, 4.0], np.float32)
_JB_PTS = np.array([0, 50, 100], np.int32)


@flax.struct.dataclass
class JamesbondCore:
    py: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    ob_live: jax.Array    # [4]
    ob_type: jax.Array
    ob_x: jax.Array
    ob_y: jax.Array
    spawn_clock: jax.Array
    spawn_count: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _jb_reset(key):
    del key  # fully deterministic (jamesbond.cc reset_game)
    return JamesbondCore(
        py=jnp.float32(50.0), shot_live=jnp.bool_(False),
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        ob_live=jnp.zeros(_JB_SLOTS, bool),
        ob_type=jnp.zeros(_JB_SLOTS, jnp.int32),
        ob_x=jnp.zeros(_JB_SLOTS, jnp.float32),
        ob_y=jnp.zeros(_JB_SLOTS, jnp.float32),
        spawn_clock=jnp.int32(0), spawn_count=jnp.int32(0),
        lives=jnp.int32(_JB_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _jb_act(s: JamesbondCore, dx, dy, fire, key):
    del dx
    live = ~s.over
    k_enemy, k_sat = jax.random.split(key)

    py = jnp.clip(s.py + dy.astype(jnp.float32) * _JB_MOVE, 24.0, 70.0)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, _JB_PX + _JB_PW, s.shot_x)
    shot_y = jnp.where(fires, py, s.shot_y)
    shot_x = jnp.where(shot_live, shot_x + _JB_SHOT_VX, shot_x)
    shot_y = jnp.where(shot_live, shot_y + _JB_SHOT_VY, shot_y)
    shot_live = shot_live & (shot_x <= 84.0) & (shot_y >= 0.0)

    # Spawn into the first free slot when the clock fires; the spawn period
    # shrinks as the wave count climbs (floor 36, jamesbond.cc ramp).
    period = jnp.maximum(jnp.int32(36), _JB_SPAWN - s.spawn_count // 2)
    spawn_clock = s.spawn_clock + 1
    spawning = spawn_clock >= period
    spawn_clock = jnp.where(spawning, 0, spawn_clock)
    slot = _first_true(~s.ob_live) & spawning
    new_type = jnp.asarray(_JB_TYPES)[s.spawn_count % 4]
    spawned = slot.any()
    spawn_count = s.spawn_count + spawned.astype(jnp.int32)
    new_y = jnp.where(
        new_type == 0, 70.0,
        jnp.where(
            new_type == 1,
            28.0 + jax.random.randint(k_enemy, (), 0, 36).astype(jnp.float32),
            20.0 + jax.random.randint(k_sat, (), 0, 8).astype(jnp.float32),
        ),
    )
    ob_live = s.ob_live | slot
    ob_type = jnp.where(slot, new_type, s.ob_type)
    ob_x = jnp.where(slot, 84.0, s.ob_x)
    ob_y = jnp.where(slot, new_y, s.ob_y)

    # Scroll (spawn-frame movement included, as in the C++ loop); speed ramps
    # without bound with the post-spawn wave count, flying enemies are faster
    # and home onto the player's altitude (jamesbond.cc ramp).
    ramp = spawn_count.astype(jnp.float32)
    speed = jnp.where(ob_type == 1, 1.5 + 0.05 * ramp, 1.0 + 0.025 * ramp)
    ob_x = jnp.where(ob_live, ob_x - speed, ob_x)
    ob_live = ob_live & (ob_x >= -8.0)
    home = 0.06 + 0.004 * ramp
    ob_y = jnp.where(
        ob_live & (ob_type == 1),
        jnp.clip(ob_y + jnp.sign(py - ob_y) * home, 20.0, 70.0),
        ob_y,
    )

    w = jnp.asarray(_JB_W)[ob_type]
    h = jnp.asarray(_JB_H)[ob_type]
    shot_hits = (
        shot_live & ob_live & (ob_type != 0)
        & (shot_x >= ob_x) & (shot_x < ob_x + w)
        & (shot_y >= ob_y) & (shot_y < ob_y + h)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    ob_live = ob_live & ~kill
    pts = jnp.where(kill, jnp.asarray(_JB_PTS)[ob_type], 0).sum()
    reward = pts.astype(jnp.float32)
    score = s.score + pts

    collides = (
        ob_live & (ob_type != 2)
        & (_JB_PX + _JB_PW > ob_x) & (_JB_PX < ob_x + w)
        & (py + _JB_PH > ob_y) & (py < ob_y + h)
    ).any()
    lives = s.lives - collides.astype(jnp.int32)
    over = s.over | (collides & (lives <= 0))
    py = jnp.where(collides, 50.0, py)
    shot_live = jnp.where(collides, False, shot_live)
    ob_live = jnp.where(collides, jnp.zeros_like(ob_live), ob_live)
    spawn_clock = jnp.where(collides, 0, spawn_clock)

    out = JamesbondCore(
        py=py, shot_live=shot_live, shot_x=shot_x, shot_y=shot_y,
        ob_live=ob_live, ob_type=ob_type, ob_x=ob_x, ob_y=ob_y,
        spawn_clock=spawn_clock, spawn_count=spawn_count,
        lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _jb_render(s: JamesbondCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y >= 76) & (y < 78), jnp.uint8(100), f)
    shades = jnp.asarray(np.array([130, 170, 210], np.uint8))
    for i in range(_JB_SLOTS):
        t = s.ob_type[i]
        m = _rect_mask(y, x, s.ob_x[i], s.ob_y[i],
                       jnp.asarray(_JB_W)[t], jnp.asarray(_JB_H)[t]) & s.ob_live[i]
        f = jnp.where(m, shades[t], f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 1.0, 2.0, 2.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, _JB_PX, s.py, _JB_PW, _JB_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 50, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _JB_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


JAMESBOND = dict(
    reset=_jb_reset,
    act=_jb_act,
    render=_jb_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=6,
    minimal_to_full=np.array([0, 1, 2, 5, 10, 13], np.int32),
)


# ---------------------------------------------------------------------------
# Zaxxon (csrc/envs/zaxxon.cc)
# ---------------------------------------------------------------------------

_ZX_PY = 66.0
_ZX_PW, _ZX_PH = 5.0, 4.0
_ZX_MX = 1.2
_ZX_ALT_RATE = 0.15
_ZX_ALT_MAX = 6.0
_ZX_SCROLL = 1.2
_ZX_WALL_PERIOD = 220
_ZX_SITE_PERIOD = 70
_ZX_SITES = 4
_ZX_SW, _ZX_SH = 6.0, 4.0
_ZX_SHOT_V = 2.5
_ZX_LIVES = 3
_ZX_FUEL_MAX = 40.0   # units; 1/16 unit burned per raw frame (zaxxon.cc)
_ZX_FUEL_BURN = 0.0625
_ZX_FUEL_PER_TANK = 10.0


@flax.struct.dataclass
class ZaxxonCore:
    px: jax.Array
    alt: jax.Array
    fuel: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    wall_live: jax.Array
    wall_y: jax.Array
    wall_req: jax.Array
    wall_clock: jax.Array
    walls_cleared: jax.Array
    site_live: jax.Array   # [4]
    site_tank: jax.Array
    site_x: jax.Array
    site_y: jax.Array
    site_clock: jax.Array
    spawn_count: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _zx_respawn_fields():
    return dict(
        px=jnp.float32(40.0), alt=jnp.float32(3.0),
        fuel=jnp.float32(_ZX_FUEL_MAX),
        shot_live=jnp.bool_(False), wall_live=jnp.bool_(False),
        wall_clock=jnp.int32(0), site_clock=jnp.int32(0),
        spawn_count=jnp.int32(0), site_live=jnp.zeros(_ZX_SITES, bool),
    )


def _zx_reset(key):
    del key  # fully deterministic (zaxxon.cc reset_game)
    return ZaxxonCore(
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        wall_y=jnp.float32(0.0), wall_req=jnp.float32(2.0),
        walls_cleared=jnp.int32(0),
        site_tank=jnp.zeros(_ZX_SITES, bool),
        site_x=jnp.zeros(_ZX_SITES, jnp.float32),
        site_y=jnp.zeros(_ZX_SITES, jnp.float32),
        lives=jnp.int32(_ZX_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_zx_respawn_fields(),
    )


def _zx_act(s: ZaxxonCore, dx, dy, fire, key):
    live = ~s.over

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _ZX_MX, 6.0, 78.0 - _ZX_PW)
    alt = jnp.clip(s.alt - dy.astype(jnp.float32) * _ZX_ALT_RATE, 0.0, _ZX_ALT_MAX)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _ZX_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, _ZX_PY, s.shot_y)
    shot_y = jnp.where(shot_live, shot_y - _ZX_SHOT_V, shot_y)
    shot_live = shot_live & (shot_y >= 0.0)

    # Fortress difficulty ramps with every wall cleared (zaxxon.cc ramp):
    # faster scroll, tighter wall and site cadence.
    scroll = _ZX_SCROLL + 0.03 * s.walls_cleared.astype(jnp.float32)
    wall_period = jnp.maximum(jnp.int32(120), _ZX_WALL_PERIOD - 8 * s.walls_cleared)
    site_period = jnp.maximum(jnp.int32(30), _ZX_SITE_PERIOD - 3 * s.walls_cleared)

    # Fortress wall.
    wall_clock = jnp.where(s.wall_live, s.wall_clock, s.wall_clock + 1)
    wall_spawns = ~s.wall_live & (wall_clock >= wall_period)
    wall_clock = jnp.where(wall_spawns, 0, wall_clock)
    wall_live = s.wall_live | wall_spawns
    wall_y = jnp.where(wall_spawns, -4.0, s.wall_y)
    wall_req = jnp.where(
        wall_spawns, 2.0 + ((s.walls_cleared * 3) % 5).astype(jnp.float32),
        s.wall_req,
    )
    wall_y = jnp.where(wall_live, wall_y + scroll, wall_y)
    wall_passes = wall_live & (wall_y >= 84.0)
    wall_live = wall_live & ~wall_passes
    walls_cleared = s.walls_cleared + wall_passes.astype(jnp.int32)
    wall_kills = (
        wall_live & (wall_y + 4.0 > _ZX_PY) & (wall_y < _ZX_PY + _ZX_PH)
        & (alt < wall_req)
    )

    # Ground sites.
    site_clock = s.site_clock + 1
    site_spawning = site_clock >= site_period
    site_clock = jnp.where(site_spawning, 0, site_clock)
    slot = _first_true(~s.site_live) & site_spawning
    spawned = slot.any()
    is_tank = (s.spawn_count % 3) == 2
    spawn_count = s.spawn_count + spawned.astype(jnp.int32)
    new_x = 8.0 + jax.random.randint(key, (), 0, 64).astype(jnp.float32)
    site_live = s.site_live | slot
    site_tank = jnp.where(slot, is_tank, s.site_tank)
    site_x = jnp.where(slot, new_x, s.site_x)
    site_y = jnp.where(slot, -_ZX_SH, s.site_y)
    site_y = jnp.where(site_live, site_y + scroll, site_y)
    site_live = site_live & (site_y < 84.0)

    shot_hits = (
        shot_live & site_live
        & (shot_x >= site_x) & (shot_x < site_x + _ZX_SW)
        & (shot_y >= site_y) & (shot_y < site_y + _ZX_SH)
    )
    kill = _first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    site_live = site_live & ~kill
    pts = jnp.where(kill, jnp.where(site_tank, 300, 200), 0).sum()
    reward = pts.astype(jnp.float32)
    score = s.score + pts
    # Shooting a fuel tank refuels (zaxxon.cc shot-hit branch).
    refuel = (kill & site_tank).any()
    fuel = jnp.where(refuel,
                     jnp.minimum(jnp.float32(_ZX_FUEL_MAX), s.fuel + _ZX_FUEL_PER_TANK),
                     s.fuel)

    site_kills = ~wall_kills & (alt < 2.0) & (
        site_live
        & (px + _ZX_PW > site_x) & (px < site_x + _ZX_SW)
        & (_ZX_PY + _ZX_PH > site_y) & (_ZX_PY < site_y + _ZX_SH)
    ).any()

    # Fuel burns every frame; an empty tank crashes the ship (zaxxon.cc).
    # The burn is skipped on wall/site-death frames (C++ early return), which
    # is invisible because respawn refills the tank anyway.
    fuel = fuel - _ZX_FUEL_BURN
    fuel_out = ~wall_kills & ~site_kills & (fuel <= 0.0)

    died = wall_kills | site_kills | fuel_out
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    re = _zx_respawn_fields()
    px = jnp.where(died, re["px"], px)
    alt = jnp.where(died, re["alt"], alt)
    fuel = jnp.where(died, re["fuel"], fuel)
    shot_live = jnp.where(died, re["shot_live"], shot_live)
    wall_live = jnp.where(died, re["wall_live"], wall_live)
    wall_clock = jnp.where(died, re["wall_clock"], wall_clock)
    site_clock = jnp.where(died, re["site_clock"], site_clock)
    spawn_count = jnp.where(died, re["spawn_count"], spawn_count)
    site_live = jnp.where(died, re["site_live"], site_live)

    out = ZaxxonCore(
        px=px, alt=alt, fuel=fuel, shot_live=shot_live, shot_x=shot_x, shot_y=shot_y,
        wall_live=wall_live, wall_y=wall_y, wall_req=wall_req,
        wall_clock=wall_clock, walls_cleared=walls_cleared,
        site_live=site_live, site_tank=site_tank, site_x=site_x,
        site_y=site_y, site_clock=site_clock, spawn_count=spawn_count,
        lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), out, s)
    return out, jnp.where(live, reward, 0.0)


def _zx_render(s: ZaxxonCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((x == 4) | (x == 79), jnp.uint8(70), f)
    for i in range(_ZX_SITES):
        m = _rect_mask(y, x, s.site_x[i], s.site_y[i], _ZX_SW, _ZX_SH) \
            & s.site_live[i]
        shade = jnp.where(s.site_tank[i], jnp.uint8(190), jnp.uint8(140))
        f = jnp.where(m, shade, f)
    rows = 2.0 + jnp.floor(s.wall_req)
    wm = _rect_mask(y, x, 5.0, s.wall_y, 74.0, rows) & s.wall_live
    f = jnp.where(wm, jnp.uint8(120), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 2.0, 2.0, 3.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, _ZX_PY + 6.0, _ZX_PW, 2.0),
                  jnp.uint8(60), f)
    f = jnp.where(_rect_mask(y, x, s.px, _ZX_PY - s.alt, _ZX_PW, _ZX_PH),
                  jnp.uint8(255), f)
    bars = s.alt.astype(jnp.int32)
    gauge_row = (74 - y) % 3 == 0
    gauge_idx = (74 - y) // 3
    gauge = (x >= 81) & (x < 83) & gauge_row & (y <= 74) \
        & (gauge_idx >= 0) & (gauge_idx < jnp.minimum(bars, 6))
    f = jnp.where(gauge, jnp.uint8(180), f)
    fuel_px = jnp.minimum(s.fuel.astype(jnp.int32), 62)
    fuel_bar = (y == 80) & (x >= 2) & (x - 2 < fuel_px)
    f = jnp.where(fuel_bar, jnp.uint8(90), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _ZX_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


ZAXXON = dict(
    reset=_zx_reset,
    act=_zx_act,
    render=_zx_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
