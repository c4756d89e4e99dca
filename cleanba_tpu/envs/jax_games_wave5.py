"""Pure-JAX twins of the fifth wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/assault.cc, phoenix.cc,
gopher.cc, name_this_game.cc) so the Anakin trainer covers the same task set
as the Sebulba host-env path; reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract of
jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

The engines draw independent RNG streams (PCG32 vs threefry), so
trajectories diverge after the first stochastic event — rules, scoring, and
rendering are what must match, and do. Oscillations use a triangle wave (not
sin) so positions are bit-identical float32 across engines.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["ASSAULT", "PHOENIX", "GOPHER", "NAME_THIS_GAME"]


def _tri(p):
    """Triangle wave, period 4, amplitude 1 (csrc tri())."""
    p = jnp.mod(p, 4.0)
    return jnp.where(p < 1.0, p, jnp.where(p < 3.0, 2.0 - p, p - 4.0))


# ---------------------------------------------------------------------------
# Assault (csrc/envs/assault.cc)
# ---------------------------------------------------------------------------

_AS_DRONES = 6
_AS_BANDS = 3
_AS_BAND_Y = np.array([18.0, 28.0, 38.0], np.float32)
_AS_DRONE_W, _AS_DRONE_H = 6.0, 4.0
_AS_GROUND_Y = 72.0
_AS_PLAYER_Y, _AS_PLAYER_W, _AS_PLAYER_H = 76.0, 6.0, 4.0
_AS_MOTHER_Y, _AS_MOTHER_W, _AS_MOTHER_H = 4.0, 12.0, 5.0
_AS_BOMBS = 4


@flax.struct.dataclass
class AssaultCore:
    px: jax.Array
    mx: jax.Array
    mdir: jax.Array
    live: jax.Array       # [6] bool
    charging: jax.Array   # [6] bool
    band: jax.Array       # [6] i32
    dx: jax.Array         # [6] f32
    ddir: jax.Array
    patrol: jax.Array     # [6] i32
    bomb_live: jax.Array  # [4] bool
    bx: jax.Array
    by: jax.Array
    vshot: jax.Array      # bool
    vx: jax.Array
    vy: jax.Array
    hshot: jax.Array
    hx: jax.Array
    hdir: jax.Array
    spawn_timer: jax.Array
    kills: jax.Array
    lives: jax.Array
    invuln: jax.Array
    score: jax.Array
    over: jax.Array


def _as_reset(key):
    del key  # deterministic layout (assault.cc reset_game)
    z6 = jnp.zeros((_AS_DRONES,), jnp.float32)
    return AssaultCore(
        px=jnp.float32(39.0), mx=jnp.float32(36.0), mdir=jnp.float32(1.0),
        live=jnp.zeros((_AS_DRONES,), bool), charging=jnp.zeros((_AS_DRONES,), bool),
        band=jnp.zeros((_AS_DRONES,), jnp.int32), dx=z6, ddir=z6,
        patrol=jnp.zeros((_AS_DRONES,), jnp.int32),
        bomb_live=jnp.zeros((_AS_BOMBS,), bool),
        bx=jnp.zeros((_AS_BOMBS,), jnp.float32), by=jnp.zeros((_AS_BOMBS,), jnp.float32),
        vshot=jnp.bool_(False), vx=jnp.float32(0), vy=jnp.float32(0),
        hshot=jnp.bool_(False), hx=jnp.float32(0), hdir=jnp.float32(1.0),
        spawn_timer=jnp.int32(30), kills=jnp.int32(0), lives=jnp.int32(3),
        invuln=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _as_act(s: AssaultCore, dx, dy, fire, key):
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_spawn_band, k_spawn_dir, k_spawn_pat, k_bomb = jax.random.split(key, 4)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * 1.5, 2.0, 84.0 - 2.0 - _AS_PLAYER_W)
    want_vfire = ((fire > 0) & (dx == 0)) | (dy < 0)
    want_hfire = (fire > 0) & (dx != 0)

    spawn_v = want_vfire & ~s.vshot
    vshot = s.vshot | spawn_v
    vx = jnp.where(spawn_v, px + _AS_PLAYER_W / 2.0, s.vx)
    vy = jnp.where(spawn_v, _AS_PLAYER_Y - 2.0, s.vy)
    spawn_h = want_hfire & ~s.hshot
    hshot = s.hshot | spawn_h
    hdir = jnp.where(spawn_h, jnp.where(dx > 0, 1.0, -1.0), s.hdir)
    hx = jnp.where(spawn_h, jnp.where(dx > 0, px + _AS_PLAYER_W, px - 1.0), s.hx)

    vy = jnp.where(vshot, vy - 2.5, vy)
    vshot = vshot & (vy >= 2.0)
    hx = jnp.where(hshot, hx + hdir * 2.5, hx)
    hshot = hshot & (hx >= 0.0) & (hx <= 84.0)

    mx = s.mx + s.mdir * 0.4
    mdir = jnp.where((mx < 6.0) | (mx > 84.0 - 6.0 - _AS_MOTHER_W), -s.mdir, s.mdir)

    # Drone deployment from the mothership (first free slot).
    spawn_timer = s.spawn_timer - 1
    interval = jnp.maximum(90 - 4 * (s.kills // 5), 36)
    do_spawn = spawn_timer <= 0
    spawn_timer = jnp.where(do_spawn, interval, spawn_timer)
    free = ~s.live
    slot = jnp.argmax(free)
    place = do_spawn & jnp.any(free)
    live = s.live.at[slot].set(s.live[slot] | place)
    charging = s.charging.at[slot].set(jnp.where(place, False, s.charging[slot]))
    band = s.band.at[slot].set(jnp.where(place, jax.random.randint(k_spawn_band, (), 0, _AS_BANDS), s.band[slot]))
    dxa = s.dx.at[slot].set(jnp.where(place, mx + _AS_MOTHER_W / 2.0, s.dx[slot]))
    ddir = s.ddir.at[slot].set(jnp.where(
        place, jnp.where(jax.random.uniform(k_spawn_dir) < 0.5, 1.0, -1.0), s.ddir[slot]))
    patrol = s.patrol.at[slot].set(jnp.where(
        place, 120 + jax.random.randint(k_spawn_pat, (), 0, 180), s.patrol[slot]))

    # Drones: patrol / descend to charge; formation drones may drop a bomb.
    speed = 0.5 + 0.15 * (s.kills // 10).astype(jnp.float32)
    bomb_live, bxx, byy = s.bomb_live, s.bx, s.by
    for i in range(_AS_DRONES):
        alive, was_charging = live[i], charging[i]
        patrolling = alive & ~was_charging
        xi = jnp.where(patrolling, dxa[i] + ddir[i] * speed, dxa[i])
        flip = patrolling & ((xi < 2.0) | (xi > 84.0 - 2.0 - _AS_DRONE_W))
        ddir = ddir.at[i].set(jnp.where(flip, -ddir[i], ddir[i]))
        pat = jnp.where(patrolling, patrol[i] - 1, patrol[i])
        patrol = patrol.at[i].set(pat)
        charging = charging.at[i].set(was_charging | (patrolling & (pat <= 0)))
        # Bomb drop from the patrol band (first free bomb slot).
        drop = patrolling & (jax.random.uniform(jax.random.fold_in(k_bomb, i)) < 0.008)
        bslot = jnp.argmax(~bomb_live)
        drop = drop & jnp.any(~bomb_live)
        bxx = bxx.at[bslot].set(jnp.where(drop, xi + _AS_DRONE_W / 2.0, bxx[bslot]))
        byy = byy.at[bslot].set(jnp.where(drop, jnp.asarray(_AS_BAND_Y)[band[i]] + _AS_DRONE_H, byy[bslot]))
        bomb_live = bomb_live.at[bslot].set(bomb_live[bslot] | drop)
        # Ground charge toward the player.
        want = px + _AS_PLAYER_W / 2.0 - _AS_DRONE_W / 2.0
        xi = jnp.where(alive & was_charging,
                       xi + jnp.where(xi < want, 0.8, -0.8), xi)
        dxa = dxa.at[i].set(xi)

    byy = jnp.where(bomb_live, byy + 1.2, byy)
    bomb_live = bomb_live & (byy <= 84.0)

    # Vertical shot vs banded drones (first hit only, like the C++ break).
    band_y = jnp.asarray(_AS_BAND_Y)[band]
    vhit = (vshot & live & ~charging
            & (vx + 1.0 > dxa) & (vx < dxa + _AS_DRONE_W)
            & (vy + 2.0 > band_y) & (vy < band_y + _AS_DRONE_H))
    any_vhit = jnp.any(vhit)
    first_v = jnp.argmax(vhit)
    live = live.at[first_v].set(live[first_v] & ~any_vhit)
    vshot = vshot & ~any_vhit
    reward = reward + jnp.where(any_vhit, 21.0, 0.0)
    # Horizontal shot vs chargers.
    hhit = hshot & live & charging & (hx + 2.0 > dxa) & (hx < dxa + _AS_DRONE_W)
    any_hhit = jnp.any(hhit)
    first_h = jnp.argmax(hhit)
    live = live.at[first_h].set(live[first_h] & ~any_hhit)
    hshot = hshot & ~any_hhit
    reward = reward + jnp.where(any_hhit, 42.0, 0.0)
    kills = s.kills + any_vhit.astype(jnp.int32) + any_hhit.astype(jnp.int32)

    # Player hits.
    vulnerable = s.invuln <= 0
    bomb_hit = (bomb_live & (bxx + 1.0 > px) & (bxx < px + _AS_PLAYER_W)
                & (byy + 2.0 > _AS_PLAYER_Y) & (byy < _AS_PLAYER_Y + _AS_PLAYER_H))
    charger_hit = live & charging & (dxa + _AS_DRONE_W > px) & (dxa < px + _AS_PLAYER_W)
    hit = vulnerable & (jnp.any(bomb_hit) | jnp.any(charger_hit))
    bomb_live = jnp.where(vulnerable, bomb_live & ~bomb_hit, bomb_live)
    live = jnp.where(vulnerable & hit, live & ~charger_hit, live)
    lives = s.lives - hit.astype(jnp.int32)
    invuln = jnp.where(hit, 60, jnp.maximum(s.invuln - 1, 0))
    bomb_live = jnp.where(hit, jnp.zeros_like(bomb_live), bomb_live)
    over = s.over | (lives <= 0)

    out = AssaultCore(
        px=px, mx=mx, mdir=mdir, live=live, charging=charging, band=band,
        dx=dxa, ddir=ddir, patrol=patrol, bomb_live=bomb_live, bx=bxx, by=byy,
        vshot=vshot, vx=vx, vy=vy, hshot=hshot, hx=hx, hdir=hdir,
        spawn_timer=spawn_timer, kills=kills, lives=lives, invuln=invuln,
        score=s.score + reward.astype(jnp.int32), over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _as_render(s: AssaultCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    f = jnp.where(y == 81, jnp.uint8(60), f)
    f = jnp.where(_rect_mask(y, x, s.mx, _AS_MOTHER_Y, _AS_MOTHER_W, _AS_MOTHER_H),
                  jnp.uint8(160), f)
    for i in range(_AS_DRONES):
        m_band = (s.live[i] & ~s.charging[i]
                  & _rect_mask(y, x, s.dx[i], jnp.asarray(_AS_BAND_Y)[s.band[i]],
                               _AS_DRONE_W, _AS_DRONE_H))
        f = jnp.where(m_band, (140 + 20 * s.band[i]).astype(jnp.uint8), f)
        m_chg = (s.live[i] & s.charging[i]
                 & _rect_mask(y, x, s.dx[i], _AS_GROUND_Y, _AS_DRONE_W, _AS_DRONE_H))
        f = jnp.where(m_chg, jnp.uint8(200), f)
    for b in range(_AS_BOMBS):
        f = jnp.where(s.bomb_live[b] & _rect_mask(y, x, s.bx[b], s.by[b], 1, 2),
                      jnp.uint8(100), f)
    f = jnp.where(s.vshot & _rect_mask(y, x, s.vx, s.vy, 1, 2), jnp.uint8(224), f)
    f = jnp.where(s.hshot & _rect_mask(y, x, s.hx, _AS_GROUND_Y + 1.0, 2, 1), jnp.uint8(224), f)
    visible = (s.invuln == 0) | ((s.invuln // 4) % 2 == 0)
    f = jnp.where(visible & _rect_mask(y, x, s.px, _AS_PLAYER_Y, _AS_PLAYER_W, _AS_PLAYER_H),
                  jnp.uint8(210), f)
    pip = (y == 83) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < s.lives)
    f = jnp.where(pip, jnp.uint8(180), f)
    return f


ASSAULT = dict(
    reset=_as_reset, act=_as_act, render=_as_render,
    lives=lambda s: s.lives, over=lambda s: s.over,
    minimal_actions=7,
    minimal_to_full=np.array([0, 1, 2, 3, 4, 11, 12], np.int32),
)


# ---------------------------------------------------------------------------
# Phoenix (csrc/envs/phoenix.cc)
# ---------------------------------------------------------------------------

_PH_BIRDS = 8
_PH_COLS = 4
_PH_ROW_Y = np.array([16.0, 26.0], np.float32)
_PH_BIRD_W, _PH_BIRD_H = 5.0, 3.0
_PH_PLAYER_Y, _PH_PLAYER_W, _PH_PLAYER_H = 76.0, 5.0, 3.0
_PH_BOMBS = 3
_PH_SHIELD_FRAMES = 40
_PH_SHIELD_CD = 120


@flax.struct.dataclass
class PhoenixCore:
    px: jax.Array
    phase: jax.Array
    wave: jax.Array
    dive_prob: jax.Array
    live: jax.Array     # [8] bool
    diving: jax.Array   # [8] bool
    dive_x: jax.Array
    dive_y: jax.Array
    bomb_live: jax.Array  # [3]
    bx: jax.Array
    by: jax.Array
    shot: jax.Array
    sx: jax.Array
    sy: jax.Array
    shield: jax.Array
    shield_cd: jax.Array
    lives: jax.Array
    invuln: jax.Array
    score: jax.Array
    over: jax.Array


def _ph_reset(key):
    del key
    return PhoenixCore(
        px=jnp.float32(39.5), phase=jnp.float32(0.0), wave=jnp.int32(0),
        dive_prob=jnp.float32(0.004),
        live=jnp.ones((_PH_BIRDS,), bool), diving=jnp.zeros((_PH_BIRDS,), bool),
        dive_x=jnp.zeros((_PH_BIRDS,), jnp.float32),
        dive_y=jnp.zeros((_PH_BIRDS,), jnp.float32),
        bomb_live=jnp.zeros((_PH_BOMBS,), bool),
        bx=jnp.zeros((_PH_BOMBS,), jnp.float32), by=jnp.zeros((_PH_BOMBS,), jnp.float32),
        shot=jnp.bool_(False), sx=jnp.float32(0), sy=jnp.float32(0),
        shield=jnp.int32(0), shield_cd=jnp.int32(0), lives=jnp.int32(3),
        invuln=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _ph_bird_x(phase, i):
    base = 10.0 + 16.0 * float(i % _PH_COLS)
    return jnp.float32(base) + jnp.float32(6.0) * _tri(phase + jnp.float32(0.7) * float(i))


def _ph_act(s: PhoenixCore, dx, dy, fire, key):
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_dive, k_bomb = jax.random.split(key)

    shield = jnp.maximum(s.shield - 1, 0)
    shield_cd = jnp.maximum(s.shield_cd - 1, 0)
    raise_shield = (dy > 0) & (shield == 0) & (shield_cd == 0)
    shield = jnp.where(raise_shield, _PH_SHIELD_FRAMES, shield)
    shield_cd = jnp.where(raise_shield, _PH_SHIELD_CD + _PH_SHIELD_FRAMES, shield_cd)
    can_move = shield == 0
    px = jnp.where(
        can_move,
        jnp.clip(s.px + dx.astype(jnp.float32) * 1.5, 2.0, 84.0 - 2.0 - _PH_PLAYER_W),
        s.px,
    )
    spawn_shot = (fire > 0) & ~s.shot
    shot = s.shot | spawn_shot
    sx = jnp.where(spawn_shot, px + _PH_PLAYER_W / 2.0, s.sx)
    sy = jnp.where(spawn_shot, _PH_PLAYER_Y - 2.0, s.sy)
    sy = jnp.where(shot, sy - 2.5, sy)
    shot = shot & (sy >= 2.0)

    phase = s.phase + 0.05 + 0.01 * s.wave.astype(jnp.float32)
    live, diving = s.live, s.diving
    dive_x, dive_y = s.dive_x, s.dive_y
    bomb_live, bxx, byy = s.bomb_live, s.bx, s.by
    for i in range(_PH_BIRDS):
        k_d = jax.random.fold_in(k_dive, i)
        k_b = jax.random.fold_in(k_bomb, i)
        formation = live[i] & ~diving[i]
        start_dive = formation & (jax.random.uniform(k_d) < s.dive_prob)
        bx_i = _ph_bird_x(phase, i)
        dive_x = dive_x.at[i].set(jnp.where(start_dive, bx_i, dive_x[i]))
        dive_y = dive_y.at[i].set(jnp.where(start_dive, _PH_ROW_Y[i // _PH_COLS], dive_y[i]))
        drop = formation & ~start_dive & (jax.random.uniform(k_b) < 0.003)
        bslot = jnp.argmax(~bomb_live)
        drop = drop & jnp.any(~bomb_live)
        bxx = bxx.at[bslot].set(jnp.where(drop, bx_i + _PH_BIRD_W / 2.0, bxx[bslot]))
        byy = byy.at[bslot].set(jnp.where(drop, _PH_ROW_Y[i // _PH_COLS] + _PH_BIRD_H, byy[bslot]))
        bomb_live = bomb_live.at[bslot].set(bomb_live[bslot] | drop)
        # Dive flight (homing); past the bottom the bird rejoins the flock.
        was_diving = live[i] & diving[i]
        ny = jnp.where(was_diving, dive_y[i] + 1.0, dive_y[i])
        nx = jnp.where(was_diving, dive_x[i] + jnp.where(dive_x[i] < px, 0.5, -0.5), dive_x[i])
        rejoin = was_diving & (ny > 82.0)
        diving = diving.at[i].set((was_diving | start_dive) & ~rejoin)
        dive_x = dive_x.at[i].set(nx)
        dive_y = dive_y.at[i].set(ny)

    byy = jnp.where(bomb_live, byy + 1.1, byy)
    bomb_live = bomb_live & (byy <= 84.0)

    # Shot vs birds (first hit only).
    ex = jnp.where(diving, dive_x, jnp.stack([_ph_bird_x(phase, i) for i in range(_PH_BIRDS)]))
    ey = jnp.where(diving, dive_y, jnp.repeat(jnp.asarray(_PH_ROW_Y), _PH_COLS))
    hit = (shot & live & (sx + 1.0 > ex) & (sx < ex + _PH_BIRD_W)
           & (sy + 2.0 > ey) & (sy < ey + _PH_BIRD_H))
    any_hit = jnp.any(hit)
    first = jnp.argmax(hit)
    reward = reward + jnp.where(any_hit, jnp.where(diving[first], 50.0, 20.0), 0.0)
    live = live.at[first].set(live[first] & ~any_hit)
    shot = shot & ~any_hit

    # Player hit by a bomb or a diver (shield blocks both).
    vulnerable = (s.invuln <= 0) & (shield == 0)
    bomb_hit = (bomb_live & (bxx + 1.0 > px) & (bxx < px + _PH_PLAYER_W)
                & (byy + 2.0 > _PH_PLAYER_Y) & (byy < _PH_PLAYER_Y + _PH_PLAYER_H))
    diver_hit = (live & diving & (dive_x + _PH_BIRD_W > px) & (dive_x < px + _PH_PLAYER_W)
                 & (dive_y + _PH_BIRD_H > _PH_PLAYER_Y) & (dive_y < _PH_PLAYER_Y + _PH_PLAYER_H))
    was_hit = vulnerable & (jnp.any(bomb_hit) | jnp.any(diver_hit))
    bomb_live = jnp.where(vulnerable, bomb_live & ~bomb_hit, bomb_live)
    live = jnp.where(vulnerable & was_hit, live & ~diver_hit, live)
    lives = s.lives - was_hit.astype(jnp.int32)
    invuln = jnp.where(was_hit, 60, jnp.maximum(s.invuln - 1, 0))
    bomb_live = jnp.where(was_hit, jnp.zeros_like(bomb_live), bomb_live)
    over = s.over | (lives <= 0)

    # Wave cleared: respawn the flock, faster.
    cleared = ~jnp.any(live)
    wave = s.wave + cleared.astype(jnp.int32)
    dive_prob = jnp.where(cleared, s.dive_prob * 1.3, s.dive_prob)
    live = jnp.where(cleared, jnp.ones_like(live), live)
    diving = jnp.where(cleared, jnp.zeros_like(diving), diving)

    out = PhoenixCore(
        px=px, phase=phase, wave=wave, dive_prob=dive_prob, live=live,
        diving=diving, dive_x=dive_x, dive_y=dive_y, bomb_live=bomb_live,
        bx=bxx, by=byy, shot=shot, sx=sx, sy=sy, shield=shield,
        shield_cd=shield_cd, lives=lives, invuln=invuln,
        score=s.score + reward.astype(jnp.int32), over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _ph_render(s: PhoenixCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    for i in range(_PH_BIRDS):
        ex = jnp.where(s.diving[i], s.dive_x[i], _ph_bird_x(s.phase, i))
        ey = jnp.where(s.diving[i], s.dive_y[i], _PH_ROW_Y[i // _PH_COLS])
        m = s.live[i] & _rect_mask(y, x, ex, ey, _PH_BIRD_W, _PH_BIRD_H)
        f = jnp.where(m, jnp.where(s.diving[i], jnp.uint8(220), jnp.uint8(150)), f)
    for b in range(_PH_BOMBS):
        f = jnp.where(s.bomb_live[b] & _rect_mask(y, x, s.bx[b], s.by[b], 1, 2),
                      jnp.uint8(100), f)
    f = jnp.where(s.shot & _rect_mask(y, x, s.sx, s.sy, 1, 2), jnp.uint8(224), f)
    visible = (s.invuln == 0) | ((s.invuln // 4) % 2 == 0)
    f = jnp.where(visible & _rect_mask(y, x, s.px, _PH_PLAYER_Y, _PH_PLAYER_W, _PH_PLAYER_H),
                  jnp.uint8(210), f)
    f = jnp.where((s.shield > 0) & _rect_mask(y, x, s.px - 1.0, _PH_PLAYER_Y - 3.0,
                                              _PH_PLAYER_W + 2.0, 2), jnp.uint8(120), f)
    pip = (y == 83) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < s.lives)
    f = jnp.where(pip, jnp.uint8(180), f)
    return f


PHOENIX = dict(
    reset=_ph_reset, act=_ph_act, render=_ph_render,
    lives=lambda s: s.lives, over=lambda s: s.over,
    minimal_actions=8,
    minimal_to_full=np.array([0, 1, 3, 4, 5, 11, 12, 13], np.int32),
)


# ---------------------------------------------------------------------------
# Gopher (csrc/envs/gopher.cc)
# ---------------------------------------------------------------------------

_GO_CARROTS = 3
_GO_CARROT_X = np.array([26.0, 41.0, 56.0], np.float32)
_GO_CARROT_W = 4.0
_GO_GROUND_Y = 60.0
_GO_GOPHER_Y = 70.0
_GO_FARMER_Y, _GO_FARMER_W, _GO_FARMER_H = 52.0, 5.0, 8.0
_GO_DIG_FRAMES = 40
_GO_REACH = 5.0


@flax.struct.dataclass
class GopherCore:
    fx: jax.Array
    gx: jax.Array
    carrot: jax.Array  # [3] bool
    dig: jax.Array     # [3] i32
    target: jax.Array  # i32
    stun: jax.Array
    whack_cd: jax.Array
    score: jax.Array
    over: jax.Array


def _go_reset(key):
    del key
    return GopherCore(
        fx=jnp.float32(39.0), gx=jnp.float32(4.0),
        carrot=jnp.ones((_GO_CARROTS,), bool),
        dig=jnp.zeros((_GO_CARROTS,), jnp.int32),
        target=jnp.int32(1), stun=jnp.int32(0), whack_cd=jnp.int32(0),
        score=jnp.int32(0), over=jnp.bool_(False),
    )


def _go_retarget(carrot, target, key):
    """Random still-standing carrot; fall back to the current target."""
    u = jax.random.uniform(key, (_GO_CARROTS,))
    u = jnp.where(carrot, u, -1.0)
    pick = jnp.argmax(u)
    return jnp.where(jnp.any(carrot), pick, target).astype(jnp.int32)


def _go_act(s: GopherCore, dx, dy, fire, key):
    del dy
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_eat, k_bonk = jax.random.split(key)

    fx = jnp.clip(s.fx + dx.astype(jnp.float32) * 1.2, 2.0, 84.0 - 2.0 - _GO_FARMER_W)
    whack_cd = jnp.maximum(s.whack_cd - 1, 0)
    whack = (fire > 0) & (whack_cd == 0)
    whack_cd = jnp.where(whack, 10, whack_cd)

    fcx = fx + _GO_FARMER_W / 2.0
    tx = jnp.asarray(_GO_CARROT_X)[s.target] + _GO_CARROT_W / 2.0

    stunned = s.stun > 0
    stun = jnp.maximum(s.stun - 1, 0)
    traveling = ~stunned & ((s.gx + 2.0 < tx) | (s.gx - 2.0 > tx))
    gx = jnp.where(traveling, s.gx + jnp.where(s.gx < tx, 0.7, -0.7), s.gx)
    at_column = ~stunned & ~traveling
    digging = at_column & (s.dig[s.target] < _GO_DIG_FRAMES)
    dig = s.dig.at[s.target].set(s.dig[s.target] + digging.astype(jnp.int32))
    breach = at_column & ~digging
    carrot = s.carrot.at[s.target].set(s.carrot[s.target] & ~breach)
    dig = dig.at[s.target].set(jnp.where(breach, 0, dig[s.target]))
    target = jnp.where(breach, _go_retarget(carrot, s.target, k_eat), s.target)

    # Whack resolution (uses the post-move gopher/dig state, like the C++).
    near_gopher = ~stunned & (gx + 2.0 >= fcx - _GO_REACH) & (gx - 2.0 <= fcx + _GO_REACH)
    gopher_shallow = (dig[target] > _GO_DIG_FRAMES // 2) \
        & (jnp.asarray(_GO_CARROT_X)[target] + _GO_CARROT_W / 2.0 >= fcx - _GO_REACH) \
        & (jnp.asarray(_GO_CARROT_X)[target] + _GO_CARROT_W / 2.0 <= fcx + _GO_REACH)
    bonk = whack & near_gopher & gopher_shallow
    reward = reward + jnp.where(bonk, 80.0, 0.0)
    stun = jnp.where(bonk, 90, stun)
    gx = jnp.where(bonk, 4.0, gx)
    dig = dig.at[target].set(jnp.where(bonk, dig[target] // 2, dig[target]))
    target = jnp.where(bonk, _go_retarget(carrot, target, k_bonk), target)
    # Fill: first dug column under the farmer (+20 a block).
    ccx = jnp.asarray(_GO_CARROT_X) + _GO_CARROT_W / 2.0
    fillable = (dig > 0) & (ccx >= fcx - _GO_REACH) & (ccx <= fcx + _GO_REACH)
    do_fill = whack & ~bonk & jnp.any(fillable)
    fslot = jnp.argmax(fillable)
    dig = dig.at[fslot].set(jnp.where(do_fill, jnp.maximum(dig[fslot] - 8, 0), dig[fslot]))
    reward = reward + jnp.where(do_fill, 20.0, 0.0)

    over = s.over | ~jnp.any(carrot)
    out = GopherCore(fx=fx, gx=gx, carrot=carrot, dig=dig, target=target,
                     stun=stun, whack_cd=whack_cd,
                     score=s.score + reward.astype(jnp.int32), over=over)
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _go_render(s: GopherCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    f = jnp.where(y == int(_GO_GROUND_Y), jnp.uint8(90), f)
    dirt = (y >= int(_GO_GROUND_Y) + 4) & ((y - (int(_GO_GROUND_Y) + 4)) % 6 == 0) & (x % 4 == 0)
    f = jnp.where(dirt, jnp.uint8(40), f)
    for c in range(_GO_CARROTS):
        m = s.carrot[c] & _rect_mask(y, x, float(_GO_CARROT_X[c]), _GO_GROUND_Y - 6.0,
                                     _GO_CARROT_W, 6)
        f = jnp.where(m, jnp.uint8(170), f)
        h = s.dig[c].astype(jnp.float32) / _GO_DIG_FRAMES * (_GO_GOPHER_Y - _GO_GROUND_Y - 1.0)
        m = (s.dig[c] > 0) & _rect_mask(y, x, float(_GO_CARROT_X[c]), _GO_GOPHER_Y - h,
                                        _GO_CARROT_W, h)
        f = jnp.where(m, jnp.uint8(120), f)
    f = jnp.where((s.stun == 0) & _rect_mask(y, x, s.gx - 2.0, _GO_GOPHER_Y, 5, 3),
                  jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.fx, _GO_FARMER_Y, _GO_FARMER_W, _GO_FARMER_H),
                  jnp.uint8(210), f)
    f = jnp.where((s.whack_cd > 6) & _rect_mask(y, x, s.fx - 1.0, _GO_FARMER_Y + 6.0,
                                                _GO_FARMER_W + 2.0, 2), jnp.uint8(255), f)
    return f


GOPHER = dict(
    reset=_go_reset, act=_go_act, render=_go_render,
    lives=lambda s: jnp.int32(1), over=lambda s: s.over,
    minimal_actions=8,
    minimal_to_full=np.array([0, 1, 2, 3, 4, 10, 11, 12], np.int32),
)


# ---------------------------------------------------------------------------
# Name This Game (csrc/envs/name_this_game.cc)
# ---------------------------------------------------------------------------

_NT_TENTACLES = 6
_NT_TENT_X = np.array([18.0, 28.0, 38.0, 48.0, 58.0, 68.0], np.float32)
_NT_TENT_W = 2.0
_NT_TENT_TOP = 18.0
_NT_PLAYER_Y, _NT_PLAYER_W, _NT_PLAYER_H = 70.0, 5.0, 4.0
_NT_SHARK_Y, _NT_SHARK_W, _NT_SHARK_H = 56.0, 8.0, 3.0
_NT_OXY_MAX = 600.0
_NT_HOSE_CYCLE = 400
_NT_HOSE_DOWN = 200


@flax.struct.dataclass
class NameThisGameCore:
    px: jax.Array
    tlen: jax.Array       # [6] f32
    shark_x: jax.Array
    shark_dir: jax.Array
    shark_speed: jax.Array
    shark_dead: jax.Array
    shot: jax.Array
    sx: jax.Array
    sy: jax.Array
    oxy: jax.Array
    boat_x: jax.Array
    boat_dir: jax.Array
    hose_timer: jax.Array
    lives: jax.Array
    invuln: jax.Array
    score: jax.Array
    over: jax.Array


def _nt_reset(key):
    del key
    return NameThisGameCore(
        px=jnp.float32(39.0), tlen=jnp.full((_NT_TENTACLES,), 6.0, jnp.float32),
        shark_x=jnp.float32(2.0), shark_dir=jnp.float32(1.0),
        shark_speed=jnp.float32(0.8), shark_dead=jnp.int32(0),
        shot=jnp.bool_(False), sx=jnp.float32(0), sy=jnp.float32(0),
        oxy=jnp.float32(_NT_OXY_MAX), boat_x=jnp.float32(30.0),
        boat_dir=jnp.float32(1.0), hose_timer=jnp.int32(0), lives=jnp.int32(3),
        invuln=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _nt_act(s: NameThisGameCore, dx, dy, fire, key):
    del dy
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_grow = key

    px = jnp.clip(s.px + dx.astype(jnp.float32) * 1.5, 2.0, 84.0 - 2.0 - _NT_PLAYER_W)
    spawn_shot = (fire > 0) & ~s.shot
    shot = s.shot | spawn_shot
    sx = jnp.where(spawn_shot, px + _NT_PLAYER_W / 2.0, s.sx)
    sy = jnp.where(spawn_shot, _NT_PLAYER_Y - 2.0, s.sy)
    sy = jnp.where(shot, sy - 2.5, sy)
    shot = shot & (sy >= _NT_TENT_TOP - 4.0)

    grow = jax.random.randint(k_grow, (), 0, _NT_TENTACLES)
    tlen = s.tlen.at[grow].add(0.6)

    # Shark patrol / respawn countdown.
    respawning = s.shark_dead > 0
    shark_dead = jnp.maximum(s.shark_dead - 1, 0)
    respawn_now = respawning & (shark_dead == 0)
    shark_x = jnp.where(
        respawn_now,
        jnp.where(s.shark_dir > 0, 2.0, 84.0 - 2.0 - _NT_SHARK_W),
        jnp.where(respawning, s.shark_x, s.shark_x + s.shark_dir * s.shark_speed),
    )
    shark_dir = jnp.where(
        ~respawning & ((shark_x < 2.0) | (shark_x > 84.0 - 2.0 - _NT_SHARK_W)),
        -s.shark_dir, s.shark_dir)

    boat_x = s.boat_x + s.boat_dir * 0.5
    boat_dir = jnp.where((boat_x < 6.0) | (boat_x > 84.0 - 6.0 - 8.0), -s.boat_dir, s.boat_dir)
    hose_timer = (s.hose_timer + 1) % _NT_HOSE_CYCLE
    hose_down = hose_timer >= _NT_HOSE_CYCLE - _NT_HOSE_DOWN

    oxy = s.oxy - 1.0
    hose_x = boat_x + 4.0
    under_hose = hose_down & (px + _NT_PLAYER_W / 2.0 > hose_x - 4.0) \
        & (px + _NT_PLAYER_W / 2.0 < hose_x + 4.0)
    oxy = jnp.where(under_hose, jnp.minimum(oxy + 6.0, _NT_OXY_MAX), oxy)

    # Shot: shark first, then tentacle tips (first hit).
    shark_hit = (shot & ~respawning & (sx + 1.0 > shark_x) & (sx < shark_x + _NT_SHARK_W)
                 & (sy + 2.0 > _NT_SHARK_Y) & (sy < _NT_SHARK_Y + _NT_SHARK_H))
    shot = shot & ~shark_hit
    shark_dead = jnp.where(shark_hit, 60, shark_dead)
    shark_speed = jnp.where(shark_hit, s.shark_speed + 0.1, s.shark_speed)
    reward = reward + jnp.where(shark_hit, 150.0, 0.0)
    tip = _NT_TENT_TOP + tlen
    tent_hit = (shot & (sx + 1.0 > jnp.asarray(_NT_TENT_X))
                & (sx < jnp.asarray(_NT_TENT_X) + _NT_TENT_W)
                & (sy < tip) & (sy + 2.0 > tip - 6.0))
    any_tent = jnp.any(tent_hit)
    first = jnp.argmax(tent_hit)
    tlen = tlen.at[first].set(jnp.where(any_tent, jnp.maximum(tlen[first] - 8.0, 0.0), tlen[first]))
    shot = shot & ~any_tent
    reward = reward + jnp.where(any_tent, 10.0, 0.0)

    # Deaths.
    vulnerable = s.invuln <= 0
    shark_contact = (~respawning & ~shark_hit & (shark_x + _NT_SHARK_W > px)
                     & (shark_x < px + _NT_PLAYER_W)
                     & (_NT_SHARK_Y + _NT_SHARK_H > _NT_PLAYER_Y - 2.0))
    tent_contact = jnp.any(
        (_NT_TENT_TOP + tlen >= _NT_PLAYER_Y)
        & (jnp.asarray(_NT_TENT_X) + _NT_TENT_W > px)
        & (jnp.asarray(_NT_TENT_X) < px + _NT_PLAYER_W))
    dead = vulnerable & ((oxy <= 0.0) | shark_contact | tent_contact)
    lives = s.lives - dead.astype(jnp.int32)
    invuln = jnp.where(dead, 60, jnp.maximum(s.invuln - 1, 0))
    oxy = jnp.where(dead, _NT_OXY_MAX, oxy)
    tlen = jnp.where(dead, jnp.full_like(tlen, 6.0), tlen)
    over = s.over | (lives <= 0)

    out = NameThisGameCore(
        px=px, tlen=tlen, shark_x=shark_x, shark_dir=shark_dir,
        shark_speed=shark_speed, shark_dead=shark_dead, shot=shot, sx=sx, sy=sy,
        oxy=oxy, boat_x=boat_x, boat_dir=boat_dir, hose_timer=hose_timer,
        lives=lives, invuln=invuln, score=s.score + reward.astype(jnp.int32),
        over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _nt_render(s: NameThisGameCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 200, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    f = jnp.where(y == 5, jnp.uint8(70), f)
    f = jnp.where(_rect_mask(y, x, s.boat_x, 2.0, 8, 3), jnp.uint8(180), f)
    hose_down = s.hose_timer >= _NT_HOSE_CYCLE - _NT_HOSE_DOWN
    f = jnp.where(hose_down & _rect_mask(y, x, s.boat_x + 4.0, 5.0, 1, _NT_PLAYER_Y - 5.0),
                  jnp.uint8(130), f)
    f = jnp.where(_rect_mask(y, x, 30.0, 8.0, 24, 10), jnp.uint8(160), f)
    for t in range(_NT_TENTACLES):
        f = jnp.where(_rect_mask(y, x, float(_NT_TENT_X[t]), _NT_TENT_TOP,
                                 _NT_TENT_W, s.tlen[t]), jnp.uint8(140), f)
    f = jnp.where((s.shark_dead == 0) & _rect_mask(y, x, s.shark_x, _NT_SHARK_Y,
                                                   _NT_SHARK_W, _NT_SHARK_H), jnp.uint8(190), f)
    f = jnp.where(s.shot & _rect_mask(y, x, s.sx, s.sy, 1, 2), jnp.uint8(224), f)
    visible = (s.invuln == 0) | ((s.invuln // 4) % 2 == 0)
    f = jnp.where(visible & _rect_mask(y, x, s.px, _NT_PLAYER_Y, _NT_PLAYER_W, _NT_PLAYER_H),
                  jnp.uint8(210), f)
    f = jnp.where(_rect_mask(y, x, 2.0, 82.0, s.oxy / _NT_OXY_MAX * 80.0, 1), jnp.uint8(150), f)
    pip = (y == 80) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < s.lives)
    f = jnp.where(pip, jnp.uint8(180), f)
    return f


NAME_THIS_GAME = dict(
    reset=_nt_reset, act=_nt_act, render=_nt_render,
    lives=lambda s: s.lives, over=lambda s: s.over,
    minimal_actions=6,
    minimal_to_full=np.array([0, 1, 3, 4, 11, 12], np.int32),
)
