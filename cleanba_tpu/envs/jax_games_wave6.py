"""Pure-JAX twins of the sixth wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/riverraid.cc,
kung_fu_master.cc, tennis.cc, star_gunner.cc); reset frames are
pixel-identical across engines (tests/test_jax_engine.py). Each game exposes
the functional dict contract of jax_engine._BREAKOUT.

Riverraid's river course comes from a deterministic per-segment integer hash
(mirroring csrc seg_hash) rather than the live RNG stream, so both engines
agree on level geometry; entity spawns use engine-local randomness and
diverge, as for every other game.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask
from cleanba_tpu.envs.jax_games_wave5 import _tri

__all__ = ["RIVERRAID", "KUNG_FU_MASTER", "TENNIS", "STAR_GUNNER"]


# ---------------------------------------------------------------------------
# River Raid (csrc/envs/riverraid.cc)
# ---------------------------------------------------------------------------

_RR_PLAYER_Y, _RR_PLAYER_W, _RR_PLAYER_H = 70.0, 5.0, 4.0
_RR_SEG_ROWS = 40
_RR_BRIDGE_EVERY = 600
_RR_ENEMIES = 5
_RR_FUEL_MAX = 1000.0
_RR_W = np.array([7.0, 6.0, 5.0], np.float32)  # ship, heli, fuel widths


def _rr_seg_hash(seg, salt):
    """Mirror of csrc seg_hash: uint32 avalanche -> [0, 1)."""
    h = seg.astype(jnp.uint32) * jnp.uint32(2654435761) + jnp.uint32(salt) * jnp.uint32(40503)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(1274126177)
    h = h ^ (h >> 16)
    return (h >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def _rr_banks_at(dist, y):
    wr = dist + (84.0 - y)
    seg = (wr / _RR_SEG_ROWS).astype(jnp.int32)
    t = (wr - seg.astype(jnp.float32) * _RR_SEG_ROWS) / jnp.float32(_RR_SEG_ROWS)
    c0 = 30.0 + _rr_seg_hash(seg, 1) * 24.0
    c1 = 30.0 + _rr_seg_hash(seg + 1, 1) * 24.0
    h0 = 12.0 + _rr_seg_hash(seg, 2) * 16.0
    h1 = 12.0 + _rr_seg_hash(seg + 1, 2) * 16.0
    c = c0 + (c1 - c0) * t
    h = h0 + (h1 - h0) * t
    return c - h, c + h


def _rr_bridge_screen_y(dist):
    wr_player = dist + (84.0 - _RR_PLAYER_Y)
    n = (wr_player / _RR_BRIDGE_EVERY).astype(jnp.int32) + 1
    return 84.0 - (n.astype(jnp.float32) * _RR_BRIDGE_EVERY - dist)


@flax.struct.dataclass
class RiverraidCore:
    px: jax.Array
    dist: jax.Array
    fuel: jax.Array
    live: jax.Array   # [5] bool
    kind: jax.Array   # [5] i32: 0 ship, 1 heli, 2 fuel
    ex: jax.Array
    ey: jax.Array
    edir: jax.Array
    spawn_timer: jax.Array
    shot: jax.Array
    sx: jax.Array
    sy: jax.Array
    bridge_alive: jax.Array
    section: jax.Array
    lives: jax.Array
    invuln: jax.Array
    score: jax.Array
    over: jax.Array


def _rr_reset(key):
    del key
    z5 = jnp.zeros((_RR_ENEMIES,), jnp.float32)
    return RiverraidCore(
        px=jnp.float32(41.0), dist=jnp.float32(0.0), fuel=jnp.float32(_RR_FUEL_MAX),
        live=jnp.zeros((_RR_ENEMIES,), bool), kind=jnp.zeros((_RR_ENEMIES,), jnp.int32),
        ex=z5, ey=z5, edir=z5, spawn_timer=jnp.int32(50),
        shot=jnp.bool_(False), sx=jnp.float32(0), sy=jnp.float32(0),
        bridge_alive=jnp.bool_(True), section=jnp.int32(0), lives=jnp.int32(3),
        invuln=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _rr_act(s: RiverraidCore, dx, dy, fire, key):
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_int, k_kind, k_x, k_dir = jax.random.split(key, 4)

    v = jnp.where(dy < 0, 1.8, jnp.where(dy > 0, 0.6, 1.0))
    dist = s.dist + v
    px = s.px + dx.astype(jnp.float32) * 1.5
    fuel = s.fuel - 0.35

    spawn_shot = (fire > 0) & ~s.shot
    shot = s.shot | spawn_shot
    sx = jnp.where(spawn_shot, px + _RR_PLAYER_W / 2.0, s.sx)
    sy = jnp.where(spawn_shot, _RR_PLAYER_Y - 2.0, s.sy)
    sy = jnp.where(shot, sy - 3.0 * v, sy)
    shot = shot & (sy >= 2.0)

    # Entities scroll; helicopters strafe between the banks.
    ey = jnp.where(s.live, s.ey + v, s.ey)
    heli = s.live & (s.kind == 1)
    ex = jnp.where(heli, s.ex + s.edir * 0.6, s.ex)
    sl_e, sr_e = _rr_banks_at(dist, ey)
    edir = jnp.where(heli & ((ex < sl_e + 1.0) | (ex + 6.0 > sr_e - 1.0)), -s.edir, s.edir)
    live = s.live & (ey <= 84.0)

    # Spawn ahead (first free slot).
    spawn_timer = s.spawn_timer - 1
    do_spawn = spawn_timer <= 0
    spawn_timer = jnp.where(do_spawn, 45 + jax.random.randint(k_int, (), 0, 40), spawn_timer)
    free = ~live
    slot = jnp.argmax(free)
    place = do_spawn & jnp.any(free)
    kroll = jax.random.randint(k_kind, (), 0, 4)
    new_kind = jnp.where(kroll < 2, 0, jnp.where(kroll == 2, 1, 2))
    sl0, sr0 = _rr_banks_at(dist, jnp.float32(-6.0))
    w = jnp.asarray(_RR_W)[new_kind]
    span = jnp.maximum(sr0 - sl0 - w - 2.0, 0.0)
    live = live.at[slot].set(live[slot] | place)
    kind = s.kind.at[slot].set(jnp.where(place, new_kind, s.kind[slot]))
    ey = ey.at[slot].set(jnp.where(place, -6.0, ey[slot]))
    ex = ex.at[slot].set(jnp.where(place, sl0 + 1.0 + jax.random.uniform(k_x) * span, ex[slot]))
    edir = edir.at[slot].set(jnp.where(
        place, jnp.where(jax.random.uniform(k_dir) < 0.5, 1.0, -1.0), edir[slot]))

    # Section bridges.
    section = ((dist + (84.0 - _RR_PLAYER_Y)) / _RR_BRIDGE_EVERY).astype(jnp.int32)
    new_section = section != s.section
    bridge_alive = s.bridge_alive | new_section
    bridge_row = _rr_bridge_screen_y(dist)

    bridge_hit = (shot & bridge_alive & (bridge_row > -4.0) & (bridge_row < 84.0)
                  & (sy <= bridge_row + 5.0) & (sy + 2.0 >= bridge_row))
    bridge_alive = bridge_alive & ~bridge_hit
    shot = shot & ~bridge_hit
    reward = reward + jnp.where(bridge_hit, 500.0, 0.0)

    widths = jnp.asarray(_RR_W)[kind]
    ent_hit = (shot & live & (sx + 1.0 > ex) & (sx < ex + widths)
               & (sy + 2.0 > ey) & (sy < ey + 5.0))
    any_ent = jnp.any(ent_hit)
    first = jnp.argmax(ent_hit)
    live = live.at[first].set(live[first] & ~any_ent)
    shot = shot & ~any_ent
    kind_scores = jnp.asarray(np.array([30.0, 60.0, 80.0], np.float32))
    reward = reward + jnp.where(any_ent, kind_scores[kind[first]], 0.0)

    # Refuel over depots (+6 per overlapping depot, like the C++ loop).
    over_depot = (
        live & (kind == 2) & (ex + 5.0 > px) & (ex < px + _RR_PLAYER_W)
        & (ey + 8.0 > _RR_PLAYER_Y) & (ey < _RR_PLAYER_Y + _RR_PLAYER_H))
    fuel = jnp.minimum(fuel + 6.0 * jnp.sum(over_depot), _RR_FUEL_MAX)

    # Deaths.
    vulnerable = s.invuln <= 0
    slp, srp = _rr_banks_at(dist, jnp.float32(_RR_PLAYER_Y))
    bank_crash = (px < slp) | (px + _RR_PLAYER_W > srp)
    solid = live & (kind != 2)
    wsolid = jnp.asarray(_RR_W)[kind]
    contact = jnp.any(solid & (ex + wsolid > px) & (ex < px + _RR_PLAYER_W)
                      & (ey + 5.0 > _RR_PLAYER_Y) & (ey < _RR_PLAYER_Y + _RR_PLAYER_H))
    bridge_crash = bridge_alive & (bridge_row + 5.0 > _RR_PLAYER_Y) \
        & (bridge_row < _RR_PLAYER_Y + _RR_PLAYER_H)
    dead = vulnerable & ((fuel <= 0.0) | bank_crash | contact | bridge_crash)
    lives = s.lives - dead.astype(jnp.int32)
    invuln = jnp.where(dead, 60, jnp.maximum(s.invuln - 1, 0))
    fuel = jnp.where(dead, _RR_FUEL_MAX, fuel)
    px = jnp.where(dead, 41.0, px)
    dist = jnp.where(dead, dist + _RR_SEG_ROWS, dist)
    live = jnp.where(dead, jnp.zeros_like(live), live)
    over = s.over | (lives <= 0)

    out = RiverraidCore(
        px=px, dist=dist, fuel=fuel, live=live, kind=kind, ex=ex, ey=ey,
        edir=edir, spawn_timer=spawn_timer, shot=shot, sx=sx, sy=sy,
        bridge_alive=bridge_alive, section=section, lives=lives, invuln=invuln,
        score=s.score + reward.astype(jnp.int32), over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _rr_render(s: RiverraidCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 300, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    # Banks (per-row geometry; int-truncated bounds like the C++ loop).
    sl, sr = _rr_banks_at(s.dist, y.astype(jnp.float32))
    land = (x < sl.astype(jnp.int32)) | (x >= sr.astype(jnp.int32))
    f = jnp.where(land, jnp.uint8(80), f)  # land over-paints the tick row
    by = _rr_bridge_screen_y(s.dist)
    slb, srb = _rr_banks_at(s.dist, by)
    show_bridge = s.bridge_alive & (by > -5.0) & (by < 84.0)
    f = jnp.where(show_bridge & _rect_mask(y, x, slb, by, srb - slb, 5), jnp.uint8(170), f)
    for e in range(_RR_ENEMIES):
        shade = jnp.asarray(np.array([150, 190, 120], np.uint8))[s.kind[e]]
        w = jnp.asarray(_RR_W)[s.kind[e]]
        h = jnp.where(s.kind[e] == 2, 8.0, 4.0)
        f = jnp.where(s.live[e] & _rect_mask(y, x, s.ex[e], s.ey[e], w, h), shade, f)
    f = jnp.where(s.shot & _rect_mask(y, x, s.sx, s.sy, 1, 2), jnp.uint8(224), f)
    visible = (s.invuln == 0) | ((s.invuln // 4) % 2 == 0)
    f = jnp.where(visible & _rect_mask(y, x, s.px, _RR_PLAYER_Y, _RR_PLAYER_W, _RR_PLAYER_H),
                  jnp.uint8(210), f)
    f = jnp.where(_rect_mask(y, x, 2.0, 82.0, s.fuel / _RR_FUEL_MAX * 80.0, 1), jnp.uint8(150), f)
    pip = (y == 80) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < s.lives)
    f = jnp.where(pip, jnp.uint8(180), f)
    return f


RIVERRAID = dict(
    reset=_rr_reset, act=_rr_act, render=_rr_render,
    lives=lambda s: s.lives, over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Kung-Fu Master (csrc/envs/kung_fu_master.cc)
# ---------------------------------------------------------------------------

_KF_FLOOR_Y = 70.0
_KF_PLAYER_W, _KF_PLAYER_H = 5.0, 10.0
_KF_GRIPPERS = 5
_KF_KNIVES = 2
_KF_ENERGY_MAX = 100.0
_KF_JUMP_FRAMES = 20


@flax.struct.dataclass
class KungFuMasterCore:
    px: jax.Array
    facing: jax.Array
    energy: jax.Array
    glive: jax.Array  # [5] bool
    gx: jax.Array
    thrower: jax.Array
    thrower_left: jax.Array
    tx: jax.Array
    thrower_timer: jax.Array
    throw_timer: jax.Array
    klive: jax.Array  # [2] bool
    khigh: jax.Array
    kx: jax.Array
    ky: jax.Array
    kdir: jax.Array
    spawn_timer: jax.Array
    punch: jax.Array
    punch_cd: jax.Array
    punch_dir: jax.Array
    jump: jax.Array
    ducking: jax.Array
    kills: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _kf_reset(key):
    del key
    return KungFuMasterCore(
        px=jnp.float32(40.0), facing=jnp.float32(1.0),
        energy=jnp.float32(_KF_ENERGY_MAX),
        glive=jnp.zeros((_KF_GRIPPERS,), bool),
        gx=jnp.zeros((_KF_GRIPPERS,), jnp.float32),
        thrower=jnp.bool_(False), thrower_left=jnp.bool_(True), tx=jnp.float32(0),
        thrower_timer=jnp.int32(300), throw_timer=jnp.int32(0),
        klive=jnp.zeros((_KF_KNIVES,), bool), khigh=jnp.zeros((_KF_KNIVES,), bool),
        kx=jnp.zeros((_KF_KNIVES,), jnp.float32), ky=jnp.zeros((_KF_KNIVES,), jnp.float32),
        kdir=jnp.zeros((_KF_KNIVES,), jnp.float32),
        spawn_timer=jnp.int32(40), punch=jnp.int32(0), punch_cd=jnp.int32(0),
        punch_dir=jnp.float32(1.0), jump=jnp.int32(0), ducking=jnp.bool_(False),
        kills=jnp.int32(0), lives=jnp.int32(3), score=jnp.int32(0),
        over=jnp.bool_(False),
    )


def _kf_act(s: KungFuMasterCore, dx, dy, fire, key):
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_side, k_tside, k_high = jax.random.split(key, 3)

    ducking = (dy > 0) & (s.jump == 0)
    jump = jnp.maximum(s.jump - 1, 0)
    jump = jnp.where((dy < 0) & (s.jump == 0) & ~ducking, _KF_JUMP_FRAMES, jump)
    px = jnp.where(
        ~ducking,
        jnp.clip(s.px + dx.astype(jnp.float32) * 1.2, 4.0, 84.0 - 4.0 - _KF_PLAYER_W),
        s.px,
    )
    facing = jnp.where(dx != 0, jnp.where(dx > 0, 1.0, -1.0), s.facing)

    punch_cd = jnp.maximum(s.punch_cd - 1, 0)
    punch = jnp.maximum(s.punch - 1, 0)
    throw_punch = (fire > 0) & (punch_cd == 0)
    punch = jnp.where(throw_punch, 4, punch)
    punch_cd = jnp.where(throw_punch, 28, punch_cd)
    punch_dir = jnp.where(throw_punch,
                          jnp.where(dx != 0, jnp.where(dx > 0, 1.0, -1.0), facing),
                          s.punch_dir)

    # Gripper spawn (first free slot) and approach / grab.
    spawn_timer = s.spawn_timer - 1
    interval = jnp.maximum(70 - 3 * (s.kills // 4), 30)
    do_spawn = spawn_timer <= 0
    spawn_timer = jnp.where(do_spawn, interval, spawn_timer)
    free = ~s.glive
    slot = jnp.argmax(free)
    place = do_spawn & jnp.any(free)
    from_left = jax.random.uniform(k_side) < 0.5
    glive = s.glive.at[slot].set(s.glive[slot] | place)
    gx = s.gx.at[slot].set(jnp.where(place, jnp.where(from_left, 0.0, 84.0 - 4.0), s.gx[slot]))

    touching = glive & (gx + 4.0 > px) & (gx < px + _KF_PLAYER_W)
    gx = jnp.where(glive & ~touching,
                   gx + jnp.where(gx + 2.0 < px + _KF_PLAYER_W / 2.0, 1.0, -1.0) * 0.7, gx)
    energy = s.energy - jnp.sum(touching) * 1.0

    # Knife thrower.
    thrower_timer = jnp.where(s.thrower, s.thrower_timer, s.thrower_timer - 1)
    arrive = ~s.thrower & (thrower_timer <= 0)
    thrower = s.thrower | arrive
    thrower_left = jnp.where(arrive, jax.random.uniform(k_tside) < 0.5, s.thrower_left)
    tx = jnp.where(arrive, jnp.where(thrower_left, 6.0, 84.0 - 6.0 - 4.0), s.tx)
    throw_timer = jnp.where(arrive, 30, jnp.where(thrower, s.throw_timer - 1, s.throw_timer))
    throw_now = thrower & ~arrive & (throw_timer <= 0)
    throw_timer = jnp.where(throw_now, 90, throw_timer)
    kfree = ~s.klive
    kslot = jnp.argmax(kfree)
    kplace = throw_now & jnp.any(kfree)
    high = jax.random.uniform(k_high) < 0.5
    klive = s.klive.at[kslot].set(s.klive[kslot] | kplace)
    khigh = s.khigh.at[kslot].set(jnp.where(kplace, high, s.khigh[kslot]))
    kx = s.kx.at[kslot].set(jnp.where(kplace, jnp.where(thrower_left, tx + 4.0, tx - 2.0), s.kx[kslot]))
    ky = s.ky.at[kslot].set(jnp.where(
        kplace, jnp.where(high, _KF_FLOOR_Y + 1.0, _KF_FLOOR_Y + 7.0), s.ky[kslot]))
    kdir = s.kdir.at[kslot].set(jnp.where(kplace, jnp.where(thrower_left, 1.0, -1.0), s.kdir[kslot]))
    kx = jnp.where(klive, kx + kdir * 1.8, kx)
    klive = klive & (kx >= 0.0) & (kx <= 84.0)

    # Punch resolution: every gripper in reach on the punch side, then the
    # thrower (the C++ loop kills all in-reach grippers in one active frame).
    punching = punch > 0
    rel = gx + 2.0 - (px + _KF_PLAYER_W / 2.0)
    gr_hit = punching & glive & (rel * punch_dir > 0.0) & (rel * punch_dir < 9.0)
    n_hit = jnp.sum(gr_hit)
    glive = glive & ~gr_hit
    kills = s.kills + n_hit.astype(jnp.int32)
    reward = reward + 100.0 * n_hit.astype(jnp.float32)
    trel = tx + 2.0 - (px + _KF_PLAYER_W / 2.0)
    t_hit = punching & thrower & (trel * punch_dir > 0.0) & (trel * punch_dir < 9.0)
    thrower = thrower & ~t_hit
    thrower_timer = jnp.where(t_hit, 300, thrower_timer)
    reward = reward + jnp.where(t_hit, 800.0, 0.0)

    # Knife hits: high knives ducked, low knives jumped.
    k_contact = klive & (kx + 2.0 > px) & (kx < px + _KF_PLAYER_W)
    dodged = jnp.where(khigh, ducking, jump > 0)
    damage = jnp.sum(k_contact & ~dodged) * 25.0
    energy = energy - damage
    klive = klive & ~k_contact

    # Energy out: lose a life, reset the wave.
    ko = energy <= 0.0
    lives = s.lives - ko.astype(jnp.int32)
    energy = jnp.where(ko, _KF_ENERGY_MAX, energy)
    glive = jnp.where(ko, jnp.zeros_like(glive), glive)
    klive = jnp.where(ko, jnp.zeros_like(klive), klive)
    thrower = thrower & ~ko
    thrower_timer = jnp.where(ko, 300, thrower_timer)
    over = s.over | (lives <= 0)

    out = KungFuMasterCore(
        px=px, facing=facing, energy=energy, glive=glive, gx=gx,
        thrower=thrower, thrower_left=thrower_left, tx=tx,
        thrower_timer=thrower_timer, throw_timer=throw_timer, klive=klive,
        khigh=khigh, kx=kx, ky=ky, kdir=kdir, spawn_timer=spawn_timer,
        punch=punch, punch_cd=punch_cd, punch_dir=punch_dir, jump=jump,
        ducking=ducking, kills=kills, lives=lives,
        score=s.score + reward.astype(jnp.int32), over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _kf_render(s: KungFuMasterCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 400, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    f = jnp.where(y == int(_KF_FLOOR_Y) + 10, jnp.uint8(70), f)
    for g in range(_KF_GRIPPERS):
        f = jnp.where(s.glive[g] & _rect_mask(y, x, s.gx[g], _KF_FLOOR_Y, 4, 10),
                      jnp.uint8(150), f)
    f = jnp.where(s.thrower & _rect_mask(y, x, s.tx, _KF_FLOOR_Y, 4, 10), jnp.uint8(190), f)
    for k in range(_KF_KNIVES):
        f = jnp.where(s.klive[k] & _rect_mask(y, x, s.kx[k], s.ky[k], 2, 1), jnp.uint8(255), f)
    ph = jnp.where(s.ducking, _KF_PLAYER_H - 5.0, _KF_PLAYER_H)
    py = jnp.where(s.ducking, _KF_FLOOR_Y + 5.0, _KF_FLOOR_Y)
    py = jnp.where(s.jump > 0, py - 8.0, py)
    f = jnp.where(_rect_mask(y, x, s.px, py, _KF_PLAYER_W, ph), jnp.uint8(210), f)
    ax = jnp.where(s.punch_dir > 0, s.px + _KF_PLAYER_W, s.px - 4.0)
    f = jnp.where((s.punch > 0) & _rect_mask(y, x, ax, py + 3.0, 4, 1), jnp.uint8(255), f)
    f = jnp.where(_rect_mask(y, x, 2.0, 82.0, s.energy / _KF_ENERGY_MAX * 80.0, 1),
                  jnp.uint8(150), f)
    pip = (y == 80) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < s.lives)
    f = jnp.where(pip, jnp.uint8(180), f)
    return f


KUNG_FU_MASTER = dict(
    reset=_kf_reset, act=_kf_act, render=_kf_render,
    lives=lambda s: s.lives, over=lambda s: s.over,
    minimal_actions=14,
    minimal_to_full=np.array([0, 2, 3, 4, 5, 8, 9, 11, 12, 13, 14, 15, 16, 17], np.int32),
)


# ---------------------------------------------------------------------------
# Tennis (csrc/envs/tennis.cc)
# ---------------------------------------------------------------------------

_TN_COURT_L, _TN_COURT_R = 14.0, 70.0
_TN_NET_Y = 45.0
_TN_PTOP, _TN_PBOT = 48.0, 74.0
_TN_CTOP, _TN_CBOT = 14.0, 40.0
_TN_PAD_W, _TN_PAD_H = 6.0, 2.0
_TN_BASE_P, _TN_BASE_C = 80.0, 8.0
_TN_PTS, _TN_GAMES = 4, 6


@flax.struct.dataclass
class TennisCore:
    px: jax.Array
    py: jax.Array
    cx: jax.Array
    cy: jax.Array
    bx: jax.Array
    by: jax.Array
    bvx: jax.Array
    bvy: jax.Array
    ball: jax.Array
    player_serves: jax.Array
    serve_pause: jax.Array
    p_points: jax.Array
    c_points: jax.Array
    p_games: jax.Array
    c_games: jax.Array
    over: jax.Array


def _tn_reset(key):
    del key
    return TennisCore(
        px=jnp.float32(39.0), py=jnp.float32(66.0),
        cx=jnp.float32(39.0), cy=jnp.float32(20.0),
        bx=jnp.float32(0), by=jnp.float32(0), bvx=jnp.float32(0), bvy=jnp.float32(0),
        ball=jnp.bool_(False), player_serves=jnp.bool_(True),
        serve_pause=jnp.int32(40), p_points=jnp.int32(0), c_points=jnp.int32(0),
        p_games=jnp.int32(0), c_games=jnp.int32(0), over=jnp.bool_(False),
    )


def _tn_act(s: TennisCore, dx, dy, fire, key):
    del fire
    live_game = ~s.over
    k_serve = key

    px = jnp.clip(s.px + dx.astype(jnp.float32) * 1.2, _TN_COURT_L, _TN_COURT_R - _TN_PAD_W)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * 1.2, _TN_PTOP, _TN_PBOT)

    want = jnp.where(s.ball & (s.by < _TN_NET_Y + 10.0), s.bx, 39.0)
    cx = s.cx + jnp.where(s.cx + _TN_PAD_W / 2.0 < want, 0.75, -0.75)
    cx = jnp.clip(cx, _TN_COURT_L, _TN_COURT_R - _TN_PAD_W)

    # Serve after the pause.
    serve_pause = jnp.where(s.ball, s.serve_pause, s.serve_pause - 1)
    serve_now = ~s.ball & (serve_pause <= 0)
    ball = s.ball | serve_now
    bx = jnp.where(serve_now,
                   jnp.where(s.player_serves, px + _TN_PAD_W / 2.0, cx + _TN_PAD_W / 2.0),
                   s.bx)
    by = jnp.where(serve_now,
                   jnp.where(s.player_serves, py - 1.0, s.cy + _TN_PAD_H + 1.0),
                   s.by)
    bvy = jnp.where(serve_now, jnp.where(s.player_serves, -1.3, 1.3), s.bvy)
    bvx = jnp.where(serve_now, (jax.random.uniform(k_serve) - 0.5) * 1.2, s.bvx)

    in_play = ball & ~serve_now  # the C++ returns right after serving
    bx = jnp.where(in_play, bx + bvx, bx)
    by = jnp.where(in_play, by + bvy, by)
    bvx = jnp.where(in_play & ((bx < _TN_COURT_L + 1.0) | (bx > _TN_COURT_R - 1.0)), -bvx, bvx)

    p_return = (in_play & (bvy > 0.0) & (by + 1.0 >= py) & (by <= py + _TN_PAD_H)
                & (bx + 1.0 >= px) & (bx <= px + _TN_PAD_W))
    bvy = jnp.where(p_return, -1.3, bvy)
    bvx = jnp.where(p_return, jnp.clip((bx - (px + _TN_PAD_W / 2.0)) * 0.25, -1.2, 1.2), bvx)
    c_return = (in_play & (bvy < 0.0) & (by <= s.cy + _TN_PAD_H) & (by + 1.0 >= s.cy)
                & (bx + 1.0 >= cx) & (bx <= cx + _TN_PAD_W))
    bvy = jnp.where(c_return, 1.3, bvy)
    bvx = jnp.where(c_return, jnp.clip((bx - (cx + _TN_PAD_W / 2.0)) * 0.25, -1.2, 1.2), bvx)

    p_scores = in_play & (by < _TN_BASE_C)
    c_scores = in_play & ~p_scores & (by > _TN_BASE_P)
    reward = jnp.where(p_scores, 1.0, jnp.where(c_scores, -1.0, 0.0))
    point_over = p_scores | c_scores
    p_points = s.p_points + p_scores.astype(jnp.int32)
    c_points = s.c_points + c_scores.astype(jnp.int32)
    game_over_p = p_points >= _TN_PTS
    game_over_c = c_points >= _TN_PTS
    p_games = s.p_games + game_over_p.astype(jnp.int32)
    c_games = s.c_games + game_over_c.astype(jnp.int32)
    reset_pts = game_over_p | game_over_c
    p_points = jnp.where(reset_pts, 0, p_points)
    c_points = jnp.where(reset_pts, 0, c_points)
    over = s.over | (p_games >= _TN_GAMES) | (c_games >= _TN_GAMES)
    ball = ball & ~point_over
    serve_pause = jnp.where(point_over, 40, serve_pause)
    player_serves = jnp.where(point_over, ~s.player_serves, s.player_serves)

    out = TennisCore(
        px=px, py=py, cx=cx, cy=s.cy, bx=bx, by=by, bvx=bvx, bvy=bvy,
        ball=ball, player_serves=player_serves, serve_pause=serve_pause,
        p_points=p_points, c_points=c_points, p_games=p_games, c_games=c_games,
        over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, jnp.float32(0.0))


def _tn_render(s: TennisCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    in_court_y = (y >= int(_TN_BASE_C)) & (y <= int(_TN_BASE_P))
    f = jnp.where(in_court_y & ((x == int(_TN_COURT_L) - 1) | (x == int(_TN_COURT_R))),
                  jnp.uint8(90), f)
    in_court_x = (x >= int(_TN_COURT_L) - 1) & (x <= int(_TN_COURT_R))
    f = jnp.where(in_court_x & ((y == int(_TN_BASE_C)) | (y == int(_TN_BASE_P))),
                  jnp.uint8(90), f)
    f = jnp.where(in_court_x & (y == int(_TN_NET_Y)), jnp.uint8(140), f)
    pgame = (y == 83) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < jnp.minimum(s.p_games, _TN_GAMES))
    f = jnp.where(pgame, jnp.uint8(200), f)
    cgame = (y == 1) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < jnp.minimum(s.c_games, _TN_GAMES))
    f = jnp.where(cgame, jnp.uint8(200), f)
    for p in range(_TN_PTS):
        f = jnp.where((s.p_points > p) & _rect_mask(y, x, 74.0, 70.0 - 4.0 * p, 2, 2),
                      jnp.uint8(160), f)
        f = jnp.where((s.c_points > p) & _rect_mask(y, x, 74.0, 12.0 + 4.0 * p, 2, 2),
                      jnp.uint8(160), f)
    f = jnp.where(_rect_mask(y, x, s.cx, s.cy, _TN_PAD_W, _TN_PAD_H), jnp.uint8(120), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _TN_PAD_W, _TN_PAD_H), jnp.uint8(200), f)
    f = jnp.where(s.ball & _rect_mask(y, x, s.bx, s.by, 2, 2), jnp.uint8(236), f)
    return f


TENNIS = dict(
    reset=_tn_reset, act=_tn_act, render=_tn_render,
    lives=lambda s: jnp.int32(1), over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# StarGunner (csrc/envs/star_gunner.cc)
# ---------------------------------------------------------------------------

_SG_SHIP_W, _SG_SHIP_H = 6.0, 4.0
_SG_XMIN, _SG_XMAX, _SG_YMIN, _SG_YMAX = 4.0, 40.0, 10.0, 70.0
_SG_ENEMIES = 5
_SG_SHOTS = 2
_SG_BOLTS = 3


@flax.struct.dataclass
class StarGunnerCore:
    px: jax.Array
    py: jax.Array
    elive: jax.Array   # [5]
    homing: jax.Array
    ex: jax.Array
    ey: jax.Array
    ey0: jax.Array
    phase: jax.Array
    slive: jax.Array   # [2]
    sx: jax.Array
    sy: jax.Array
    blive: jax.Array   # [3]
    bx: jax.Array
    by: jax.Array
    bvy: jax.Array
    spawn_timer: jax.Array
    kills: jax.Array
    lives: jax.Array
    invuln: jax.Array
    score: jax.Array
    over: jax.Array


def _sg_reset(key):
    del key
    z5 = jnp.zeros((_SG_ENEMIES,), jnp.float32)
    return StarGunnerCore(
        px=jnp.float32(10.0), py=jnp.float32(40.0),
        elive=jnp.zeros((_SG_ENEMIES,), bool), homing=jnp.zeros((_SG_ENEMIES,), bool),
        ex=z5, ey=z5, ey0=z5, phase=z5,
        slive=jnp.zeros((_SG_SHOTS,), bool),
        sx=jnp.zeros((_SG_SHOTS,), jnp.float32), sy=jnp.zeros((_SG_SHOTS,), jnp.float32),
        blive=jnp.zeros((_SG_BOLTS,), bool),
        bx=jnp.zeros((_SG_BOLTS,), jnp.float32), by=jnp.zeros((_SG_BOLTS,), jnp.float32),
        bvy=jnp.zeros((_SG_BOLTS,), jnp.float32),
        spawn_timer=jnp.int32(30), kills=jnp.int32(0), lives=jnp.int32(3),
        invuln=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _sg_act(s: StarGunnerCore, dx, dy, fire, key):
    live_game = ~s.over
    reward = jnp.float32(0.0)
    k_y, k_home, k_phase, k_bolt = jax.random.split(key, 4)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * 1.5, _SG_XMIN, _SG_XMAX)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * 1.5, _SG_YMIN, _SG_YMAX)

    # Cannon (up to 2 rounds in flight; one spawned per frame like the C++).
    sfree = ~s.slive
    sslot = jnp.argmax(sfree)
    sspawn = (fire > 0) & jnp.any(sfree)
    slive = s.slive.at[sslot].set(s.slive[sslot] | sspawn)
    sx = s.sx.at[sslot].set(jnp.where(sspawn, px + _SG_SHIP_W, s.sx[sslot]))
    sy = s.sy.at[sslot].set(jnp.where(sspawn, py + _SG_SHIP_H / 2.0, s.sy[sslot]))
    sx = jnp.where(slive, sx + 3.0, sx)
    slive = slive & (sx <= 84.0)

    # Raider spawn (first free slot).
    spawn_timer = s.spawn_timer - 1
    interval = jnp.maximum(50 - 2 * (s.kills // 5), 22)
    do_spawn = spawn_timer <= 0
    spawn_timer = jnp.where(do_spawn, interval, spawn_timer)
    efree = ~s.elive
    eslot = jnp.argmax(efree)
    eplace = do_spawn & jnp.any(efree)
    new_y = 12.0 + jax.random.uniform(k_y) * 56.0
    elive = s.elive.at[eslot].set(s.elive[eslot] | eplace)
    ex = s.ex.at[eslot].set(jnp.where(eplace, 84.0, s.ex[eslot]))
    ey = s.ey.at[eslot].set(jnp.where(eplace, new_y, s.ey[eslot]))
    ey0 = s.ey0.at[eslot].set(jnp.where(eplace, new_y, s.ey0[eslot]))
    homing = s.homing.at[eslot].set(jnp.where(eplace, jax.random.uniform(k_home) < 0.3, s.homing[eslot]))
    phase = s.phase.at[eslot].set(jnp.where(eplace, jax.random.uniform(k_phase) * 4.0, s.phase[eslot]))

    # Flight: homing raiders track the ship; others bob on a triangle wave.
    speed = 1.0 + 0.1 * (s.kills // 10).astype(jnp.float32)
    ex = jnp.where(elive, ex - speed, ex)
    ey = jnp.where(elive & homing, ey + jnp.where(ey < py, 0.5, -0.5), ey)
    phase = jnp.where(elive & ~homing, phase + 0.08, phase)
    ey = jnp.where(elive & ~homing, ey0 + 6.0 * _tri(phase), ey)
    # Bolt fire (per-raider chance, first free bolt slot).
    blive, bxx, byy, bvy = s.blive, s.bx, s.by, s.bvy
    for e in range(_SG_ENEMIES):
        want = elive[e] & (jax.random.uniform(jax.random.fold_in(k_bolt, e)) < 0.004)
        bslot = jnp.argmax(~blive)
        want = want & jnp.any(~blive)
        bxx = bxx.at[bslot].set(jnp.where(want, ex[e], bxx[bslot]))
        byy = byy.at[bslot].set(jnp.where(want, ey[e] + 1.0, byy[bslot]))
        bvy = bvy.at[bslot].set(jnp.where(want, jnp.where(ey[e] + 1.0 < py, 0.6, -0.6), bvy[bslot]))
        blive = blive.at[bslot].set(blive[bslot] | want)
    elive = elive & (ex >= -6.0)
    bxx = jnp.where(blive, bxx - 2.0, bxx)
    byy = jnp.where(blive, byy + bvy, byy)
    blive = blive & (bxx >= 0.0)

    # Shots vs raiders (each shot kills at most one raider, in slot order).
    n_kills = jnp.int32(0)
    for si in range(_SG_SHOTS):
        hit = (slive[si] & elive & (sx[si] + 2.0 > ex) & (sx[si] < ex + 5.0)
               & (sy[si] + 1.0 > ey) & (sy[si] < ey + 3.0))
        any_hit = jnp.any(hit)
        first = jnp.argmax(hit)
        reward = reward + jnp.where(any_hit, jnp.where(homing[first], 300.0, 100.0), 0.0)
        n_kills = n_kills + any_hit.astype(jnp.int32)
        elive = elive.at[first].set(elive[first] & ~any_hit)
        slive = slive.at[si].set(slive[si] & ~any_hit)
    kills = s.kills + n_kills

    # Ship hits.
    vulnerable = s.invuln <= 0
    e_hit = (elive & (ex + 5.0 > px) & (ex < px + _SG_SHIP_W)
             & (ey + 3.0 > py) & (ey < py + _SG_SHIP_H))
    b_hit = (blive & (bxx + 2.0 > px) & (bxx < px + _SG_SHIP_W)
             & (byy + 1.0 > py) & (byy < py + _SG_SHIP_H))
    hit = vulnerable & (jnp.any(e_hit) | jnp.any(b_hit))
    elive = jnp.where(vulnerable, elive & ~e_hit, elive)
    lives = s.lives - hit.astype(jnp.int32)
    invuln = jnp.where(hit, 60, jnp.maximum(s.invuln - 1, 0))
    blive = jnp.where(hit, jnp.zeros_like(blive), jnp.where(vulnerable, blive & ~b_hit, blive))
    over = s.over | (lives <= 0)

    out = StarGunnerCore(
        px=px, py=py, elive=elive, homing=homing, ex=ex, ey=ey, ey0=ey0,
        phase=phase, slive=slive, sx=sx, sy=sy, blive=blive, bx=bxx, by=byy,
        bvy=bvy, spawn_timer=spawn_timer, kills=kills, lives=lives,
        invuln=invuln, score=s.score + reward.astype(jnp.int32), over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live_game, n, o), out, s)
    return out, jnp.where(live_game, reward, 0.0)


def _sg_render(s: StarGunnerCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 500, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    star = (y >= 6) & (y < 80) & ((y - 6) % 9 == 0) & (x >= 3) & ((x - 3) % 11 == 0)
    f = jnp.where(star, jnp.uint8(50), f)
    for e in range(_SG_ENEMIES):
        f = jnp.where(s.elive[e] & _rect_mask(y, x, s.ex[e], s.ey[e], 5, 3),
                      jnp.where(s.homing[e], jnp.uint8(220), jnp.uint8(150)), f)
    for si in range(_SG_SHOTS):
        f = jnp.where(s.slive[si] & _rect_mask(y, x, s.sx[si], s.sy[si], 2, 1), jnp.uint8(224), f)
    for b in range(_SG_BOLTS):
        f = jnp.where(s.blive[b] & _rect_mask(y, x, s.bx[b], s.by[b], 2, 1), jnp.uint8(120), f)
    visible = (s.invuln == 0) | ((s.invuln // 4) % 2 == 0)
    f = jnp.where(visible & _rect_mask(y, x, s.px, s.py, _SG_SHIP_W, _SG_SHIP_H),
                  jnp.uint8(210), f)
    pip = (y == 83) & (x >= 2) & ((x - 2) % 4 < 3) & ((x - 2) // 4 < s.lives)
    f = jnp.where(pip, jnp.uint8(180), f)
    return f


STAR_GUNNER = dict(
    reset=_sg_reset, act=_sg_act, render=_sg_render,
    lives=lambda s: s.lives, over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
