"""Pure-JAX twins of the wave-9d C++ engine games: Asteroids, Centipede.

Rules mirror the C++ engine game-for-game (csrc/envs/asteroids.cc,
centipede.cc) so the Anakin trainer covers the same task set as the Sebulba
host-env path; reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract
of jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

Both engines share the one-rock-kill-per-frame rule (asteroids.cc) so the
split bookkeeping stays engine-identical without sequential slot loops.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["ASTEROIDS", "CENTIPEDE"]


def _first_true(mask):
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


# ---------------------------------------------------------------------------
# Asteroids (csrc/envs/asteroids.cc)
# ---------------------------------------------------------------------------

_AS_HEADINGS = 16
# Same literals as the C++ table so float32 rounding matches.
_AS_HX = np.array([
    0.0, 0.3826834, 0.7071068, 0.9238795, 1.0,
    0.9238795, 0.7071068, 0.3826834, 0.0, -0.3826834,
    -0.7071068, -0.9238795, -1.0, -0.9238795, -0.7071068, -0.3826834,
], np.float32)
_AS_HY = np.array([
    -1.0, -0.9238795, -0.7071068, -0.3826834, 0.0,
    0.3826834, 0.7071068, 0.9238795, 1.0, 0.9238795,
    0.7071068, 0.3826834, 0.0, -0.3826834, -0.7071068, -0.9238795,
], np.float32)
_AS_SLOTS = 16
_AS_RX0 = np.array([10.0, 70.0, 10.0, 70.0], np.float32)
_AS_RY0 = np.array([12.0, 12.0, 66.0, 66.0], np.float32)
_AS_RVX0 = np.array([0.4, -0.3, 0.35, -0.45], np.float32)
_AS_RVY0 = np.array([0.3, 0.45, -0.4, -0.3], np.float32)
_AS_R = np.array([2.0, 4.0, 6.0], np.float32)
_AS_PTS = np.array([100, 50, 20], np.int32)
_AS_SHOTS = 2
_AS_SHOT_V = 2.5
_AS_SHOT_LIFE = 34
_AS_FIRE_CD = 9
_AS_THRUST = 0.06
_AS_DRAG = 0.995
_AS_MAXV = 1.5
_AS_ROT = 3
_AS_INVULN = 60
_AS_LIVES = 3
_AS_C45 = 0.7071068


@flax.struct.dataclass
class AsteroidsCore:
    px: jax.Array
    py: jax.Array
    vx: jax.Array
    vy: jax.Array
    heading: jax.Array
    rot_cd: jax.Array
    fire_cd: jax.Array
    invuln: jax.Array
    shot_live: jax.Array   # [2]
    shot_x: jax.Array
    shot_y: jax.Array
    shot_vx: jax.Array
    shot_vy: jax.Array
    shot_age: jax.Array
    rock_live: jax.Array   # [16]
    rock_x: jax.Array
    rock_y: jax.Array
    rock_vx: jax.Array
    rock_vy: jax.Array
    rock_size: jax.Array
    wave: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _as_wave_rocks():
    live = np.zeros(_AS_SLOTS, bool)
    live[:4] = True
    x = np.zeros(_AS_SLOTS, np.float32)
    y = np.zeros(_AS_SLOTS, np.float32)
    vx = np.zeros(_AS_SLOTS, np.float32)
    vy = np.zeros(_AS_SLOTS, np.float32)
    x[:4], y[:4], vx[:4], vy[:4] = _AS_RX0, _AS_RY0, _AS_RVX0, _AS_RVY0
    size = np.zeros(_AS_SLOTS, np.int32)
    size[:4] = 2
    return dict(
        rock_live=jnp.asarray(live), rock_x=jnp.asarray(x),
        rock_y=jnp.asarray(y), rock_vx=jnp.asarray(vx),
        rock_vy=jnp.asarray(vy), rock_size=jnp.asarray(size),
    )


def _as_respawn_fields():
    return dict(
        px=jnp.float32(40.0), py=jnp.float32(40.0),
        vx=jnp.float32(0.0), vy=jnp.float32(0.0),
        heading=jnp.int32(0), rot_cd=jnp.int32(_AS_ROT - 1),
        fire_cd=jnp.int32(0), invuln=jnp.int32(_AS_INVULN),
        shot_live=jnp.zeros(_AS_SHOTS, bool),
    )


def _as_reset(key):
    del key  # fully deterministic (asteroids.cc reset_game)
    return AsteroidsCore(
        shot_x=jnp.zeros(_AS_SHOTS, jnp.float32),
        shot_y=jnp.zeros(_AS_SHOTS, jnp.float32),
        shot_vx=jnp.zeros(_AS_SHOTS, jnp.float32),
        shot_vy=jnp.zeros(_AS_SHOTS, jnp.float32),
        shot_age=jnp.zeros(_AS_SHOTS, jnp.int32),
        wave=jnp.int32(0), lives=jnp.int32(_AS_LIVES), score=jnp.int32(0),
        over=jnp.bool_(False), **_as_respawn_fields(), **_as_wave_rocks(),
    )


def _as_act(s: AsteroidsCore, dx, dy, fire, key):
    del key  # fully deterministic
    live = ~s.over
    wave_speed = 1.0 + 0.15 * s.wave.astype(jnp.float32)
    hx = jnp.asarray(_AS_HX)
    hy = jnp.asarray(_AS_HY)

    turning = dx != 0
    rot_cd = jnp.where(turning, s.rot_cd + 1, _AS_ROT - 1)
    turns = turning & (rot_cd >= _AS_ROT)
    rot_cd = jnp.where(turns, 0, rot_cd)
    heading = jnp.where(
        turns,
        (s.heading + jnp.where(dx > 0, 1, _AS_HEADINGS - 1)) % _AS_HEADINGS,
        s.heading,
    )
    thrusting = dy < 0
    vx = s.vx + jnp.where(thrusting, hx[heading] * _AS_THRUST, 0.0)
    vy = s.vy + jnp.where(thrusting, hy[heading] * _AS_THRUST, 0.0)
    vx, vy = vx * _AS_DRAG, vy * _AS_DRAG
    sp = jnp.sqrt(vx * vx + vy * vy)
    scale = jnp.where(sp > _AS_MAXV, _AS_MAXV / jnp.maximum(sp, 1e-6), 1.0)
    vx, vy = vx * scale, vy * scale
    px = jnp.mod(s.px + vx, 84.0)
    py = jnp.mod(s.py + vy, 84.0)
    invuln = jnp.maximum(s.invuln - 1, 0)

    fire_cd = jnp.maximum(s.fire_cd - 1, 0)
    wants = (fire > 0) & (fire_cd == 0)
    slot = _first_true(~s.shot_live) & wants
    fired = slot.any()
    fire_cd = jnp.where(fired, _AS_FIRE_CD, fire_cd)
    shot_live = s.shot_live | slot
    shot_x = jnp.where(slot, px + 2.0 + hx[heading] * 3.0, s.shot_x)
    shot_y = jnp.where(slot, py + 2.0 + hy[heading] * 3.0, s.shot_y)
    shot_vx = jnp.where(slot, hx[heading] * _AS_SHOT_V, s.shot_vx)
    shot_vy = jnp.where(slot, hy[heading] * _AS_SHOT_V, s.shot_vy)
    shot_age = jnp.where(slot, 0, s.shot_age)
    shot_x = jnp.where(shot_live, shot_x + shot_vx, shot_x)
    shot_y = jnp.where(shot_live, shot_y + shot_vy, shot_y)
    shot_age = jnp.where(shot_live, shot_age + 1, shot_age)
    shot_live = shot_live & (shot_age < _AS_SHOT_LIFE) \
        & (shot_x >= 0) & (shot_x < 84) & (shot_y >= 0) & (shot_y < 84)

    rock_live = s.rock_live
    rock_x = jnp.where(rock_live, jnp.mod(s.rock_x + s.rock_vx * wave_speed, 84.0), s.rock_x)
    rock_y = jnp.where(rock_live, jnp.mod(s.rock_y + s.rock_vy * wave_speed, 84.0), s.rock_y)
    rr = jnp.asarray(_AS_R)[s.rock_size]

    # One rock kill per frame: first (rock, shot) overlap in slot-major order.
    hits = (
        rock_live[:, None] & shot_live[None, :]
        & (shot_x[None, :] >= rock_x[:, None] - rr[:, None])
        & (shot_x[None, :] < rock_x[:, None] + rr[:, None])
        & (shot_y[None, :] >= rock_y[:, None] - rr[:, None])
        & (shot_y[None, :] < rock_y[:, None] + rr[:, None])
    )
    flat = _first_true(hits.reshape(-1))
    killed = flat.any()
    idx = jnp.argmax(flat)
    k_rock = (idx // _AS_SHOTS).astype(jnp.int32)
    k_shot = (idx % _AS_SHOTS).astype(jnp.int32)
    shot_live = shot_live & ~(killed & (jnp.arange(_AS_SHOTS) == k_shot))
    rock_live = rock_live & ~(killed & (jnp.arange(_AS_SLOTS) == k_rock))
    ksize = s.rock_size[k_rock]
    pts = jnp.where(killed, jnp.asarray(_AS_PTS)[ksize], 0)
    reward = pts.astype(jnp.float32)
    score = s.score + pts

    # Split: two children into the first free slots (the killed slot reopens
    # first, as in the C++ spawn_rock scan).
    splits = killed & (ksize > 0)
    pvx, pvy = s.rock_vx[k_rock], s.rock_vy[k_rock]
    cvx1, cvy1 = (pvx - pvy) * _AS_C45 * 1.2, (pvx + pvy) * _AS_C45 * 1.2
    cvx2, cvy2 = (pvx + pvy) * _AS_C45 * 1.2, (pvy - pvx) * _AS_C45 * 1.2
    free = ~rock_live
    c1 = _first_true(free) & splits
    c2 = _first_true(free & ~c1) & splits
    kx, ky = rock_x[k_rock], rock_y[k_rock]
    rock_live = rock_live | c1 | c2
    rock_x = jnp.where(c1 | c2, kx, rock_x)
    rock_y = jnp.where(c1 | c2, ky, rock_y)
    rock_vx = jnp.where(c1, cvx1, jnp.where(c2, cvx2, s.rock_vx))
    rock_vy = jnp.where(c1, cvy1, jnp.where(c2, cvy2, s.rock_vy))
    rock_size = jnp.where(c1 | c2, ksize - 1, s.rock_size)

    # Ship-rock collision.
    rr2 = jnp.asarray(_AS_R)[rock_size]
    died = (invuln == 0) & (
        rock_live
        & (px + 4.0 > rock_x - rr2) & (px < rock_x + rr2)
        & (py + 4.0 > rock_y - rr2) & (py < rock_y + rr2)
    ).any()

    cleared = ~died & ~rock_live.any()
    wave = s.wave + cleared.astype(jnp.int32)
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))

    wr = _as_wave_rocks()
    rock_live = jnp.where(cleared, wr["rock_live"], rock_live)
    rock_x = jnp.where(cleared, wr["rock_x"], rock_x)
    rock_y = jnp.where(cleared, wr["rock_y"], rock_y)
    rock_vx = jnp.where(cleared, wr["rock_vx"], rock_vx)
    rock_vy = jnp.where(cleared, wr["rock_vy"], rock_vy)
    rock_size = jnp.where(cleared, wr["rock_size"], rock_size)
    invuln = jnp.where(cleared, _AS_INVULN, invuln)

    re = _as_respawn_fields()
    px = jnp.where(died, re["px"], px)
    py = jnp.where(died, re["py"], py)
    vx = jnp.where(died, re["vx"], vx)
    vy = jnp.where(died, re["vy"], vy)
    heading = jnp.where(died, re["heading"], heading)
    rot_cd = jnp.where(died, re["rot_cd"], rot_cd)
    fire_cd = jnp.where(died, re["fire_cd"], fire_cd)
    invuln = jnp.where(died, re["invuln"], invuln)
    shot_live = jnp.where(died, re["shot_live"], shot_live)

    out = AsteroidsCore(
        px=px, py=py, vx=vx, vy=vy, heading=heading, rot_cd=rot_cd,
        fire_cd=fire_cd, invuln=invuln, shot_live=shot_live, shot_x=shot_x,
        shot_y=shot_y, shot_vx=shot_vx, shot_vy=shot_vy, shot_age=shot_age,
        rock_live=rock_live, rock_x=rock_x, rock_y=rock_y, rock_vx=rock_vx,
        rock_vy=rock_vy, rock_size=rock_size, wave=wave, lives=lives,
        score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _as_render(s: AsteroidsCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    rr = jnp.asarray(_AS_R)[s.rock_size]
    for r in range(_AS_SLOTS):
        m = _rect_mask(y, x, s.rock_x[r] - rr[r], s.rock_y[r] - rr[r],
                       2 * rr[r], 2 * rr[r]) & s.rock_live[r]
        f = jnp.where(m, (120 + 30 * s.rock_size[r]).astype(jnp.uint8), f)
    for i in range(_AS_SHOTS):
        m = _rect_mask(y, x, s.shot_x[i] - 1.0, s.shot_y[i] - 1.0, 2.0, 2.0) \
            & s.shot_live[i]
        f = jnp.where(m, jnp.uint8(220), f)
    visible = (s.invuln % 2) == 0
    hx = jnp.asarray(_AS_HX)[s.heading]
    hy = jnp.asarray(_AS_HY)[s.heading]
    body = _rect_mask(y, x, s.px, s.py, 4.0, 4.0) & visible
    nose = _rect_mask(y, x, s.px + 1.0 + hx * 3.0, s.py + 1.0 + hy * 3.0,
                      2.0, 2.0) & visible
    f = jnp.where(body | nose, jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 20, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _AS_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


ASTEROIDS = dict(
    reset=_as_reset,
    act=_as_act,
    render=_as_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Centipede (csrc/envs/centipede.cc)
# ---------------------------------------------------------------------------

_CP_COLS, _CP_ROWS = 19, 13
_CP_GX, _CP_GY = 4, 8
_CP_SEGS = 9
_CP_SEG_SPEED = 1.0
_CP_SW = _CP_SH = 4.0
_CP_PW = _CP_PH = 4.0
_CP_WALK = 1.0
_CP_SHOT_V = 3.0
_CP_SPW, _CP_SPH = 5.0, 4.0
_CP_SPIDER_RESPAWN = 200
_CP_LIVES = 3
_CP_MUSH0 = np.array(
    [[((c * 7 + r * 11) % 13) == 0 for c in range(_CP_COLS)] for r in range(_CP_ROWS)]
)


@flax.struct.dataclass
class CentipedeCore:
    mush: jax.Array       # [13, 19] bool
    seg_live: jax.Array   # [9]
    seg_x: jax.Array
    seg_y: jax.Array
    seg_dir: jax.Array
    px: jax.Array
    py: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    spider_x: jax.Array
    spider_y: jax.Array
    spider_vx: jax.Array
    spider_vy: jax.Array
    spider_hold: jax.Array
    wave: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _cp_wave_fields():
    return dict(
        seg_live=jnp.ones(_CP_SEGS, bool),
        seg_x=jnp.asarray([20.0 + s * 5.0 for s in range(_CP_SEGS)], jnp.float32),
        seg_y=jnp.full(_CP_SEGS, 8.0, jnp.float32),
        seg_dir=jnp.ones(_CP_SEGS, jnp.float32),
        spider_hold=jnp.int32(120), spider_x=jnp.float32(4.0),
        spider_y=jnp.float32(60.0), spider_vx=jnp.float32(0.8),
        spider_vy=jnp.float32(0.6),
    )


def _cp_reset(key):
    del key  # fully deterministic (centipede.cc reset_game)
    return CentipedeCore(
        mush=jnp.asarray(_CP_MUSH0), px=jnp.float32(40.0), py=jnp.float32(74.0),
        shot_live=jnp.bool_(False), shot_x=jnp.float32(0.0),
        shot_y=jnp.float32(0.0), wave=jnp.int32(0), lives=jnp.int32(_CP_LIVES),
        score=jnp.int32(0), over=jnp.bool_(False), **_cp_wave_fields(),
    )


def _cp_cell(fx, fy):
    c = ((fx - _CP_GX) / 4.0).astype(jnp.int32)
    r = ((fy - _CP_GY) / 4.0).astype(jnp.int32)
    ok = (c >= 0) & (c < _CP_COLS) & (r >= 0) & (r < _CP_ROWS) \
        & (fx >= _CP_GX) & (fy >= _CP_GY)
    return r, c, ok


def _cp_act(s: CentipedeCore, dx, dy, fire, key):
    del key  # fully deterministic
    live = ~s.over
    sspeed = _CP_SEG_SPEED * (1.0 + 0.15 * s.wave.astype(jnp.float32))

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _CP_WALK, 4.0, 80.0 - _CP_PW)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * _CP_WALK, 64.0, 78.0)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _CP_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py, s.shot_y)
    shot_y = jnp.where(shot_live, shot_y - _CP_SHOT_V, shot_y)
    shot_live = shot_live & (shot_y >= 0)

    # Shot vs mushroom.
    mr, mc, m_ok = _cp_cell(shot_x, shot_y)
    mush_hit = shot_live & m_ok & s.mush[jnp.clip(mr, 0, _CP_ROWS - 1),
                                         jnp.clip(mc, 0, _CP_COLS - 1)]
    mush = jnp.where(
        mush_hit,
        s.mush.at[jnp.clip(mr, 0, _CP_ROWS - 1),
                  jnp.clip(mc, 0, _CP_COLS - 1)].set(False),
        s.mush,
    )
    shot_live = shot_live & ~mush_hit
    reward = jnp.where(mush_hit, 1.0, 0.0)
    score = s.score + mush_hit.astype(jnp.int32)

    # Segments snake through the field.
    nx = s.seg_x + s.seg_dir * sspeed
    at_wall = (nx < 4.0) | (nx + _CP_SW > 80.0)
    head = jnp.where(s.seg_dir > 0, nx + _CP_SW - 1.0, nx)
    hr, hc, h_ok = _cp_cell(head, s.seg_y)
    at_mush = h_ok & mush[jnp.clip(hr, 0, _CP_ROWS - 1),
                          jnp.clip(hc, 0, _CP_COLS - 1)]
    blocked = at_wall | at_mush
    seg_dir = jnp.where(s.seg_live & blocked, -s.seg_dir, s.seg_dir)
    seg_y = jnp.where(s.seg_live & blocked & (s.seg_y < 76.0), s.seg_y + 4.0, s.seg_y)
    seg_x = jnp.where(s.seg_live & ~blocked, nx, s.seg_x)

    # Shot vs segments: first hit only; a mushroom grows where it died.
    seg_hits = (
        shot_live & s.seg_live
        & (shot_x >= seg_x) & (shot_x < seg_x + _CP_SW)
        & (shot_y >= seg_y) & (shot_y < seg_y + _CP_SH)
    )
    kill = _first_true(seg_hits)
    killed = kill.any()
    shot_live = shot_live & ~killed
    seg_live = s.seg_live & ~kill
    reward = reward + jnp.where(killed, 10.0, 0.0)
    score = score + jnp.where(killed, 10, 0)
    kidx = jnp.argmax(kill)
    gr, gc, g_ok = _cp_cell(seg_x[kidx] + 2.0, seg_y[kidx])
    mush = jnp.where(
        killed & g_ok,
        mush.at[jnp.clip(gr, 0, _CP_ROWS - 1),
                jnp.clip(gc, 0, _CP_COLS - 1)].set(True),
        mush,
    )

    seg_touch = (
        seg_live
        & (px + _CP_PW > seg_x) & (px < seg_x + _CP_SW)
        & (py + _CP_PH > seg_y) & (py < seg_y + _CP_SH)
    ).any()

    # Spider.
    holding = s.spider_hold > 0
    hold = jnp.where(holding, s.spider_hold - 1, s.spider_hold)
    comeback = holding & (hold == 0)
    wf = _cp_wave_fields()
    spx = jnp.where(comeback, wf["spider_x"], s.spider_x)
    spy = jnp.where(comeback, wf["spider_y"], s.spider_y)
    svx = jnp.where(comeback, wf["spider_vx"], s.spider_vx)
    svy = jnp.where(comeback, wf["spider_vy"], s.spider_vy)
    active = ~holding
    spx = jnp.where(active, spx + svx, spx)
    spy = jnp.where(active, spy + svy, spy)
    svx = jnp.where(active & ((spx < 4.0) | (spx + _CP_SPW > 80.0)), -svx, svx)
    svy = jnp.where(active & ((spy < 56.0) | (spy + _CP_SPH > 78.0)), -svy, svy)
    spider_shot = (
        active & shot_live
        & (shot_x >= spx) & (shot_x < spx + _CP_SPW)
        & (shot_y >= spy) & (shot_y < spy + _CP_SPH)
    )
    shot_live = shot_live & ~spider_shot
    hold = jnp.where(spider_shot, _CP_SPIDER_RESPAWN, hold)
    reward = reward + jnp.where(spider_shot, 300.0, 0.0)
    score = score + jnp.where(spider_shot, 300, 0)
    spider_touch = active & ~spider_shot & ~seg_touch & (
        (px + _CP_PW > spx) & (px < spx + _CP_SPW)
        & (py + _CP_PH > spy) & (py < spy + _CP_SPH)
    )

    died = seg_touch | spider_touch
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    cleared = ~died & ~seg_live.any()
    wave = s.wave + cleared.astype(jnp.int32)

    restart = died | cleared
    seg_live = jnp.where(restart, wf["seg_live"], seg_live)
    seg_x = jnp.where(restart, wf["seg_x"], seg_x)
    seg_y = jnp.where(restart, wf["seg_y"], seg_y)
    seg_dir = jnp.where(restart, wf["seg_dir"], seg_dir)
    hold = jnp.where(restart, wf["spider_hold"], hold)
    spx = jnp.where(restart, wf["spider_x"], spx)
    spy = jnp.where(restart, wf["spider_y"], spy)
    svx = jnp.where(restart, wf["spider_vx"], svx)
    svy = jnp.where(restart, wf["spider_vy"], svy)
    px = jnp.where(died, 40.0, px)
    py = jnp.where(died, 74.0, py)
    shot_live = jnp.where(died, False, shot_live)

    out = CentipedeCore(
        mush=mush, seg_live=seg_live, seg_x=seg_x, seg_y=seg_y,
        seg_dir=seg_dir, px=px, py=py, shot_live=shot_live, shot_x=shot_x,
        shot_y=shot_y, spider_x=spx, spider_y=spy, spider_vx=svx,
        spider_vy=svy, spider_hold=hold, wave=wave, lives=lives, score=score,
        over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


# Static pixel template for one mushroom cell: 3x3 block at each grid cell.
_CP_CELL_Y = np.array([[_CP_GY + r * 4 for c in range(_CP_COLS)]
                       for r in range(_CP_ROWS)])
_CP_CELL_X = np.array([[_CP_GX + c * 4 for c in range(_CP_COLS)]
                       for r in range(_CP_ROWS)])


def _cp_render(s: CentipedeCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    # Mushrooms: upsample the grid to pixels (3x3 block per 4x4 cell).
    in_field = (y >= _CP_GY) & (y < _CP_GY + _CP_ROWS * 4) \
        & (x >= _CP_GX) & (x < _CP_GX + _CP_COLS * 4)
    cr = jnp.clip((y - _CP_GY) // 4, 0, _CP_ROWS - 1)
    cc = jnp.clip((x - _CP_GX) // 4, 0, _CP_COLS - 1)
    sub = ((y - _CP_GY) % 4 < 3) & ((x - _CP_GX) % 4 < 3)
    mush_px = in_field & sub & s.mush[cr, cc]
    f = jnp.where(mush_px, jnp.uint8(140), jnp.uint8(0))
    for i in range(_CP_SEGS):
        m = _rect_mask(y, x, s.seg_x[i], s.seg_y[i], _CP_SW, _CP_SH) & s.seg_live[i]
        f = jnp.where(m, jnp.uint8(200), f)
    sp = _rect_mask(y, x, s.spider_x, s.spider_y, _CP_SPW, _CP_SPH) \
        & (s.spider_hold == 0)
    f = jnp.where(sp, jnp.uint8(180), f)
    sm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 2.0, 2.0, 3.0) & s.shot_live
    f = jnp.where(sm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _CP_PW, _CP_PH), jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 10, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _CP_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


CENTIPEDE = dict(
    reset=_cp_reset,
    act=_cp_act,
    render=_cp_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
