"""Pure-JAX twins of the wave-13 C++ engine games: MontezumaRevenge,
Pitfall, PrivateEye, Solaris, VideoPinball — completing native Atari-57.

Rules mirror the C++ engine game-for-game (csrc/envs/montezuma.cc,
pitfall.cc, private_eye.cc, solaris.cc, video_pinball.cc) so the Anakin
trainer covers the same task set as the Sebulba host-env path; reset frames
are pixel-identical across engines (tests/test_jax_engine.py). Each game
exposes the functional dict contract of jax_engine._BREAKOUT: reset / act
(one raw frame) / render / lives / over.

Simultaneity note: the C++ games early-return on a life loss; the JAX twins
gate those updates with selects instead. Given the engines draw different
RNG streams, trajectories diverge anyway — rules, scoring, and rendering
are what must match, and do.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["MONTEZUMA", "PITFALL", "PRIVATE_EYE", "SOLARIS", "VIDEO_PINBALL"]


# ---------------------------------------------------------------------------
# Montezuma's Revenge (csrc/envs/montezuma.cc)
# ---------------------------------------------------------------------------

_MZ_TOP, _MZ_MID, _MZ_BOT = 20.0, 44.0, 72.0
_MZ_ML0, _MZ_ML1 = 6.0, 34.0
_MZ_MR0, _MZ_MR1 = 50.0, 78.0
_MZ_LT, _MZ_LL, _MZ_LR = 40.0, 12.0, 64.0
_MZ_LW = 5.0
_MZ_PW, _MZ_PH = 4.0, 7.0
_MZ_WALK = 0.9
_MZ_CLIMB = 0.8
_MZ_JUMP = -2.0
_MZ_G = 0.17
# The skull guards the key's mid platform (montezuma.cc round-5).
_MZ_SMIN, _MZ_SMAX = 6.0, 29.0
_MZ_SW = _MZ_SH = 5.0
_MZ_LIVES = 3
_MZ_TOPS = np.array([_MZ_TOP, _MZ_MID, _MZ_BOT], np.float32)


@flax.struct.dataclass
class MontezumaCore:
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    grounded: jax.Array
    climbing: jax.Array
    skull_x: jax.Array
    skull_dir: jax.Array
    has_key: jax.Array
    doors: jax.Array     # [2]
    cycles: jax.Array    # door-pair re-arms — skull speed ramps with each
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _mz_respawn_fields():
    return dict(
        px=jnp.float32(38.0), py=jnp.float32(_MZ_TOP - _MZ_PH),
        vy=jnp.float32(0.0), grounded=jnp.bool_(True),
        climbing=jnp.bool_(False),
    )


def _mz_reset(key):
    del key  # fully deterministic (montezuma.cc reset_game)
    return MontezumaCore(
        skull_x=jnp.float32(_MZ_SMIN), skull_dir=jnp.float32(1.0),
        has_key=jnp.bool_(False), doors=jnp.ones(2, bool),
        cycles=jnp.int32(0),
        lives=jnp.int32(_MZ_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_mz_respawn_fields(),
    )


def _mz_near(cx, lx):
    return jnp.abs(cx - (lx + _MZ_LW / 2.0)) < 3.0


def _mz_plat_under(cx, top):
    mid = ((cx >= _MZ_ML0) & (cx < _MZ_ML1)) | ((cx >= _MZ_MR0) & (cx < _MZ_MR1))
    return jnp.where(top == _MZ_MID, mid, True)


def _mz_act(s: MontezumaCore, dx, dy, fire, key):
    del fire, key  # fully deterministic
    live = ~s.over
    tops = jnp.asarray(_MZ_TOPS)

    cx = s.px + _MZ_PW / 2.0
    near_t = _mz_near(cx, _MZ_LT)
    near_l = _mz_near(cx, _MZ_LL)
    near_r = _mz_near(cx, _MZ_LR)
    on_lad = near_t | near_l | near_r
    down_ok = (dy > 0) & (s.py + _MZ_PH < _MZ_BOT)
    up_ok = (dy < 0) & (s.py + _MZ_PH > _MZ_TOP + 1.0)
    enters = ~s.climbing & s.grounded & (dy != 0) & on_lad & (down_ok | up_ok)
    snap_x = jnp.where(
        near_t, _MZ_LT, jnp.where(near_l, _MZ_LL, _MZ_LR)
    ) - _MZ_PW / 2.0 + _MZ_LW / 2.0 - 1.0
    climbing = s.climbing | enters
    px = jnp.where(enters, snap_x, s.px)
    vy = jnp.where(enters, 0.0, s.vy)

    # -- climbing branch -- (step off only at a platform whose top the feet
    # CROSS this frame: the starting platform must not re-capture the climber)
    prev_feet = s.py + _MZ_PH
    py_cl = s.py + dy.astype(jnp.float32) * _MZ_CLIMB
    feet = py_cl + _MZ_PH
    crossed = ((dy > 0) & (tops > prev_feet + 0.5)) \
        | ((dy < 0) & (tops < prev_feet - 0.5))
    at_top = (jnp.abs(feet - tops) < 1.0) & crossed \
        & _mz_plat_under(px + _MZ_PW / 2.0, tops)
    steps_off = climbing & at_top.any()
    step_top = jnp.where(at_top, tops, jnp.inf).min()
    py_cl = jnp.where(steps_off, step_top - _MZ_PH, py_cl)
    hit_bot = climbing & (py_cl + _MZ_PH > _MZ_BOT)
    py_cl = jnp.where(hit_bot, _MZ_BOT - _MZ_PH, py_cl)
    py_cl = jnp.maximum(py_cl, 6.0)
    cl_done = steps_off | hit_bot

    # -- platform branch --
    px_pl = jnp.clip(px + dx.astype(jnp.float32) * _MZ_WALK, 2.0, 80.0 - _MZ_PW)
    jumps = s.grounded & (dy < 0)
    vy_pl = jnp.where(jumps, _MZ_JUMP, vy) + _MZ_G
    prev_bottom = s.py + _MZ_PH
    py_pl = s.py + vy_pl
    lands = (vy_pl >= 0.0) & (prev_bottom <= tops) & (py_pl + _MZ_PH >= tops) \
        & _mz_plat_under(px_pl + _MZ_PW / 2.0, tops)
    land_top = jnp.where(lands, tops, jnp.inf).min()
    landed = lands.any()
    py_pl = jnp.where(landed, land_top - _MZ_PH, py_pl)
    floor_hit = py_pl + _MZ_PH > _MZ_BOT
    py_pl = jnp.where(floor_hit, _MZ_BOT - _MZ_PH, py_pl)
    grounded_pl = landed | floor_hit
    vy_pl = jnp.where(grounded_pl, 0.0, vy_pl)

    was_climbing = climbing
    px = jnp.where(was_climbing, px, px_pl)
    py = jnp.where(was_climbing, py_cl, py_pl)
    vy = jnp.where(was_climbing, 0.0, vy_pl)
    grounded = jnp.where(was_climbing, cl_done, grounded_pl)
    climbing = jnp.where(was_climbing, ~cl_done, jnp.bool_(False))

    # Each re-arm cycle speeds the skull (montezuma.cc round-5 calibration).
    skull_x = s.skull_x + s.skull_dir * (0.5 + 0.35 * s.cycles.astype(jnp.float32))
    skull_dir = jnp.where(skull_x < _MZ_SMIN, 1.0,
                          jnp.where(skull_x > _MZ_SMAX, -1.0, s.skull_dir))
    skull_x = jnp.clip(skull_x, _MZ_SMIN, _MZ_SMAX)
    sy = _MZ_MID - _MZ_SH
    skulled = (px + _MZ_PW > skull_x) & (px < skull_x + _MZ_SW) \
        & (py + _MZ_PH > sy) & (py < sy + _MZ_SH)

    keyed = ~skulled & ~s.has_key & (px < _MZ_ML0 + 6.0) \
        & (jnp.abs(py + _MZ_PH - _MZ_MID) < 2.0)
    has_key = s.has_key | keyed
    reward = jnp.where(keyed, 100.0, 0.0)
    score = s.score + jnp.where(keyed, 100, 0)

    at_top_row = jnp.abs(py + _MZ_PH - _MZ_TOP) < 2.0
    dxs = jnp.asarray([2.0, 78.0], jnp.float32)
    opens = (
        ~skulled & has_key & at_top_row & s.doors
        & (px + _MZ_PW > dxs) & (px < dxs + 4.0)
    )
    opened = opens.any()
    doors = s.doors & ~opens
    has_key = jnp.where(opened, False, has_key)
    reward = reward + jnp.where(opened, 300.0, 0.0)
    score = score + jnp.where(opened, 300, 0)
    rearm = ~doors.any()
    cycles = s.cycles + rearm.astype(jnp.int32)
    doors = jnp.where(rearm, jnp.ones_like(doors), doors)

    lives = s.lives - skulled.astype(jnp.int32)
    over = s.over | (skulled & (lives <= 0))
    re = _mz_respawn_fields()
    px = jnp.where(skulled, re["px"], px)
    py = jnp.where(skulled, re["py"], py)
    vy = jnp.where(skulled, re["vy"], vy)
    grounded = jnp.where(skulled, re["grounded"], grounded)
    climbing = jnp.where(skulled, re["climbing"], climbing)

    out = MontezumaCore(
        px=px, py=py, vy=vy, grounded=grounded, climbing=climbing,
        skull_x=skull_x, skull_dir=skull_dir, has_key=has_key, doors=doors,
        cycles=cycles,
        lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _mz_static_bg():
    f = np.zeros((SCREEN, SCREEN), np.uint8)

    def hline(x0, x1, yy):
        f[int(yy):int(yy) + 2, int(x0):int(x1)] = 100

    def vlad(lx, y0, y1):
        for yy in range(int(y0) + 2, int(y1), 2):
            f[yy, int(lx):int(lx + _MZ_LW)] = 80

    hline(2, 80, _MZ_TOP)
    hline(_MZ_ML0, _MZ_ML1, _MZ_MID)
    hline(_MZ_MR0, _MZ_MR1, _MZ_MID)
    hline(2, 80, _MZ_BOT)
    vlad(_MZ_LT, _MZ_TOP, _MZ_MID)
    vlad(_MZ_LL, _MZ_MID, _MZ_BOT)
    vlad(_MZ_LR, _MZ_MID, _MZ_BOT)
    return f


_MZ_BG = _mz_static_bg()


def _mz_render(s: MontezumaCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.asarray(_MZ_BG)
    d0 = _rect_mask(y, x, 2.0, _MZ_TOP - 12.0, 4.0, 12.0) & s.doors[0]
    d1 = _rect_mask(y, x, 78.0, _MZ_TOP - 12.0, 4.0, 12.0) & s.doors[1]
    f = jnp.where(d0 | d1, jnp.uint8(140), f)
    km = _rect_mask(y, x, _MZ_ML0 + 2.0, _MZ_MID - 4.0, 3.0, 3.0) & ~s.has_key
    f = jnp.where(km, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.skull_x, _MZ_MID - _MZ_SH, _MZ_SW, _MZ_SH),
                  jnp.uint8(180), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _MZ_PW, _MZ_PH), jnp.uint8(255), f)
    keybar = (y == 3) & (x >= 2) & (x < 5) & s.has_key
    f = jnp.where(keybar, jnp.uint8(220), f)
    tick = (y == 1) & (x >= 10) & ((x - 10) % 2 == 0) \
        & ((x - 10) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _MZ_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


MONTEZUMA = dict(
    reset=_mz_reset,
    act=_mz_act,
    render=_mz_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Pitfall! (csrc/envs/pitfall.cc)
# ---------------------------------------------------------------------------

_PF_SCREENS = 8
_PF_GROUND = 62.0
_PF_PW, _PF_PH = 4.0, 7.0
_PF_RUN = 1.1
_PF_JUMP = -2.1
_PF_G = 0.16
_PF_LAYOUT = np.array([1, 0, 2, 1, 4, 1, 2, 4], np.int32)
_PF_PIT0, _PF_PIT1 = 34.0, 54.0
_PF_LOGW, _PF_LOGH = 6.0, 4.0
_PF_TREASX = 64.0
_PF_LIVES = 3


@flax.struct.dataclass
class PitfallCore:
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    grounded: jax.Array
    screen: jax.Array
    log_x: jax.Array
    treasure_taken: jax.Array  # [8]
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _pf_reset(key):
    del key  # fully deterministic (pitfall.cc reset_game)
    return PitfallCore(
        px=jnp.float32(6.0), py=jnp.float32(_PF_GROUND - _PF_PH),
        vy=jnp.float32(0.0), grounded=jnp.bool_(True), screen=jnp.int32(0),
        log_x=jnp.float32(70.0), treasure_taken=jnp.zeros(_PF_SCREENS, bool),
        lives=jnp.int32(_PF_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _pf_act(s: PitfallCore, dx, dy, fire, key):
    del fire, key  # fully deterministic
    live = ~s.over
    lay = jnp.asarray(_PF_LAYOUT)[s.screen]

    px = s.px + dx.astype(jnp.float32) * _PF_RUN
    went_left = px < 0.0
    went_right = px > 80.0
    screen = jnp.where(went_left, (s.screen + _PF_SCREENS - 1) % _PF_SCREENS,
                       jnp.where(went_right, (s.screen + 1) % _PF_SCREENS,
                                 s.screen))
    px = jnp.where(went_left, 80.0 - _PF_PW, jnp.where(went_right, 0.0, px))
    log_x = jnp.where(went_left | went_right, 70.0, s.log_x)
    lay = jnp.asarray(_PF_LAYOUT)[screen]

    jumps = s.grounded & (dy < 0)
    vy = jnp.where(jumps, _PF_JUMP, s.vy) + _PF_G
    py = s.py + vy
    lands = (vy >= 0.0) & (py + _PF_PH >= _PF_GROUND)
    py = jnp.where(lands, _PF_GROUND - _PF_PH, py)
    grounded = lands
    vy = jnp.where(lands, 0.0, vy)

    has_log = (lay & 1) != 0
    log_x = jnp.where(has_log, log_x - 0.8, log_x)
    log_x = jnp.where(has_log & (log_x < -_PF_LOGW), 84.0, log_x)
    ly = _PF_GROUND - _PF_LOGH
    bruised = has_log & (px + _PF_PW > log_x) & (px < log_x + _PF_LOGW) \
        & (py + _PF_PH > ly) & (py < ly + _PF_LOGH)
    reward = jnp.where(bruised, -1.0, 0.0)
    score = s.score - bruised.astype(jnp.int32)

    cxm = px + _PF_PW / 2.0
    crocd = ((lay & 2) != 0) & grounded & (cxm >= _PF_PIT0) & (cxm < _PF_PIT1)

    grabs = ~crocd & ((lay & 4) != 0) & ~s.treasure_taken[screen] & grounded \
        & (px + _PF_PW > _PF_TREASX) & (px < _PF_TREASX + 4.0)
    treasure_taken = jnp.where(grabs, s.treasure_taken.at[screen].set(True),
                               s.treasure_taken)
    reward = reward + jnp.where(grabs, 2000.0, 0.0)
    score = score + jnp.where(grabs, 2000, 0)

    lives = s.lives - crocd.astype(jnp.int32)
    over = s.over | (crocd & (lives <= 0))
    px = jnp.where(crocd, 6.0, px)
    py = jnp.where(crocd, _PF_GROUND - _PF_PH, py)
    vy = jnp.where(crocd, 0.0, vy)
    grounded = jnp.where(crocd, True, grounded)

    out = PitfallCore(
        px=px, py=py, vy=vy, grounded=grounded, screen=screen, log_x=log_x,
        treasure_taken=treasure_taken, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _pf_render(s: PitfallCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    lay = jnp.asarray(_PF_LAYOUT)[s.screen]
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where((y >= 8) & (y < 12), jnp.uint8(60), f)
    f = jnp.where((y >= int(_PF_GROUND)) & (y < int(_PF_GROUND) + 2),
                  jnp.uint8(100), f)
    f = jnp.where((y >= 76) & (y < 78), jnp.uint8(80), f)
    has_pit = (lay & 2) != 0
    pit = _rect_mask(y, x, _PF_PIT0, _PF_GROUND, _PF_PIT1 - _PF_PIT0, 2.0) & has_pit
    f = jnp.where(pit, jnp.uint8(30), f)
    c1 = _rect_mask(y, x, _PF_PIT0 + 3.0, _PF_GROUND - 2.0, 4.0, 2.0) & has_pit
    c2 = _rect_mask(y, x, _PF_PIT0 + 11.0, _PF_GROUND - 2.0, 4.0, 2.0) & has_pit
    f = jnp.where(c1 | c2, jnp.uint8(150), f)
    lm = _rect_mask(y, x, s.log_x, _PF_GROUND - _PF_LOGH, _PF_LOGW, _PF_LOGH) \
        & ((lay & 1) != 0)
    f = jnp.where(lm, jnp.uint8(130), f)
    tm = _rect_mask(y, x, _PF_TREASX, _PF_GROUND - 4.0, 4.0, 4.0) \
        & ((lay & 4) != 0) & ~s.treasure_taken[s.screen]
    f = jnp.where(tm, jnp.uint8(230), f)
    spips = (y == 5) & (x >= 2) & ((x - 2) % 3 == 0) & ((x - 2) // 3 <= s.screen)
    f = jnp.where(spips, jnp.uint8(120), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _PF_PW, _PF_PH), jnp.uint8(255), f)
    st = jnp.maximum(s.score, 0) // 100
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(st, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _PF_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


PITFALL = dict(
    reset=_pf_reset,
    act=_pf_act,
    render=_pf_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Private Eye (csrc/envs/private_eye.cc)
# ---------------------------------------------------------------------------

_PE_SCREENS = 6
_PE_ROAD = 60.0
_PE_CW, _PE_CH = 7.0, 5.0
_PE_DRIVE = 1.2
_PE_JUMP = -1.9
_PE_G = 0.15
_PE_LAYOUT = np.array([1, 2, 1, 0, 2, 1], np.int32)
_PE_HOLEX, _PE_HOLEW = 40.0, 8.0
_PE_ITEMX = 60.0
_PE_STUN = 30
_PE_THIEF = 800
_PE_FRAMES = 14000


@flax.struct.dataclass
class PrivateEyeCore:
    px: jax.Array
    py: jax.Array
    vy: jax.Array
    grounded: jax.Array
    screen: jax.Array
    stun: jax.Array
    thief_live: jax.Array
    thief_screen: jax.Array
    thief_timer: jax.Array
    thief_x: jax.Array
    item_taken: jax.Array  # [6]
    frame: jax.Array
    score: jax.Array
    over: jax.Array


def _pe_reset(key):
    del key  # fully deterministic (private_eye.cc reset_game)
    return PrivateEyeCore(
        px=jnp.float32(6.0), py=jnp.float32(_PE_ROAD - _PE_CH),
        vy=jnp.float32(0.0), grounded=jnp.bool_(True), screen=jnp.int32(0),
        stun=jnp.int32(0), thief_live=jnp.bool_(False),
        thief_screen=jnp.int32(-1), thief_timer=jnp.int32(0),
        thief_x=jnp.float32(0.0), item_taken=jnp.zeros(_PE_SCREENS, bool),
        frame=jnp.int32(0), score=jnp.int32(0), over=jnp.bool_(False),
    )


def _pe_act(s: PrivateEyeCore, dx, dy, fire, key):
    del fire
    live = ~s.over
    k_scr, k_x = jax.random.split(key)
    frame = s.frame + 1

    stun = jnp.maximum(s.stun - 1, 0)
    v = jnp.where(stun > 0, 0.0, _PE_DRIVE)
    px = s.px + dx.astype(jnp.float32) * v
    went_left = px < 0.0
    went_right = px > 80.0
    screen = jnp.where(went_left, (s.screen + _PE_SCREENS - 1) % _PE_SCREENS,
                       jnp.where(went_right, (s.screen + 1) % _PE_SCREENS,
                                 s.screen))
    px = jnp.where(went_left, 80.0 - _PE_CW, jnp.where(went_right, 0.0, px))
    lay = jnp.asarray(_PE_LAYOUT)[screen]

    jumps = s.grounded & (dy < 0) & (stun == 0)
    vy = jnp.where(jumps, _PE_JUMP, s.vy) + _PE_G
    py = s.py + vy
    lands = (vy >= 0.0) & (py + _PE_CH >= _PE_ROAD)
    py = jnp.where(lands, _PE_ROAD - _PE_CH, py)
    grounded = lands
    vy = jnp.where(lands, 0.0, vy)

    cxm = px + _PE_CW / 2.0
    stalls = ((lay & 1) != 0) & grounded & (stun == 0) \
        & (cxm >= _PE_HOLEX) & (cxm < _PE_HOLEX + _PE_HOLEW)
    stun = jnp.where(stalls, _PE_STUN, stun)

    grabs = ((lay & 2) != 0) & ~s.item_taken[screen] & grounded \
        & (px + _PE_CW > _PE_ITEMX) & (px < _PE_ITEMX + 4.0)
    item_taken = jnp.where(grabs, s.item_taken.at[screen].set(True), s.item_taken)
    reward = jnp.where(grabs, 100.0, 0.0)
    score = s.score + jnp.where(grabs, 100, 0)

    appears = ~s.thief_live & (frame % _PE_THIEF == 0)
    thief_live = s.thief_live | appears
    thief_screen = jnp.where(appears, jax.random.randint(k_scr, (), 0, _PE_SCREENS),
                             s.thief_screen)
    thief_x = jnp.where(appears, 10.0 + jax.random.uniform(k_x) * 60.0, s.thief_x)
    thief_timer = jnp.where(appears, 500, s.thief_timer)
    thief_timer = jnp.where(thief_live, thief_timer - 1, thief_timer)
    expires = thief_live & (thief_timer <= 0)
    collars = thief_live & ~expires & (screen == thief_screen) \
        & (px + _PE_CW > thief_x) & (px < thief_x + 4.0) & grounded
    thief_live = thief_live & ~expires & ~collars
    reward = reward + jnp.where(collars, 500.0, 0.0)
    score = score + jnp.where(collars, 500, 0)

    over = s.over | (frame >= _PE_FRAMES)
    out = PrivateEyeCore(
        px=px, py=py, vy=vy, grounded=grounded, screen=screen, stun=stun,
        thief_live=thief_live, thief_screen=thief_screen,
        thief_timer=thief_timer, thief_x=thief_x, item_taken=item_taken,
        frame=frame, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _pe_render(s: PrivateEyeCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    lay = jnp.asarray(_PE_LAYOUT)[s.screen]
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    sky = (y >= 14) & (y < 18) & (((x // 6 + s.screen) % 3) != 0)
    f = jnp.where(sky, jnp.uint8(70), f)
    f = jnp.where((y >= int(_PE_ROAD)) & (y < int(_PE_ROAD) + 2), jnp.uint8(100), f)
    hole = _rect_mask(y, x, _PE_HOLEX, _PE_ROAD, _PE_HOLEW, 2.0) & ((lay & 1) != 0)
    f = jnp.where(hole, jnp.uint8(20), f)
    item = _rect_mask(y, x, _PE_ITEMX, _PE_ROAD - 4.0, 4.0, 4.0) \
        & ((lay & 2) != 0) & ~s.item_taken[s.screen]
    f = jnp.where(item, jnp.uint8(230), f)
    th = _rect_mask(y, x, s.thief_x, _PE_ROAD - 7.0, 4.0, 7.0) \
        & s.thief_live & (s.screen == s.thief_screen)
    f = jnp.where(th, jnp.uint8(180), f)
    spips = (y == 5) & (x >= 2) & ((x - 2) % 3 == 0) & ((x - 2) // 3 <= s.screen)
    f = jnp.where(spips, jnp.uint8(120), f)
    shade = jnp.where(s.stun > 0, jnp.uint8(140), jnp.uint8(255))
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _PE_CW, _PE_CH), shade, f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    return f


PRIVATE_EYE = dict(
    reset=_pe_reset,
    act=_pe_act,
    render=_pe_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Solaris (csrc/envs/solaris.cc)
# ---------------------------------------------------------------------------

_SL_SQUAD = 3
_SL_EW, _SL_EH = 6.0, 4.0
_SL_PW, _SL_PH = 6.0, 4.0
_SL_MX, _SL_MY = 1.2, 0.8
_SL_SHOT = 3.0
_SL_ESHOT = 1.5
_SL_FUEL = 6000
_SL_REFUEL = 1500
_SL_LIVES = 3
_SL_SINE = np.array([
    0.0, 0.3826834, 0.7071068, 0.9238795, 1.0, 0.9238795, 0.7071068,
    0.3826834, 0.0, -0.3826834, -0.7071068, -0.9238795, -1.0, -0.9238795,
    -0.7071068, -0.3826834,
], np.float32)


def _sl_first_true(mask):
    return mask & (jnp.cumsum(mask.astype(jnp.int32)) == 1)


@flax.struct.dataclass
class SolarisCore:
    px: jax.Array
    py: jax.Array
    shot_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    enemy_live: jax.Array  # [3]
    ex: jax.Array
    ey: jax.Array
    phase: jax.Array
    eshot_live: jax.Array
    eshot_x: jax.Array
    eshot_y: jax.Array
    fuel: jax.Array
    wave: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _sl_warp_fields():
    return dict(
        enemy_live=jnp.ones(_SL_SQUAD, bool),
        ex=jnp.asarray([14.0 + e * 22.0 for e in range(_SL_SQUAD)], jnp.float32),
        ey=jnp.asarray([12.0 + e * 6.0 for e in range(_SL_SQUAD)], jnp.float32),
        phase=jnp.asarray([e * 85 for e in range(_SL_SQUAD)], jnp.int32),
        eshot_live=jnp.zeros(_SL_SQUAD, bool),
    )


def _sl_reset(key):
    del key  # fully deterministic (solaris.cc reset_game)
    return SolarisCore(
        px=jnp.float32(39.0), py=jnp.float32(70.0), shot_live=jnp.bool_(False),
        shot_x=jnp.float32(0.0), shot_y=jnp.float32(0.0),
        eshot_x=jnp.zeros(_SL_SQUAD, jnp.float32),
        eshot_y=jnp.zeros(_SL_SQUAD, jnp.float32),
        fuel=jnp.int32(_SL_FUEL), wave=jnp.int32(0),
        lives=jnp.int32(_SL_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_sl_warp_fields(),
    )


def _sl_act(s: SolarisCore, dx, dy, fire, key):
    live = ~s.over
    espeed = 0.5 + 0.08 * s.wave.astype(jnp.float32)

    px = jnp.clip(s.px + dx.astype(jnp.float32) * _SL_MX, 2.0, 82.0 - _SL_PW)
    py = jnp.clip(s.py + dy.astype(jnp.float32) * _SL_MY, 52.0, 78.0)

    fires = (fire > 0) & ~s.shot_live
    shot_live = s.shot_live | fires
    shot_x = jnp.where(fires, px + _SL_PW / 2.0, s.shot_x)
    shot_y = jnp.where(fires, py, s.shot_y)
    shot_y = jnp.where(shot_live, shot_y - _SL_SHOT, shot_y)
    shot_live = shot_live & (shot_y >= 0.0)

    phase = jnp.where(s.enemy_live, (s.phase + 3) & 255, s.phase)
    ex = jnp.where(
        s.enemy_live,
        jnp.clip(s.ex + jnp.asarray(_SL_SINE)[phase >> 4] * espeed * 1.6,
                 2.0, 82.0 - _SL_EW),
        s.ex,
    )
    ey = jnp.where(s.enemy_live, s.ey + espeed * 0.12, s.ey)
    ey = jnp.where(s.enemy_live & (ey > 48.0), 12.0, ey)
    strafes = (
        s.enemy_live & ~s.eshot_live & (jnp.abs(ex - px) < 6.0)
        & (jax.random.uniform(key, (_SL_SQUAD,)) < 0.02)
    )
    eshot_live = s.eshot_live | strafes
    eshot_x = jnp.where(strafes, ex + _SL_EW / 2.0, s.eshot_x)
    eshot_y = jnp.where(strafes, ey + _SL_EH, s.eshot_y)

    shot_hits = (
        shot_live & s.enemy_live
        & (shot_x >= ex) & (shot_x < ex + _SL_EW)
        & (shot_y >= ey) & (shot_y < ey + _SL_EH)
    )
    kill = _sl_first_true(shot_hits)
    shot_live = shot_live & ~kill.any()
    enemy_live = s.enemy_live & ~kill
    reward = kill.any().astype(jnp.float32) * 150.0
    score = s.score + jnp.where(kill.any(), 150, 0)

    eshot_y = jnp.where(eshot_live, eshot_y + _SL_ESHOT, eshot_y)
    eshot_live = eshot_live & (eshot_y < 84.0)
    shelled = (
        eshot_live
        & (px + _SL_PW > eshot_x - 1.0) & (px < eshot_x + 1.0)
        & (py + _SL_PH > eshot_y - 1.0) & (py < eshot_y + 1.0)
    ).any()

    cleared = ~shelled & ~enemy_live.any()
    reward = reward + jnp.where(cleared, 500.0, 0.0)
    score = score + jnp.where(cleared, 500, 0)
    fuel = jnp.where(cleared, jnp.minimum(s.fuel + _SL_REFUEL, _SL_FUEL), s.fuel)
    wave = s.wave + cleared.astype(jnp.int32)
    wf = _sl_warp_fields()
    enemy_live = jnp.where(cleared, wf["enemy_live"], enemy_live)
    ex = jnp.where(cleared, wf["ex"], ex)
    ey = jnp.where(cleared, wf["ey"], ey)
    phase = jnp.where(cleared, wf["phase"], phase)
    eshot_live = jnp.where(cleared, wf["eshot_live"], eshot_live)

    fuel = fuel - 1
    drained = ~shelled & (fuel <= 0)
    died = shelled | drained
    fuel = jnp.where(drained, _SL_FUEL, fuel)
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    px = jnp.where(died, 39.0, px)
    py = jnp.where(died, 70.0, py)
    shot_live = jnp.where(died, False, shot_live)
    eshot_live = jnp.where(died, jnp.zeros_like(eshot_live), eshot_live)

    out = SolarisCore(
        px=px, py=py, shot_live=shot_live, shot_x=shot_x, shot_y=shot_y,
        enemy_live=enemy_live, ex=ex, ey=ey, phase=phase,
        eshot_live=eshot_live, eshot_x=eshot_x, eshot_y=eshot_y, fuel=fuel,
        wave=wave, lives=lives, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _sl_render(s: SolarisCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    stars = (y >= 6) & (y < 48) & ((y - 6) % 7 == 0) & (x >= 3) & (x < 81) \
        & ((x - 3) % 9 == 0)
    f = jnp.where(stars, jnp.uint8(60), f)
    for e in range(_SL_SQUAD):
        em = _rect_mask(y, x, s.ex[e], s.ey[e], _SL_EW, _SL_EH) & s.enemy_live[e]
        f = jnp.where(em, jnp.uint8(170), f)
        sm = _rect_mask(y, x, s.eshot_x[e] - 1.0, s.eshot_y[e] - 1.0, 2.0, 2.0) \
            & s.eshot_live[e]
        f = jnp.where(sm, jnp.uint8(210), f)
    pm = _rect_mask(y, x, s.shot_x - 1.0, s.shot_y - 2.0, 2.0, 3.0) & s.shot_live
    f = jnp.where(pm, jnp.uint8(220), f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _SL_PW, _SL_PH), jnp.uint8(255), f)
    bars = s.fuel * 60 // _SL_FUEL
    gauge = (y == 3) & (x >= 2) & (x < 2 + bars)
    f = jnp.where(gauge, jnp.uint8(160), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 150, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _SL_LIVES)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


SOLARIS = dict(
    reset=_sl_reset,
    act=_sl_act,
    render=_sl_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Video Pinball (csrc/envs/video_pinball.cc)
# ---------------------------------------------------------------------------

_VP_L, _VP_R, _VP_T = 4.0, 74.0, 8.0
_VP_LANE = 76.0
_VP_BALL = 3.0
_VP_G = 0.06
_VP_BOUNCE = 0.85
_VP_BUMP = 3
_VP_BX = np.array([20.0, 52.0, 36.0], np.float32)
_VP_BY = np.array([24.0, 24.0, 42.0], np.float32)
_VP_BR = 4.0
_VP_KICK = 1.8
_VP_BCD = 6
_VP_FLIPY = 70.0
_VP_FL0, _VP_FL1 = 18.0, 36.0
_VP_FR0, _VP_FR1 = 42.0, 60.0
_VP_D0, _VP_D1 = 36.0, 42.0
_VP_BALLS = 3


@flax.struct.dataclass
class VideoPinballCore:
    in_lane: jax.Array
    bx: jax.Array
    by: jax.Array
    bvx: jax.Array
    bvy: jax.Array
    bump_cd: jax.Array
    balls: jax.Array
    score: jax.Array
    over: jax.Array


def _vp_rack_fields():
    return dict(
        in_lane=jnp.bool_(True), bx=jnp.float32(_VP_LANE), by=jnp.float32(60.0),
        bvx=jnp.float32(0.0), bvy=jnp.float32(0.0), bump_cd=jnp.int32(0),
    )


def _vp_reset(key):
    del key  # fully deterministic (video_pinball.cc reset_game)
    return VideoPinballCore(
        balls=jnp.int32(_VP_BALLS), score=jnp.int32(0), over=jnp.bool_(False),
        **_vp_rack_fields(),
    )


def _vp_act(s: VideoPinballCore, dx, dy, fire, key):
    del dy
    live = ~s.over
    k1, k2 = jax.random.split(key)

    launches = s.in_lane & (fire > 0)
    in_lane = s.in_lane & ~launches
    bx = jnp.where(launches, _VP_LANE - 4.0, s.bx)
    by = jnp.where(launches, 30.0, s.by)
    bvx = jnp.where(launches, -1.2 - jax.random.uniform(k1) * 0.6, s.bvx)
    bvy = jnp.where(launches, -2.0 - jax.random.uniform(k2) * 0.4, s.bvy)

    playing = ~in_lane & ~launches
    bvy = jnp.where(playing, bvy + _VP_G, bvy)
    bx = jnp.where(playing, bx + bvx, bx)
    by = jnp.where(playing, by + bvy, by)
    bump_cd = jnp.maximum(s.bump_cd - playing.astype(jnp.int32), 0)

    hit_l = playing & (bx < _VP_L)
    hit_r = playing & (bx + _VP_BALL > _VP_R)
    bx = jnp.where(hit_l, _VP_L, jnp.where(hit_r, _VP_R - _VP_BALL, bx))
    bvx = jnp.where(hit_l | hit_r, -bvx * _VP_BOUNCE, bvx)
    hit_t = playing & (by < _VP_T)
    by = jnp.where(hit_t, _VP_T, by)
    bvy = jnp.where(hit_t, -bvy * _VP_BOUNCE, bvy)

    ddx = bx + _VP_BALL / 2.0 - jnp.asarray(_VP_BX)
    ddy = by + _VP_BALL / 2.0 - jnp.asarray(_VP_BY)
    d2 = ddx * ddx + ddy * ddy
    rr = _VP_BR + _VP_BALL / 2.0
    bump_hits = playing & (d2 < rr * rr) & (bump_cd == 0)
    first = bump_hits & (jnp.cumsum(bump_hits.astype(jnp.int32)) == 1)
    bumped = first.any()
    bi = jnp.argmax(first)
    d = jnp.sqrt(d2[bi]) + 1e-3
    bvx = jnp.where(bumped, ddx[bi] / d * _VP_KICK, bvx)
    bvy = jnp.where(bumped, ddy[bi] / d * _VP_KICK, bvy)
    bump_cd = jnp.where(bumped, _VP_BCD, bump_cd)
    # 750/bumper puts clone random play on the ALE random anchor
    # (video_pinball.cc round-5 calibration).
    reward = jnp.where(bumped, 750.0, 0.0)
    score = s.score + jnp.where(bumped, 750, 0)

    lf = (dx < 0) | (fire > 0)
    rf = (dx > 0) | (fire > 0)
    cx = bx + _VP_BALL / 2.0
    at_flip = playing & (by + _VP_BALL >= _VP_FLIPY) \
        & (by + _VP_BALL <= _VP_FLIPY + 4.0) & (bvy > 0.0)
    l_hit = at_flip & lf & (cx >= _VP_FL0) & (cx < _VP_FL1)
    r_hit = at_flip & ~l_hit & rf & (cx >= _VP_FR0) & (cx < _VP_FR1)
    rest = at_flip & ~l_hit & ~r_hit & ((cx < _VP_D0) | (cx >= _VP_D1))
    bvy = jnp.where(l_hit | r_hit, -2.4, jnp.where(rest, -bvy * 0.5, bvy))
    bvx = jnp.where(l_hit, bvx + 0.8, jnp.where(r_hit, bvx - 0.8, bvx))
    flips = l_hit | r_hit
    reward = reward + jnp.where(flips, 1.0, 0.0)
    score = score + flips.astype(jnp.int32)

    drains = playing & (by > 80.0)
    balls = s.balls - drains.astype(jnp.int32)
    over = s.over | (drains & (balls <= 0))
    rk = _vp_rack_fields()
    rerack = drains & (balls > 0)
    in_lane = jnp.where(rerack, rk["in_lane"], in_lane)
    bx = jnp.where(rerack, rk["bx"], bx)
    by = jnp.where(rerack, rk["by"], by)
    bvx = jnp.where(rerack, rk["bvx"], bvx)
    bvy = jnp.where(rerack, rk["bvy"], bvy)
    bump_cd = jnp.where(rerack, rk["bump_cd"], bump_cd)

    out = VideoPinballCore(
        in_lane=in_lane, bx=bx, by=by, bvx=bvx, bvy=bvy, bump_cd=bump_cd,
        balls=balls, score=score, over=over,
    )
    out = jax.tree.map(lambda n_, o_: jnp.where(live, n_, o_), out, s)
    return out, jnp.where(live, reward, 0.0)


def _vp_render(s: VideoPinballCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    walls = (
        ((x == int(_VP_L) - 1) | (x == int(_VP_R) + 1) | (x == 81))
        & (y >= int(_VP_T)) & (y < 80)
    ) | ((y == int(_VP_T)) & (x >= int(_VP_L) - 1) & (x <= 81))
    f = jnp.where(walls, jnp.uint8(90), f)
    for b in range(_VP_BUMP):
        f = jnp.where(
            _rect_mask(y, x, float(_VP_BX[b]) - _VP_BR, float(_VP_BY[b]) - _VP_BR,
                       2 * _VP_BR, 2 * _VP_BR),
            jnp.uint8(150), f,
        )
    f = jnp.where(_rect_mask(y, x, _VP_FL0, _VP_FLIPY, _VP_FL1 - _VP_FL0, 2.0),
                  jnp.uint8(180), f)
    f = jnp.where(_rect_mask(y, x, _VP_FR0, _VP_FLIPY, _VP_FR1 - _VP_FR0, 2.0),
                  jnp.uint8(180), f)
    ball_x = jnp.where(s.in_lane, _VP_LANE, s.bx)
    ball_y = jnp.where(s.in_lane, 60.0, s.by)
    f = jnp.where(_rect_mask(y, x, ball_x, ball_y, _VP_BALL, _VP_BALL),
                  jnp.uint8(255), f)
    tick = (y == 1) & (x >= 2) & ((x - 2) % 2 == 0) \
        & ((x - 2) // 2 < jnp.minimum(s.score // 100, 40))
    f = jnp.where(tick, jnp.uint8(200), f)
    pips = (y == 82) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.balls, _VP_BALLS)) \
        & ((x - 2) % 5 < 3)
    f = jnp.where(pips, jnp.uint8(160), f)
    return f


VIDEO_PINBALL = dict(
    reset=_vp_reset,
    act=_vp_act,
    render=_vp_render,
    lives=lambda s: s.balls,
    over=lambda s: s.over,
    minimal_actions=9,
    minimal_to_full=np.array([0, 1, 2, 3, 4, 5, 10, 11, 12], np.int32),
)
