"""Additional pure-JAX game cores for the on-device engine.

Rules mirror the C++ engine game-for-game (csrc/envs/pong.cc,
space_invaders.cc, beamrider.cc, bigfish.cc, maze.cc) so the Anakin trainer
(cleanba_tpu/train_ppo_anakin.py) covers the same task set as the Sebulba
host-env path. Each game exposes the same functional dict contract as
jax_engine._BREAKOUT: reset / act (one raw frame) / render / lives / over.

The procgen-family envs (Bigfish, Maze) implement the procgen protocol from
csrc/envs/procgen_like.h: 64x64x3 RGB obs, the 15-action combo space, a fresh
procedural level every episode, no Atari preprocessing (reference
legacy_scripts/cleanba_ppo_envpool_procgen.py:115-130).
"""

from __future__ import annotations

from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

SCREEN = 84
_Y = np.arange(SCREEN, dtype=np.int32)[:, None]
_X = np.arange(SCREEN, dtype=np.int32)[None, :]


def _rect_mask(y, x, fx, fy, fw, fh):
    """draw_rect semantics: integer-truncated [x0,x1) x [y0,y1) box."""
    x0 = jnp.asarray(fx).astype(jnp.int32)
    x1 = (jnp.asarray(fx) + fw).astype(jnp.int32)
    y0 = jnp.asarray(fy).astype(jnp.int32)
    y1 = (jnp.asarray(fy) + fh).astype(jnp.int32)
    return (y >= y0) & (y < y1) & (x >= x0) & (x < x1)


# ---------------------------------------------------------------------------
# Pong (csrc/envs/pong.cc)
# ---------------------------------------------------------------------------

_PG_WALL_TOP = 4
_PG_WALL_BOT = 80
_PG_PAD_H = 8
_PG_PAD_W = 2
_PG_PLAYER_X = 78.0
_PG_CPU_X = 4.0
_PG_BALL = 2.0


@flax.struct.dataclass
class PongCore:
    player_score: jax.Array
    cpu_score: jax.Array
    over: jax.Array
    player_y: jax.Array
    cpu_y: jax.Array
    ball_x: jax.Array
    ball_y: jax.Array
    vx: jax.Array
    vy: jax.Array
    speed: jax.Array


def _pong_serve(key, towards_player):
    k1, k2 = jax.random.split(key)
    ball_y = _PG_WALL_TOP + jax.random.randint(
        k1, (), 0, _PG_WALL_BOT - _PG_WALL_TOP - 4
    ).astype(jnp.float32)
    speed = jnp.float32(1.1)
    vx = jnp.where(towards_player, speed, -speed)
    vy = jnp.where(jax.random.bernoulli(k2), 0.6, -0.6)
    return jnp.float32(42.0), ball_y, vx, vy, speed


def _pong_reset(key):
    bx, by, vx, vy, speed = _pong_serve(key, jnp.bool_(True))
    return PongCore(
        player_score=jnp.int32(0), cpu_score=jnp.int32(0), over=jnp.bool_(False),
        player_y=jnp.float32(42.0 - _PG_PAD_H / 2.0),
        cpu_y=jnp.float32(42.0 - _PG_PAD_H / 2.0),
        ball_x=bx, ball_y=by, vx=vx, vy=vy, speed=speed,
    )


def _pong_clamp(y):
    return jnp.clip(y, float(_PG_WALL_TOP), float(_PG_WALL_BOT - _PG_PAD_H))


def _pong_bounce(s: PongCore, paddle_y):
    offset = jnp.clip(
        (s.ball_y + _PG_BALL / 2.0 - (paddle_y + _PG_PAD_H / 2.0)) / (_PG_PAD_H / 2.0),
        -1.0, 1.0,
    )
    speed = jnp.minimum(s.speed * 1.03, 2.0)
    vy = offset * 1.1 * speed
    mag = jnp.minimum(jnp.abs(s.vx) * 1.03, 2.0)
    vx = jnp.where(s.vx > 0, mag, -mag)
    return s.replace(speed=speed, vy=vy, vx=vx)


def _pong_collide(s: PongCore, key) -> Tuple[PongCore, jax.Array]:
    # Walls.
    hit_top = s.ball_y < _PG_WALL_TOP
    ball_y = jnp.where(hit_top, float(_PG_WALL_TOP), s.ball_y)
    vy = jnp.where(hit_top, jnp.abs(s.vy), s.vy)
    hit_bot = ball_y + _PG_BALL > _PG_WALL_BOT
    ball_y = jnp.where(hit_bot, _PG_WALL_BOT - _PG_BALL, ball_y)
    vy = jnp.where(hit_bot, -jnp.abs(vy), vy)
    s = s.replace(ball_y=ball_y, vy=vy)

    # Player paddle (right).
    p_hit = (
        (s.vx > 0)
        & (s.ball_x + _PG_BALL >= _PG_PLAYER_X) & (s.ball_x < _PG_PLAYER_X + _PG_PAD_W)
        & (s.ball_y + _PG_BALL > s.player_y) & (s.ball_y < s.player_y + _PG_PAD_H)
    )
    bounced_p = _pong_bounce(s.replace(ball_x=jnp.float32(_PG_PLAYER_X - _PG_BALL)), s.player_y)
    bounced_p = bounced_p.replace(vx=-jnp.abs(bounced_p.vx))
    s = jax.tree.map(lambda a, b: jnp.where(p_hit, a, b), bounced_p, s)

    # CPU paddle (left).
    c_hit = (
        (s.vx < 0)
        & (s.ball_x <= _PG_CPU_X + _PG_PAD_W) & (s.ball_x + _PG_BALL > _PG_CPU_X)
        & (s.ball_y + _PG_BALL > s.cpu_y) & (s.ball_y < s.cpu_y + _PG_PAD_H)
    )
    bounced_c = _pong_bounce(s.replace(ball_x=jnp.float32(_PG_CPU_X + _PG_PAD_W)), s.cpu_y)
    bounced_c = bounced_c.replace(vx=jnp.abs(bounced_c.vx))
    s = jax.tree.map(lambda a, b: jnp.where(c_hit, a, b), bounced_c, s)

    # Points.
    k1, k2 = jax.random.split(key)
    cpu_point = s.ball_x > SCREEN
    player_point = ~cpu_point & (s.ball_x + _PG_BALL < 0)
    cpu_score = s.cpu_score + cpu_point.astype(jnp.int32)
    player_score = s.player_score + player_point.astype(jnp.int32)
    over = s.over | (cpu_point & (cpu_score >= 21)) | (player_point & (player_score >= 21))
    # Re-serve unless the match ended.
    sx1, sy1, svx1, svy1, ss1 = _pong_serve(k1, jnp.bool_(True))
    sx2, sy2, svx2, svy2, ss2 = _pong_serve(k2, jnp.bool_(False))
    do1 = cpu_point & ~over
    do2 = player_point & ~over
    s = s.replace(
        cpu_score=cpu_score, player_score=player_score, over=over,
        ball_x=jnp.where(do1, sx1, jnp.where(do2, sx2, s.ball_x)),
        ball_y=jnp.where(do1, sy1, jnp.where(do2, sy2, s.ball_y)),
        vx=jnp.where(do1, svx1, jnp.where(do2, svx2, s.vx)),
        vy=jnp.where(do1, svy1, jnp.where(do2, svy2, s.vy)),
        speed=jnp.where(do1, ss1, jnp.where(do2, ss2, s.speed)),
    )
    reward = jnp.where(cpu_point, -1.0, jnp.where(player_point, 1.0, 0.0))
    return s, reward


def _pong_act(s: PongCore, dx, dy, fire, key):
    del fire
    live = ~s.over
    # RIGHT/LEFT also act as UP/DOWN (pong.cc:34-36).
    move = jnp.where(dy != 0, dy, dx).astype(jnp.float32)
    player_y = _pong_clamp(s.player_y + 2.0 * move)
    # CPU tracks the ball with capped speed and a deadzone.
    target = s.ball_y + _PG_BALL / 2.0 - _PG_PAD_H / 2.0
    err = target - s.cpu_y
    cpu_y = _pong_clamp(
        jnp.where(jnp.abs(err) > 2.0, s.cpu_y + jnp.where(err > 0, 1.15, -1.15), s.cpu_y)
    )
    s1 = s.replace(player_y=jnp.where(live, player_y, s.player_y),
                   cpu_y=jnp.where(live, cpu_y, s.cpu_y))

    def substep(st, k):
        moved = st.replace(ball_x=st.ball_x + st.vx / 2.0, ball_y=st.ball_y + st.vy / 2.0)
        nxt, r = _pong_collide(moved, k)
        halt = st.over
        nxt = jax.tree.map(lambda a, b: jnp.where(halt, a, b), st, nxt)
        return nxt, jnp.where(halt, 0.0, r)

    ks = jax.random.split(key, 2)
    s2, rewards = jax.lax.scan(substep, s1, ks)
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), s2, s)
    return out, jnp.where(live, rewards.sum(), 0.0)


def _pong_render(s: PongCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.full((SCREEN, SCREEN), 20, jnp.uint8)  # court background
    f = jnp.where((y < _PG_WALL_TOP) | (y >= _PG_WALL_BOT), jnp.uint8(142), f)
    # Score ticks: cpu left half, player right half.
    f = jnp.where((y == 1) & (x >= 2) & (x < 2 + jnp.minimum(s.cpu_score, 21)),
                  jnp.uint8(0), f)
    f = jnp.where((y == 1) & (x <= 81) & (x > 81 - jnp.minimum(s.player_score, 21)),
                  jnp.uint8(0), f)
    f = jnp.where(_rect_mask(y, x, _PG_CPU_X, s.cpu_y, _PG_PAD_W, _PG_PAD_H), jnp.uint8(120), f)
    f = jnp.where(_rect_mask(y, x, _PG_PLAYER_X, s.player_y, _PG_PAD_W, _PG_PAD_H), jnp.uint8(200), f)
    ball = ~s.over & _rect_mask(y, x, s.ball_x, s.ball_y, _PG_BALL, _PG_BALL)
    f = jnp.where(ball, jnp.uint8(236), f)
    return f


PONG = dict(
    reset=_pong_reset,
    act=_pong_act,
    render=_pong_render,
    lives=lambda s: jnp.int32(1),
    over=lambda s: s.over,
    minimal_actions=6,
    minimal_to_full=np.array([0, 1, 3, 4, 11, 12], np.int32),
)


# ---------------------------------------------------------------------------
# Space Invaders (csrc/envs/space_invaders.cc)
# ---------------------------------------------------------------------------

_SI_ROWS, _SI_COLS = 5, 9
_SI_AW, _SI_AH = 5, 3
_SI_GX, _SI_GY = 8, 6
_SI_PLAYER_Y = 76.0
_SI_PW, _SI_PH = 6, 3
_SI_SHIELD_Y = 66
_SI_SW, _SI_SH, _SI_NS = 10, 5, 3
_SI_ROW_SCORE = np.array([30, 20, 20, 10, 10], np.float32)
_SI_SHIELD_X = np.array([10 + s * (_SI_SW + 18) for s in range(_SI_NS)], np.int32)


@flax.struct.dataclass
class SpaceInvadersCore:
    aliens: jax.Array    # [5, 9] bool
    shields: jax.Array   # [3, 5, 10] bool
    lives: jax.Array
    over: jax.Array
    grid_x: jax.Array    # i32
    grid_y: jax.Array
    dir: jax.Array
    march_clock: jax.Array
    step_period: jax.Array
    player_x: jax.Array  # f32
    shot_live: jax.Array
    bomb_live: jax.Array
    shot_x: jax.Array
    shot_y: jax.Array
    bomb_x: jax.Array
    bomb_y: jax.Array
    bomb_cooldown: jax.Array


def _si_new_wave(s: SpaceInvadersCore, first) -> SpaceInvadersCore:
    return s.replace(
        aliens=jnp.ones((_SI_ROWS, _SI_COLS), jnp.bool_),
        grid_x=jnp.int32(6),
        grid_y=jnp.where(first, jnp.int32(10), jnp.int32(14)),
        dir=jnp.int32(1),
        march_clock=jnp.int32(0),
        step_period=jnp.int32(2 + (_SI_ROWS * _SI_COLS) // 6),
    )


def _si_reset(key):
    s = SpaceInvadersCore(
        aliens=jnp.ones((_SI_ROWS, _SI_COLS), jnp.bool_),
        shields=jnp.ones((_SI_NS, _SI_SH, _SI_SW), jnp.bool_),
        lives=jnp.int32(3), over=jnp.bool_(False),
        grid_x=jnp.int32(6), grid_y=jnp.int32(10), dir=jnp.int32(1),
        march_clock=jnp.int32(0), step_period=jnp.int32(9),
        player_x=jnp.float32(42.0 - _SI_PW / 2.0),
        shot_live=jnp.bool_(False), bomb_live=jnp.bool_(False),
        shot_x=jnp.float32(0), shot_y=jnp.float32(0),
        bomb_x=jnp.float32(0), bomb_y=jnp.float32(0),
        bomb_cooldown=jnp.int32(40) + jax.random.randint(key, (), 0, 40),
    )
    return _si_new_wave(s, jnp.bool_(True)).replace(
        shields=jnp.ones((_SI_NS, _SI_SH, _SI_SW), jnp.bool_)
    )


def _si_hit_shield(shields, px, py):
    """Returns (hit, carved_shields): point test + 3x3 crater, mirroring
    space_invaders.cc:222-238 (shields never overlap, so at most one hits)."""
    lx = px.astype(jnp.int32) - jnp.asarray(_SI_SHIELD_X)          # [3]
    ly = py.astype(jnp.int32) - _SI_SHIELD_Y                        # scalar
    in_x = (lx >= 0) & (lx < _SI_SW)
    in_y = (ly >= 0) & (ly < _SI_SH)
    lxc = jnp.clip(lx, 0, _SI_SW - 1)
    lyc = jnp.clip(ly, 0, _SI_SH - 1)
    cell = shields[jnp.arange(_SI_NS), lyc, lxc]                    # [3]
    hit_s = in_x & in_y & cell                                      # [3]
    yy = jnp.arange(_SI_SH)[None, :, None]
    xx = jnp.arange(_SI_SW)[None, None, :]
    crater = (
        hit_s[:, None, None]
        & (jnp.abs(yy - lyc) <= 1)
        & (jnp.abs(xx - lxc[:, None, None]) <= 1)
    )
    return jnp.any(hit_s), shields & ~crater


def _si_act(s: SpaceInvadersCore, dx, dy, fire, key):
    del dy
    live = ~s.over
    orig = s
    k_bomb_col, k_bomb_cd = jax.random.split(key)

    player_x = jnp.clip(s.player_x + 1.5 * dx.astype(jnp.float32), 2.0, 84.0 - 2 - _SI_PW)
    s = s.replace(player_x=player_x)

    # Fire: one shot in flight (space_invaders.cc:49-53).
    new_shot = (fire > 0) & ~s.shot_live
    s = s.replace(
        shot_live=s.shot_live | new_shot,
        shot_x=jnp.where(new_shot, player_x + _SI_PW / 2.0, s.shot_x),
        shot_y=jnp.where(new_shot, _SI_PLAYER_Y - 1.0, s.shot_y),
    )

    # Shot flight + collisions.
    shot_y = jnp.where(s.shot_live, s.shot_y - 3.0, s.shot_y)
    sh_hit, carved = _si_hit_shield(s.shields, s.shot_x, shot_y)
    sh_hit = sh_hit & s.shot_live
    shields = jnp.where(sh_hit, carved, s.shields)
    # Alien cell containing the shot point (pitch > width, so unique).
    gx_off = s.shot_x.astype(jnp.int32) - s.grid_x
    gy_off = shot_y.astype(jnp.int32) - s.grid_y
    c = gx_off // _SI_GX
    r = gy_off // _SI_GY
    in_cell = (
        (gx_off >= 0) & (gy_off >= 0)
        & (c >= 0) & (c < _SI_COLS) & (r >= 0) & (r < _SI_ROWS)
        & (gx_off - c * _SI_GX < _SI_AW) & (gy_off - r * _SI_GY < _SI_AH)
    )
    rc = jnp.clip(r, 0, _SI_ROWS - 1)
    cc = jnp.clip(c, 0, _SI_COLS - 1)
    alien_hit = s.shot_live & ~sh_hit & in_cell & s.aliens[rc, cc]
    aliens = s.aliens.at[rc, cc].set(jnp.where(alien_hit, False, s.aliens[rc, cc]))
    reward = jnp.where(alien_hit, jnp.asarray(_SI_ROW_SCORE)[rc], 0.0)
    shot_live = s.shot_live & ~sh_hit & ~alien_hit & (shot_y >= 2.0)
    s = s.replace(shields=shields, aliens=aliens, shot_live=shot_live, shot_y=shot_y)

    # Grid march.
    march_clock = s.march_clock + 1
    do_march = march_clock >= s.step_period
    grid_x = jnp.where(do_march, s.grid_x + 2 * s.dir, s.grid_x)
    cols = jnp.arange(_SI_COLS)
    col_alive = jnp.any(s.aliens, axis=0)
    lo = jnp.min(jnp.where(col_alive, cols, _SI_COLS - 1))
    hi = jnp.max(jnp.where(col_alive, cols, 0))
    at_wall = do_march & (
        (grid_x + lo * _SI_GX < 2) | (grid_x + hi * _SI_GX + _SI_AW > 82)
    )
    dir_ = jnp.where(at_wall, -s.dir, s.dir)
    grid_y = jnp.where(at_wall, s.grid_y + 3, s.grid_y)
    alive = jnp.sum(s.aliens).astype(jnp.int32)
    step_period = jnp.where(do_march, 2 + alive // 6, s.step_period)
    rows = jnp.arange(_SI_ROWS)
    row_bottom = jnp.max(jnp.where(jnp.any(s.aliens, axis=1), rows, 0))
    reached = do_march & (grid_y + row_bottom * _SI_GY + _SI_AH >= _SI_PLAYER_Y)
    s = s.replace(
        march_clock=jnp.where(do_march, 0, march_clock),
        grid_x=grid_x, grid_y=grid_y, dir=dir_, step_period=step_period,
        over=s.over | reached,
    )

    # Alien bombs.
    cooldown = s.bomb_cooldown - 1
    drop = ~s.bomb_live & (cooldown <= 0)
    col_has = jnp.any(s.aliens, axis=0)                      # [9]
    n_cols = jnp.sum(col_has).astype(jnp.int32)
    pick = jax.random.randint(k_bomb_col, (), 0, jnp.maximum(n_cols, 1))
    col_idx = jnp.argmax(jnp.cumsum(col_has.astype(jnp.int32)) > pick)
    low_row = jnp.max(jnp.where(s.aliens[:, col_idx], rows, 0))
    can_drop = drop & (n_cols > 0)
    s = s.replace(
        bomb_live=s.bomb_live | can_drop,
        bomb_x=jnp.where(can_drop, (s.grid_x + col_idx * _SI_GX + _SI_AW / 2.0).astype(jnp.float32), s.bomb_x),
        bomb_y=jnp.where(can_drop, (s.grid_y + low_row * _SI_GY + _SI_AH).astype(jnp.float32), s.bomb_y),
        bomb_cooldown=jnp.where(
            drop, 25 + jax.random.randint(k_bomb_cd, (), 0, 50), cooldown
        ),
    )
    bomb_y = jnp.where(s.bomb_live, s.bomb_y + 1.5, s.bomb_y)
    bsh_hit, bcarved = _si_hit_shield(s.shields, s.bomb_x, bomb_y)
    bsh_hit = bsh_hit & s.bomb_live
    shields = jnp.where(bsh_hit, bcarved, s.shields)
    player_hit = (
        s.bomb_live & ~bsh_hit
        & (bomb_y + 3 >= _SI_PLAYER_Y) & (bomb_y < _SI_PLAYER_Y + _SI_PH)
        & (s.bomb_x >= s.player_x) & (s.bomb_x < s.player_x + _SI_PW)
    )
    lives = s.lives - player_hit.astype(jnp.int32)
    over = s.over | (player_hit & (lives <= 0))
    bomb_live = s.bomb_live & ~bsh_hit & ~player_hit & (bomb_y <= 82.0)
    s = s.replace(shields=shields, bomb_live=bomb_live, bomb_y=bomb_y, lives=lives, over=over)

    # Next wave on clear (fresh shields).
    cleared = jnp.sum(s.aliens) == 0
    waved = _si_new_wave(s, jnp.bool_(False)).replace(
        shields=jnp.ones((_SI_NS, _SI_SH, _SI_SW), jnp.bool_)
    )
    s = jax.tree.map(lambda w, o: jnp.where(cleared, w, o), waved, s)

    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), s, orig)
    return out, jnp.where(live, reward, 0.0)


# Alien sprite cell mask [6, 8] (5x3 sprite in an 8x6 pitch), tiled to the
# whole grid block — a static constant, so rendering the grid is one
# elementwise op + one dynamic_update_slice paste (no per-pixel gathers,
# which are HBM-murder on TPU).
_SI_CELL = np.zeros((_SI_GY, _SI_GX), np.uint8)
_SI_CELL[:_SI_AH, :_SI_AW] = 1
_SI_BLOCK_MASK = np.tile(_SI_CELL, (_SI_ROWS, _SI_COLS))        # [30, 72]
_SI_BLOCK_SHADE = np.repeat(
    (150 + 15 * np.arange(_SI_ROWS, dtype=np.uint8))[:, None], _SI_GY, axis=0
)  # [30, 1]
_SI_PAD = 80  # grid offsets stay within +-80 of the screen


def _si_render(s: SpaceInvadersCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where(y == 82, jnp.uint8(80), f)  # ground line
    # Lives ticks.
    l = (x - 2) // 5
    f = jnp.where(
        (y == 1) & (x >= 2) & (l < s.lives) & (l >= 0) & ((x - 2) % 5 < 3),
        jnp.uint8(120), f,
    )
    # Aliens: upsample the [5, 9] grid to its pixel block and paste it at
    # (grid_y, grid_x) into a padded canvas (offsets can leave the screen).
    cells = jnp.repeat(jnp.repeat(s.aliens, _SI_GY, axis=0), _SI_GX, axis=1)
    block = (
        cells.astype(jnp.uint8) * jnp.asarray(_SI_BLOCK_MASK) * jnp.asarray(_SI_BLOCK_SHADE)
    )
    canvas = jnp.zeros((SCREEN + 2 * _SI_PAD, SCREEN + 2 * _SI_PAD), jnp.uint8)
    canvas = jax.lax.dynamic_update_slice(
        canvas, block, (s.grid_y + _SI_PAD, s.grid_x + _SI_PAD)
    )
    aliens_px = jax.lax.dynamic_slice(canvas, (_SI_PAD, _SI_PAD), (SCREEN, SCREEN))
    f = jnp.where(aliens_px > 0, aliens_px, f)
    # Shields: static positions -> static slice writes.
    for sid in range(_SI_NS):
        sx = int(_SI_SHIELD_X[sid])
        patch = jnp.where(s.shields[sid], jnp.uint8(110),
                          f[_SI_SHIELD_Y:_SI_SHIELD_Y + _SI_SH, sx:sx + _SI_SW])
        f = f.at[_SI_SHIELD_Y:_SI_SHIELD_Y + _SI_SH, sx:sx + _SI_SW].set(patch)
    f = jnp.where(_rect_mask(y, x, s.player_x, _SI_PLAYER_Y, _SI_PW, _SI_PH), jnp.uint8(220), f)
    shot = s.shot_live & _rect_mask(y, x, s.shot_x, s.shot_y, 1, 3)
    f = jnp.where(shot, jnp.uint8(255), f)
    bomb = s.bomb_live & _rect_mask(y, x, s.bomb_x, s.bomb_y, 1, 3)
    f = jnp.where(bomb, jnp.uint8(200), f)
    return f


SPACE_INVADERS = dict(
    reset=_si_reset,
    act=_si_act,
    render=_si_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=6,
    minimal_to_full=np.array([0, 1, 3, 4, 11, 12], np.int32),
)


# ---------------------------------------------------------------------------
# Beam Rider (csrc/envs/beamrider.cc)
# ---------------------------------------------------------------------------

_BR_LANES = 5
_BR_PLAYER_Y = 74.0
_BR_PW, _BR_PH = 6, 4
_BR_SW, _BR_SH = 5, 3
_BR_TOP = 12.0
_BR_SECTOR = 15
_BR_NSAUCERS = 4
_BR_LANE_X = np.array([12.0 + l * 15.0 for l in range(_BR_LANES)], np.float32)


@flax.struct.dataclass
class BeamRiderCore:
    s_live: jax.Array   # [4] bool
    s_lane: jax.Array   # [4] i32
    s_y: jax.Array      # [4] f32
    s_speed: jax.Array  # [4] f32
    lives: jax.Array
    over: jax.Array
    sector: jax.Array
    sector_remaining: jax.Array
    to_spawn: jax.Array
    spawn_clock: jax.Array
    spawn_period: jax.Array
    base_speed: jax.Array
    player_lane: jax.Array
    player_x: jax.Array
    shot_live: jax.Array
    shot_lane: jax.Array
    shot_y: jax.Array


def _br_begin_sector(s: BeamRiderCore) -> BeamRiderCore:
    return s.replace(
        s_live=jnp.zeros(_BR_NSAUCERS, jnp.bool_),
        sector_remaining=jnp.int32(_BR_SECTOR),
        to_spawn=jnp.int32(_BR_SECTOR),
        spawn_period=34 - 2 * jnp.minimum(s.sector, 12),
        spawn_clock=jnp.int32(10),
        base_speed=0.35 + 0.05 * jnp.minimum(s.sector, 10).astype(jnp.float32),
    )


def _br_reset(key):
    del key
    s = BeamRiderCore(
        s_live=jnp.zeros(_BR_NSAUCERS, jnp.bool_),
        s_lane=jnp.zeros(_BR_NSAUCERS, jnp.int32),
        s_y=jnp.zeros(_BR_NSAUCERS, jnp.float32),
        s_speed=jnp.full(_BR_NSAUCERS, 0.4, jnp.float32),
        lives=jnp.int32(3), over=jnp.bool_(False),
        sector=jnp.int32(1),
        sector_remaining=jnp.int32(_BR_SECTOR), to_spawn=jnp.int32(_BR_SECTOR),
        spawn_clock=jnp.int32(10), spawn_period=jnp.int32(30),
        base_speed=jnp.float32(0.4),
        player_lane=jnp.int32(2),
        player_x=jnp.float32(float(_BR_LANE_X[2]) - _BR_PW / 2.0),
        shot_live=jnp.bool_(False), shot_lane=jnp.int32(2), shot_y=jnp.float32(0),
    )
    return _br_begin_sector(s)


def _br_at_target(s: BeamRiderCore):
    lanes = jnp.asarray(_BR_LANE_X)
    return jnp.abs(s.player_x - (lanes[s.player_lane] - _BR_PW / 2.0)) < 0.75


def _br_act(s: BeamRiderCore, dx, dy, fire, key):
    del dy
    live = ~s.over
    orig = s
    lanes = jnp.asarray(_BR_LANE_X)
    k_hop, k_hopdir, k_slane, k_sspeed = jax.random.split(key, 4)

    at_t = _br_at_target(s)
    lane = jnp.clip(
        s.player_lane + jnp.where(at_t, dx, 0), 0, _BR_LANES - 1
    )
    target = lanes[lane] - _BR_PW / 2.0
    d = target - s.player_x
    player_x = jnp.where(
        jnp.abs(d) > 1.5, s.player_x + jnp.where(d > 0, 1.5, -1.5), target
    )
    s = s.replace(player_lane=lane, player_x=player_x)

    # Fire.
    new_shot = (fire > 0) & ~s.shot_live
    s = s.replace(
        shot_live=s.shot_live | new_shot,
        shot_lane=jnp.where(new_shot, lane, s.shot_lane),
        shot_y=jnp.where(new_shot, _BR_PLAYER_Y - 2.0, s.shot_y),
    )
    shot_y = jnp.where(s.shot_live, s.shot_y - 3.5, s.shot_y)
    # Hit: first live saucer in array order on the shot lane within range
    # (beamrider.cc:65-72 breaks on the first match).
    hit_mask = (
        s.shot_live & s.s_live & (s.s_lane == s.shot_lane)
        & (shot_y <= s.s_y + _BR_SH) & (shot_y + 3 >= s.s_y)
    )
    any_hit = jnp.any(hit_mask)
    first_hit = jnp.argmax(hit_mask)
    s_live = s.s_live.at[first_hit].set(
        jnp.where(any_hit, False, s.s_live[first_hit])
    )
    reward = jnp.where(any_hit, 44.0, 0.0)
    sector_remaining = s.sector_remaining - any_hit.astype(jnp.int32)
    shot_live = s.shot_live & ~any_hit & (shot_y >= _BR_TOP)
    s = s.replace(s_live=s_live, shot_live=shot_live, shot_y=shot_y,
                  sector_remaining=sector_remaining)

    # Saucer movement: descend, occasional lane hop, reach player row.
    s_y = jnp.where(s.s_live, s.s_y + s.s_speed, s.s_y)
    hop = s.s_live & (jax.random.randint(k_hop, (_BR_NSAUCERS,), 0, 128) == 0)
    hop_dir = jnp.where(jax.random.bernoulli(k_hopdir, shape=(_BR_NSAUCERS,)), 1, -1)
    s_lane = jnp.clip(s.s_lane + jnp.where(hop, hop_dir, 0), 0, _BR_LANES - 1)
    reached = s.s_live & (s_y + _BR_SH >= _BR_PLAYER_Y)
    same_lane = reached & (s_lane == s.player_lane) & _br_at_target(s)
    n_reached = jnp.sum(reached).astype(jnp.int32)
    n_hits = jnp.sum(same_lane).astype(jnp.int32)
    lives = s.lives - n_hits
    s = s.replace(
        s_live=s.s_live & ~reached, s_y=s_y, s_lane=s_lane,
        to_spawn=s.to_spawn + n_reached,
        lives=lives, over=s.over | ((n_hits > 0) & (lives <= 0)),
    )

    # Spawning: first dead slot.
    spawn_clock = s.spawn_clock - 1
    do_spawn = (s.to_spawn > 0) & (spawn_clock <= 0) & jnp.any(~s.s_live)
    slot = jnp.argmax(~s.s_live)
    new_lane = jax.random.randint(k_slane, (), 0, _BR_LANES)
    new_speed = s.base_speed * (0.9 + 0.2 * jax.random.uniform(k_sspeed))
    s = s.replace(
        s_live=s.s_live.at[slot].set(jnp.where(do_spawn, True, s.s_live[slot])),
        s_lane=s.s_lane.at[slot].set(jnp.where(do_spawn, new_lane, s.s_lane[slot])),
        s_y=s.s_y.at[slot].set(jnp.where(do_spawn, jnp.float32(_BR_TOP), s.s_y[slot])),
        s_speed=s.s_speed.at[slot].set(jnp.where(do_spawn, new_speed, s.s_speed[slot])),
        to_spawn=s.to_spawn - do_spawn.astype(jnp.int32),
        spawn_clock=jnp.where(
            (s.to_spawn > 0) & (spawn_clock <= 0), s.spawn_period, spawn_clock
        ),
    )

    # Sector clear.
    cleared = s.sector_remaining <= 0
    next_s = _br_begin_sector(s.replace(sector=s.sector + 1))
    s = jax.tree.map(lambda n, o: jnp.where(cleared, n, o), next_s, s)

    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), s, orig)
    return out, jnp.where(live, reward, 0.0)


def _br_render(s: BeamRiderCore):
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    lanes = jnp.asarray(_BR_LANE_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    f = jnp.where(y == int(_BR_TOP), jnp.uint8(60), f)  # horizon
    # Perspective beams: for each lane, x(y) = hx + (bx-hx) * t.
    t = (y.astype(jnp.float32) - _BR_TOP) / (80.0 - _BR_TOP)  # [84,1]
    in_band = (y >= int(_BR_TOP)) & (y < 80)
    for l in range(_BR_LANES):
        bx = float(_BR_LANE_X[l])
        hx = 42.0 + (bx - 42.0) * 0.25
        beam_x = (hx + (bx - hx) * t).astype(jnp.int32)  # [84,1]
        f = jnp.where(in_band & (x == beam_x), jnp.uint8(50), f)
    # Lives ticks.
    l = (x - 2) // 5
    f = jnp.where((y == 1) & (x >= 2) & (l < s.lives) & (l >= 0) & ((x - 2) % 5 < 3),
                  jnp.uint8(120), f)
    # Sector progress ticks.
    i = (x - 2) // 2
    f = jnp.where(
        (y == 3) & (x >= 2) & ((x - 2) % 2 == 0)
        & (i < jnp.minimum(s.sector_remaining, 15)) & (i >= 0),
        jnp.uint8(90), f,
    )
    # Saucers (brighter as they approach).
    for k in range(_BR_NSAUCERS):
        shade = (150.0 + 100.0 * (s.s_y[k] / _BR_PLAYER_Y)).astype(jnp.uint8)
        m = s.s_live[k] & _rect_mask(
            y, x, lanes[s.s_lane[k]] - _BR_SW / 2.0, s.s_y[k], _BR_SW, _BR_SH
        )
        f = jnp.where(m, shade, f)
    f = jnp.where(_rect_mask(y, x, s.player_x, _BR_PLAYER_Y, _BR_PW, _BR_PH), jnp.uint8(230), f)
    shot = s.shot_live & _rect_mask(y, x, lanes[s.shot_lane], s.shot_y, 1, 3)
    f = jnp.where(shot, jnp.uint8(255), f)
    return f


BEAMRIDER = dict(
    reset=_br_reset,
    act=_br_act,
    render=_br_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=9,
    minimal_to_full=np.array([0, 1, 2, 3, 4, 6, 7, 11, 12], np.int32),
)
