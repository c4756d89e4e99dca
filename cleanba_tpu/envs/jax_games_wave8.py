"""Pure-JAX twins of the eighth wave of C++ engine games.

Rules mirror the C++ engine game-for-game (csrc/envs/alien.cc,
road_runner.cc); reset frames are pixel-identical across engines
(tests/test_jax_engine.py). Each game exposes the functional dict contract
of jax_engine._BREAKOUT.

The engines draw different RNG streams, so trajectories diverge — rules,
scoring, and rendering are what must match, and do. Alien's sequential
hunter-contact loop (with its mid-loop respawn break) and RoadRunner's
truck slots are unrolled statically with masked selects.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs.jax_games import SCREEN, _Y, _X, _rect_mask

__all__ = ["ALIEN", "ROAD_RUNNER"]


# ---------------------------------------------------------------------------
# Alien (csrc/envs/alien.cc)
# ---------------------------------------------------------------------------

_AL_ROWS, _AL_COLS, _AL_CELL = 17, 19, 4
_AL_OFFX, _AL_OFFY = 4, 8
_AL_HUNTERS = 3
_AL_LIVES = 3
_AL_PULSAR_FRAMES = 300
_AL_EATEN_HOLD = 80
_AL_EGG, _AL_PULSAR_R, _AL_TORCH = 10.0, 100.0, 200.0

_AL_SHIP = [
    "###################",
    "#.....#.....#.....#",
    "#.###.#.###.#.###.#",
    "#o..#...#G#...#..o#",
    "##.#.###...###.#.##",
    "#....#.......#....#",
    "#.####.#####.####.#",
    "#.........#.......#",
    "#.####.##.#.#####.#",
    "#....#.#.....#....#",
    "#.##.#.#.###.#.##.#",
    "#.#..........o..#.#",
    "#.#.####.#.####.#.#",
    "#......#.P.#......#",
    "#.####.#.#.#.####.#",
    "#o.......#.......o#",
    "###################",
]
_AL_WALL = np.array([[c == "#" for c in row] for row in _AL_SHIP], bool)
_AL_WALL_PAD = np.ones((_AL_ROWS + 2, _AL_COLS + 2), bool)
_AL_WALL_PAD[1:-1, 1:-1] = _AL_WALL
_AL_EGG0 = np.array([[c == "." for c in row] for row in _AL_SHIP], bool)
_AL_PUL0 = np.array([[c == "o" for c in row] for row in _AL_SHIP], bool)
_AL_NEGGS = int(_AL_EGG0.sum())
_AL_P_RC = divmod("".join(_AL_SHIP).index("P"), _AL_COLS)
_AL_G_RC = divmod("".join(_AL_SHIP).index("G"), _AL_COLS)
_AL_PX0 = _AL_OFFX + _AL_P_RC[1] * _AL_CELL
_AL_PY0 = _AL_OFFY + _AL_P_RC[0] * _AL_CELL
_AL_NX = _AL_OFFX + _AL_G_RC[1] * _AL_CELL
_AL_NY = _AL_OFFY + _AL_G_RC[0] * _AL_CELL
_AL_DY = np.array([0, -1, 0, 0, 1], np.int32)
_AL_DX = np.array([0, 0, 1, -1, 0], np.int32)


def _al_rev(d):
    return jnp.where(d == 0, 0, 5 - d)


def _al_aligned(x, y):
    return ((x - _AL_OFFX) % _AL_CELL == 0) & ((y - _AL_OFFY) % _AL_CELL == 0)


def _al_can_go(x, y, d):
    r = (y - _AL_OFFY) // _AL_CELL + jnp.asarray(_AL_DY)[d]
    c = (x - _AL_OFFX) // _AL_CELL + jnp.asarray(_AL_DX)[d]
    open_ = ~jnp.asarray(_AL_WALL_PAD)[r + 1, c + 1]
    return (d != 0) & open_


@flax.struct.dataclass
class AlienCore:
    egg: jax.Array      # [17, 19] bool
    pulsar: jax.Array   # [17, 19] bool
    eggs_left: jax.Array
    px: jax.Array
    py: jax.Array
    pdir: jax.Array
    hx: jax.Array       # [3] i32
    hy: jax.Array
    hdir: jax.Array
    hold: jax.Array
    pulsar_timer: jax.Array
    chain: jax.Array
    frame: jax.Array
    lives: jax.Array
    score: jax.Array
    level: jax.Array
    over: jax.Array


def _al_entities():
    """place_entities values (alien.cc:233-254)."""
    return dict(
        px=jnp.int32(_AL_PX0), py=jnp.int32(_AL_PY0), pdir=jnp.int32(0),
        hx=jnp.full(_AL_HUNTERS, _AL_NX, jnp.int32),
        hy=jnp.full(_AL_HUNTERS, _AL_NY, jnp.int32),
        hdir=jnp.arange(1, _AL_HUNTERS + 1, dtype=jnp.int32),
        hold=jnp.zeros(_AL_HUNTERS, jnp.int32),
        pulsar_timer=jnp.int32(0), chain=jnp.int32(0), frame=jnp.int32(0),
    )


def _al_reset(key):
    del key  # deterministic layout (alien.cc:64-71)
    return AlienCore(
        egg=jnp.asarray(_AL_EGG0), pulsar=jnp.asarray(_AL_PUL0),
        eggs_left=jnp.int32(_AL_NEGGS),
        lives=jnp.int32(_AL_LIVES), score=jnp.int32(0),
        level=jnp.int32(0), over=jnp.bool_(False),
        **_al_entities(),
    )


def _al_pick_dir(h, hx, hy, hdir, pulsar_timer, px, py, key):
    """Hunter direction at a cell centre (alien.cc:198-221)."""
    rev = _al_rev(hdir)
    dirs = jnp.arange(1, 5)
    open_ = jax.vmap(lambda d: _al_can_go(hx, hy, d))(dirs)
    options = open_ & (dirs != rev)
    n = options.sum()
    nx = hx + jnp.asarray(_AL_DX)[dirs] * _AL_CELL
    ny = hy + jnp.asarray(_AL_DY)[dirs] * _AL_CELL
    dist = jnp.abs(nx - px) + jnp.abs(ny - py)
    sc = jnp.where(pulsar_timer > 0, -dist, dist)
    sc = jnp.where(options, sc, 1 << 30)
    best = dirs[jnp.argmin(sc)]
    k_choice, k_idx = jax.random.split(key)
    chase_p = 0.5 + 0.12 * float(h)
    idx = jax.random.randint(k_idx, (), 0, jnp.maximum(n, 1))
    cum = jnp.cumsum(options.astype(jnp.int32)) - 1
    uniform = dirs[jnp.argmax((cum == idx) & options)]
    chosen = jnp.where(jax.random.uniform(k_choice) < chase_p, best, uniform)
    return jnp.where(n == 0, rev, chosen)


def _al_act(s: AlienCore, dx, dy, fire, key):
    """One raw frame (alien.cc:73-160)."""
    fire = jnp.asarray(fire).astype(jnp.bool_)  # int32 from the action decode
    live = ~s.over
    frame = s.frame + 1
    keys = jax.random.split(key, _AL_HUNTERS)

    # ---- player -----------------------------------------------------------
    want = jnp.where(
        dy < 0, 1, jnp.where(dy > 0, 4, jnp.where(dx > 0, 2, jnp.where(dx < 0, 3, 0)))
    ).astype(jnp.int32)
    at_cell = _al_aligned(s.px, s.py)
    pdir = jnp.where(at_cell & (want != 0) & _al_can_go(s.px, s.py, want), want, s.pdir)
    pdir = jnp.where(at_cell & ~_al_can_go(s.px, s.py, pdir), 0, pdir)
    px = s.px + jnp.asarray(_AL_DX)[pdir]
    py = s.py + jnp.asarray(_AL_DY)[pdir]

    now_cell = _al_aligned(px, py)
    r = (py - _AL_OFFY) // _AL_CELL
    c = (px - _AL_OFFX) // _AL_CELL
    crush = now_cell & s.egg[r, c]
    egg = s.egg.at[r, c].set(s.egg[r, c] & ~crush)
    eggs_left = s.eggs_left - crush.astype(jnp.int32)
    reward = crush.astype(jnp.float32) * _AL_EGG
    grab = now_cell & ~crush & s.pulsar[r, c]
    pulsar = s.pulsar.at[r, c].set(s.pulsar[r, c] & ~grab)
    reward = reward + grab.astype(jnp.float32) * _AL_PULSAR_R
    pulsar_timer = jnp.where(grab, _AL_PULSAR_FRAMES, s.pulsar_timer)
    chain = jnp.where(grab, 0, s.chain)
    hdir = jnp.where(grab & (s.hold == 0), _al_rev(s.hdir), s.hdir)

    torching = fire & (pulsar_timer > 0)

    # ---- hunters ----------------------------------------------------------
    pulsar_timer = jnp.maximum(pulsar_timer - 1, 0)
    frightened = pulsar_timer > 0
    hx, hy, hold = s.hx, s.hy, s.hold
    new_hx, new_hy, new_hd, new_hold = [], [], [], []
    for h in range(_AL_HUNTERS):
        parked = hold[h] > 0
        moves = ~parked & jnp.where(
            frightened, (frame + h) % 2 == 0, (frame + h) % 6 != 0
        )
        at = _al_aligned(hx[h], hy[h])
        d = jnp.where(
            moves & at,
            _al_pick_dir(h, hx[h], hy[h], hdir[h], pulsar_timer, px, py, keys[h]),
            hdir[h],
        )
        new_hd.append(d)
        new_hx.append(hx[h] + jnp.where(moves, jnp.asarray(_AL_DX)[d], 0))
        new_hy.append(hy[h] + jnp.where(moves, jnp.asarray(_AL_DY)[d], 0))
        new_hold.append(jnp.where(parked, hold[h] - 1, hold[h]))
    hx = jnp.stack(new_hx)
    hy = jnp.stack(new_hy)
    hdir = jnp.stack(new_hd)
    hold = jnp.stack(new_hold)

    # ---- contacts (alien.cc:119-146) --------------------------------------
    on_duty = hold == 0
    ddx, ddy = hx - px, hy - py
    touching = (
        on_duty & (ddx > -_AL_CELL) & (ddx < _AL_CELL)
        & (ddy > -_AL_CELL) & (ddy < _AL_CELL)
    )
    tx = px + jnp.asarray(_AL_DX)[pdir] * _AL_CELL
    ty = py + jnp.asarray(_AL_DY)[pdir] * _AL_CELL
    tdx, tdy = hx - tx, hy - ty
    torched = (
        torching & on_duty & ~touching
        & (tdx > -_AL_CELL) & (tdx < _AL_CELL)
        & (tdy > -_AL_CELL) & (tdy < _AL_CELL)
    )
    burned = (touching | torched) & frightened
    # Chain bonus: the C++ loop pays 200 * 2^min(chain, 3) per hunter in
    # order (alien.cc:134), re-applying the cap at every burn. Unroll the
    # per-burn payments statically (nburn <= _AL_HUNTERS = 3) so multi-burn
    # frames that cross the cap pay exactly what the C++ engine pays.
    nburn = burned.sum().astype(jnp.int32)
    pay = jnp.float32(0.0)
    for i in range(_AL_HUNTERS):
        pay = pay + jnp.where(
            i < nburn,
            _AL_TORCH * (1 << jnp.minimum(chain + i, 3)).astype(jnp.float32),
            0.0,
        )
    reward = reward + pay
    chain = chain + nburn
    ent = _al_entities()
    hx = jnp.where(burned, ent["hx"], hx)
    hy = jnp.where(burned, ent["hy"], hy)
    hdir = jnp.where(burned, 1 + (jnp.arange(_AL_HUNTERS) % 4), hdir)
    hold = jnp.where(burned, _AL_EATEN_HOLD, hold)

    caught = (touching & ~frightened).any()
    lives = s.lives - caught.astype(jnp.int32)
    over = s.over | (caught & (lives <= 0))

    cleared = (eggs_left == 0) & ~over
    level = s.level + cleared.astype(jnp.int32)
    egg = jnp.where(cleared, jnp.asarray(_AL_EGG0), egg)
    pulsar = jnp.where(cleared, jnp.asarray(_AL_PUL0), pulsar)
    eggs_left = jnp.where(cleared, _AL_NEGGS, eggs_left)

    respawn = caught | cleared
    nxt = AlienCore(
        egg=egg, pulsar=pulsar, eggs_left=eggs_left,
        px=jnp.where(respawn, ent["px"], px),
        py=jnp.where(respawn, ent["py"], py),
        pdir=jnp.where(respawn, ent["pdir"], pdir),
        hx=jnp.where(respawn, ent["hx"], hx),
        hy=jnp.where(respawn, ent["hy"], hy),
        hdir=jnp.where(respawn, ent["hdir"], hdir),
        hold=jnp.where(respawn, ent["hold"], hold),
        pulsar_timer=jnp.where(respawn, ent["pulsar_timer"], pulsar_timer),
        chain=jnp.where(respawn, ent["chain"], chain),
        frame=jnp.where(respawn, ent["frame"], frame),
        lives=lives,
        score=s.score + reward.astype(jnp.int32),
        level=level, over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), nxt, s)
    return out, jnp.where(live, reward, 0.0)


def _al_render(s: AlienCore) -> jax.Array:
    """84x84 frame (alien.cc:162-186)."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    in_r = (y >= _AL_OFFY) & (y < _AL_OFFY + _AL_ROWS * _AL_CELL)
    in_c = (x >= _AL_OFFX) & (x < _AL_OFFX + _AL_COLS * _AL_CELL)
    rr = jnp.clip((y - _AL_OFFY) // _AL_CELL, 0, _AL_ROWS - 1)
    cc = jnp.clip((x - _AL_OFFX) // _AL_CELL, 0, _AL_COLS - 1)
    inside = in_r & in_c
    f = jnp.where(inside & jnp.asarray(_AL_WALL)[rr, cc], jnp.uint8(70), f)
    sub_y = (y - _AL_OFFY) % _AL_CELL
    sub_x = (x - _AL_OFFX) % _AL_CELL
    egg_px = (sub_y >= 1) & (sub_y < 3) & (sub_x >= 1) & (sub_x < 3)
    f = jnp.where(inside & s.egg[rr, cc] & egg_px, jnp.uint8(150), f)
    f = jnp.where(inside & s.pulsar[rr, cc] & ~s.egg[rr, cc], jnp.uint8(180), f)
    for h in range(_AL_HUNTERS):
        shade = jnp.where(
            s.hold[h] > 0, jnp.uint8(85),
            jnp.where(s.pulsar_timer > 0, jnp.uint8(100), jnp.uint8(190 + 12 * h)),
        )
        m = _rect_mask(y, x, s.hx[h], s.hy[h], _AL_CELL, _AL_CELL)
        f = jnp.where(m, shade, f)
    f = jnp.where(_rect_mask(y, x, s.px, s.py, _AL_CELL, _AL_CELL), jnp.uint8(230), f)
    tick = (y == 1) & (x >= 2) & (x < 2 + 2 * jnp.minimum(s.score // 100, 40)) & ((x - 2) % 2 == 0)
    f = jnp.where(tick, jnp.uint8(200), f)
    lm = (y == 81) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _AL_LIVES)) & ((x - 2) % 5 < 3)
    f = jnp.where(lm, jnp.uint8(160), f)
    return f


ALIEN = dict(
    reset=_al_reset,
    act=_al_act,
    render=_al_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)


# ---------------------------------------------------------------------------
# Road Runner (csrc/envs/road_runner.cc)
# ---------------------------------------------------------------------------

_RD_LANES = 3
_RD_LANE_Y = np.array([40.0, 54.0, 68.0], np.float32)
_RD_PX = 24.0
_RD_BW, _RD_BH = 4.0, 5.0
_RD_SPRINT, _RD_JOG, _RD_EASE = 2.6, 1.0, 0.4
_RD_SEED_EVERY = 90.0
_RD_SEED_REWARD = 100.0
_RD_TRUCKS = 3
_RD_TW, _RD_TH = 7.0, 6.0
_RD_LIVES = 3
_RD_COY0, _RD_CATCH = -30.0, -4.0


@flax.struct.dataclass
class RoadRunnerCore:
    dist: jax.Array
    next_seed: jax.Array
    lane: jax.Array
    lane_cool: jax.Array
    coyote_x: jax.Array
    truck_live: jax.Array   # [3] bool
    truck_lane: jax.Array   # [3] i32
    truck_x: jax.Array
    truck_v: jax.Array
    spawn_clock: jax.Array
    lives: jax.Array
    score: jax.Array
    over: jax.Array


def _rd_respawn():
    """respawn() values (road_runner.cc:126-133)."""
    return dict(
        lane=jnp.int32(1), lane_cool=jnp.int32(0),
        coyote_x=jnp.float32(_RD_COY0),
        truck_live=jnp.zeros(_RD_TRUCKS, jnp.bool_),
        spawn_clock=jnp.int32(60),
    )


def _rd_reset(key):
    del key  # deterministic start (road_runner.cc:41-49)
    return RoadRunnerCore(
        dist=jnp.float32(0.0), next_seed=jnp.float32(_RD_SEED_EVERY),
        truck_lane=jnp.zeros(_RD_TRUCKS, jnp.int32),
        truck_x=jnp.zeros(_RD_TRUCKS, jnp.float32),
        truck_v=jnp.zeros(_RD_TRUCKS, jnp.float32),
        lives=jnp.int32(_RD_LIVES), score=jnp.int32(0), over=jnp.bool_(False),
        **_rd_respawn(),
    )


def _rd_act(s: RoadRunnerCore, dx, dy, fire, key):
    """One raw frame (road_runner.cc:51-121). The C++ early-returns on a
    coyote catch (trucks skipped); the truck stage is masked on that frame."""
    del fire
    live = ~s.over
    k_clock, k_lane, k_v = jax.random.split(key, 3)

    v = jnp.where(dy < 0, _RD_SPRINT, jnp.where(dy > 0, _RD_EASE, _RD_JOG))
    shift = jnp.where((dx != 0) & (s.lane_cool == 0), jnp.sign(dx), 0)
    lane = jnp.clip(s.lane + shift, 0, _RD_LANES - 1)
    # C++ sets cool=6 then decrements in the same frame (road_runner.cc:57-63).
    lane_cool = jnp.maximum(jnp.where(shift != 0, 6, s.lane_cool) - 1, 0)
    dist = s.dist + v

    coyote_x = s.coyote_x + (v - 2.0) * jnp.float32(-0.5)
    caught = coyote_x > _RD_CATCH
    coyote_x = jnp.maximum(coyote_x, _RD_COY0)

    pile_lane = (s.next_seed / _RD_SEED_EVERY).astype(jnp.int32) % _RD_LANES
    got = ~caught & (dist >= s.next_seed) & (pile_lane == lane)
    passed = ~caught & (dist >= s.next_seed)
    reward = got.astype(jnp.float32) * _RD_SEED_REWARD
    next_seed = jnp.where(passed, s.next_seed + _RD_SEED_EVERY, s.next_seed)

    # ---- trucks (skipped on a caught frame) -------------------------------
    spawn_clock = s.spawn_clock - 1
    spawning = ~caught & (spawn_clock <= 0)
    spawn_clock = jnp.where(
        spawn_clock <= 0, 50 + jax.random.randint(k_clock, (), 0, 60), spawn_clock
    )
    free = ~s.truck_live
    slot = (jnp.arange(_RD_TRUCKS) == jnp.argmax(free)) & spawning & free.any()
    truck_live = s.truck_live | slot
    truck_lane = jnp.where(slot, jax.random.randint(k_lane, (), 0, _RD_LANES), s.truck_lane)
    truck_x = jnp.where(slot, 90.0, s.truck_x)
    truck_v = jnp.where(slot, 1.2 + jax.random.uniform(k_v) * 0.8, s.truck_v)

    truck_x = truck_x - jnp.where(truck_live & ~caught, truck_v + v, 0.0)
    gone = truck_live & (truck_x < -_RD_TW - 6.0)
    truck_live = truck_live & ~gone
    hit = (
        ~caught & truck_live & (truck_lane == lane)
        & (truck_x < _RD_PX + _RD_BW) & (truck_x + _RD_TW > _RD_PX)
    ).any()

    died = caught | hit
    lives = s.lives - died.astype(jnp.int32)
    over = s.over | (died & (lives <= 0))
    ent = _rd_respawn()
    nxt = RoadRunnerCore(
        dist=dist, next_seed=next_seed,
        lane=jnp.where(died, ent["lane"], lane),
        lane_cool=jnp.where(died, ent["lane_cool"], lane_cool),
        coyote_x=jnp.where(died, ent["coyote_x"], coyote_x),
        truck_live=jnp.where(died, ent["truck_live"], truck_live),
        truck_lane=truck_lane, truck_x=truck_x, truck_v=truck_v,
        spawn_clock=jnp.where(died, ent["spawn_clock"], spawn_clock),
        lives=lives,
        score=s.score + reward.astype(jnp.int32),
        over=over,
    )
    out = jax.tree.map(lambda n, o: jnp.where(live, n, o), nxt, s)
    return out, jnp.where(live, reward, 0.0)


def _rd_render(s: RoadRunnerCore) -> jax.Array:
    """84x84 frame (road_runner.cc:123-158)."""
    y, x = jnp.asarray(_Y), jnp.asarray(_X)
    f = jnp.zeros((SCREEN, SCREEN), jnp.uint8)
    # Lane stripes (dashed, scrolling with dist).
    for l in range(_RD_LANES):
        yy = int(_RD_LANE_Y[l]) + int(_RD_BH) + 1
        stripe = (y == yy) & (((x + s.dist.astype(jnp.int32)) // 6) % 2 == 0)
        f = jnp.where(stripe, jnp.uint8(90), f)
    # Next seed pile.
    sx = _RD_PX + (s.next_seed - s.dist)
    pile_lane = (s.next_seed / _RD_SEED_EVERY).astype(jnp.int32) % _RD_LANES
    pm = _rect_mask(y, x, sx.astype(jnp.int32),
                    jnp.asarray(_RD_LANE_Y, jnp.int32)[pile_lane] + 2, 3, 3)
    f = jnp.where((sx >= 0.0) & (sx < 83.0) & pm, jnp.uint8(200), f)
    # Trucks.
    for i in range(_RD_TRUCKS):
        m = _rect_mask(y, x, s.truck_x[i],
                       jnp.asarray(_RD_LANE_Y)[s.truck_lane[i]],
                       int(_RD_TW), int(_RD_TH))
        f = jnp.where(s.truck_live[i] & m, jnp.uint8(150), f)
    # Coyote then bird.
    cm = _rect_mask(y, x, (_RD_PX + s.coyote_x).astype(jnp.int32),
                    jnp.asarray(_RD_LANE_Y, jnp.int32)[s.lane] - 1, 5, 6)
    f = jnp.where(cm, jnp.uint8(120), f)
    bm = _rect_mask(y, x, int(_RD_PX), jnp.asarray(_RD_LANE_Y, jnp.int32)[s.lane],
                    int(_RD_BW), int(_RD_BH))
    f = jnp.where(bm, jnp.uint8(230), f)
    tick = (y == 1) & (x >= 2) & (x < 2 + 2 * jnp.minimum(s.score // 100, 40)) & ((x - 2) % 2 == 0)
    f = jnp.where(tick, jnp.uint8(200), f)
    lm = (y == 81) & (x >= 2) & (x < 2 + 5 * jnp.minimum(s.lives, _RD_LIVES)) & ((x - 2) % 5 < 3)
    f = jnp.where(lm, jnp.uint8(160), f)
    return f


ROAD_RUNNER = dict(
    reset=_rd_reset,
    act=_rd_act,
    render=_rd_render,
    lives=lambda s: s.lives,
    over=lambda s: s.over,
    minimal_actions=18,
    minimal_to_full=np.arange(18, dtype=np.int32),
)
