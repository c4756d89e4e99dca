"""Environment engine tests: C++/Python parity, protocol semantics, async API."""

import numpy as np
import pytest

from cleanba_tpu.envs import make_env
from cleanba_tpu.envs.native import native_available

needs_native = pytest.mark.skipif(not native_available(), reason="native engine not built")


@needs_native
def test_cartpole_native_matches_python_oracle():
    nat = make_env("CartPole-v1", seed=11, num_envs=3, backend="native")()
    py = make_env("CartPole-v1", seed=11, num_envs=3, backend="python")()
    o1, _ = nat.reset()
    o2, _ = py.reset()
    np.testing.assert_allclose(o1, o2, atol=1e-7)
    rng = np.random.default_rng(1)
    for _ in range(150):
        a = rng.integers(0, 2, size=3)
        obs1, r1, t1, tr1, _ = nat.step(a)
        obs2, r2, t2, tr2, _ = py.step(a)
        np.testing.assert_allclose(obs1, obs2, atol=1e-4)
        assert np.array_equal(t1, t2) and np.array_equal(tr1, tr2)
    nat.close()
    py.close()


def test_cartpole_python_matches_gymnasium():
    """Dynamics parity vs gymnasium (independent oracle for the physics)."""
    import gymnasium as gym

    ours = make_env("CartPole-v1", seed=0, num_envs=1, backend="python")()
    obs, _ = ours.reset()
    genv = gym.make("CartPole-v1")
    genv.reset(seed=0)
    # Force identical start state (seeding schemes differ).
    genv.unwrapped.state = np.asarray(obs[0], dtype=np.float64)
    rng = np.random.default_rng(2)
    for _ in range(60):
        a = int(rng.integers(0, 2))
        obs_o, r_o, term_o, trunc_o, _ = ours.step(np.asarray([a]))
        obs_g, r_g, term_g, trunc_g, _ = genv.step(a)
        if term_o[0] or term_g:
            assert bool(term_o[0]) == bool(term_g)
            break
        np.testing.assert_allclose(obs_o[0], obs_g, atol=1e-4)
    ours.close()


@needs_native
def test_breakout_spec_and_determinism():
    e1 = make_env("Breakout-v5", seed=3, num_envs=4)()
    e2 = make_env("Breakout-v5", seed=3, num_envs=4)()
    assert e1.spec.obs_shape == (84, 84, 4)
    assert e1.spec.num_actions == 18  # Machado full action space
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    assert np.array_equal(o1, o2)
    rng = np.random.default_rng(0)
    for _ in range(50):
        a = rng.integers(0, 18, size=4).astype(np.int32)
        s1 = e1.step(a)
        s2 = e2.step(a)
        assert np.array_equal(s1[0], s2[0])
        assert np.array_equal(s1[1], s2[1])
    e1.close()
    e2.close()


@needs_native
def test_breakout_seeds_differ():
    e1 = make_env("Breakout-v5", seed=3, num_envs=2)()
    e2 = make_env("Breakout-v5", seed=4, num_envs=2)()
    e1.reset(), e2.reset()
    a = np.ones(2, np.int32)  # FIRE
    diverged = False
    for _ in range(30):
        s1, s2 = e1.step(a), e2.step(a)
        if not np.array_equal(s1[0], s2[0]):
            diverged = True
            break
    assert diverged  # sticky-action RNG differs across seeds
    e1.close()
    e2.close()


@needs_native
def test_breakout_episodic_life_protocol():
    machado = make_env("Breakout-v5", seed=0, num_envs=1, protocol="machado")()
    espeholt = make_env("Breakout-v5", seed=0, num_envs=1, protocol="espeholt")()
    assert espeholt.spec.num_actions == 4  # minimal action set
    machado.close()
    espeholt.close()


@needs_native
def test_breakout_scores_with_scripted_play():
    """A trivial ball-tracking controller must collect brick rewards, proving
    the game is playable/learnable (paddle control affects returns)."""
    env = make_env("Breakout-v5", seed=7, num_envs=8)()
    obs, _ = env.reset()
    total = 0.0
    acts = np.ones(8, np.int32)  # start with FIRE
    for t in range(600):
        obs, rew, term, trunc, info = env.step(acts)
        total += rew.sum()
        # track the ball: compare ball x (brightest pixel rows 30..78) to paddle x
        acts = np.ones(8, np.int32)
        for i in range(8):
            frame = obs[i, :, :, -1]
            ys, xs = np.nonzero(frame[30:78] == 236)
            pxs = np.nonzero(frame[79] == 200)[0]
            if len(xs) and len(pxs):
                ball_x, paddle_x = xs.mean(), pxs.mean()
                acts[i] = 3 if ball_x > paddle_x + 1 else (4 if ball_x < paddle_x - 1 else 1)
    env.close()
    assert total > 5, f"scripted tracker scored {total}; game may not be playable"


@needs_native
def test_async_api_round_trip():
    env = make_env("Breakout-v5", seed=1, num_envs=16, async_batch_size=8)()
    env.async_reset()
    seen = np.zeros(16, np.int64)
    for _ in range(40):
        obs, rew, term, trunc, info = env.recv()
        assert obs.shape == (8, 84, 84, 4)
        ids = info["env_ids"]
        seen[ids] += 1
        env.send(np.zeros(8, np.int32), ids)
    assert seen.sum() == 40 * 8
    assert (seen > 0).all()  # every env participates
    env.close()


@needs_native
def test_truncation_cap():
    env = make_env("CartPole-v1", seed=0, num_envs=2, backend="native")()
    env.reset()
    # Run well past the 500-step cap; every episode must end by then.
    saw_done = np.zeros(2, bool)
    for _ in range(520):
        _, _, term, trunc, _ = env.step(np.zeros(2, np.int64))
        saw_done |= term | trunc
    assert saw_done.all()
    env.close()


@needs_native
@pytest.mark.parametrize("task", ["Pong-v5", "SpaceInvaders-v5", "BeamRider-v5",
                                  "Boxing-v5", "Seaquest-v5", "Qbert-v5",
                                  "Asterix-v5", "MsPacman-v5", "DemonAttack-v5",
                                  "Enduro-v5", "Atlantis-v5", "Bowling-v5",
                                  "FishingDerby-v5", "CrazyClimber-v5",
                                  "Assault-v5", "Phoenix-v5", "Gopher-v5",
                                  "NameThisGame-v5", "Riverraid-v5",
                                  "KungFuMaster-v5", "Tennis-v5", "StarGunner-v5",
                                  "Amidar-v5", "BankHeist-v5", "UpNDown-v5",
                                  "TimePilot-v5", "Alien-v5", "RoadRunner-v5",
                                  "Skiing-v5", "Frostbite-v5", "Kangaroo-v5",
                                  "ChopperCommand-v5", "Jamesbond-v5",
                                  "Zaxxon-v5", "Berzerk-v5",
                                  "WizardOfWor-v5", "Asteroids-v5",
                                  "Centipede-v5", "Tutankham-v5",
                                  "Venture-v5", "IceHockey-v5",
                                  "BattleZone-v5", "Surround-v5",
                                  "Defender-v5", "Robotank-v5",
                                  "Gravitar-v5", "DoubleDunk-v5",
                                  "Hero-v5", "YarsRevenge-v5", "Krull-v5",
                                  "MontezumaRevenge-v5", "Pitfall-v5",
                                  "PrivateEye-v5", "Solaris-v5",
                                  "VideoPinball-v5"])
def test_other_games_spec_and_determinism(task):
    e1 = make_env(task, seed=5, num_envs=2)()
    e2 = make_env(task, seed=5, num_envs=2)()
    assert e1.spec.obs_shape == (84, 84, 4)
    assert e1.spec.num_actions == 18
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    assert np.array_equal(o1, o2)
    rng = np.random.default_rng(0)
    reward_seen = 0.0
    for _ in range(200):
        a = rng.integers(0, 18, size=2).astype(np.int32)
        s1, s2 = e1.step(a), e2.step(a)
        assert np.array_equal(s1[0], s2[0])
        reward_seen += float(np.abs(s1[1]).sum())
    # Genuinely sparse games cannot be expected to score within 200 random
    # steps (Venture's published random anchor is 0.0; a basket, a floor
    # descent, or a shield nibble takes longer than 800 raw frames of
    # drift). Their 6000-step random-walk contracts in test_jax_engine.py
    # still require the score to move.
    sparse = {"Venture-v5", "DoubleDunk-v5", "Hero-v5", "YarsRevenge-v5",
              "MontezumaRevenge-v5", "Pitfall-v5", "PrivateEye-v5"}
    if task not in sparse:
        assert reward_seen > 0, f"{task}: no rewards under random play"
    e1.close()
    e2.close()


@needs_native
@pytest.mark.parametrize("task", ["BigfishHard-v0", "Maze-v0", "Leaper-v0", "ChaserHard-v0",
                                  "Coinrun-v0", "MinerHard-v0", "Heist-v0", "Jumper-v0",
                                  "Ninja-v0", "PlunderHard-v0", "Caveflyer-v0",
                                  "Climber-v0", "DodgeballHard-v0", "Bossfight-v0"])
def test_procgen_spec_and_determinism(task):
    # Procgen contract (reference legacy_scripts/cleanba_ppo_envpool_procgen.py
    # :115-130): plain make, 64x64x3 uint8 RGB obs, 15-action space, raw
    # (unclipped) rewards, fresh procedural level every episode.
    e1 = make_env(task, seed=9, num_envs=4)()
    e2 = make_env(task, seed=9, num_envs=4)()
    assert e1.spec.obs_shape == (64, 64, 3)
    assert e1.spec.obs_dtype == np.uint8
    assert e1.spec.num_actions == 15
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    assert np.array_equal(o1, o2)
    rng = np.random.default_rng(2)
    for _ in range(120):
        a = rng.integers(0, 15, size=4).astype(np.int32)
        s1, s2 = e1.step(a), e2.step(a)
        assert np.array_equal(s1[0], s2[0]) and np.array_equal(s1[1], s2[1])
    e1.close()
    e2.close()


@needs_native
def test_procgen_levels_are_procedural():
    # Different seeds must generate different levels (first observations).
    e1 = make_env("Maze-v0", seed=1, num_envs=1)()
    e2 = make_env("Maze-v0", seed=100, num_envs=1)()
    o1, _ = e1.reset()
    o2, _ = e2.reset()
    assert not np.array_equal(o1, o2)
    e1.close()
    e2.close()


@needs_native
def test_bigfish_eating_rewards_and_timeout():
    # Random play on easy Bigfish should eventually eat a small fish (+1 raw,
    # unclipped) and every episode must end by the 1000-step procgen timeout.
    env = make_env("Bigfish-v0", seed=3, num_envs=8)()
    env.reset()
    rng = np.random.default_rng(0)
    total, ends = 0.0, 0
    for _ in range(1100):
        _, rew, term, trunc, _ = env.step(rng.integers(0, 15, size=8).astype(np.int32))
        total += float(rew.sum())
        ends += int((term | trunc).sum())
    assert total > 0, "no fish eaten under random play"
    assert ends >= 8, "episodes did not terminate within the procgen timeout"
    env.close()


@needs_native
def test_maze_solvable_and_pays_ten():
    # Mazes are perfect (fully connected), so random walkers across a batch of
    # levels reliably reach the cheese; each solve pays exactly +10 and ends
    # the episode. (Empirically 16 envs x 3000 steps yields ~40 solves.)
    env = make_env("Maze-v0", seed=11, num_envs=16)()
    env.reset()
    rng = np.random.default_rng(4)
    total, solves = 0.0, 0
    for _ in range(3000):
        _, rew, term, trunc, _ = env.step(rng.integers(0, 15, size=16).astype(np.int32))
        total += float(rew.sum())
        solves += int((rew > 0).sum())
        assert set(np.unique(rew)).issubset({0.0, 10.0})
    env.close()
    assert solves >= 3, "random walkers never reached the cheese"
    assert total == 10.0 * solves


@needs_native
def test_leaper_crossing_pays_ten_and_deaths_end_episode():
    """UP-spam from the start row either finishes (+10, terminated) or dies
    (0, terminated) — both must end the episode; across seeds both outcomes
    occur and only {0, 10} raw rewards exist."""
    env = make_env("Leaper-v0", seed=21, num_envs=16)()
    env.reset()
    outcomes = set()
    total = 0.0
    for _ in range(600):
        obs, rew, term, trunc, _ = env.step(np.full(16, 5, np.int32))  # UP
        assert set(np.unique(rew)).issubset({0.0, 10.0})
        total += float(rew.sum())
        for r, t in zip(rew, term):
            if t:
                outcomes.add("win" if r > 0 else "death")
    assert "death" in outcomes, "no leaper death observed"
    assert total >= 10.0 or "win" in outcomes, "no crossing ever completed"
    env.close()


@needs_native
def test_chaser_dots_score_and_enemies_catch():
    """Dots pay 3/n each under random play (official R_max=13 economy);
    enemy contact terminates without the +10 clear bonus."""
    env = make_env("ChaserHard-v0", seed=7, num_envs=8)()
    env.reset()
    rng = np.random.default_rng(1)
    total, catches = 0.0, 0
    for _ in range(1000):
        obs, rew, term, trunc, _ = env.step(rng.integers(0, 15, 8).astype(np.int32))
        total += float(rew.sum())
        catches += int((term & (rew < 10)).sum())
    assert total > 0, "no dots eaten"
    assert catches > 0, "no enemy ever caught the player"
    env.close()


def test_native_catalog_is_the_complete_atari57():
    """Completeness guard: the native catalog must contain the canonical
    Atari-57 suite (Machado et al. / ALE benchmark list) exactly once each,
    so no wave refactor can silently drop a game."""
    from cleanba_tpu.envs import NATIVE_ATARI_TASKS

    atari57 = {
        "Alien", "Amidar", "Assault", "Asterix", "Asteroids", "Atlantis",
        "BankHeist", "BattleZone", "BeamRider", "Berzerk", "Bowling",
        "Boxing", "Breakout", "Centipede", "ChopperCommand", "CrazyClimber",
        "Defender", "DemonAttack", "DoubleDunk", "Enduro", "FishingDerby",
        "Freeway", "Frostbite", "Gopher", "Gravitar", "Hero", "IceHockey",
        "Jamesbond", "Kangaroo", "Krull", "KungFuMaster", "MontezumaRevenge",
        "MsPacman", "NameThisGame", "Phoenix", "Pitfall", "Pong",
        "PrivateEye", "Qbert", "Riverraid", "RoadRunner", "Robotank",
        "Seaquest", "Skiing", "Solaris", "SpaceInvaders", "StarGunner",
        "Surround", "Tennis", "TimePilot", "Tutankham", "UpNDown", "Venture",
        "VideoPinball", "WizardOfWor", "YarsRevenge", "Zaxxon",
    }
    assert len(atari57) == 57
    native = {t[:-3] for t in NATIVE_ATARI_TASKS}
    missing = atari57 - native
    assert not missing, f"Atari-57 games missing from the native catalog: {sorted(missing)}"
    assert len(NATIVE_ATARI_TASKS) == len(set(NATIVE_ATARI_TASKS)), "duplicate task ids"


def test_native_catalog_is_the_complete_procgen16():
    """Same guard for the 16-game procgen suite (easy + hard variants)."""
    from cleanba_tpu.envs import NATIVE_PROCGEN_TASKS

    procgen16 = {
        "Bigfish", "Bossfight", "Caveflyer", "Chaser", "Climber", "Coinrun",
        "Dodgeball", "Fruitbot", "Heist", "Jumper", "Leaper", "Maze",
        "Miner", "Ninja", "Plunder", "Starpilot",
    }
    assert len(procgen16) == 16
    bases = {t.replace("Easy-v0", "-v0").replace("Hard-v0", "-v0")[:-3]
             for t in NATIVE_PROCGEN_TASKS}
    missing = procgen16 - bases
    assert not missing, f"procgen games missing: {sorted(missing)}"
