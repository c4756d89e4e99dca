"""Worker script for the localhost multi-process distributed test.

Run by tests/test_distributed.py as N subprocesses on CPU — the TPU-free
analog of the reference's fake-SLURM/TPU-env-var two-process fixture
(README.md:68-72, tpu.sh:61-77). Each process owns 2 virtual CPU devices; the
learner mesh spans all processes; one PPO update runs with gradients psum'd
across the process boundary; the final parameter checksum must agree
everywhere (printed for the parent to compare).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    coordinator = sys.argv[1]
    num_processes = int(sys.argv[2])
    process_id = int(sys.argv[3])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    import numpy as np

    from cleanba_tpu.config import PPOConfig
    from cleanba_tpu.parallel.sharding import ship_to_learners
    from cleanba_tpu.parallel.topology import build_topology
    from cleanba_tpu.ops import make_ppo_optimizer
    from cleanba_tpu.runtime.agent import build_agent
    from cleanba_tpu.runtime.learner import make_ppo_update
    from cleanba_tpu.runtime.storage import PPOStorage
    from cleanba_tpu.runtime.train_state import TrainState

    topo = build_topology(actor_device_ids=[0], learner_device_ids=[0, 1])
    assert topo.world_size == num_processes, topo.world_size
    assert topo.n_global_learners == 2 * num_processes, topo.global_learner_devices

    T = 4
    b_local = 4  # envs produced by THIS process
    B = b_local * num_processes
    cfg = PPOConfig(
        network="mlp", hiddens=[16], local_num_envs=B, num_steps=T,
        num_actor_threads=1, num_minibatches=2, update_epochs=1,
        total_timesteps=B * T * 4, learner_device_ids=[0, 1],
    )
    cfg.resolve(world_size=1)  # batch math for the fixture's global shapes
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    state = TrainState.create(params=agent.init_params, tx=make_ppo_optimizer(cfg))
    state = jax.device_put(state, topo.replicated())
    update = make_ppo_update(cfg, topo, agent.logits_and_value)

    # Each process contributes only its local env columns; global arrays are
    # assembled with make_array_from_process_local_data inside ship_to_learners.
    rng = np.random.default_rng(123 + process_id)
    local = PPOStorage(
        obs=rng.normal(size=(T, b_local, 4)).astype(np.float32),
        dones=np.zeros((T, b_local), np.float32),
        actions=rng.integers(0, 2, size=(T, b_local)).astype(np.int32),
        logprobs=np.full((T, b_local), -np.log(2), np.float32),
        values=np.zeros((T, b_local), np.float32),
        env_ids=np.tile(np.arange(b_local, dtype=np.int32), (T, 1)),
        rewards=rng.normal(size=(T, b_local)).astype(np.float32),
        truncations=np.zeros((T, b_local), np.float32),
        terminations=np.zeros((T, b_local), np.float32),
        firststeps=np.zeros((T, b_local), np.float32),
        prev_actions=np.zeros((T, b_local), np.int32),
        prev_rewards=np.zeros((T, b_local), np.float32),
    )
    storage = ship_to_learners(local, topo, env_axis=1)
    next_obs, next_done = ship_to_learners(
        (rng.normal(size=(b_local, 4)).astype(np.float32), np.zeros(b_local, np.float32)),
        topo, env_axis=0,
    )
    key = jax.device_put(jax.random.PRNGKey(0), topo.replicated())
    state, metrics, key = update(state, [storage], [next_obs], [next_done], key)

    params_host = jax.device_get(jax.tree.map(lambda x: x, state.params))
    checksum = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(params_host)))
    print(f"CHECKSUM {process_id} {checksum:.6f}", flush=True)

    # --- Phase 2: Anakin train step over the cross-process global mesh ------
    # (on-device envs; rollout + update in one program spanning both
    # processes, grads pmean'd across the process boundary).
    from cleanba_tpu import train_ppo_anakin as anakin

    acfg = PPOConfig(
        env_id="CartPole-v1", network="mlp", hiddens=[16],
        local_num_envs=8, num_actor_threads=1, num_steps=8,
        num_minibatches=2, update_epochs=1, total_timesteps=8 * 8 * 2,
    )
    acfg.resolve()
    global_mesh = jax.sharding.Mesh(np.array(jax.devices()), (anakin.AXIS,))
    aagent = build_agent(acfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(1))
    astep = anakin.build_train_step(acfg, anakin.make_jax_env("CartPole-v1", {}),
                                    global_mesh, aagent, 8)
    acarry = anakin.make_anakin_state(
        acfg, anakin.make_jax_env("CartPole-v1", {}), global_mesh, aagent,
        jax.random.PRNGKey(2),
    )
    for _ in range(2):
        acarry, ametrics, acharts = astep(acarry)
    aparams = jax.device_get(acarry.agent_state.params)
    asum = float(sum(np.abs(np.asarray(l)).sum() for l in jax.tree.leaves(aparams)))
    print(f"ANAKIN_CHECKSUM {process_id} {asum:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
