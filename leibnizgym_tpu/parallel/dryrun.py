"""Multi-chip dry run: shard the env axis over a data mesh, jit one full step.

Called by the driver with N virtual CPU devices to validate that the sharded
program compiles and executes without real chips. Extended to cover the PPO
training step as the learning stack lands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def run_dryrun(n_devices: int) -> None:
    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )
    mesh = Mesh(devices, axis_names=("data",))

    from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv, env_reset, env_step

    envs_per_dev = 4
    n = envs_per_dev * n_devices
    env = TrifingerEnv(
        config={"num_instances": n, "command_mode": "torque",
                "asymmetric_obs": True, "sim": {"substeps": 2}},
        verbose=False,
    )
    static, params = env.static, env.params

    state, _ = env_reset(static, params, jax.random.PRNGKey(0))

    # shard every per-env leaf along the data axis; scalars replicated
    def shard_spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == n:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    state = jax.tree.map(
        lambda x: jax.device_put(x, shard_spec(x)), state
    )
    action = jax.device_put(
        jnp.zeros((n, static.action_dim)), NamedSharding(mesh, P("data"))
    )

    step = jax.jit(env_step, static_argnums=0)
    out_state, obs, states, reward, dones, info = step(static, params, state, action)
    jax.block_until_ready(obs)
    print(f"[dryrun] sharded env step OK on {n_devices} devices: obs {obs.shape}")

    # full PPO training step (rollout + GAE + update) under the same mesh
    try:
        from leibnizgym_tpu.learning.train import make_train_step_for_dryrun

        train_step, carry = make_train_step_for_dryrun(mesh, env)
    except ImportError:
        print("[dryrun] learning stack not present yet; env-step-only dry run")
        return
    carry = train_step(carry)
    jax.block_until_ready(carry)
    print(f"[dryrun] sharded PPO train step OK on {n_devices} devices")

    # The shipped FLAGSHIP recipe — difficulty-4 curriculum + full domain
    # randomization + measured cone arena + frames=2 stacking — under the
    # same mesh, so config-surface growth cannot silently break sharding
    # (VERDICT r4 item 9).
    from leibnizgym_tpu.config.presets import parse_cli, update_cfg

    cfg_all = update_cfg(parse_cli([
        "gym=trifinger_difficulty_4_curriculum_dr",
        f"args.num_envs={n}",
    ]))
    gym_cfg = dict(cfg_all["gym"])
    gym_cfg["arena"] = {"profile": "cone"}
    gym_cfg["sim"] = dict(gym_cfg.get("sim") or {})
    gym_cfg["sim"]["substeps"] = 2  # tiny shapes; sharding path is identical
    flagship = TrifingerEnv(config=gym_cfg, verbose=False)
    train_step2, carry2 = make_train_step_for_dryrun(mesh, flagship, frames=2)
    carry2 = train_step2(carry2)
    jax.block_until_ready(carry2)
    print(
        f"[dryrun] sharded FLAGSHIP train step (cone+DR+frames=2) OK on "
        f"{n_devices} devices"
    )
