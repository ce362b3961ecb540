"""Top-level training entry (run_rlg equivalent) + dryrun hook.

Reference call path parity (rlg_train.py:208-252): build env from task
config, build learner from rl_games-style agent config, run.
"""

from __future__ import annotations

from typing import Optional

import jax

from leibnizgym_tpu.learning.runner import Runner
from leibnizgym_tpu.utils import print_info


def run_training(
    task_cfg: dict,
    agent_cfg: dict,
    logdir: str = "logs",
    seed: int = 7,
    train: bool = True,
    checkpoint: str = "",
    max_epochs: Optional[int] = None,
    play_steps: int = 1000,
    verbose: bool = False,
    watchdog_timeout: Optional[float] = None,
    visualize: bool = False,
):
    """Train or play, mirroring rl_games Runner.run(vargs)."""
    if watchdog_timeout and train:
        # Init-phase failure detector: Runner construction is the FIRST
        # device touch (backend init through the remote tunnel), and a
        # wedged tunnel can hang `jax.devices()` itself — before
        # Runner.train() ever arms its epoch watchdog — stalling the
        # supervisor forever (observed round 2). Arm a one-shot deadline
        # here; Runner.train()'s own watchdog takes over once it starts.
        import os as _os
        import threading
        import time as _time

        deadline = _time.time() + max(
            watchdog_timeout, Runner._FIRST_EPOCH_WATCHDOG_FLOOR
        )
        init_done = threading.Event()

        def _init_watch():
            while not init_done.is_set():
                if _time.time() > deadline:
                    print_info(
                        "INIT WATCHDOG: backend/env init did not complete "
                        "in time — exiting 42 for supervised restart"
                    )
                    _os._exit(42)
                _time.sleep(5.0)

        threading.Thread(target=_init_watch, daemon=True).start()
    runner = Runner(
        task_cfg=task_cfg,
        agent_params=agent_cfg["params"],
        logdir=logdir,
        seed=seed,
        verbose=verbose,
        visualize=visualize,
    )
    runner.reset()
    if checkpoint:
        runner.restore(checkpoint)
    if train:
        if watchdog_timeout:
            init_done.set()
        return runner.train(max_epochs=max_epochs, watchdog_timeout=watchdog_timeout)
    return runner.play(num_steps=play_steps)


def make_train_step_for_dryrun(mesh, env, frames: int = 1):
    """Build a sharded single-train-step callable for the driver's
    multi-chip dry run (tiny shapes, full tp/dp sharding path).
    ``frames`` > 1 exercises the in-scan frame-stacking path of the
    flagship recipe."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from leibnizgym_tpu.learning.ppo import (
        PPOConfig,
        init_train_state,
        train_iteration,
    )
    from leibnizgym_tpu.parallel.mesh import shard_batch_pytree

    n = env.static.num_envs
    cfg = PPOConfig(
        horizon=4,
        minibatch_size=max(n * 4 // 4, 1),
        mini_epochs=2,
        cv_minibatch_size=max(n * 4 // 4, 1),
        cv_mini_epochs=2,
        frames=frames,
    )
    ts = init_train_state(cfg, env.static, env.params, jax.random.PRNGKey(0))
    ts = ts.replace(
        env_state=shard_batch_pytree(ts.env_state, mesh, n),
        obs=jax.device_put(ts.obs, NamedSharding(mesh, P("data"))),
        states=jax.device_put(ts.states, NamedSharding(mesh, P("data"))),
        ep_return=jax.device_put(ts.ep_return, NamedSharding(mesh, P("data"))),
        ep_len=jax.device_put(ts.ep_len, NamedSharding(mesh, P("data"))),
    )
    step = jax.jit(train_iteration, static_argnums=(0, 1))

    def train_step(ts):
        new_ts, metrics = step(cfg, env.static, env.params, ts)
        return new_ts

    print_info(f"[dryrun] PPO train step built: {n} envs over mesh {mesh.shape}")
    return train_step, ts
