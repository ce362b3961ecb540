"""Training runner: the rl_games ``Runner`` equivalent.

Replaces the external rl_games Runner + RlGamesGpuEnvAdapter + observer stack
(reference rlg_train.py:89-252) with a single class: it owns the env, the
jitted PPO iteration, TensorBoard metric logging (LeibnizAlgoObserver parity),
Orbax checkpointing (nn/ directory parity), and the play/inference path.
"""

from __future__ import annotations

import collections
import os
import time
from datetime import datetime
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from leibnizgym_tpu.envs.trifinger.env import TrifingerEnv
from leibnizgym_tpu.learning.ppo import (
    PPOConfig,
    PPOTrainState,
    init_train_state,
    make_networks,
    train_iteration,
)
from leibnizgym_tpu.utils import print_info, print_notify

try:
    from tensorboardX import SummaryWriter
except ImportError:  # pragma: no cover
    SummaryWriter = None


class AverageMeter:
    """Mean over the last ``maxlen`` completed games (rl_games parity)."""

    def __init__(self, maxlen: int = 100):
        self._buf = collections.deque(maxlen=maxlen)

    def update(self, values):
        self._buf.extend(np.atleast_1d(values).tolist())

    @property
    def current_size(self):
        return len(self._buf)

    def get_mean(self):
        return float(np.mean(self._buf)) if self._buf else 0.0


class Runner:
    """Owns env + learner; trains or plays."""

    def __init__(
        self,
        task_cfg: dict,
        agent_params: dict,
        logdir: str = "logs",
        seed: int = 7,
        verbose: bool = False,
        devices=None,
        visualize: bool = False,
    ):
        self.verbose = verbose
        num_actors = int(task_cfg.get("num_instances", 256))
        self.ppo_cfg = PPOConfig.from_rlg_params(agent_params, num_actors)
        self.env = TrifingerEnv(
            config=task_cfg, verbose=verbose, visualize=visualize
        )
        self.static, self.env_params = self.env.static, self.env.params
        self.seed = seed

        # data-parallel mesh over all (or the given) devices: env-axis leaves
        # sharded, learner replicated; XLA inserts the gradient all-reduce
        devices = devices if devices is not None else jax.devices()
        self.mesh = None
        if len(devices) > 1 and num_actors % len(devices) == 0:
            from leibnizgym_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(devices)
            print_info(
                f"Runner: sharding {num_actors} envs over {len(devices)} "
                f"devices ({devices[0].platform})"
            )

        # log directories (reference run_rlg:219-246: nn/, runs/, timestamped)
        stamp = datetime.now().strftime("%m-%d-%Y-%H-%M-%S")
        self.logdir = os.path.join(logdir, stamp)
        self.nn_dir = os.path.join(self.logdir, "nn")
        os.makedirs(self.nn_dir, exist_ok=True)
        with open(os.path.join(self.logdir, "agent_config.yaml"), "w") as f:
            yaml.dump(agent_params, f)
        self.env.dump_config(os.path.join(self.logdir, "env_config.yaml"))
        self.writer = (
            SummaryWriter(os.path.join(self.logdir, "summaries"))
            if SummaryWriter is not None
            else None
        )
        print_notify(f"Saving logs at: {self.logdir}")

        self._train_iter = jax.jit(train_iteration, static_argnums=(0, 1))
        self.game_rewards = AverageMeter(self.ppo_cfg.games_to_track)
        self.ts: Optional[PPOTrainState] = None

        # success-gated curriculum controller (host side of
        # EnvStatic.curriculum_success_gated): advances/retreats the device
        # scalar EnvParams.curriculum_level on successes-per-finished-episode.
        # Episodes finish synchronized (timeout resets), so one sample
        # arrives per ~episode_length/horizon epochs; steps are sized per
        # SAMPLE, not per epoch.
        gc = dict(task_cfg.get("goal_curriculum", {}) or {})
        self._cur_gated = self.static.curriculum_success_gated
        self._cur_level = 0.0
        if self._cur_gated:
            self._cur_up_thresh = float(gc.get("up_threshold", 0.5))
            self._cur_down_thresh = float(gc.get("down_threshold", 0.1))
            self._cur_up_step = float(gc.get("up_step", 0.005))
            self._cur_down_step = float(gc.get("down_step", 0.02))
            self._cur_window = int(gc.get("window_samples", 4))
            self._suc_win = collections.deque(maxlen=self._cur_window)
            self._strict_win = collections.deque(maxlen=64)
            self._best_cur_score = -1.0
            self._last_cur_save = 0.0
            print_info(
                f"Runner: success-gated curriculum on "
                f"(up>{self._cur_up_thresh}, down<{self._cur_down_thresh}, "
                f"steps +{self._cur_up_step}/-{self._cur_down_step} per "
                f"episode sample, window {self._cur_window})"
            )

    def _set_curriculum_level(self, level: float):
        self._cur_level = float(np.clip(level, 0.0, 1.0))
        self.env_params = self.env_params.replace(
            curriculum_level=jnp.asarray(self._cur_level, jnp.float32)
        )

    # ------------------------------------------------------------------ setup

    def reset(self):
        key = jax.random.PRNGKey(self.seed)
        self.ts = init_train_state(self.ppo_cfg, self.static, self.env_params, key)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from leibnizgym_tpu.parallel.mesh import shard_batch_pytree

            n = self.static.num_envs
            data = NamedSharding(self.mesh, P("data"))
            self.ts = self.ts.replace(
                env_state=shard_batch_pytree(self.ts.env_state, self.mesh, n),
                obs=jax.device_put(self.ts.obs, data),
                states=jax.device_put(self.ts.states, data),
                ep_return=jax.device_put(self.ts.ep_return, data),
                ep_len=jax.device_put(self.ts.ep_len, data),
            )

    # ----------------------------------------------------------- checkpointing

    def _ckpt_payload(self, ts=None):
        """Learner state saved/restored (env state intentionally excluded:
        envs re-reset on resume, matching the reference where env state is
        never checkpointed — SURVEY.md §5). Optimizer state is included for
        faithful training resume."""
        ts = ts if ts is not None else self.ts
        payload = {
            "ac_params": ts.ac_params,
            "cv_params": ts.cv_params,
            "ac_opt_state": ts.ac_opt_state,
            "cv_opt_state": ts.cv_opt_state,
            "lr": ts.lr,
            "epoch": ts.epoch,
            "frame": ts.frame,
        }
        if self._cur_gated:
            # resume must not restart the curriculum from easy
            payload["curriculum_level"] = jnp.asarray(
                self._cur_level, jnp.float32
            )
        return payload

    def _checkpointer(self):
        """One persistent async checkpointer for the Runner's lifetime.
        orbax's StandardCheckpointer is an AsyncCheckpointer: ``save``
        returns after staging host copies and commits in a background
        thread (waiting for any previous in-flight save first), so the
        ~1 s directory commit overlaps training instead of idling the
        device. ``save(..., wait=True)`` / ``flush_saves()`` block."""
        if getattr(self, "_ckptr", None) is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save(self, name: str, ts=None, wait: bool = True):
        """Checkpoint ``ts`` (default: the CURRENT train state). The
        pipelined train loop passes the state of the epoch whose metrics
        triggered the save — 'best' must hold the policy that actually
        achieved the best reward, not one K epochs ahead of it.

        ``wait`` defaults to True so the returned path is immediately
        readable by any consumer (another Runner, a resume scan, a test);
        only the train loop's own throttled hot-path saves pass
        ``wait=False`` to overlap the ~1 s commit with training."""
        path = os.path.abspath(os.path.join(self.nn_dir, name))
        ckptr = self._checkpointer()
        ckptr.save(path, self._ckpt_payload(ts), force=True)
        if wait:
            ckptr.wait_until_finished()
        return path

    def flush_saves(self):
        """Block until any in-flight async checkpoint commit completes."""
        if getattr(self, "_ckptr", None) is not None:
            self._ckptr.wait_until_finished()

    def restore(self, path: str):
        if self.ts is None:
            self.reset()
        # shared async checkpointer: restore waits for in-flight saves first
        ckptr = self._checkpointer()
        template = self._ckpt_payload()
        try:
            payload = ckptr.restore(os.path.abspath(path), template)
        except (ValueError, KeyError) as e:
            # structure mismatch only (e.g. older checkpoints lacking the
            # optimizer state): fall back to a weights-only restore, loudly —
            # optimizer state and LR restart from scratch. Genuine I/O errors
            # or corrupt checkpoints still propagate.
            from leibnizgym_tpu.utils import print_warn

            print_warn(
                f"Checkpoint {path} does not match the full training-state "
                f"template ({type(e).__name__}: {e}); retrying weights-only. "
                "Optimizer state and LR will be re-initialized."
            )
            template = {
                k: template[k]
                for k in ("ac_params", "cv_params", "lr", "epoch", "frame")
            }
            payload = ckptr.restore(os.path.abspath(path), template)
        # old checkpoints stored the frame counter as int32
        payload["frame"] = jnp.asarray(payload["frame"], jnp.float32)
        if "curriculum_level" in payload:
            self._set_curriculum_level(float(payload.pop("curriculum_level")))
            print_info(f"Restored curriculum level: {self._cur_level:.3f}")
        self.ts = self.ts.replace(**payload)
        print_info(f"Restored checkpoint: {path}")

    # ---------------------------------------------------------------- training

    def _start_watchdog(self, timeout: float):
        """Failure detector for wedged device tunnels: if no epoch completes
        within the current ``self._watchdog_timeout`` seconds, exit(42) so a
        supervisor (e.g. scripts/supervise_train.sh) can restart with
        --checkpoint resume. A blocked XLA call cannot be interrupted from
        Python, so a hard exit is the only reliable escape. The timeout is
        read each cycle, so the caller can arm it loose (first-epoch compile)
        and tighten after progress begins."""
        import threading

        self._watchdog_timeout = timeout
        self._last_progress = time.time()
        self._watchdog_armed = True

        def watch():
            while self._watchdog_armed:
                t = self._watchdog_timeout
                # short sleep quantum so a disarm takes effect promptly (the
                # stall check still uses the full timeout t)
                time.sleep(min(max(t / 4, 1.0), 5.0))
                if not self._watchdog_armed:
                    return
                if time.time() - self._last_progress > t:
                    print_notify(
                        f"WATCHDOG: no training progress for {t:.0f}s — "
                        "exiting 42 for supervised restart"
                    )
                    os._exit(42)

        t = threading.Thread(target=watch, daemon=True)
        t.start()

    def _stop_watchdog(self):
        self._watchdog_armed = False

    # compile of the first epoch (remote tunnel) can take ~15 min; the
    # watchdog runs with this floor until the first epoch completes
    _FIRST_EPOCH_WATCHDOG_FLOOR = 1800.0

    def train(self, max_epochs: Optional[int] = None,
              watchdog_timeout: Optional[float] = None):
        if self.ts is None:
            self.reset()
        cfg = self.ppo_cfg
        epochs = max_epochs if max_epochs is not None else cfg.max_epochs
        best_reward = -float("inf")
        t_start = time.time()
        if watchdog_timeout:
            # loose during the first epoch (XLA compile), tight afterwards
            self._start_watchdog(
                max(watchdog_timeout, self._FIRST_EPOCH_WATCHDOG_FLOOR)
            )
        prev_ts = None
        # Host-loop pipelining: metrics stay on-device for up to `depth`
        # epochs so device_get never drains the async dispatch queue — the
        # host processes epoch e-depth+1 while the device runs epoch e
        # (TODO.md: ~25 ms/epoch of synchronous host time). nan_telemetry
        # needs the immediately-preceding train state, so it forces the
        # synchronous depth of 1.
        depth = max(1, cfg.host_pipeline_depth)
        if cfg.nan_telemetry:
            depth = 1
        pending = collections.deque()  # (epoch, device metrics, that epoch's ts)
        self._best_reward = best_reward
        last_t = time.time()
        stop = False

        def process(epoch: int, metrics, dt: float, ts_epoch) -> bool:
            """Handle one epoch's fetched metrics; True = stop training."""
            nonlocal prev_ts
            self._last_progress = time.time()
            # first PROCESSED epoch (start_epoch+1 on a supervisor resume,
            # not 1): compile is done, drop the first-epoch watchdog floor
            # back to the user's timeout
            if epoch == start_epoch + 1 and watchdog_timeout:
                self._watchdog_timeout = watchdog_timeout
            frame = int(metrics["info/frames"])
            # per-episode returns (rl_games game_rewards parity: each finished
            # episode contributes its own return to the tracking window)
            fin_rets = np.asarray(metrics.pop("episodes/finished_returns"))
            fin_n = np.asarray(metrics.pop("episodes/finished_n"))
            if fin_n.sum() > 0:
                self.game_rewards.update(fin_rets[fin_n > 0])
            if self._cur_gated:
                fc = float(metrics.get("episodes/finished_count", 0.0))
                self._strict_win.append(
                    float(metrics.get("env/strict_success_frac", 0.0))
                )
                if fc > 0:
                    # one sample per synchronized episode boundary:
                    # successes per finished episode under CURRENT tolerances
                    spe = float(metrics["episodes/finished_success_sum"]) / fc
                    self._suc_win.append(spe)
                    m = float(np.mean(self._suc_win))
                    lvl = self._cur_level
                    if (len(self._suc_win) == self._suc_win.maxlen
                            and m > self._cur_up_thresh):
                        lvl += self._cur_up_step
                    elif m < self._cur_down_thresh and lvl > 0.0:
                        lvl -= self._cur_down_step
                    if lvl != self._cur_level:
                        self._set_curriculum_level(lvl)
                    if self.writer is not None:
                        self.writer.add_scalar(
                            "curriculum/success_per_episode", spe, frame
                        )
                        self.writer.add_scalar(
                            "curriculum/level_target", self._cur_level, frame
                        )
                    # capability checkpoint: highest level reached, ties
                    # broken by strict-tolerance success (NOT shaped reward,
                    # which kept rising through the round-2 collapse).
                    # Throttled: during a steady climb the score improves on
                    # every level raise (~every episode sample) and each
                    # synchronous Orbax save costs ~1 s of device idle.
                    score = (float(metrics.get("env/curriculum_level", 0.0))
                             * 10.0 + float(np.mean(self._strict_win)))
                    now = time.time()
                    if score > self._best_cur_score and (
                        now - self._last_cur_save > 60.0
                    ):
                        self._best_cur_score = score
                        self._last_cur_save = now
                        self.save("best_curriculum", ts_epoch, wait=False)
            fps = cfg.horizon * self.static.num_envs / dt
            if self.writer is not None:
                for k, v in metrics.items():
                    self.writer.add_scalar(k, float(v), frame)
                self.writer.add_scalar("performance/fps", fps, frame)
                if self.game_rewards.current_size > 0:
                    self.writer.add_scalar(
                        "rewards0/frame", self.game_rewards.get_mean(), frame
                    )
            if self.verbose or epoch % 10 == 0:
                print_info(
                    f"epoch {epoch}/{epochs} frames {frame} fps {fps:,.0f} "
                    f"ep_rew {self.game_rewards.get_mean():.1f} "
                    f"kl {float(metrics['info/kl']):.4f} lr {float(metrics['info/lr']):.2e}"
                )
            mean_rew = self.game_rewards.get_mean()
            if (
                epoch >= cfg.save_best_after
                and self.game_rewards.current_size > 0
                and mean_rew > self._best_reward
            ):
                self._best_reward = mean_rew
                self.save("best", ts_epoch, wait=False)
            if cfg.save_frequency and epoch % cfg.save_frequency == 0:
                self.save("last", ts_epoch, wait=False)
            if (self.game_rewards.current_size > 0
                    and self.game_rewards.get_mean() >= cfg.score_to_win):
                print_notify(
                    f"score_to_win reached ({self.game_rewards.get_mean():.1f} "
                    f">= {cfg.score_to_win}); stopping early"
                )
                return True
            if not np.isfinite(float(metrics["info/kl"])):
                # params are garbage once kl is non-finite — halt instead of
                # burning the chip. nan/* telemetry (config nan_telemetry)
                # locates the first bad pipeline stage.
                from leibnizgym_tpu.utils import print_error

                print_error(
                    f"non-finite kl at epoch {epoch}; halting. "
                    + " ".join(
                        f"{k}={float(v):.3g}" for k, v in sorted(metrics.items())
                        if k.startswith("nan/")
                    )
                )
                if prev_ts is not None:
                    import pickle

                    path = os.path.join(self.logdir, "nan_prev_ts.pkl")
                    with open(path, "wb") as fh:
                        pickle.dump(jax.device_get(prev_ts), fh)
                    print_error(f"pre-nan train state dumped to {path}")
                # ts_epoch is the FIRST state whose metrics are bad —
                # not the pipeline head, which is up to depth-1 epochs past it
                self.save("nan_halt", ts_epoch, wait=True)
                return True
            return False

        # max_epochs is a TOTAL budget across restarts: a supervisor resume
        # restores ts.epoch from the checkpoint, and the loop continues from
        # there instead of training max_epochs MORE epochs (pre-round-5 the
        # count was per-process, so every auto-restart extended the run).
        start_epoch = int(self.ts.epoch)
        if start_epoch >= epochs:
            # a completed run re-invoked with the same budget: do NOT fall
            # through to save("final") — that would overwrite the finished
            # run's final checkpoint with the just-restored state
            print_notify(
                f"resumed at epoch {start_epoch} >= max_epochs {epochs}; "
                "nothing to train"
            )
            self._stop_watchdog()
            return self.game_rewards.get_mean()
        try:
            for epoch in range(start_epoch + 1, epochs + 1):
                if cfg.nan_telemetry:
                    # keep the pre-epoch state so a nan halt can dump the exact
                    # reproducer (replayed by scripts/nan_replay.py)
                    prev_ts = self.ts
                self.ts, metrics_dev = self._train_iter(
                    cfg, self.static, self.env_params, self.ts
                )
                pending.append((epoch, metrics_dev, self.ts))
                if len(pending) >= depth:
                    e, m, ts_e = pending.popleft()
                    now = time.time()
                    # steady-state wall time per epoch (the fetch of an epoch
                    # `depth` back only blocks if the device is actually behind)
                    dt, last_t = now - last_t, now
                    stop = process(e, jax.device_get(m), dt, ts_e)
                    if stop:
                        break
            while pending and not stop:
                e, m, ts_e = pending.popleft()
                now = time.time()
                dt, last_t = now - last_t, now
                stop = process(e, jax.device_get(m), dt, ts_e)
        finally:
            # training is over (or dying): the watchdog must not shoot a
            # process that is now legitimately doing something else (eval,
            # checkpoint IO, a long-lived test session)
            self._stop_watchdog()
            # an exception/KeyboardInterrupt must not leave the last async
            # 'best'/'last' commit to a background thread a supervisor
            # SIGTERM can cut short after the old directory was removed
            self.flush_saves()
        best_reward = self._best_reward
        self.save("final", wait=True)
        total = time.time() - t_start
        print_notify(
            f"Training done: epoch {int(self.ts.epoch)}/{epochs}, "
            f"{int(self.ts.frame)} frames, "
            f"{total:.0f}s, best ep reward {best_reward:.1f}"
        )
        return self.game_rewards.get_mean()

    # ---------------------------------------------------------------- playing

    def make_policy(self, deterministic: bool = True,
                    curriculum_level: Optional[float] = None):
        """Build the deployment-side policy: a jitted ``(obs, key) -> action``
        closure over the current ``ts.ac_params`` with the training-time
        obs/action clipping baked in. Shared by :meth:`play` and external
        evaluators (scripts/eval_policy.py) so any change to the action
        semantics propagates everywhere.

        In success-gated curriculum mode the env is set to FULL difficulty
        (level 1.0: fully random goal orientations, final tolerances) unless
        ``curriculum_level`` overrides it."""
        if self._cur_gated:
            lvl = 1.0 if curriculum_level is None else float(curriculum_level)
            self.env.params = self.env.params.replace(
                curriculum_level=jnp.asarray(lvl, jnp.float32)
            )
            print_info(f"play: curriculum level {lvl:.2f}")
        actor_critic, _ = make_networks(self.ppo_cfg, self.static)
        cfg = self.ppo_cfg

        @jax.jit
        def _policy(params, obs, key):
            mu, log_std, _ = actor_critic.apply(params, obs)
            if deterministic:
                action = mu
            else:
                action = mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape)
            return jnp.clip(action, -cfg.clip_actions, cfg.clip_actions)

        def policy(obs, key):
            obs = jnp.clip(obs, -cfg.clip_obs, cfg.clip_obs)
            return _policy(self.ts.ac_params, obs, key)

        return policy

    def wrap_env(self, env=None):
        """Apply the inference-side obs wrappers the policy was trained with:
        FrameStack when ``frames > 1`` (reference rlg_train.py:83-86). The
        learner rolls the stack inside its jitted rollout; external step
        loops (play/eval/replay) get the equivalent via the wrapper."""
        from leibnizgym_tpu.wrappers import stack_if_frames

        return stack_if_frames(
            env if env is not None else self.env, self.ppo_cfg.frames
        )

    def play(self, checkpoint: Optional[str] = None, num_steps: int = 1000,
             deterministic: bool = True,
             curriculum_level: Optional[float] = None):
        """Run the trained policy (reference play path, rlg_hydra README.md:83-97)."""
        if self.ts is None:
            self.reset()
        if checkpoint:
            self.restore(checkpoint)
        policy = self.make_policy(deterministic, curriculum_level)
        env = self.wrap_env()
        obs = env.reset()
        key = jax.random.PRNGKey(0)
        total_reward = np.zeros(self.static.num_envs)
        for step in range(num_steps):
            key, k = jax.random.split(key)
            action = policy(obs, k)
            obs, reward, dones, info = env.step(action)
            total_reward += np.asarray(reward)
            if self.env.visualize:  # live viewer (reference render-per-step)
                self.env.render()
        mean_r = float(total_reward.mean())
        print_info(f"play: {num_steps} steps, mean accumulated reward {mean_r:.1f}")
        return mean_r
