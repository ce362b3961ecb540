"""PPO with asymmetric actor-critic — the rl_games-equivalent learner.

Algorithm parity with rl_games a2c_continuous as configured by the reference
(/root/reference/resources/config/rlg/asymm.yaml:39-91):
- clipped surrogate (e_clip), critic MSE with critic_coef, bounds loss on mu,
  optional entropy bonus, global grad-norm clipping
- GAE(gamma, tau) with the rl_games done-masking convention
- adaptive learning rate from analytic Gaussian KL against a threshold,
  updated per minibatch (rl_games AdaptiveScheduler: /1.5 above 2x threshold,
  x1.5 below 0.5x threshold, clamped to [1e-6, 1e-2])
- reward shaping by scale_value before GAE
- separate central-value network trained on privileged states; its values
  (not the actor tower's critic) drive GAE when asymmetric
- whole-batch advantage normalization

TPU-first design: one `train_iteration` = rollout (lax.scan over horizon) +
GAE + minibatched updates (lax.scan over minibatches), all inside a single
jit — zero host round-trips per epoch. The env axis is shardable; gradients
are averaged by jit's partitioner via psum when the batch axis is sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from leibnizgym_tpu.envs.trifinger.env import EnvParams, EnvState, EnvStatic, env_step
from leibnizgym_tpu.models.networks import (
    ActorCritic,
    CentralValue,
    fused_forward,
    fused_log_std,
    gaussian_entropy,
    gaussian_kl,
    gaussian_neglogp,
    stack_fused,
    unstack_fused,
)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Static hyperparameters (defaults = reference asymm.yaml)."""

    gamma: float = 0.99
    tau: float = 0.95
    learning_rate: float = 3e-4
    lr_schedule: str = "adaptive"
    kl_threshold: float = 0.008
    min_lr: float = 1e-6
    max_lr: float = 1e-2
    e_clip: float = 0.2
    horizon: int = 32
    minibatch_size: int = 8192
    mini_epochs: int = 4
    critic_coef: float = 4.0
    entropy_coef: float = 0.0
    bounds_loss_coef: float = 1e-4
    bounds_soft: float = 1.1
    grad_norm: float = 1.0
    truncate_grads: bool = True
    clip_value: bool = False
    normalize_advantage: bool = True
    reward_shaper_scale: float = 0.01
    clip_obs: float = 5.0
    clip_actions: float = 1.0
    # observation frame stacking (reference rlg_train.py:83-86:
    # ``wrappers.FrameStack(env, frames, False)``): the actor consumes the
    # last `frames` clipped observations, flattened frame-major (oldest
    # first). Rolls inside the jitted rollout scan — and, quirk-faithful to
    # rl_games' vectorized wrapper, rolls THROUGH per-env auto-resets (the
    # stack is never cleared per-env on done). 1 = no stacking.
    frames: int = 1
    max_epochs: int = 100000
    save_best_after: int = 500
    save_frequency: int = 100
    score_to_win: float = 1e6
    games_to_track: int = 100
    # asymmetric central value
    central_value: bool = True
    cv_learning_rate: float = 5e-4
    cv_mini_epochs: int = 4
    cv_minibatch_size: int = 8192
    shuffle_minibatches: bool = True
    units: Tuple[int, ...] = (400, 200, 100)
    # compute dtype of the MLP towers ("float32" | "bfloat16"): bfloat16 puts
    # the matmuls on the MXU fast path; params and the policy math (neglogp,
    # KL, losses) stay float32 either way
    network_dtype: str = "float32"
    # exploration floor on the policy sigma (see models/networks.py): -20
    # disables it (rl_games parity); the D4 presets use log(0.2) ~ -1.61 to
    # prevent the premature entropy collapse that kills orientation discovery
    log_std_min: float = -20.0
    # Fused-tower update path (round-5 perf experiment): evaluate the actor /
    # critic / central-value towers as ONE batched-matmul chain (inputs
    # zero-padded to a lane multiple, towers stacked — models/networks.py
    # stack_fused) and run the clip+Adam tail on the 9 stacked leaves
    # instead of ~34 canonical ones. Mathematically equivalent to the
    # unfused path up to f32 summation order (pinned by tests); checkpoints
    # keep the canonical tree layout (stack/unstack at the epoch boundary).
    # MEASURED SLOWER on v5e (60.8 ms epoch vs 56.6 unfused — the padded
    # batched matmuls cost more than the per-op savings; RESULTS.md round
    # 5), so the default stays off; kept as a tested opt-in ablation.
    fused_update: bool = False
    # Fuse the actor+cv towers of the ROLLOUT inference edge into one
    # batched-matmul chain (independent of fused_update). Measured a small
    # win on v5e (56.3 ms epoch vs 56.6; RESULTS.md round 5) — default on.
    fused_rollout: bool = True
    # lax.scan unroll factor for the minibatch-update scan: unrolling lets
    # XLA software-pipeline consecutive updates and removes per-iteration
    # while-loop overhead. Pure scheduling — identical math. Measured
    # neutral at 2 and SLOWER at 4 on v5e (RESULTS.md round 5); default 1.
    update_unroll: int = 1
    # emit per-stage finiteness flags + magnitudes (nan/* metrics) to locate
    # the first non-finite tensor in the rollout->GAE->update pipeline
    nan_telemetry: bool = False
    # host-loop pipeline depth: the runner keeps this many epochs' metrics
    # on-device before fetching, so the per-epoch device_get never drains
    # the async dispatch queue (host reads epoch e-K while the device runs
    # epoch e). 1 = fully synchronous; forced to 1 when nan_telemetry is on
    # (the nan dump needs the immediately-preceding train state)
    host_pipeline_depth: int = 4

    @classmethod
    def from_rlg_params(cls, params: dict, num_actors: int) -> "PPOConfig":
        """Build from an rl_games-style ``params`` dict (asymm.yaml schema)."""
        c = params["config"]
        cv = c.get("central_value_config")
        units = tuple(params.get("network", {}).get("mlp", {}).get("units", (400, 200, 100)))
        return cls(
            gamma=float(c.get("gamma", 0.99)),
            tau=float(c.get("tau", 0.95)),
            learning_rate=float(c.get("learning_rate", 3e-4)),
            lr_schedule=str(c.get("lr_schedule", "adaptive")),
            kl_threshold=float(c.get("lr_threshold", c.get("kl_threshold", 0.008))),
            e_clip=float(c.get("e_clip", 0.2)),
            horizon=int(c.get("steps_num", c.get("horizon_length", 32))),
            minibatch_size=int(c.get("minibatch_size", num_actors)),
            mini_epochs=int(c.get("mini_epochs", 4)),
            critic_coef=float(c.get("critic_coef", 4)),
            entropy_coef=float(c.get("entropy_coef", 0.0)),
            bounds_loss_coef=float(c.get("bounds_loss_coef", 1e-4) or 0.0),
            grad_norm=float(c.get("grad_norm", 1.0)),
            truncate_grads=bool(c.get("truncate_grads", True)),
            clip_value=bool(c.get("clip_value", False)),
            normalize_advantage=bool(c.get("normalize_advantage", True)),
            reward_shaper_scale=float(
                c.get("reward_shaper", {}).get("scale_value", 1.0)
            ),
            max_epochs=int(c.get("max_epochs", 100000)),
            save_best_after=int(c.get("save_best_after", 500)),
            save_frequency=int(c.get("save_frequency", 100)),
            score_to_win=float(c.get("score_to_win", 1e6)),
            games_to_track=int(c.get("games_to_track", 100)),
            central_value=cv is not None,
            cv_learning_rate=float(cv["lr"]) if cv else 5e-4,
            cv_mini_epochs=int(cv.get("mini_epochs", 4)) if cv else 4,
            cv_minibatch_size=int(cv.get("minibatch_size", num_actors)) if cv else 8192,
            units=units,
            network_dtype=(
                "bfloat16"
                if (c.get("mixed_precision") or c.get("network_dtype") == "bfloat16")
                else "float32"
            ),
            frames=int(c.get("frames", 1)),
            fused_update=bool(c.get("fused_update", False)),
            fused_rollout=bool(c.get("fused_rollout", True)),
            update_unroll=int(c.get("update_unroll", 1)),
            nan_telemetry=bool(c.get("nan_telemetry", False)),
            log_std_min=float(c.get("log_std_min", -20.0)),
            host_pipeline_depth=int(c.get("host_pipeline_depth", 4)),
        )


@struct.dataclass
class PPOTrainState:
    ac_params: Any
    cv_params: Any  # None if not asymmetric
    ac_opt_state: Any
    cv_opt_state: Any
    lr: jax.Array  # adaptive learning rate, ()
    env_state: EnvState
    obs: jax.Array  # (N, obs_dim) clipped
    states: jax.Array  # (N, state_dim)
    ep_return: jax.Array  # (N,) raw reward accumulator
    ep_len: jax.Array  # (N,)
    key: jax.Array
    epoch: jax.Array  # () int32
    frame: jax.Array  # () float32 counter of env frames (int32 overflows at 2.1B)


def make_networks(cfg: PPOConfig, static: EnvStatic):
    import jax.numpy as _jnp

    dtype = _jnp.bfloat16 if cfg.network_dtype == "bfloat16" else _jnp.float32
    actor_critic = ActorCritic(
        action_dim=static.action_dim, units=cfg.units, dtype=dtype,
        log_std_min=cfg.log_std_min,
    )
    central_value = CentralValue(units=cfg.units, dtype=dtype) if (
        cfg.central_value and static.asymmetric_obs
    ) else None
    return actor_critic, central_value


def make_optimizers(cfg: PPOConfig):
    """Adam preconditioner WITHOUT the lr step — the (adaptive) lr is applied
    by scaling the preconditioned updates, so it can be a traced value."""

    def chain():
        steps = []
        if cfg.truncate_grads:
            steps.append(optax.clip_by_global_norm(cfg.grad_norm))
        steps.append(optax.scale_by_adam(eps=1e-8))
        return optax.chain(*steps)

    return chain(), chain()


def _apply_lr(updates, lr):
    return jax.tree.map(lambda u: -lr * u, updates)


# Adam constants of make_optimizers' scale_by_adam (optax defaults + the
# explicit eps) — the fused-tower path reimplements the identical math on
# stacked leaves, so these must stay in sync with make_optimizers.
_ADAM_B1, _ADAM_B2, _ADAM_EPS = 0.9, 0.999, 1e-8


def _find_adam(opt_state):
    """Locate the ScaleByAdamState inside an optax chain state tuple."""
    for i, s in enumerate(opt_state):
        if isinstance(s, optax.ScaleByAdamState):
            return i, s
    raise ValueError("optimizer state has no ScaleByAdamState")


def _replace_adam(opt_state, slot, new_adam):
    return tuple(
        new_adam if i == slot else s for i, s in enumerate(opt_state)
    )


def init_train_state(
    cfg: PPOConfig,
    static: EnvStatic,
    params: EnvParams,
    key: jax.Array,
) -> PPOTrainState:
    from leibnizgym_tpu.envs.trifinger.env import env_reset

    k_env, k_ac, k_cv, k_rest = jax.random.split(key, 4)
    env_state, obs = env_reset(static, params, k_env)
    obs = jnp.clip(obs, -cfg.clip_obs, cfg.clip_obs)
    if cfg.frames > 1:
        # initial stack = the reset obs repeated (FrameStack.reset parity)
        obs = jnp.tile(obs, (1, cfg.frames))
    actor_critic, central_value = make_networks(cfg, static)
    ac_params = actor_critic.init(k_ac, obs[:1])
    ac_tx, cv_tx = make_optimizers(cfg)
    ac_opt_state = ac_tx.init(ac_params)
    if central_value is not None:
        states0 = jnp.zeros((1, static.state_dim))
        cv_params = central_value.init(k_cv, states0)
        cv_opt_state = cv_tx.init(cv_params)
        states = jnp.zeros((static.num_envs, static.state_dim))
    else:
        cv_params, cv_opt_state = None, None
        states = jnp.zeros((static.num_envs, 0))
    return PPOTrainState(
        ac_params=ac_params,
        cv_params=cv_params,
        ac_opt_state=ac_opt_state,
        cv_opt_state=cv_opt_state,
        lr=jnp.asarray(cfg.learning_rate, jnp.float32),
        env_state=env_state,
        obs=obs,
        states=states,
        ep_return=jnp.zeros(static.num_envs),
        ep_len=jnp.zeros(static.num_envs, jnp.int32),
        key=k_rest,
        epoch=jnp.zeros((), jnp.int32),
        frame=jnp.zeros((), jnp.float32),
    )


def _gae(cfg: PPOConfig, rewards, values, dones, last_value):
    """rl_games discount_values: nextnonterminal[t] = 1 - done_after_t."""

    def body(carry, inp):
        lastgaelam = carry
        reward, value, done, next_value = inp
        nonterminal = 1.0 - done
        delta = reward + cfg.gamma * next_value * nonterminal - value
        lastgaelam = delta + cfg.gamma * cfg.tau * nonterminal * lastgaelam
        return lastgaelam, lastgaelam

    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
    _, advs = jax.lax.scan(
        body,
        jnp.zeros_like(last_value),
        (rewards, values, dones.astype(jnp.float32), next_values),
        reverse=True,
    )
    return advs


def train_iteration(
    cfg: PPOConfig,
    static: EnvStatic,
    env_params: EnvParams,
    ts: PPOTrainState,
) -> Tuple[PPOTrainState, Dict[str, jax.Array]]:
    """One PPO epoch: rollout horizon steps, GAE, minibatched updates."""
    actor_critic, central_value = make_networks(cfg, static)
    ac_tx, cv_tx = make_optimizers(cfg)
    n = static.num_envs
    h = cfg.horizon
    asym = central_value is not None
    net_dtype = jnp.bfloat16 if cfg.network_dtype == "bfloat16" else jnp.float32
    fuse_towers = cfg.fused_update and asym
    obs_width = static.obs_dim * cfg.frames

    if cfg.fused_rollout and asym:
        # actor + central-value towers as one batched-matmul chain for the
        # rollout inference edge (the critic tower is dead code here — the
        # unfused path relied on XLA DCE for the same effect)
        fp_roll = stack_fused(
            ts.ac_params, ts.cv_params, obs_width, static.state_dim,
            cfg.units, static.action_dim, towers=("actor", "cv"),
        )

        def policy_and_value(obs, states):
            out = fused_forward(fp_roll, [obs, states], net_dtype)
            mu = out[0]
            log_std = fused_log_std(
                fp_roll, mu, actor_critic.log_std_min, actor_critic.log_std_max
            )
            return mu, log_std, out[1][..., 0]
    else:
        def policy_and_value(obs, states):
            mu, log_std, own_value = actor_critic.apply(ts.ac_params, obs)
            if asym:
                return mu, log_std, central_value.apply(ts.cv_params, states)
            return mu, log_std, own_value

    # ---------------- rollout ------------------------------------------------
    def rollout_step(carry, _):
        (env_state, obs, states, ep_ret, ep_len, fin_ret, fin_n, fin_suc,
         key) = carry
        key, k_act = jax.random.split(key)
        mu, log_std, value = policy_and_value(obs, states)
        noise = jax.random.normal(k_act, mu.shape)
        action = mu + jnp.exp(log_std) * noise
        neglogp = gaussian_neglogp(mu, log_std, action)
        clipped = jnp.clip(action, -cfg.clip_actions, cfg.clip_actions)
        env_state, next_obs, next_states, reward, done, info = env_step(
            static, env_params, env_state, clipped
        )
        next_obs = jnp.clip(next_obs, -cfg.clip_obs, cfg.clip_obs)
        if cfg.frames > 1:
            # roll the frame stack: drop the oldest obs_dim block, append
            # the new frame (never cleared per-env on reset — see PPOConfig)
            next_obs = jnp.concatenate(
                [obs[:, static.obs_dim:], next_obs], axis=-1
            )
        if asym:
            next_states = jnp.clip(next_states, -cfg.clip_obs, cfg.clip_obs)
        shaped = reward * cfg.reward_shaper_scale

        # episode tracking on raw rewards; an env flagged for reset finishes
        # its episode this step (the reset applies at the next step's start).
        # Per-env final returns are carried so the runner can track individual
        # episodes (rl_games game_rewards parity); with timeout-driven resets
        # an env finishes at most once per horizon, so a (N,) slot is exact.
        ep_ret = ep_ret + reward
        ep_len = ep_len + 1
        finished = env_state.reset_buf
        fin_ret = jnp.where(finished, ep_ret, fin_ret)
        fin_n = fin_n + finished.astype(fin_n.dtype)
        # successes of episodes finishing this step (the buffer zeroes on the
        # NEXT step's reset, so it still holds the final per-episode count):
        # the phase-independent signal the success-gated curriculum
        # controller consumes (successes-per-finished-episode)
        fin_suc = fin_suc + jnp.sum(
            jnp.where(finished, env_state.successes, 0).astype(jnp.float32)
        )
        ep_ret = jnp.where(finished, 0.0, ep_ret)
        ep_len = jnp.where(finished, 0, ep_len)

        out = (obs, states, action, mu, log_std, neglogp, value, shaped,
               done.astype(jnp.float32), info)
        return (env_state, next_obs, next_states, ep_ret, ep_len,
                fin_ret, fin_n, fin_suc, key), out

    carry0 = (ts.env_state, ts.obs, ts.states, ts.ep_return, ts.ep_len,
              jnp.zeros(n), jnp.zeros(n, jnp.int32), jnp.zeros(()), ts.key)
    carry, traj = jax.lax.scan(rollout_step, carry0, None, length=h)
    (env_state, last_obs, last_states, ep_ret, ep_len, fin_ret, fin_n,
     fin_suc, key) = carry
    (b_obs, b_states, b_action, b_mu, b_log_std, b_neglogp, b_value, b_reward,
     b_done, infos) = traj

    _, _, last_value = policy_and_value(last_obs, last_states)

    advs = _gae(cfg, b_reward, b_value, b_done, last_value)
    returns = advs + b_value

    # ---------------- flatten + normalize -----------------------------------
    batch = h * n

    def flat(x):
        return x.reshape((batch,) + x.shape[2:])

    # ---------------- actor-critic minibatch updates -------------------------
    num_mb = max(batch // cfg.minibatch_size, 1)
    mb_size = batch // num_mb

    # Sharding-aware minibatching (VERDICT round-1 item 5): flattening
    # (h, n, d) time-major and gathering a GLOBAL random permutation forces
    # the SPMD partitioner to all-gather the entire trajectory onto every
    # device of a data mesh (observed: obs/states/actions/advantages gathered
    # per epoch), degenerating the learner to replicated compute. Instead,
    # keep the trajectory TIME-MAJOR exactly as the rollout scan produced it
    # (env axis sharded, untouched) and build minibatch i from k = h/num_mb
    # whole timestep rows, drawn per mini-epoch from a random permutation of
    # the h row indices. Every sample is used exactly once per mini-epoch;
    # row selection is an h-length leading-axis take (cheap), there are no
    # trajectory transposes or per-element gathers (a per-env time shuffle
    # via argsort+take_along_axis was measured 13x slower end-to-end on the
    # chip), and the only collectives left are the per-minibatch
    # gradient/metric all-reduces. Within-minibatch samples share their
    # timesteps across all n envs — with thousands of independent envs per
    # row the gradient estimate is as decorrelated as rl_games' global
    # shuffle in practice. Falls back to the rl_games-exact global shuffle
    # when num_mb does not divide the horizon.
    time_sliced = cfg.shuffle_minibatches and num_mb <= h and h % num_mb == 0

    if cfg.normalize_advantage:
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

    if not time_sliced:
        f_obs, f_states, f_action, f_mu, f_log_std, f_neglogp, f_value = map(
            flat, (b_obs, b_states, b_action, b_mu, b_log_std, b_neglogp, b_value)
        )
        f_returns, f_advs = flat(returns), flat(advs)

    def _ac_loss_terms(mb, mu, log_std, value):
        """PPO surrogate + critic + entropy + bounds terms on a minibatch,
        given the network outputs — shared by the per-tower and fused-tower
        update paths so the loss math cannot drift between them."""
        neglogp = gaussian_neglogp(mu, log_std, mb["action"])
        ratio = jnp.exp(mb["neglogp"] - neglogp)
        surr1 = -mb["advs"] * ratio
        surr2 = -mb["advs"] * jnp.clip(ratio, 1.0 - cfg.e_clip, 1.0 + cfg.e_clip)
        a_loss = jnp.mean(jnp.maximum(surr1, surr2))
        if cfg.clip_value:
            v_clipped = mb["value"] + jnp.clip(
                value - mb["value"], -cfg.e_clip, cfg.e_clip
            )
            c_loss = jnp.mean(
                jnp.maximum(
                    jnp.square(value - mb["returns"]),
                    jnp.square(v_clipped - mb["returns"]),
                )
            )
        else:
            c_loss = jnp.mean(jnp.square(value - mb["returns"]))
        entropy = jnp.mean(gaussian_entropy(log_std))
        mu_high = jnp.square(jnp.maximum(mu - cfg.bounds_soft, 0.0))
        mu_low = jnp.square(jnp.minimum(mu + cfg.bounds_soft, 0.0))
        b_loss = jnp.mean(jnp.sum(mu_high + mu_low, axis=-1))
        total = (
            a_loss
            + 0.5 * c_loss * cfg.critic_coef
            - cfg.entropy_coef * entropy
            + cfg.bounds_loss_coef * b_loss
        )
        kl = gaussian_kl(mb["mu"], mb["log_std"], mu, log_std)
        return total, (a_loss, c_loss, entropy, b_loss, kl)

    def loss_fn(ac_params, mb, lr_unused):
        mu, log_std, value = actor_critic.apply(ac_params, mb["obs"])
        return _ac_loss_terms(mb, mu, log_std, value)

    if time_sliced:
        # time-major (h, n, ...) exactly as the rollout scan emitted it
        data = {
            "obs": b_obs, "action": b_action, "mu": b_mu,
            "log_std": b_log_std, "neglogp": b_neglogp, "advs": advs,
            "returns": returns, "value": b_value,
        }
        k_rows = h // num_mb  # timestep rows per minibatch
    else:
        data = {
            "obs": f_obs, "action": f_action, "mu": f_mu, "log_std": f_log_std,
            "neglogp": f_neglogp, "advs": f_advs, "returns": f_returns,
            "value": f_value,
        }

    # Draw every mini-epoch's minibatch indices up front (same RNG stream
    # order as the historical per-mini-epoch loops: all actor draws, then all
    # central-value draws) so the updates can run in a single scan.
    ac_idx_epochs = []
    for _ in range(cfg.mini_epochs):
        key, k_perm = jax.random.split(key)
        if time_sliced:
            ac_idx_epochs.append(
                jax.random.permutation(k_perm, h).reshape(num_mb, k_rows)
            )
        else:
            if cfg.shuffle_minibatches:
                perm = jax.random.permutation(k_perm, batch)
            else:
                perm = jnp.arange(batch)
            ac_idx_epochs.append(perm[: num_mb * mb_size].reshape(num_mb, mb_size))
    ac_idxs = jnp.concatenate(ac_idx_epochs, axis=0)

    cv_params, cv_opt_state = ts.cv_params, ts.cv_opt_state
    cv_loss_mean = jnp.asarray(0.0)
    cv_idxs = None
    if asym:
        cv_num_mb = max(batch // cfg.cv_minibatch_size, 1)
        cv_mb = batch // cv_num_mb
        # same timestep-row minibatching as the actor (see the note above)
        cv_time_sliced = (
            cfg.shuffle_minibatches and cv_num_mb <= h and h % cv_num_mb == 0
        )

        def cv_loss_fn(p, s, r):
            v = central_value.apply(p, s)
            return jnp.mean(jnp.square(v - r))

        if cv_time_sliced:
            cv_data = {"s": b_states, "r": returns}  # time-major (h, n, ...)
            cv_k_rows = h // cv_num_mb
        else:
            cv_data = {"s": flat(b_states), "r": flat(returns)}

        cv_idx_epochs = []
        for _ in range(cfg.cv_mini_epochs):
            key, k_perm = jax.random.split(key)
            if cv_time_sliced:
                cv_idx_epochs.append(
                    jax.random.permutation(k_perm, h).reshape(cv_num_mb, cv_k_rows)
                )
            else:
                perm = jax.random.permutation(k_perm, batch)
                cv_idx_epochs.append(
                    perm[: cv_num_mb * cv_mb].reshape(cv_num_mb, cv_mb)
                )
        cv_idxs = jnp.concatenate(cv_idx_epochs, axis=0)

    def _ac_step(ac_params, opt_state, lr, idx):
        # idx: (k_rows,) timestep-row indices when time_sliced, else
        # (mb_size,) flat sample indices — both a leading-axis take.
        # When time_sliced the minibatch keeps its (k_rows, n, ...) shape —
        # the loss reduces over all leading dims, and merging the replicated
        # row dim into the sharded env dim would force a resharding
        mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=0), data)
        (total, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ac_params, mb, lr
        )
        updates, opt_state = ac_tx.update(grads, opt_state, ac_params)
        ac_params = optax.apply_updates(ac_params, _apply_lr(updates, lr))
        a_loss, c_loss, entropy, b_loss, kl = aux
        if cfg.lr_schedule == "adaptive":
            lr = jnp.where(kl > 2.0 * cfg.kl_threshold,
                           jnp.maximum(lr / 1.5, cfg.min_lr), lr)
            lr = jnp.where(kl < 0.5 * cfg.kl_threshold,
                           jnp.minimum(lr * 1.5, cfg.max_lr), lr)
        mb_out = (total, a_loss, c_loss, entropy, kl)
        if cfg.nan_telemetry:
            mb_out = mb_out + (optax.global_norm(grads),)
        return ac_params, opt_state, lr, mb_out

    def _cv_step(p, opt, idx):
        s = jnp.take(cv_data["s"], idx, axis=0)
        r = jnp.take(cv_data["r"], idx, axis=0)
        loss, grads = jax.value_and_grad(cv_loss_fn)(p, s, r)
        updates, opt = cv_tx.update(grads, opt, p)
        p = optax.apply_updates(
            p, _apply_lr(updates, jnp.asarray(cfg.cv_learning_rate)))
        return p, opt, loss

    ac_params, ac_opt_state, lr = ts.ac_params, ts.ac_opt_state, ts.lr
    # Fused-tower path (cfg.fused_update): one batched-matmul fwd+bwd chain
    # for all three towers per minibatch step and a stacked clip+Adam tail —
    # requires the actor and cv minibatch schedules to line up exactly so
    # their inputs stack (same row source, same count). nan_telemetry keeps
    # the historical path so per-chain grad norms stay observable.
    fused_towers_ok = (
        fuse_towers
        and not cfg.nan_telemetry
        and cv_idxs is not None
        and cv_idxs.shape == ac_idxs.shape
        # equal idx SHAPES are not enough: one side can be time-sliced row
        # indices (minibatch (k_rows, n, W)) while the other is flat sample
        # indices (minibatch (mb, W)) — the stacked forward would get
        # rank-mismatched inputs; fall back to the per-tower path instead
        and time_sliced == cv_time_sliced
    )
    if fused_towers_ok:
        sargs = (obs_width, static.state_dim, cfg.units, static.action_dim)
        fp = stack_fused(ts.ac_params, ts.cv_params, *sargs)
        ac_slot, ac_adam = _find_adam(ts.ac_opt_state)
        cv_slot, cv_adam = _find_adam(ts.cv_opt_state)
        mu_f = stack_fused(ac_adam.mu, cv_adam.mu, *sargs)
        nu_f = stack_fused(ac_adam.nu, cv_adam.nu, *sargs)
        b1, b2, eps = _ADAM_B1, _ADAM_B2, _ADAM_EPS
        cv_lr = jnp.asarray(cfg.cv_learning_rate, jnp.float32)

        def fused_loss(fp_, ac_mb, cv_s, cv_r):
            out = fused_forward(
                fp_, [ac_mb["obs"], ac_mb["obs"], cv_s], net_dtype
            )
            mu = out[0]
            value = out[1][..., 0]
            v_cv = out[2][..., 0]
            log_std = fused_log_std(
                fp_, mu, actor_critic.log_std_min, actor_critic.log_std_max
            )
            ac_total, aux = _ac_loss_terms(ac_mb, mu, log_std, value)
            cv_l = jnp.mean(jnp.square(v_cv - cv_r))
            # disjoint param columns: grads of the sum == separate grads
            return ac_total + cv_l, (ac_total, aux, cv_l)

        def fused_sgd(fp_, mu_f_, nu_f_, c_ac, c_cv, lr_, grads):
            """clip_by_global_norm + scale_by_adam + (-lr) on stacked leaves,
            per optimizer group (ac = tower entries 0,1 + log_std; cv = 2).
            Padded kernel regions carry exactly-zero gradients, so the group
            norms and moments equal their canonical-tree counterparts."""
            ac_sq = jnp.sum(jnp.square(grads["log_std"]))
            cv_sq = jnp.zeros(())
            for k_ in grads:
                if k_ == "log_std":
                    continue
                g = grads[k_]
                ac_sq = ac_sq + jnp.sum(jnp.square(g[0:2]))
                cv_sq = cv_sq + jnp.sum(jnp.square(g[2]))
            ac_norm, cv_norm = jnp.sqrt(ac_sq), jnp.sqrt(cv_sq)
            if cfg.truncate_grads:
                s_ac = jnp.where(
                    ac_norm < cfg.grad_norm, 1.0, cfg.grad_norm / ac_norm
                )
                s_cv = jnp.where(
                    cv_norm < cfg.grad_norm, 1.0, cfg.grad_norm / cv_norm
                )
            else:
                s_ac = s_cv = jnp.ones(())
            c_ac = c_ac + 1
            c_cv = c_cv + 1
            bc1_ac = 1.0 - b1 ** c_ac.astype(jnp.float32)
            bc2_ac = 1.0 - b2 ** c_ac.astype(jnp.float32)
            bc1 = jnp.stack([bc1_ac, bc1_ac, 1.0 - b1 ** c_cv.astype(jnp.float32)])
            bc2 = jnp.stack([bc2_ac, bc2_ac, 1.0 - b2 ** c_cv.astype(jnp.float32)])
            scale3 = jnp.stack([s_ac, s_ac, s_cv])
            lr3 = jnp.stack([lr_, lr_, cv_lr])
            new_fp, new_mu, new_nu = {}, {}, {}
            for k_, p in fp_.items():
                g = grads[k_]
                if k_ == "log_std":
                    g = g * s_ac
                    m = b1 * mu_f_[k_] + (1.0 - b1) * g
                    v = b2 * nu_f_[k_] + (1.0 - b2) * jnp.square(g)
                    upd = (m / bc1_ac) / (jnp.sqrt(v / bc2_ac) + eps)
                    new_fp[k_] = p - lr_ * upd
                else:
                    sh = (3,) + (1,) * (g.ndim - 1)
                    g = g * scale3.reshape(sh)
                    m = b1 * mu_f_[k_] + (1.0 - b1) * g
                    v = b2 * nu_f_[k_] + (1.0 - b2) * jnp.square(g)
                    upd = (m / bc1.reshape(sh)) / (
                        jnp.sqrt(v / bc2.reshape(sh)) + eps
                    )
                    new_fp[k_] = p - lr3.reshape(sh) * upd
                new_mu[k_], new_nu[k_] = m, v
            return new_fp, new_mu, new_nu, c_ac, c_cv

        def fused_step(carry, xs):
            fp_, mu_f_, nu_f_, c_ac, c_cv, lr_ = carry
            ac_idx, cv_idx = xs
            ac_mb = jax.tree.map(lambda x: jnp.take(x, ac_idx, axis=0), data)
            cv_s = jnp.take(cv_data["s"], cv_idx, axis=0)
            cv_r = jnp.take(cv_data["r"], cv_idx, axis=0)
            (_, aux), grads = jax.value_and_grad(fused_loss, has_aux=True)(
                fp_, ac_mb, cv_s, cv_r
            )
            ac_total, (a_loss, c_loss, entropy, b_loss, kl), cv_l = aux
            fp_, mu_f_, nu_f_, c_ac, c_cv = fused_sgd(
                fp_, mu_f_, nu_f_, c_ac, c_cv, lr_, grads
            )
            if cfg.lr_schedule == "adaptive":
                lr_ = jnp.where(kl > 2.0 * cfg.kl_threshold,
                                jnp.maximum(lr_ / 1.5, cfg.min_lr), lr_)
                lr_ = jnp.where(kl < 0.5 * cfg.kl_threshold,
                                jnp.minimum(lr_ * 1.5, cfg.max_lr), lr_)
            mb_out = (ac_total, a_loss, c_loss, entropy, kl)
            return (fp_, mu_f_, nu_f_, c_ac, c_cv, lr_), (mb_out, cv_l)

        carry_f = (fp, mu_f, nu_f, ac_adam.count, cv_adam.count, lr)
        carry_f, (ep_metrics, cv_losses) = jax.lax.scan(
            fused_step, carry_f, (ac_idxs, cv_idxs),
            unroll=cfg.update_unroll,
        )
        fp, mu_f, nu_f, c_ac, c_cv, lr = carry_f
        cv_loss_mean = jnp.mean(cv_losses)
        ac_params, cv_params = unstack_fused(fp, *sargs)
        ac_mu, cv_mu = unstack_fused(mu_f, *sargs)
        ac_nu, cv_nu = unstack_fused(nu_f, *sargs)
        ac_opt_state = _replace_adam(
            ts.ac_opt_state, ac_slot,
            ac_adam._replace(count=c_ac, mu=ac_mu, nu=ac_nu),
        )
        cv_opt_state = _replace_adam(
            ts.cv_opt_state, cv_slot,
            cv_adam._replace(count=c_cv, mu=cv_mu, nu=cv_nu),
        )

    # The actor and central-value SGD chains are data-independent of each
    # other (cv targets come from the pre-update rollout values). Running
    # both in ONE scan lets XLA overlap the two dependent chains inside each
    # iteration — the epoch is latency-bound on sequential small-matmul
    # updates (RESULTS.md), so halving the number of sequential scan steps
    # directly shortens the critical path.
    fuse_cv = (
        not fused_towers_ok
        and asym and cv_idxs.shape[0] == ac_idxs.shape[0]
    )
    if fused_towers_ok:
        pass
    elif fuse_cv:
        def fused_update(carry, xs):
            ac_p, ac_opt, lr, cv_p, cv_opt = carry
            ac_idx, cv_idx = xs
            ac_p, ac_opt, lr, mb_out = _ac_step(ac_p, ac_opt, lr, ac_idx)
            cv_p, cv_opt, cv_l = _cv_step(cv_p, cv_opt, cv_idx)
            return (ac_p, ac_opt, lr, cv_p, cv_opt), (mb_out, cv_l)

        carry_u = (ac_params, ac_opt_state, lr, cv_params, cv_opt_state)
        carry_u, (ep_metrics, cv_losses) = jax.lax.scan(
            fused_update, carry_u, (ac_idxs, cv_idxs),
            unroll=cfg.update_unroll,
        )
        ac_params, ac_opt_state, lr, cv_params, cv_opt_state = carry_u
        cv_loss_mean = jnp.mean(cv_losses)
    else:
        def mb_update(carry, idx):
            ac_p, ac_opt, lr = carry
            ac_p, ac_opt, lr, mb_out = _ac_step(ac_p, ac_opt, lr, idx)
            return (ac_p, ac_opt, lr), mb_out

        (ac_params, ac_opt_state, lr), ep_metrics = jax.lax.scan(
            mb_update, (ac_params, ac_opt_state, lr), ac_idxs,
            unroll=cfg.update_unroll,
        )
        if asym:
            def cv_update(carry, idx):
                p, opt = carry
                p, opt, loss = _cv_step(p, opt, idx)
                return (p, opt), loss

            (cv_params, cv_opt_state), cv_losses = jax.lax.scan(
                cv_update, (cv_params, cv_opt_state), cv_idxs,
                unroll=cfg.update_unroll,
            )
            cv_loss_mean = jnp.mean(cv_losses)

    if cfg.nan_telemetry:
        total_l, a_l, c_l, ent, kl, gnorms = ep_metrics
        kl_per_mb = kl  # per-update kl trace — locate the first nan update
        total_l, a_l, c_l, ent, kl = (
            jnp.mean(total_l), jnp.mean(a_l), jnp.mean(c_l), jnp.mean(ent),
            jnp.mean(kl),
        )
    else:
        total_l, a_l, c_l, ent, kl = jax.tree.map(jnp.mean, ep_metrics)

    # ---------------- pack ----------------------------------------------------
    frame = ts.frame + h * n
    new_ts = ts.replace(
        ac_params=ac_params,
        cv_params=cv_params,
        ac_opt_state=ac_opt_state,
        cv_opt_state=cv_opt_state,
        lr=lr,
        env_state=env_state,
        obs=last_obs,
        states=last_states,
        ep_return=ep_ret,
        ep_len=ep_len,
        key=key,
        epoch=ts.epoch + 1,
        frame=frame,
    )
    last_info = jax.tree.map(lambda x: x[-1], infos)
    metrics = {
        "losses/total": total_l,
        "losses/a_loss": a_l,
        "losses/c_loss": c_l,
        "losses/entropy": ent,
        "losses/cv_loss": cv_loss_mean,
        "info/kl": kl,
        "info/lr": lr,
        "info/epochs": new_ts.epoch.astype(jnp.float32),
        "info/frames": frame.astype(jnp.float32),
        "rewards/step_mean": jnp.mean(b_reward) / cfg.reward_shaper_scale,
        "episodes/finished_return_sum": jnp.sum(
            jnp.where(fin_n > 0, fin_ret, 0.0)
        ),
        "episodes/finished_count": jnp.sum(fin_n).astype(jnp.float32),
        "episodes/finished_success_sum": fin_suc,
        # per-env vectors (popped by the runner before scalar TB logging)
        "episodes/finished_returns": fin_ret,
        "episodes/finished_n": fin_n,
        **last_info,
    }
    if cfg.nan_telemetry:
        def _fin(x):
            return jnp.isfinite(x).all().astype(jnp.float32)

        def _amax(x):
            return jnp.max(jnp.abs(x))

        es_leaves = [
            leaf for leaf in jax.tree_util.tree_leaves(env_state)
            if jnp.issubdtype(leaf.dtype, jnp.inexact)
        ]
        metrics.update({
            "nan/obs_fin": _fin(b_obs), "nan/obs_max": _amax(b_obs),
            "nan/states_fin": _fin(b_states), "nan/states_max": _amax(b_states),
            "nan/act_fin": _fin(b_action), "nan/act_max": _amax(b_action),
            "nan/rew_fin": _fin(b_reward), "nan/rew_max": _amax(b_reward),
            "nan/val_fin": _fin(b_value), "nan/val_max": _amax(b_value),
            "nan/neglogp_max": _amax(b_neglogp),
            "nan/logstd_min": jnp.min(b_log_std),
            "nan/logstd_max": jnp.max(b_log_std),
            "nan/envstate_fin": jnp.stack(
                [jnp.isfinite(le).all() for le in es_leaves]
            ).all().astype(jnp.float32),
            "nan/adv_fin": _fin(advs), "nan/adv_max": _amax(advs),
            "nan/ret_max": _amax(returns),
            "nan/grad_fin": _fin(gnorms), "nan/grad_max": _amax(gnorms),
            "nan/kl_mb_fin": _fin(kl_per_mb),
            # index of the first non-finite minibatch kl (flat), -1 if none
            "nan/kl_first_bad": jnp.where(
                jnp.isfinite(kl_per_mb).all(), -1.0,
                jnp.argmax(~jnp.isfinite(kl_per_mb.reshape(-1))).astype(jnp.float32),
            ),
            "nan/params_fin": _fin(optax.global_norm(ac_params)),
        })
    return new_ts, metrics
