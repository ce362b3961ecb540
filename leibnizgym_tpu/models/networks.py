"""Neural networks for the PPO learner.

Mirrors the rl_games network config used by the reference
(/root/reference/resources/config/rlg/asymm.yaml:8-34, 70-91):
- actor_critic with ``separate: True``: independent actor and critic MLP
  towers, units [400, 200, 100], elu activations
- continuous_a2c_logstd: state-independent log-std parameter (fixed_sigma),
  initialized to 0 (const_initializer val 0)
- mu head: variance_scaling init, scale 0.02
- central value net: same MLP on the 113-dim privileged state

TPU notes: batch x [400, 200, 100] matmuls land on the MXU. Parameters and
activations stay in float32 here (tiny model, bandwidth-bound env dominates);
the runner can switch compute dtype to bfloat16 via ``dtype``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _mlp(x, units: Sequence[int], dtype, kernel_init, prefix: str = "dense"):
    for i, width in enumerate(units):
        x = nn.Dense(
            width, dtype=dtype, kernel_init=kernel_init, name=f"{prefix}_{i}"
        )(x)
        x = nn.elu(x)
    return x


class ActorCritic(nn.Module):
    """Separate actor/critic towers + fixed log-std (continuous_a2c_logstd)."""

    action_dim: int
    units: Sequence[int] = (400, 200, 100)
    dtype: jnp.dtype = jnp.float32
    mu_init_scale: float = 0.02
    # Exploration floor: sigma >= exp(log_std_min). rl_games has no floor
    # (default here is effectively none); difficulty-4 training collapses to a
    # near-deterministic policy (entropy 12.8 -> -11) long before orientation
    # behavior is discovered, so the D4 presets set a floor of ~0.2.
    log_std_min: float = -20.0
    log_std_max: float = 2.0

    @nn.compact
    def __call__(self, obs):
        hidden_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
        actor_h = _mlp(obs, self.units, self.dtype, hidden_init, prefix="actor")
        mu = nn.Dense(
            self.action_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.variance_scaling(
                self.mu_init_scale, "fan_in", "truncated_normal"
            ),
            name="mu",
        )(actor_h)
        log_std = self.param(
            "log_std", nn.initializers.zeros, (self.action_dim,)
        )
        log_std = jnp.clip(log_std, self.log_std_min, self.log_std_max)
        critic_h = _mlp(obs, self.units, self.dtype, hidden_init, prefix="critic")
        value = nn.Dense(
            1, dtype=self.dtype, kernel_init=hidden_init, name="value"
        )(critic_h)
        return (
            mu.astype(jnp.float32),
            jnp.broadcast_to(log_std, mu.shape).astype(jnp.float32),
            value[..., 0].astype(jnp.float32),
        )


class CentralValue(nn.Module):
    """Privileged-state value network (asymm.yaml central_value_config)."""

    units: Sequence[int] = (400, 200, 100)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, states):
        hidden_init = nn.initializers.variance_scaling(2.0, "fan_in", "truncated_normal")
        h = _mlp(states, self.units, self.dtype, hidden_init)
        value = nn.Dense(1, dtype=self.dtype, kernel_init=hidden_init, name="value")(h)
        return value[..., 0].astype(jnp.float32)


def gaussian_neglogp(mu, log_std, action):
    """Negative log-density of a diagonal Gaussian (rl_games neglogp form)."""
    var = jnp.exp(2.0 * log_std)
    return 0.5 * jnp.sum(
        jnp.square(action - mu) / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi),
        axis=-1,
    )


def gaussian_kl(mu0, log_std0, mu1, log_std1):
    """Analytic KL(p0 || p1), summed over action dims, mean over batch —
    matches rl_games torch_ext.policy_kl."""
    sig0sq = jnp.exp(2.0 * log_std0)
    sig1sq = jnp.exp(2.0 * log_std1)
    kl = (
        log_std1
        - log_std0
        + (sig0sq + jnp.square(mu0 - mu1)) / (2.0 * sig1sq)
        - 0.5
    )
    return jnp.mean(jnp.sum(kl, axis=-1))


def gaussian_entropy(log_std):
    """Entropy of the diagonal Gaussian, summed over dims."""
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
