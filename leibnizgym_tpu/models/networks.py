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


# ---------------------------------------------------------------------------
# Fused tower evaluation (round-5 perf work, VERDICT r4 item 1)
#
# The PPO epoch is latency-bound on ~128 sequential minibatch updates, each
# evaluating three small MLP towers (actor, critic, central value) whose
# separate matmuls leave the MXU idle between dispatches. These helpers pack
# the towers into ONE batched-matmul chain:
#   - first-layer kernels are zero-ROW-padded to a shared lane-multiple input
#     width (x @ [W; 0] == x @ W; the padded input entries are zero, so both
#     values and gradients are exactly unchanged — padded rows receive zero
#     gradient and stay zero),
#   - head kernels are zero-COLUMN-padded to the action dim (padded outputs
#     are sliced off and receive zero gradient),
#   - tower entries become independent batch entries of a batched matmul.
# The canonical flax param trees remain the source of truth (checkpoints are
# unaffected); stacking/unstacking happens at the epoch boundary.
# ---------------------------------------------------------------------------

TOWER_ALL = ("actor", "critic", "cv")


def _round_up(n: int, m: int = 128) -> int:
    return ((n + m - 1) // m) * m


def _tower_layers(ac_params, cv_params, units, tower):
    """(prefix-resolved) list of (kernel, bias) per hidden layer + head."""
    if tower == "cv":
        p = cv_params["params"]
        hidden = [p[f"dense_{i}"] for i in range(len(units))]
        head = p["value"]
    else:
        p = ac_params["params"]
        hidden = [p[f"{tower}_{i}"] for i in range(len(units))]
        head = p["mu"] if tower == "actor" else p["value"]
    return hidden, head


def stack_fused(ac_params, cv_params, obs_dim, state_dim, units, action_dim,
                towers=TOWER_ALL):
    """Pack tower params into stacked batched-matmul weights.

    ``obs_dim`` here is the width the actor/critic towers actually consume
    (obs_dim * frames when frame stacking). Returns a flat dict pytree:
    k0/b0..k{L-1}/b{L-1}, kh/bh, log_std.
    """
    pad_in = _round_up(max(obs_dim, state_dim if "cv" in towers else 0))
    layers = {t: _tower_layers(ac_params, cv_params, units, t) for t in towers}

    def pad_rows(k):
        return jnp.pad(k, ((0, pad_in - k.shape[0]), (0, 0)))

    def pad_cols(k):
        return jnp.pad(k, ((0, 0), (0, action_dim - k.shape[1])))

    fused = {}
    for i in range(len(units)):
        ks = [layers[t][0][i]["kernel"] for t in towers]
        if i == 0:
            ks = [pad_rows(k) for k in ks]
        fused[f"k{i}"] = jnp.stack(ks)
        fused[f"b{i}"] = jnp.stack([layers[t][0][i]["bias"] for t in towers])
    fused["kh"] = jnp.stack(
        [pad_cols(layers[t][1]["kernel"]) for t in towers]
    )
    fused["bh"] = jnp.stack([
        jnp.pad(layers[t][1]["bias"],
                (0, action_dim - layers[t][1]["bias"].shape[0]))
        for t in towers
    ])
    fused["log_std"] = ac_params["params"]["log_std"]
    return fused


def unstack_fused(fused, obs_dim, state_dim, units, action_dim):
    """Inverse of ``stack_fused(towers=TOWER_ALL)``: canonical flax trees."""
    L = len(units)
    ap = {}
    cp = {}
    widths = {"actor": obs_dim, "critic": obs_dim, "cv": state_dim}
    for t_idx, t in enumerate(TOWER_ALL):
        for i in range(L):
            k = fused[f"k{i}"][t_idx]
            if i == 0:
                k = k[: widths[t]]
            entry = {"kernel": k, "bias": fused[f"b{i}"][t_idx]}
            if t == "cv":
                cp[f"dense_{i}"] = entry
            else:
                ap[f"{t}_{i}"] = entry
    head_w = {"actor": action_dim, "critic": 1, "cv": 1}
    for t_idx, t in enumerate(TOWER_ALL):
        w = head_w[t]
        entry = {
            "kernel": fused["kh"][t_idx][:, :w],
            "bias": fused["bh"][t_idx][:w],
        }
        if t == "actor":
            ap["mu"] = entry
        elif t == "critic":
            ap["value"] = entry
        else:
            cp["value"] = entry
    ap["log_std"] = fused["log_std"]
    return {"params": ap}, {"params": cp}


def fused_forward(fused, inputs, dtype=jnp.float32):
    """Run the batched-matmul chain on per-tower ``inputs`` (list, one array
    of shape (..., width_t) per tower entry; padded + stacked here). Returns
    the stacked head output (T, ..., action_dim) in float32."""
    pad_in = fused["k0"].shape[1]
    x = jnp.stack([
        jnp.pad(inp, [(0, 0)] * (inp.ndim - 1)
                + [(0, pad_in - inp.shape[-1])])
        for inp in inputs
    ]).astype(dtype)
    i = 0
    while f"k{i}" in fused:
        x = (
            jnp.einsum("t...i,tio->t...o", x, fused[f"k{i}"].astype(dtype))
            + fused[f"b{i}"].astype(dtype)[
                (slice(None),) + (None,) * (x.ndim - 2)
            ]
        )
        x = nn.elu(x)
        i += 1
    out = (
        jnp.einsum("t...i,tio->t...o", x, fused["kh"].astype(dtype))
        + fused["bh"].astype(dtype)[(slice(None),) + (None,) * (x.ndim - 2)]
    )
    return out.astype(jnp.float32)


def fused_log_std(fused, mu, log_std_min, log_std_max):
    ls = jnp.clip(fused["log_std"], log_std_min, log_std_max)
    return jnp.broadcast_to(ls, mu.shape).astype(jnp.float32)


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
