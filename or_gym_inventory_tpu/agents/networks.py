"""Policy/value networks (flax) for the on-device actor-learners.

The reference trains SB3/RLlib MLP policies ("MlpPolicy", net_arch overrides
like pi/vf=[64] and [400,300] — benchmark_InvManagementBacklogEnv.py:692-717).
Here the same family of architectures is a small flax module; parameters are
replicated across the mesh and all compute maps onto the MXU as batched
matmuls (batch = thousands of envs, so even 64-wide layers keep it busy).

Actions are tanh-squashed Gaussians rescaled to the env action box — bounded
actions suit the inventory envs' hard order caps (SB3 instead clips an
unbounded Gaussian; documented behavioral difference).

Also provides ``LSTMActorCritic`` — the working counterpart of the
reference's intended-but-broken "MlpLstmPolicy" roster entries
(benchmark_InvManagementBacklogEnv.py:712-713 requested recurrent policies
stock SB3 does not ship; see SURVEY.md §4).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


_ACTS = {"tanh": nn.tanh, "relu": nn.relu, "gelu": nn.gelu}


def _mlp(x, arch: Sequence[int], activation: str):
    act = _ACTS[activation]
    for width in arch:
        x = act(nn.Dense(width, kernel_init=nn.initializers.orthogonal(np.sqrt(2)),
                         bias_init=nn.initializers.zeros)(x))
    return x


class MLPActorCritic(nn.Module):
    """Gaussian actor + value critic with separate trunks (SB3 layout)."""

    action_dim: int
    pi_arch: Tuple[int, ...] = (64, 64)
    vf_arch: Tuple[int, ...] = (64, 64)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, obs):
        pi_h = _mlp(obs, self.pi_arch, self.activation)
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01),
                        bias_init=nn.initializers.zeros)(pi_h)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        vf_h = _mlp(obs, self.vf_arch, self.activation)
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0),
                         bias_init=nn.initializers.zeros)(vf_h)
        return mean, log_std, jnp.squeeze(value, -1)


class QNetwork(nn.Module):
    """Q(s, a) critic for the off-policy learners (SAC/TD3/DDPG)."""

    arch: Tuple[int, ...] = (256, 256)
    activation: str = "relu"

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        x = _mlp(x, self.arch, self.activation)
        return jnp.squeeze(nn.Dense(1)(x), -1)


class LSTMActorCritic(nn.Module):
    """Recurrent actor-critic: Dense encoder -> LSTM cell -> pi/vf heads.

    Carried hidden state threads through vector rollouts as policy_state.
    """

    action_dim: int
    hidden: int = 128
    encoder: Tuple[int, ...] = (64,)
    activation: str = "tanh"

    @nn.compact
    def __call__(self, carry, obs, done=None):
        x = _mlp(obs, self.encoder, self.activation)
        if done is not None:
            # reset hidden state at episode boundaries
            mask = (1.0 - done.astype(jnp.float32))[..., None]
            carry = jax.tree_util.tree_map(lambda c: c * mask, carry)
        cell = nn.OptimizedLSTMCell(self.hidden)
        carry, h = cell(carry, x)
        mean = nn.Dense(self.action_dim,
                        kernel_init=nn.initializers.orthogonal(0.01))(h)
        log_std = self.param("log_std", nn.initializers.zeros, (self.action_dim,))
        value = jnp.squeeze(nn.Dense(1)(h), -1)
        return carry, (mean, log_std, value)

    def initial_carry(self, batch: int):
        zeros = jnp.zeros((batch, self.hidden), jnp.float32)
        return (zeros, zeros)


# ------------------------------------------------------- action squashing

def squash_action(raw: jax.Array, low: jax.Array, high: jax.Array) -> jax.Array:
    """R^d Gaussian sample -> env action box via tanh rescale."""
    return low + (jnp.tanh(raw) + 1.0) * 0.5 * (high - low)


def gaussian_sample(key, mean, log_std):
    std = jnp.exp(jnp.clip(log_std, -10.0, 2.0))
    noise = jax.random.normal(key, mean.shape)
    return mean + std * noise


def gaussian_log_prob(raw, mean, log_std):
    """Diagonal Gaussian log-prob with tanh-squash correction (summed over
    action dims). ``raw`` is the pre-squash sample."""
    log_std = jnp.clip(log_std, -10.0, 2.0)
    var = jnp.exp(2.0 * log_std)
    lp = -0.5 * (((raw - mean) ** 2) / var + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    # tanh correction: log det of d(squash)/d(raw), up to the constant
    # (high-low)/2 scale which cancels in PPO ratios
    corr = 2.0 * (jnp.log(2.0) - raw - jax.nn.softplus(-2.0 * raw))
    return jnp.sum(lp - corr, axis=-1)


def entropy_bonus(log_std):
    """Gaussian entropy (pre-squash; standard PPO practice)."""
    log_std = jnp.clip(log_std, -10.0, 2.0)
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
