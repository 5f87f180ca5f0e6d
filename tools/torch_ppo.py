"""An independent PyTorch PPO — the cross-validation stack.

The reference benchmarks pit two independently implemented RL stacks against
each other (SB3/torch vs RLlib/torch,
/root/reference/benchmark_NetInvMgmtLostSalesEnv_sb3_rllib.py:264-361). This
module recovers that capability for the TPU framework: a compact PPO written
from scratch in PyTorch — sharing NO code, autodiff framework, optimizer
implementation, or RNG with the JAX learner (agents/ppo.py) — trained
through the same public Gymnasium adapter surface (envs/adapters.py). If the
two stacks land in the same reward regime on the same env/budget, each
validates the other's objective and plumbing (tests/test_cross_stack.py).

Deliberately independent design choices (so agreement is informative, not
copied): plain Gaussian policy with state-independent log-std, tanh-free
action clipping at the env boundary, per-minibatch advantage normalization,
Adam without LR annealing.
"""

from __future__ import annotations

import math

import numpy as np

try:
    import torch
    import torch.nn as nn
except ImportError:  # torch is optional; the test lane skips without it
    torch = None
    nn = object


class _ActorCritic(nn.Module if torch else object):
    def __init__(self, obs_dim: int, act_dim: int, hidden: int = 64):
        super().__init__()
        self.pi = nn.Sequential(
            nn.Linear(obs_dim, hidden), nn.Tanh(),
            nn.Linear(hidden, hidden), nn.Tanh(),
            nn.Linear(hidden, act_dim))
        self.vf = nn.Sequential(
            nn.Linear(obs_dim, hidden), nn.Tanh(),
            nn.Linear(hidden, hidden), nn.Tanh(),
            nn.Linear(hidden, 1))
        self.log_std = nn.Parameter(torch.zeros(act_dim))

    def dist(self, obs):
        mean = self.pi(obs)
        return torch.distributions.Normal(mean, self.log_std.exp())


class TorchPPO:
    """Minimal-but-complete PPO: vectorized adapter envs, GAE(lambda),
    clipped surrogate, minibatch epochs, running obs normalization."""

    def __init__(self, env_factory, env_config=None, num_envs: int = 8,
                 rollout_steps: int = 128, lr: float = 3e-4,
                 gamma: float = 0.99, gae_lambda: float = 0.95,
                 clip_eps: float = 0.2, epochs: int = 4,
                 minibatches: int = 4, ent_coef: float = 0.0,
                 vf_coef: float = 0.5, max_grad_norm: float = 0.5,
                 seed: int = 0, hidden: int = 64):
        if torch is None:
            raise ImportError("torch is required for TorchPPO")
        torch.manual_seed(seed)
        self.envs = [env_factory(**(env_config or {}))
                     for _ in range(num_envs)]
        self.obs_dim = int(np.prod(self.envs[0].observation_space.shape))
        self.act_low = np.asarray(self.envs[0].action_space.low, np.float32)
        self.act_high = np.asarray(self.envs[0].action_space.high,
                                   np.float32)
        self.act_dim = int(np.prod(self.envs[0].action_space.shape))
        self.net = _ActorCritic(self.obs_dim, self.act_dim, hidden)
        self.opt = torch.optim.Adam(self.net.parameters(), lr=lr)
        self.cfg = dict(rollout_steps=rollout_steps, gamma=gamma,
                        gae_lambda=gae_lambda, clip_eps=clip_eps,
                        epochs=epochs, minibatches=minibatches,
                        ent_coef=ent_coef, vf_coef=vf_coef,
                        max_grad_norm=max_grad_norm)
        self.seed = seed
        # running obs normalization (Welford)
        self._count = 1e-4
        self._mean = np.zeros(self.obs_dim, np.float64)
        self._m2 = np.ones(self.obs_dim, np.float64)

    # ------------------------------------------------------- normalization
    def _norm_update(self, obs_batch):
        for o in obs_batch:
            self._count += 1
            delta = o - self._mean
            self._mean += delta / self._count
            self._m2 += delta * (o - self._mean)

    def _norm(self, obs):
        std = np.sqrt(self._m2 / self._count) + 1e-6
        return np.clip((obs - self._mean) / std, -10, 10).astype(np.float32)

    # --------------------------------------------------------------- train
    def train(self, total_timesteps: int):
        cfg = self.cfg
        n, t_len = len(self.envs), cfg["rollout_steps"]
        obs = np.stack([e.reset(seed=self.seed + i)[0]
                        for i, e in enumerate(self.envs)]).astype(np.float32)
        steps_done = 0
        while steps_done < total_timesteps:
            buf_obs = np.zeros((t_len, n, self.obs_dim), np.float32)
            buf_act = np.zeros((t_len, n, self.act_dim), np.float32)
            buf_logp = np.zeros((t_len, n), np.float32)
            buf_rew = np.zeros((t_len, n), np.float32)
            buf_done = np.zeros((t_len, n), np.float32)
            buf_val = np.zeros((t_len + 1, n), np.float32)
            self._norm_update(obs)
            for t in range(t_len):
                nobs = self._norm(obs)
                with torch.no_grad():
                    to = torch.as_tensor(nobs)
                    dist = self.net.dist(to)
                    act = dist.sample()
                    logp = dist.log_prob(act).sum(-1)
                    val = self.net.vf(to).squeeze(-1)
                buf_obs[t], buf_val[t] = nobs, val.numpy()
                buf_act[t], buf_logp[t] = act.numpy(), logp.numpy()
                act_env = np.clip(act.numpy(), self.act_low, self.act_high)
                for i, e in enumerate(self.envs):
                    o2, r, term, trunc, _ = e.step(
                        act_env[i].astype(e.action_space.dtype))
                    buf_rew[t, i] = r
                    done = term or trunc
                    buf_done[t, i] = float(done)
                    obs[i] = (e.reset()[0] if done else o2)
                self._norm_update(obs)
            with torch.no_grad():
                buf_val[t_len] = self.net.vf(
                    torch.as_tensor(self._norm(obs))).squeeze(-1).numpy()
            steps_done += n * t_len

            # GAE
            adv = np.zeros_like(buf_rew)
            last = np.zeros(n, np.float32)
            for t in reversed(range(t_len)):
                notdone = 1.0 - buf_done[t]
                delta = (buf_rew[t] + cfg["gamma"] * buf_val[t + 1] * notdone
                         - buf_val[t])
                last = delta + (cfg["gamma"] * cfg["gae_lambda"] * notdone
                                * last)
                adv[t] = last
            ret = adv + buf_val[:t_len]

            flat = lambda x: torch.as_tensor(
                x.reshape(t_len * n, *x.shape[2:]))
            f_obs, f_act = flat(buf_obs), flat(buf_act)
            f_logp, f_adv, f_ret = flat(buf_logp), flat(adv), flat(ret)
            batch = t_len * n
            mb = batch // cfg["minibatches"]
            for _ in range(cfg["epochs"]):
                perm = torch.randperm(batch)
                for s in range(0, batch, mb):
                    idx = perm[s:s + mb]
                    dist = self.net.dist(f_obs[idx])
                    logp = dist.log_prob(f_act[idx]).sum(-1)
                    ratio = (logp - f_logp[idx]).exp()
                    a = f_adv[idx]
                    a = (a - a.mean()) / (a.std() + 1e-8)
                    pg = -torch.min(
                        ratio * a,
                        ratio.clamp(1 - cfg["clip_eps"],
                                    1 + cfg["clip_eps"]) * a).mean()
                    v = self.net.vf(f_obs[idx]).squeeze(-1)
                    vloss = ((v - f_ret[idx]) ** 2).mean()
                    ent = dist.entropy().sum(-1).mean()
                    loss = (pg + cfg["vf_coef"] * vloss
                            - cfg["ent_coef"] * ent)
                    self.opt.zero_grad()
                    loss.backward()
                    nn.utils.clip_grad_norm_(self.net.parameters(),
                                             cfg["max_grad_norm"])
                    self.opt.step()
        return self

    # ---------------------------------------------------------------- eval
    def get_action(self, obs, env):
        """BaseAgent-protocol hook: deterministic (mean) action."""
        with torch.no_grad():
            nobs = self._norm(np.asarray(obs, np.float32).reshape(-1))
            mean = self.net.pi(torch.as_tensor(nobs)[None])[0].numpy()
        return np.clip(mean, self.act_low, self.act_high).astype(
            env.action_space.dtype)


class TorchPPOAgent:
    """BaseAgent-shaped wrapper so the torch stack runs through the same
    evaluate_agent protocol as every other agent (bench/evaluate.py)."""

    def __init__(self, env_factory, name="TorchPPO", **kwargs):
        self.name = name
        self.training_time = 0.0
        self._factory = env_factory
        self._kwargs = kwargs
        self._impl = None

    def train(self, env_config, total_timesteps, save_path_prefix=""):
        import time
        t0 = time.time()
        self._impl = TorchPPO(self._factory, env_config=env_config,
                              **self._kwargs)
        self._impl.train(total_timesteps)
        self.training_time = time.time() - t0

    def get_action(self, obs, env):
        return self._impl.get_action(obs, env)

    def get_training_time(self):
        return self.training_time
