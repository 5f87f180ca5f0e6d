"""Environment registry — name-keyed env creation.

The reference registers env creators with Ray's tune registry
(``register_env(name, creator)``, benchmark_NetInvMgmtLostSalesEnv_sb3_rllib
.py:120-133) so algorithms can be configured by env-name string. This module
provides the same capability without Ray, for both API layers:

- ``make(name, **config)`` -> Gymnasium adapter env (host path)
- ``make_functional(name, env_config=None)`` -> (Environment, params) (device
  path)

All reference env ids ship pre-registered.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

from or_gym_inventory_tpu.envs import inv_management as im
from or_gym_inventory_tpu.envs import net_inv_management as net
from or_gym_inventory_tpu.envs import newsvendor as nv
from or_gym_inventory_tpu.envs import topology as topo
from or_gym_inventory_tpu.envs.base import Environment

_HOST_REGISTRY: Dict[str, Callable] = {}
_FUNC_REGISTRY: Dict[str, Tuple[Environment, Callable]] = {}


def register_env(name: str, creator: Callable) -> None:
    """Register a host env creator under ``name`` (Ray-registry analogue)."""
    _HOST_REGISTRY[name] = creator


def register_functional(name: str, env: Environment,
                        params_factory: Callable) -> None:
    _FUNC_REGISTRY[name] = (env, params_factory)


def make(name: str, **config):
    """Instantiate a registered host (Gymnasium adapter) env."""
    if name not in _HOST_REGISTRY:
        raise KeyError(f"Unknown env {name!r}; known: {sorted(_HOST_REGISTRY)}")
    return _HOST_REGISTRY[name](**config)


def make_functional(name: str, env_config: Optional[dict] = None):
    """Return (Environment fns, params) for a registered functional env."""
    if name not in _FUNC_REGISTRY:
        raise KeyError(f"Unknown env {name!r}; known: {sorted(_FUNC_REGISTRY)}")
    env, factory = _FUNC_REGISTRY[name]
    return env, factory(env_config=env_config)


def registered_envs():
    return sorted(set(_HOST_REGISTRY) | set(_FUNC_REGISTRY))


def _net_custom_params(env_config=None, backlog=True):
    cfg = dict(env_config or {})
    periods = int(cfg.get("num_periods", 30))
    return net.default_params(env_config=cfg,
                              topology=topo.custom_topology(periods),
                              backlog=backlog)


def _register_builtins():
    from or_gym_inventory_tpu.envs import adapters as ad
    host = {
        "Newsvendor-v0": ad.NewsvendorEnv,
        "CustomizableNewsvendor-v0": ad.CustomizableNewsvendorEnv,
        "InvManagement-v0": ad.InvManagementMasterEnv,
        "InvManagementBacklog-v0": ad.InvManagementBacklogEnv,
        "InvManagementLostSales-v0": ad.InvManagementLostSalesEnv,
        "NetInvMgmt-v0": ad.NetInvMgmtMasterEnv,
        "NetInvMgmtBacklog-v0": ad.NetInvMgmtBacklogEnv,
        "NetInvMgmtLostSales-v0": ad.NetInvMgmtLostSalesEnv,
        "NetInvMgmtCustomBacklog-v0": ad.NetInvMgmtCustomBacklogEnv,
        "NetInvMgmtCustomLostSales-v0": ad.NetInvMgmtCustomLostSalesEnv,
    }
    for name, cls in host.items():
        register_env(name, cls)
    register_functional("Newsvendor-v0", nv.ENV, nv.default_params)
    register_functional("InvManagementBacklog-v0", im.ENV,
                        partial(im.default_params, backlog=True))
    register_functional("InvManagementLostSales-v0", im.ENV,
                        partial(im.default_params, backlog=False))
    register_functional("NetInvMgmtBacklog-v0", net.ENV,
                        partial(net.default_params, backlog=True))
    # The reference's NetInvMgmt LostSales subclasses DE FACTO run
    # backlog=True: the master __init__ force-overwrites
    # env_config['backlog'] with its kwarg and the subclasses set backlog
    # only via env_config (QUIRKS.md #1; network_management.py:83-85,
    # :747-761). The functional registrations must match the adapters (and
    # the reference's own RLlib register_env path), or agents built by
    # name train on dynamics the eval env never runs.
    register_functional("NetInvMgmtLostSales-v0", net.ENV,
                        partial(net.default_params, backlog=True))
    register_functional("NetInvMgmtCustomBacklog-v0", net.ENV,
                        partial(_net_custom_params, backlog=True))
    register_functional("NetInvMgmtCustomLostSales-v0", net.ENV,
                        partial(_net_custom_params, backlog=True))


_register_builtins()
