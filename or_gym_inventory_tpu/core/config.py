"""Config-dict override layer.

The reference applies user config by reflection: ``assign_env_config`` does
``setattr(self, k, v)`` for every dict entry (inventory_management.py:15-17,
network_management.py:17-24). Our params are frozen dataclass pytrees, so the
equivalent is a checked ``dataclasses.replace``: unknown keys raise instead of
silently creating attributes (a latent-bug class in the reference).

``apply_env_config`` keeps the reference's dict-override ergonomics:

    params = NewsvendorParams.create(env_config={'lead_time': 3})
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional


def apply_env_config(params, env_config: Optional[Mapping[str, Any]], aliases: Dict[str, str] = None):
    """Return ``params`` with entries of ``env_config`` replaced.

    ``aliases`` maps reference kwarg names to params field names (e.g. the
    reference's ``periods`` → ``num_periods``). Unknown keys raise KeyError.
    """
    if not env_config:
        return params
    aliases = aliases or {}
    fields = {f.name for f in dataclasses.fields(params)}
    updates = {}
    for key, value in env_config.items():
        key = aliases.get(key, key)
        if key not in fields:
            raise KeyError(
                f"Unknown env_config key {key!r} for {type(params).__name__}; "
                f"valid keys: {sorted(fields)}")
        updates[key] = value
    return dataclasses.replace(params, **updates)
