from or_gym_inventory_tpu.envs import newsvendor, inv_management, net_inv_management, topology  # noqa: F401
from or_gym_inventory_tpu.envs.base import Environment  # noqa: F401
