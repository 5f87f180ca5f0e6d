from or_gym_inventory_tpu.core import spaces, struct, config, parity  # noqa: F401
