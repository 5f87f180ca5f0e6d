from or_gym_inventory_tpu.ops import distributions  # noqa: F401
