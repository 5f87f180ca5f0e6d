from or_gym_inventory_tpu.utils import checkpoint, profiling  # noqa: F401
