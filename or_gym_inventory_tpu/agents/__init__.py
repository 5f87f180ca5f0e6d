from or_gym_inventory_tpu.agents.base import BaseAgent, RandomAgent, PolicyAgent  # noqa: F401
from or_gym_inventory_tpu.agents import heuristics  # noqa: F401
