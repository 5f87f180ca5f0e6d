from or_gym_inventory_tpu.agents.base import BaseAgent, RandomAgent, PolicyAgent  # noqa: F401
from or_gym_inventory_tpu.agents import heuristics  # noqa: F401
from or_gym_inventory_tpu.agents.ppo import PPOAgent, PPOConfig  # noqa: F401
from or_gym_inventory_tpu.agents.a2c import A2CAgent, A2CConfig  # noqa: F401
from or_gym_inventory_tpu.agents.off_policy import (  # noqa: F401
    DDPGAgent, OffPolicyConfig, SACAgent, TD3Agent)
from or_gym_inventory_tpu.agents.recurrent_ppo import (  # noqa: F401
    RecurrentPPOAgent, RecurrentPPOConfig)
from or_gym_inventory_tpu.agents.algo_registry import make_agent  # noqa: F401
