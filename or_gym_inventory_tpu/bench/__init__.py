from or_gym_inventory_tpu.bench.evaluate import evaluate_agent, evaluate_agent_vectorized  # noqa: F401
from or_gym_inventory_tpu.bench.report import process_and_report_results, numpy_encoder  # noqa: F401
from or_gym_inventory_tpu.bench import plots  # noqa: F401
