from or_gym_inventory_tpu.utils import (checkpoint, compile_cache,  # noqa: F401
                                        profiling)
