from .checkpoint import (  # noqa: F401
    load_pickle, restore_checkpoint, save_checkpoint, save_pickle)
from .evaluation import (  # noqa: F401
    compare_rollouts, field_mae, inference_latency, model_error_sweep,
    pearson, speedup_table, temperature_rmse)
from .profiling import StepTimer, trace  # noqa: F401
from .jit import TPU_COMPILER_OPTIONS, tpu_jit  # noqa: F401
