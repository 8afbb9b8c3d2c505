from .config import ModelConfig, OptimizationConfig, PipelineConfig  # noqa: F401
from .optim import AdamState, adam_step, init_adam, learning_rates  # noqa: F401
