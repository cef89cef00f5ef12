from recmodels_tpu.utils.config import TrainConfig
from recmodels_tpu.utils.logging import MetricsLogger

__all__ = ["TrainConfig", "MetricsLogger"]
