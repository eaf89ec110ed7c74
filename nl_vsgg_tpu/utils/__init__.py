from .config import Config, load_config
from .glove import obj_edge_vectors
from .logging import MetricWriter, SmoothedValue, setup_logger
from .profiling import PhaseTimer, trace

__all__ = ["Config", "load_config", "obj_edge_vectors", "MetricWriter",
           "SmoothedValue", "setup_logger", "PhaseTimer", "trace"]
