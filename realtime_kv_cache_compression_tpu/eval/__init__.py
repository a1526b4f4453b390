from . import metrics  # noqa: F401
from .longbench import LongBenchEvaluator, ModelRunner, pick_bucket

__all__ = ["metrics", "LongBenchEvaluator", "ModelRunner", "pick_bucket"]
