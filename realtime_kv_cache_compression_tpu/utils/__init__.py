from . import data, memory, tokenizer  # noqa: F401
from .logging_utils import setup_logging  # noqa: F401
