from . import attention, importance, quantization, selection  # noqa: F401
