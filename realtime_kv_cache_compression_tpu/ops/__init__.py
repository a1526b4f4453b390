from . import (attention, importance, quantization,  # noqa: F401
               sampling, selection)
