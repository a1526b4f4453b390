from . import beam_search  # noqa: F401
from . import llama  # noqa: F401
from . import speculative  # noqa: F401
