from .langid import langid_udf  # noqa: F401
from .perplexity import perplexity_udf  # noqa: F401
from .audio import audio_stats_udf  # noqa: F401
