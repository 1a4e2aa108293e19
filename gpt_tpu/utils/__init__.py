from gpt_tpu.utils.math import logsumexp, whiten, Whitening, rmse
from gpt_tpu.utils import stiefel
from gpt_tpu.utils import prng

__all__ = ["logsumexp", "whiten", "Whitening", "rmse", "stiefel", "prng"]
