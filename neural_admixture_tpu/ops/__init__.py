from .pack import unpack_dosage_x, unpack_genotypes  # noqa: F401
from .loss import clamped_bce_sum, softmax_cross_entropy_sum  # noqa: F401
from .rsvd import rsvd  # noqa: F401
from .gmm import GMMResult, fit_gmm  # noqa: F401
from .loglikelihood import loglikelihood, loglikelihood_device  # noqa: F401
