from .qp import (init_params, encode, forward_train, forward_infer,  # noqa: F401
                 restrict_P, head_keys)
