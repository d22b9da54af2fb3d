from .logger import setup_logging, log  # noqa: F401
from .seeding import set_seed  # noqa: F401
from .metrics import hudsons_fst, fst_table  # noqa: F401
