from .snp_reader import SNPReader, read_data  # noqa: F401
from .writers import write_outputs, save_config, save_checkpoint, load_checkpoint  # noqa: F401
from .packed import pack_2bit_rows, unpack_2bit_rows  # noqa: F401
