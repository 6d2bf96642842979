from ich_tpu.utils.config import AttrDict, Config, Registry, rgetattr
from ich_tpu.utils.rng import RngStream, fold_in_name

__all__ = [
    "AttrDict",
    "Config",
    "Registry",
    "rgetattr",
    "RngStream",
    "fold_in_name",
]
