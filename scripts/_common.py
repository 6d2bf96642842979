"""Shared CLI plumbing: repo-root import path + config loading."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ich_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from ich_tpu.utils.config import AttrDict  # noqa: E402
from ich_tpu.utils.logging import setup_logger  # noqa: E402

# warm restarts for every CLI driver: compiled XLA programs persist on disk
enable_compilation_cache()


def load_cfg(config_path: str) -> dict:
    return AttrDict.from_json_path(config_path).to_dict()
