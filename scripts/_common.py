"""Shared CLI plumbing: repo-root import path + config loading."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ich_tpu.utils.config import AttrDict  # noqa: E402
from ich_tpu.utils.logging import setup_logger  # noqa: E402


def load_cfg(config_path: str) -> dict:
    return AttrDict.from_json_path(config_path).to_dict()
