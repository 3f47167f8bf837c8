from rla4mor_tpu.utils import config
from rla4mor_tpu.utils.logger import get_logger, log_block

__all__ = ["config", "get_logger", "log_block"]
