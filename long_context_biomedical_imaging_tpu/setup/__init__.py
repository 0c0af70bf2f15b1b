from .config import (Config, check_args, config_to_yaml, none_or_str, str_to_bool,
                     yaml_to_config)
from .parsers import parse_config
from .run_setup import parse_config_and_setup_run, set_seed, setup_logger, setup_run

__all__ = [
    "Config", "check_args", "config_to_yaml", "yaml_to_config", "str_to_bool",
    "none_or_str", "parse_config", "parse_config_and_setup_run", "set_seed",
    "setup_logger", "setup_run",
]
