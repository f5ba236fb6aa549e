from semi_tpu.utils.config import load_config, validate_model_section
from semi_tpu.utils.tb import ScalarWriter

__all__ = ["load_config", "validate_model_section", "ScalarWriter"]
