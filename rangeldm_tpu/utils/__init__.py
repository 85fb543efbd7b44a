from rangeldm_tpu.utils.config import Cfg, load_config, instantiate  # noqa: F401
