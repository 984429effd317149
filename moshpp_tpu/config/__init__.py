from moshpp_tpu.config.config import Config, load_config, prepare_cfg
