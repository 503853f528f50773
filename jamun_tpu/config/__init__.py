from jamun_tpu.config.compose import apply_overrides, compose, merge, resolve_interpolations
from jamun_tpu.config.instantiate import instantiate, instantiate_dict_cfg, locate
