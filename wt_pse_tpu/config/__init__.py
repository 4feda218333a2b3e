from wt_pse_tpu.config.hparams import default_hparams, random_hparams, ALGORITHMS
from wt_pse_tpu.config.loader import Config, load_config, argv_update

__all__ = ["default_hparams", "random_hparams", "ALGORITHMS", "Config", "load_config", "argv_update"]
