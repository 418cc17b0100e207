from spml_tpu.config.defaults import (Config, DatasetConfig, NetworkConfig,
                                      TestConfig, TpuConfig, TrainConfig,
                                      load_config)
