from deeplio_tpu.config.schema import (
    Config,
    ConfigError,
    DatasetConfig,
    FusionConfig,
    ImuFeatConfig,
    LidarFeatConfig,
    LossConfig,
    ModelConfig,
    OdomFeatConfig,
    OptimConfig,
    ProjectionConfig,
    TrainConfig,
)
from deeplio_tpu.config.loader import load_config, load_config_dict
