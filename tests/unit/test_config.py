"""Config schema tests: the reference-style YAML (SURVEY.md §5) must parse
into validated dataclasses for all three arch variants."""

import pytest
import yaml

from deeplio_tpu.config import Config, ConfigError, load_config_dict

DEEPLIO_YAML = """
arch: deeplio
datasets:
  kitti:
    root-path: /data/kitti
    train:
      "2011_10_03": [27, 42]
    validation:
      "2011_09_30": [33]
    test:
      "2011_09_30": [34]
  sequence-size: 3
  combinations: [[0, 1], [1, 2]]
  channels: [x, y, z, remission, depth]
  image-width: 1024
  image-height: 64
  fov-up: 3.0
  fov-down: -25.0
  mean: [0.0, 0.0, 0.0, 0.2, 10.0]
  std: [10.0, 10.0, 1.0, 0.15, 10.0]
  max-imu-per-pair: 16
deeplio:
  dropout: 0.25
  lidar-feat-net: {name: lidar-feat-pointseg}
  imu-feat-net: {name: imu-feat-rnn}
  fusion-net: {type: soft}
  odom-feat-net: {name: odom-feat-rnn}
lidar-feat-pointseg:
  part: encoder
  bypass: false
imu-feat-rnn:
  type: lstm
  hidden-size: 128
  num-layers: 2
odom-feat-rnn:
  type: lstm
  hidden-size: 256
losses:
  active: lws
  lws: {sx: 0.0, sq: -2.5}
optimizer:
  name: adam
  lr: 0.0001
train:
  batch-size: 4
  epochs: 10
"""


def test_deeplio_parses():
    cfg = load_config_dict(yaml.safe_load(DEEPLIO_YAML))
    assert cfg.model.arch == "deeplio"
    assert cfg.model.lidar.name == "lidar-feat-pointseg"
    assert cfg.model.imu.hidden_size == 128
    assert cfg.model.fusion.kind == "soft"
    assert cfg.datasets.sequence_size == 3
    assert cfg.datasets.effective_combinations == ((0, 1), (1, 2))
    assert cfg.datasets.num_pairs == 2
    assert cfg.datasets.num_image_channels == 5
    assert cfg.loss.active == "lws" and cfg.loss.sq == -2.5
    assert cfg.optim.lr == 1e-4
    assert cfg.train.batch_size == 4


def test_deepio_minimal():
    cfg = load_config_dict(
        {
            "arch": "deepio",
            "deepio": {"imu-feat-net": "imu-feat-rnn"},
            "datasets": {"sequence-size": 2},
        }
    )
    assert cfg.model.arch == "deepio"
    assert cfg.model.lidar is None and cfg.model.fusion is None
    assert cfg.model.imu is not None
    # default combinations: consecutive pairs
    assert cfg.datasets.effective_combinations == ((0, 1),)


def test_deeplo_minimal():
    cfg = load_config_dict(
        {
            "arch": "deeplo",
            "deeplo": {"lidar-feat-net": "lidar-feat-simple-0"},
            "lidar-feat-simple-0": {"feature-size": 256},
        }
    )
    assert cfg.model.lidar.name == "lidar-feat-simple-0"
    assert cfg.model.lidar.feature_size == 256
    assert cfg.model.imu is None


def test_normals_expand_channels():
    cfg = load_config_dict(
        {"arch": "deepio", "datasets": {"channels": ["depth", "normals"]}}
    )
    assert cfg.datasets.num_image_channels == 4


def test_bad_arch_raises():
    with pytest.raises(ConfigError):
        load_config_dict({"arch": "nope"})


def test_bad_channel_raises():
    with pytest.raises(ConfigError):
        load_config_dict({"arch": "deepio", "datasets": {"channels": ["foo"]}})


def test_bad_fusion_raises():
    with pytest.raises(ConfigError):
        load_config_dict(
            {
                "arch": "deeplio",
                "deeplio": {"fusion-net": {"type": "medium"}},
            }
        )


def test_kernel_aligned_validation():
    with pytest.raises(ConfigError):
        load_config_dict({"arch": "deepio",
                          "datasets": {"kernel-aligned": "bogus"}})
    # trust requires grid-aligned-by-construction data
    with pytest.raises(ConfigError):
        load_config_dict({"arch": "deepio",
                          "datasets": {"kernel-aligned": "trust"}})
    cfg = load_config_dict({
        "arch": "deepio",
        "datasets": {"kernel-aligned": "trust", "synthetic": True}})
    assert cfg.datasets.projection.kernel_aligned == "trust"
    cfg = load_config_dict({
        "arch": "deepio",
        "datasets": {"kernel-aligned": "trust", "slot-bin": True}})
    assert cfg.datasets.slot_bin


def test_slot_bin_shape_validation():
    with pytest.raises(ConfigError):
        load_config_dict({"arch": "deepio",
                          "datasets": {"slot-bin": True,
                                       "max-points": 100000}})
