"""Config system tests: load, dot access, merge, snapshot."""

import os

from e2eslam_tpu.config import Config, default_config_path, load_yaml, save_yaml


def test_default_config_sections():
    cfg = load_yaml(default_config_path())
    for section in (
        "SETTINGS", "DATA", "MODEL", "LOSS", "OPTIMIZATION",
        "DEPTH_RECOVER", "ABLATION", "VIZ", "DEBUG", "DEMO",
    ):
        assert section in cfg, section
    assert cfg.MODEL.depth_network == "indoor"
    assert cfg.LOSS.three3d_loss is True
    assert cfg.DATA.frames == [0, -1]


def test_dot_access_and_merge():
    cfg = Config({"A": {"x": 1, "y": 2}})
    assert cfg.A.x == 1
    merged = cfg.merged({"A": {"y": 5}, "B": {"z": 3}})
    assert merged.A.x == 1 and merged.A.y == 5 and merged.B.z == 3
    # original untouched
    assert cfg.A.y == 2


def test_save_and_reload(tmp_path):
    cfg = load_yaml(default_config_path())
    cfg.SETTINGS.log_path = str(tmp_path)
    cfg.SETTINGS.name = "snap"
    path = save_yaml(cfg)
    assert os.path.exists(path)
    reloaded = load_yaml(path)
    assert reloaded.MODEL.num_layers == cfg.MODEL.num_layers


def test_copy_is_deep():
    cfg = load_yaml(default_config_path())
    cp = cfg.copy()
    cp.MODEL.num_layers = 50
    assert cfg.MODEL.num_layers == 18


def test_all_shipped_presets_load():
    """Every configs/*.yaml parses and carries the core sections; the
    hard-mode world preset pins its defining knobs (BASELINE.md)."""
    cfg_dir = os.path.join(os.path.dirname(default_config_path()))
    names = sorted(
        f for f in os.listdir(cfg_dir) if f.endswith(".yaml")
    )
    assert len(names) >= 7, names
    for name in names:
        cfg = load_yaml(os.path.join(cfg_dir, name))
        for section in ("SETTINGS", "DATA", "MODEL", "LOSS", "OPTIMIZATION"):
            assert section in cfg, (name, section)
    hard = load_yaml(os.path.join(cfg_dir, "config_hard_world.yaml"))
    assert hard.LOSS.three3d_align == "world"
    assert hard.LOSS.three3d_loss_weight == 1.0
    assert hard.LOSS.three3d_dist_gate is None
    assert hard.DATA.textureless_frac == 0.65
    assert hard.DATA.photo_jitter == 0.25
    # fast preset stays on the TPU-measured relative flagship
    fast = load_yaml(os.path.join(cfg_dir, "config_tpu_fast.yaml"))
    assert fast.LOSS.three3d_align == "relative"
    assert fast.LOSS.three3d_dist_gate == 0.15
