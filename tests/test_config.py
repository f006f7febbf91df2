"""Config/CLI parity tests (SURVEY.md §2.13, §5.6)."""

from dvdgan_tpu.utils.config import PRESETS, Config, parse_config


def test_default_flagship():
    c = Config()
    assert c.img_size == 64 and c.n_frames == 16
    g = c.g_config()
    assert g.n_levels == 4 and g.mults == (8, 8, 4, 2, 1)
    assert g.chunk_dim == 24 and g.cond_dim == 144


def test_reference_flag_surface():
    c = parse_config([
        "--batch_size", "16", "--n_frames", "8", "--img_size", "64",
        "--z_dim", "120", "--lr_g", "2e-4", "--lr_d", "2e-4",
        "--d_steps", "1", "--total_step", "500", "--log_step", "5",
        "--sample_step", "50", "--model_save_step", "100",
        "--pretrained_model", "400", "--dataset", "synthetic",
        "--data_path", "/x", "--seed", "7"])
    assert c.batch_size == 16 and c.pretrained_model == 400
    assert c.lr_g == 2e-4 and c.seed == 7


def test_presets_build_model_configs():
    for name, overrides in PRESETS.items():
        c = parse_config(["--preset", name])
        g = c.g_config()
        ds = c.ds_config()
        dt = c.dt_config()
        assert g.img_size == c.img_size
        assert ds.k_frames <= c.n_frames
        assert dt.input_size == c.img_size // 2, name


def test_preset_override():
    c = parse_config(["--preset", "smoke", "--batch_size", "2"])
    assert c.batch_size == 2
    assert c.dataset == "synthetic"


def test_smoke_preset_matches_baseline_config0():
    c = parse_config(["--preset", "smoke"])
    assert (c.img_size, c.n_frames, c.batch_size) == (64, 8, 4)
