from spe_tpu.config import SPEConfig, config_from_args, voc0712_preset, coco17_preset


def test_preset_values_match_published_recipe():
    cfg = voc0712_preset()
    # scripts/run_voc0712.py:15-41
    assert cfg.epochs == 50 and cfg.enc_layers == 3 and cfg.layer_to_det == 24
    assert cfg.focal_gamma == 0.5 and cfg.max_size == 512 and cfg.fixed_size
    assert cfg.backbone == "TSCAM_cait_XXS36_Two_Branch"
    assert cfg.hung_match_ratio == 5 and cfg.box_jitter == 0.1
    assert cfg.num_det_classes == 21 and cfg.num_classes == 20
    c = coco17_preset()
    assert c.epochs == 14 and c.lr_drop == 11 and c.seed == 3407
    assert c.num_det_classes == 91


def test_cli_overrides_preset():
    cfg = config_from_args(["--preset", "voc0712", "--batch_size", "4",
                            "--drop_path_rate", "0.0"])
    assert cfg.batch_size == 4
    assert cfg.drop_path_rate == 0.0  # override back to default works
    assert cfg.enc_layers == 3  # preset untouched


def test_cli_no_preset_defaults():
    cfg = config_from_args([])
    assert cfg == SPEConfig()


def test_cli_no_aux_loss_alias():
    cfg = config_from_args(["--no_aux_loss"])
    assert cfg.aux_loss is False


def test_cam_thr_schedule():
    cfg = voc0712_preset()
    assert cfg.cam_thr_at_epoch(0) == 0.2
    assert cfg.cam_thr_at_epoch(19) == 0.2
    assert cfg.cam_thr_at_epoch(20) == 0.1
