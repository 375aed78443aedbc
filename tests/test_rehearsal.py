"""The turnkey accuracy rehearsal (scripts/run_accuracy.py) end-to-end:
byte-real mini VOC data (JPEGs + XMLs + COCO jsons on disk) -> the REAL
CLI driver with the published recipe shrunk -> per-epoch VOC eval ->
log.txt -> milestone asserts. After this passes, the only untested
variable in a real data drop is the data itself (VERDICT r2 Next #2)."""

import importlib.util
import json
import types
from pathlib import Path
import pytest

REPO = Path(__file__).resolve().parent.parent


def _load_run_accuracy():
    spec = importlib.util.spec_from_file_location(
        "run_accuracy", REPO / "scripts" / "run_accuracy.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mini_voc_generator_formats(tmp_path):
    from spe_tpu.config import SPEConfig
    from spe_tpu.data.build import build_dataset
    from spe_tpu.data.mini_data import make_mini_voc

    devkit, coco_root = make_mini_voc(tmp_path, n_trainval=6, n_test=4,
                                      img_size=96)
    cfg = SPEConfig(dataset_file="voc", dataset_eval="voc_voc",
                    coco_path=str(coco_root), test_path=str(devkit),
                    fixed_size=True, max_size=96, num_classes=20)
    ds_train = build_dataset("train", "voc", cfg)
    ds_val = build_dataset("val", "voc_voc", cfg)
    assert len(ds_train) == 6 and len(ds_val) == 4
    img, tgt = ds_train[0]
    assert img.shape == (96, 96, 3) and tgt["img_label"].sum() >= 1
    # devkit XML side parses with difficult flags and 1-based label ids
    t = ds_val.get_target(0)
    assert t["boxes"].shape[1] == 4 and t["labels"].min() >= 1
    gt = ds_val.eval_ground_truth()
    assert any(len(v) for v in gt.values())


@pytest.mark.slow
def test_rehearsal_end_to_end(tmp_path):
    mod = _load_run_accuracy()
    args = types.SimpleNamespace(workdir=str(tmp_path), epochs=2,
                                 output_dir=None)
    last = mod.rehearse(args)
    assert "test_mAP" in last
    # the run dir carries the full artifact contract
    out = tmp_path / "run"
    recs = [json.loads(l) for l in (out / "log.txt").read_text().splitlines()]
    assert {r["epoch"] for r in recs} == {0, 1}


def test_milestone_checker():
    mod = _load_run_accuracy()
    mod.check_milestones("voc", {"mAP": 0.508}, tol=1.0)  # 50.8 >= 51-1
    try:
        mod.check_milestones("coco", {"AP50": 0.10, "AP": 0.079}, tol=1.0)
    except SystemExit as e:
        assert "AP50" in str(e)
    else:
        raise AssertionError("should have failed AP50 milestone")


@pytest.mark.slow
def test_coco_rehearsal_end_to_end(tmp_path):
    mod = _load_run_accuracy()
    args = types.SimpleNamespace(workdir=str(tmp_path), epochs=2,
                                 output_dir=None)
    last = mod.rehearse_coco(args)
    assert "test_AP50" in last and "test_stage1_AP50" in last
    out = tmp_path / "run"
    assert list((out / "eval").glob("stage*_*.npz"))
