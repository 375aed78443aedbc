import numpy as np
from PIL import Image

from spe_tpu.data.voc import VOC_CLASSES, VOCDevkitDataset, parse_voc_xml

XML = """<annotation>
  <size><width>100</width><height>80</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>51</xmax><ymax>61</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>30</xmax><ymax>30</ymax></bndbox>
  </object>
  <object><name>notaclass</name><difficult>0</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
  </object>
</annotation>"""


def _make_devkit(tmp_path, n_imgs=3):
    root = tmp_path / "VOCdevkit"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (root / "VOC2007" / sub).mkdir(parents=True)
    ids = []
    for i in range(n_imgs):
        img_id = f"{i:06d}"
        ids.append(img_id)
        Image.fromarray(np.zeros((80, 100, 3), np.uint8)).save(
            root / "VOC2007" / "JPEGImages" / f"{img_id}.jpg")
        (root / "VOC2007" / "Annotations" / f"{img_id}.xml").write_text(XML)
    (root / "VOC2007" / "ImageSets" / "Main" / "test.txt").write_text("\n".join(ids))
    return root


def test_parse_voc_xml(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(XML)
    ann = parse_voc_xml(p)
    assert len(ann["labels"]) == 2  # unknown class dropped
    assert ann["labels"][0] == VOC_CLASSES.index("dog") + 1
    # 1-based -> 0-based conversion
    np.testing.assert_allclose(ann["boxes"][0], [10, 20, 50, 60])
    assert ann["difficult"].tolist() == [False, True]


def test_voc_devkit_dataset(tmp_path):
    root = _make_devkit(tmp_path)
    ds = VOCDevkitDataset(root, [("VOC2007", "test")])
    assert len(ds) == 3
    img, t = ds[0]
    assert img.shape == (80, 100, 3)
    assert t["img_label"].sum() == 2  # dog + person
    gt = ds.eval_ground_truth()
    dog = VOC_CLASSES.index("dog") + 1
    assert set(gt[dog].keys()) == {0, 1, 2}
    boxes, difficult = gt[dog][0]
    assert boxes.shape == (1, 4) and not difficult[0]


def test_voc_eval_e2e_with_perfect_detections(tmp_path):
    from spe_tpu.data.voc_eval import corloc, voc_eval_all

    root = _make_devkit(tmp_path)
    ds = VOCDevkitDataset(root, [("VOC2007", "test")])
    gt = ds.eval_ground_truth()
    dog = VOC_CLASSES.index("dog") + 1
    dets = {dog: [(i, 0.9, [10, 20, 50, 60]) for i in range(3)]}
    stats = voc_eval_all(dets, {dog: gt[dog]})
    assert abs(stats["ap_per_class"][dog] - 1.0) < 1e-6
    top = {dog: {i: [10, 20, 50, 60] for i in range(3)}}
    loc = corloc(top, {dog: gt[dog]})
    assert abs(loc["CorLoc"] - 1.0) < 1e-9
