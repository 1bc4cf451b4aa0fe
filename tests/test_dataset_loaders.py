"""Every real-dataset loader parses its actual on-disk annotation format.

Each test fabricates the minimal directory layout the corresponding
dataset ships with (annotation txt/mat/json files + zero-byte images) and
asserts the parsed splits, labels and classname transformations — the
contracts a user's existing CoOp-layout data relies on (reference
``datasets/*.py``).
"""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

from clip_calibration_tpu.config import get_cfg_default
from clip_calibration_tpu.data.base import set_random_seed
from clip_calibration_tpu.engine.registry import DATASET_REGISTRY
import clip_calibration_tpu.data.datasets  # noqa: F401


def _cfg(root, shots=-1, subsample="all"):
    cfg = get_cfg_default()
    cfg.DATASET.ROOT = str(root)
    cfg.DATASET.NUM_SHOTS = shots
    cfg.DATASET.SUBSAMPLE_CLASSES = subsample
    cfg.SEED = 1
    return cfg


def _touch(*path):
    os.makedirs(osp.dirname(osp.join(*path)), exist_ok=True)
    open(osp.join(*path), "wb").close()


def _folder_tree(base, classes, n_per_class=10, ext=".jpg"):
    for c in classes:
        for i in range(n_per_class):
            _touch(base, c, f"img_{i:03d}{ext}")


def _build(name, root):
    set_random_seed(1)
    return DATASET_REGISTRY.get(name)(_cfg(root))


def test_oxford_pets(tmp_path):
    d = tmp_path / "oxford_pets"
    lines = []
    for breed, label in (("abyssinian", 1), ("great_dane", 2)):
        for i in range(10):
            lines.append(f"{breed.capitalize()}_{i} {label} 1 1")
            _touch(str(d), "images", f"{breed.capitalize()}_{i}.jpg")
    (d / "annotations").mkdir(parents=True, exist_ok=True)
    (d / "annotations" / "trainval.txt").write_text("\n".join(lines[:16]))
    (d / "annotations" / "test.txt").write_text("\n".join(lines[16:]))
    ds = _build("OxfordPets", tmp_path)
    assert ds.num_classes == 2
    assert {x.classname for x in ds.test} <= {"abyssinian", "great_dane"}
    # 80/20 trainval split, split json written for reuse
    assert len(ds.train_x) + len(ds.val) == 16
    assert (d / "split_zhou_OxfordPets.json").exists()
    # second construction reads the saved split identically
    ds2 = _build("OxfordPets", tmp_path)
    assert [x.impath for x in ds2.test] == [x.impath for x in ds.test]


def test_caltech101_ignores_and_renames(tmp_path):
    base = tmp_path / "caltech-101" / "101_ObjectCategories"
    _folder_tree(str(base), ["airplanes", "BACKGROUND_Google", "Faces",
                             "ant"], 10)
    ds = _build("Caltech101", tmp_path)
    names = {x.classname for x in ds.test}
    assert "airplane" in names and "face" in names and "ant" in names
    assert not any("BACKGROUND" in n for n in names)  # IGNORED
    assert ds.num_classes == 3


def test_dtd_and_food101_folder_split(tmp_path):
    _folder_tree(str(tmp_path / "dtd" / "images"),
                 ["banded", "blotchy"], 10)
    ds = _build("DescribableTextures", tmp_path)
    assert ds.num_classes == 2
    assert len(ds.train_x) == 10 and len(ds.val) == 4 and \
        len(ds.test) == 6  # 50/20/30

    _folder_tree(str(tmp_path / "food-101" / "images"),
                 ["apple_pie", "baby_back_ribs"], 10)
    ds = _build("Food101", tmp_path)
    assert ds.num_classes == 2


def test_eurosat_renames(tmp_path):
    _folder_tree(str(tmp_path / "eurosat" / "2750"),
                 ["AnnualCrop", "SeaLake"], 10)
    ds = _build("EuroSAT", tmp_path)
    assert {x.classname for x in ds.test} == \
        {"Annual Crop Land", "Sea or Lake"}


def test_fgvc_aircraft(tmp_path):
    d = tmp_path / "fgvc_aircraft"
    d.mkdir()
    (d / "variants.txt").write_text("707-320\nA310\n")
    for split, ids in (("train", (0, 1, 2)), ("val", (3, 4)),
                       ("test", (5, 6))):
        rows = [f"{100 + i} 707-320" if i % 2 == 0 else f"{100 + i} A310"
                for i in ids]
        (d / f"images_variant_{split}.txt").write_text("\n".join(rows))
    ds = _build("FGVCAircraft", tmp_path)
    assert ds.num_classes == 2
    assert len(ds.train_x) == 3 and len(ds.val) == 2 and len(ds.test) == 2
    assert {x.classname for x in ds.test} <= {"707-320", "A310"}
    assert ds.test[0].impath.endswith(".jpg")


def test_oxford_flowers_mat_and_json(tmp_path):
    from scipy.io import savemat
    d = tmp_path / "oxford_flowers"
    d.mkdir()
    labels = [1] * 10 + [2] * 10  # 1-based labels, 10 images each
    savemat(d / "imagelabels.mat", {"labels": np.array([labels])})
    (d / "cat_to_name.json").write_text(
        json.dumps({"1": "pink primrose", "2": "hard-leaved pocket orchid"}))
    ds = _build("OxfordFlowers", tmp_path)
    assert ds.num_classes == 2
    assert len(ds.train_x) == 10 and len(ds.val) == 4 and \
        len(ds.test) == 6  # 50/20/30 per class
    assert {x.classname for x in ds.test} == \
        {"pink primrose", "hard-leaved pocket orchid"}


def test_stanford_cars_mat(tmp_path):
    from scipy.io import savemat
    d = tmp_path / "stanford_cars"
    (d / "devkit").mkdir(parents=True)

    def annos(n, with_test=False):
        arr = np.zeros((1, n), dtype=[("fname", "O"), ("class", "O")])
        for i in range(n):
            arr[0, i]["fname"] = np.array([f"{i:05d}.jpg"])
            arr[0, i]["class"] = np.array([[1 + i % 2]])
        return arr

    savemat(d / "devkit" / "cars_train_annos.mat",
            {"annotations": annos(10)})
    savemat(d / "cars_test_annos_withlabels.mat",
            {"annotations": annos(6)})
    meta = np.zeros((1, 2), dtype=object)
    meta[0, 0] = np.array(["Tesla Model S 2012"])
    meta[0, 1] = np.array(["Audi TT 2011"])
    savemat(d / "devkit" / "cars_meta.mat", {"class_names": meta})
    ds = _build("StanfordCars", tmp_path)
    assert ds.num_classes == 2
    # year moved to the front (reference stanford_cars.py:51-55)
    assert {x.classname for x in ds.test} == \
        {"2012 Tesla Model S", "2011 Audi TT"}


def test_sun397_nested_names(tmp_path):
    d = tmp_path / "sun397"
    d.mkdir()
    (d / "ClassName.txt").write_text("/a/abbey\n/i/indoor/market\n")
    train_rows = [f"/a/abbey/sun_{i:04d}.jpg" for i in range(5)] + \
        [f"/i/indoor/market/sun_{i:04d}.jpg" for i in range(5)]
    test_rows = [f"/a/abbey/sun_9{i:03d}.jpg" for i in range(3)] + \
        [f"/i/indoor/market/sun_9{i:03d}.jpg" for i in range(3)]
    (d / "Training_01.txt").write_text("\n".join(train_rows))
    (d / "Testing_01.txt").write_text("\n".join(test_rows))
    ds = _build("SUN397", tmp_path)
    assert ds.num_classes == 2
    # "i/indoor/market" -> "market indoor" (reverse path components)
    assert {x.classname for x in ds.test} == {"abbey", "market indoor"}


def test_ucf101_camelcase_renames(tmp_path):
    d = tmp_path / "ucf101" / "ucfTrainTestlist"
    d.mkdir(parents=True)
    (d / "classInd.txt").write_text(
        "1 ApplyEyeMakeup\n2 BabyCrawling\n")
    (d / "trainlist01.txt").write_text("\n".join(
        [f"ApplyEyeMakeup/v_AEM_g{i:02d}.avi 1" for i in range(5)]
        + [f"BabyCrawling/v_BC_g{i:02d}.avi 2" for i in range(5)]))
    (d / "testlist01.txt").write_text("\n".join(
        ["ApplyEyeMakeup/v_AEM_t01.avi", "BabyCrawling/v_BC_t01.avi"]))
    ds = _build("UCF101", tmp_path)
    assert ds.num_classes == 2
    assert {x.classname for x in ds.test} == \
        {"Apply_Eye_Makeup", "Baby_Crawling"}
    assert all(x.impath.endswith(".jpg") for x in ds.test)


def test_imagenet_and_variants(tmp_path):
    # ImageNet: classnames.txt + train/val folder trees + pickle cache
    d = tmp_path / "imagenet"
    d.mkdir()
    (d / "classnames.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\n")
    for split in ("train", "val"):
        _folder_tree(str(d / "images" / split),
                     ["n01440764", "n01443537"], 4, ext=".JPEG")
    ds = _build("ImageNet", tmp_path)
    assert ds.num_classes == 2
    assert {x.classname for x in ds.test} == {"tench", "goldfish"}
    assert (d / "preprocessed.pkl").exists()
    ds2 = _build("ImageNet", tmp_path)  # cache hit path
    assert len(ds2.test) == len(ds.test)

    # Sketch: folder-per-wnid
    sk = tmp_path / "imagenet-sketch"
    sk.mkdir()
    (sk / "classnames.txt").write_text(
        "n01440764 tench\nn01443537 goldfish\n")
    _folder_tree(str(sk / "images"), ["n01440764", "n01443537"], 2)
    ds = _build("ImageNetSketch", tmp_path)
    assert ds.num_classes == 2 and len(ds.test) == 4

    # A/R: README.txt must be ignored
    for name, dirname, sub in (("ImageNetA", "imagenet-adversarial",
                                "imagenet-a"),
                               ("ImageNetR", "imagenet-rendition",
                                "imagenet-r")):
        dd = tmp_path / dirname
        dd.mkdir()
        (dd / "classnames.txt").write_text(
            "n01440764 tench\nn01443537 goldfish\n")
        _folder_tree(str(dd / sub), ["n01440764", "n01443537"], 2)
        (dd / sub / "README.txt").write_text("ignore me")
        ds = _build(name, tmp_path)
        assert ds.num_classes == 2 and len(ds.test) == 4


def test_imagenetv2_numeric_folders(tmp_path):
    d = tmp_path / "imagenetv2"
    d.mkdir()
    wnids = [f"n{i:08d}" for i in range(1000)]
    (d / "classnames.txt").write_text(
        "\n".join(f"{w} class {i}" for i, w in enumerate(wnids)))
    img = d / "imagenetv2-matched-frequency-format-val"
    for label in range(1000):
        (img / str(label)).mkdir(parents=True)
    _touch(str(img), "0", "a.jpg")
    _touch(str(img), "999", "b.jpg")
    ds = _build("ImageNetV2", tmp_path)
    assert len(ds.test) == 2
    assert {x.classname for x in ds.test} == {"class 0", "class 999"}
