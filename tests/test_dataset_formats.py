"""Annotation-format parsing for the remaining dataset generators.

Each test synthesizes the dataset's real on-disk annotation format
(``cars_annos.mat`` struct array, Flowers MATLAB label/split vectors,
iNat COCO JSON, ILSVRC synset directories, subdirectory+list files) with
tiny real JPEGs and asserts file/label/split enumeration plus one decoded
batch.  Mirrors the reference loaders: ``datasets/cars.py``,
``datasets/flowers.py``, ``datasets/ilsvrc.py``, ``datasets/inat.py``,
``datasets/subdirectory.py``.
"""

import json
import os

import numpy as np

from semantic_embeddings_tpu.data.datasets import (
    CarsDataset,
    FlowersDataset,
    ILSVRCDataset,
    INatDataset,
    SubDirectoryDataset,
)


def _jpeg(path, seed=0, size=(48, 40)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    Image.fromarray(
        rng.integers(0, 256, size + (3,)).astype(np.uint8)).save(path)


def _check_batch(ds, n=2):
    raw = next(iter(ds.train_batches(n, epoch=0, seed=0)))
    assert raw["image"].shape == (n,) + ds.cropsize[::-1] + (3,)
    assert raw["image"].dtype == np.uint8


def test_cars_dataset(tmp_path):
    import scipy.io

    root = str(tmp_path)
    n = 8
    rec = np.zeros((n,), dtype=[("relative_im_path", "O"), ("bbox_x1", "O"),
                                ("class", "O"), ("test", "O")])
    for i in range(n):
        rel = f"car_ims/{i:06d}.jpg"
        _jpeg(os.path.join(root, rel), seed=i)
        rec[i] = (rel, 1, (i % 2) + 1, i >= 5)
    scipy.io.savemat(os.path.join(root, "cars_annos.mat"),
                     {"annotations": rec})

    ds = CarsDataset(root, cropsize=(24, 24), default_target_size=28)
    assert ds.classes == [1, 2]
    assert ds.num_train == 5 and ds.num_test == 3
    assert list(ds._train_labels) == [0, 1, 0, 1, 0]
    assert all(os.path.isfile(f) for f in ds.train_img_files)
    _check_batch(ds)

    # class subsetting drops unlisted classes entirely
    sub = CarsDataset(root, classes=[2], cropsize=(24, 24),
                      default_target_size=28)
    assert sub.num_train + sub.num_test == 4
    assert set(sub._train_labels) | set(sub._test_labels) == {0}


def test_flowers_dataset(tmp_path):
    import scipy.io

    root = str(tmp_path)
    labels = np.asarray([1, 1, 2, 2, 1, 2], dtype=np.int64)  # 1-based imgs
    for i in range(1, 7):
        _jpeg(os.path.join(root, "jpg", f"image_{i:05d}.jpg"), seed=i)
    scipy.io.savemat(os.path.join(root, "imagelabels.mat"),
                     {"labels": labels})
    scipy.io.savemat(os.path.join(root, "setid.mat"), {
        "trnid": np.asarray([1, 3]), "valid": np.asarray([5]),
        "tstid": np.asarray([2, 4, 6]),
    })

    ds = FlowersDataset(root, cropsize=(24, 24), default_target_size=28)
    assert ds.classes == [1, 2]
    # train = trnid + valid (the published protocol), test = tstid
    assert ds.num_train == 3 and ds.num_test == 3
    assert list(ds._train_labels) == [0, 1, 0]   # images 1, 3, 5
    assert list(ds._test_labels) == [0, 1, 1]    # images 2, 4, 6
    assert ds.train_img_files[0].endswith("image_00001.jpg")
    _check_batch(ds)


def test_ilsvrc_dataset(tmp_path):
    root = str(tmp_path)
    for synset in ("n01440764", "n01443537"):
        for i in range(3):
            _jpeg(os.path.join(root, "ILSVRC2012_img_train", synset,
                               f"{synset}_{i}.JPEG"), seed=i)
        _jpeg(os.path.join(root, "ILSVRC2012_img_val", synset,
                           f"val_{synset}.JPEG"))

    ds = ILSVRCDataset(root)  # fixed 224 crop by design
    assert ds.classes == ["n01440764", "n01443537"]
    assert ds.num_train == 6 and ds.num_test == 2
    assert list(ds._train_labels) == [0, 0, 0, 1, 1, 1]
    _check_batch(ds)

    # explicit class list restricts AND fixes the label order
    ds2 = ILSVRCDataset(root, classes=["n01443537"])
    assert ds2.num_train == 3 and set(ds2._train_labels) == {0}


def test_inat_dataset(tmp_path):
    root = str(tmp_path)

    def coco(ids, fnames, cat_of):
        return {
            "images": [{"id": i, "file_name": fn}
                       for i, fn in zip(ids, fnames)],
            "annotations": [{"image_id": i, "category_id": cat_of[i]}
                            for i in ids],
            "categories": [
                {"id": 7, "name": "Turdus merula", "supercategory": "Aves"},
                {"id": 3, "name": "Rana temporaria",
                 "supercategory": "Amphibia"},
            ],
        }

    fnames = [f"train_val2018/img_{i}.jpg" for i in range(4)]
    for i, fn in enumerate(fnames):
        _jpeg(os.path.join(root, fn), seed=i)
    with open(os.path.join(root, "train2018.json"), "w") as f:
        json.dump(coco([0, 1, 2], fnames[:3], {0: 7, 1: 3, 2: 7}), f)
    with open(os.path.join(root, "val2018.json"), "w") as f:
        json.dump(coco([3], fnames[3:], {3: 3}), f)

    ds = INatDataset(root, cropsize=(24, 24), default_target_size=28)
    # category ids are re-enumerated sorted: 3 -> 0, 7 -> 1
    assert ds.class_indices == {"Rana temporaria": 0, "Turdus merula": 1}
    assert list(ds._train_labels) == [1, 0, 1]
    assert list(ds._test_labels) == [0]
    _check_batch(ds)

    # supercategory filter keeps only matching categories (case-insensitive)
    aves = INatDataset(root, supercategory="aves", cropsize=(24, 24),
                       default_target_size=28, mean=[0.0] * 3, std=[1.0] * 3)
    assert aves.classes == ["Turdus merula"]
    assert aves.num_train == 2 and aves.num_test == 0


def test_subdirectory_dataset(tmp_path):
    root = str(tmp_path)
    files = {"kitchen": ["a.jpg", "b.jpg"], "office": ["c.jpg", "d.jpg"]}
    for cls, fns in files.items():
        for i, fn in enumerate(fns):
            _jpeg(os.path.join(root, cls, fn), seed=i)
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("kitchen/a.jpg\noffice/c.jpg\n\n")
    with open(os.path.join(root, "test.txt"), "w") as f:
        f.write("kitchen/b.jpg\noffice/d.jpg\n")

    ds = SubDirectoryDataset(root, cropsize=(24, 24),
                             default_target_size=28,
                             mean=[0.0] * 3, std=[1.0] * 3)
    assert ds.classes == ["kitchen", "office"]
    assert ds.num_train == 2 and ds.num_test == 2
    assert list(ds._train_labels) == [0, 1]
    assert ds.test_img_files[0].endswith(os.path.join("kitchen", "b.jpg"))
    _check_batch(ds)
