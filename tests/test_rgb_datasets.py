"""On-disk layout tests for the training dataset classes (tiny fixtures)."""

import os

import cv2
import numpy as np
import pytest

from mmtrack_tpu.data.datasets import DepthTrackTrain, LasHeRTrain, names2datasets
from mmtrack_tpu.data.image_loader import default_image_loader
from mmtrack_tpu.data.rgb_datasets import GOT10k, LaSOT, TrackingNet
from mmtrack_tpu.data.sampler import TrackingSampler


def _img(path, seed=0, size=(40, 60)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    cv2.imwrite(path, rng.randint(0, 255, (*size, 3), np.uint8))


def _make_lasot(root, n=6):
    seq = os.path.join(root, "cat", "cat-1")
    for i in range(n):
        _img(os.path.join(seq, "img", f"{i + 1:08d}.jpg"), i)
    gt = np.tile([5.0, 6.0, 20.0, 15.0], (n, 1))
    np.savetxt(os.path.join(seq, "groundtruth.txt"), gt, delimiter=",")
    np.savetxt(os.path.join(seq, "full_occlusion.txt"), np.zeros((1, n)),
               delimiter=",", fmt="%d")
    np.savetxt(os.path.join(seq, "out_of_view.txt"), np.zeros((1, n)),
               delimiter=",", fmt="%d")


def test_lasot_layout(tmp_path):
    _make_lasot(str(tmp_path))
    ds = LaSOT(str(tmp_path))
    assert ds.num_sequences() == 1
    info = ds.seq_info(0)
    assert info["visible"].sum() == 6
    frames, boxes = ds.get_frames(0, [0, 3])
    assert frames[0].shape == (40, 60, 3)
    np.testing.assert_allclose(boxes[1], [5, 6, 20, 15])


def test_got10k_layout(tmp_path):
    seq = tmp_path / "GOT-10k_Train_000001"
    n = 5
    for i in range(n):
        _img(str(seq / f"{i + 1:08d}.jpg"), i)
    np.savetxt(str(seq / "groundtruth.txt"),
               np.tile([2.0, 3.0, 10.0, 8.0], (n, 1)), delimiter=",")
    np.savetxt(str(seq / "absence.label"), np.array([0, 0, 1, 0, 0]), fmt="%d")
    np.savetxt(str(seq / "cover.label"), np.array([8, 8, 8, 0, 8]), fmt="%d")
    (tmp_path / "list.txt").write_text("GOT-10k_Train_000001\n")
    ds = GOT10k(str(tmp_path))
    info = ds.seq_info(0)
    # absent frame 2 and fully-covered frame 3 are not visible
    np.testing.assert_array_equal(info["visible"], [1, 1, 0, 0, 1])
    frames, boxes = ds.get_frames(0, [4])
    assert frames[0].shape == (40, 60, 3)


def test_trackingnet_layout(tmp_path):
    f = tmp_path / "TRAIN_0" / "frames" / "seqA"
    a = tmp_path / "TRAIN_0" / "anno"
    n = 4
    for i in range(n):
        _img(str(f / f"{i}.jpg"), i)
    os.makedirs(str(a), exist_ok=True)
    np.savetxt(str(a / "seqA.txt"), np.tile([1.0, 2.0, 12.0, 9.0], (n, 1)),
               delimiter=",")
    ds = TrackingNet(str(tmp_path), set_ids=[0])
    assert ds.num_sequences() == 1
    frames, boxes = ds.get_frames(0, [0, 2])
    assert frames[1].shape == (40, 60, 3)
    np.testing.assert_allclose(boxes[0], [1, 2, 12, 9])


def test_depthtrack_train_layout(tmp_path):
    seq = tmp_path / "adapter01_indoor"
    n = 5
    for i in range(n):
        _img(str(seq / "color" / f"{i + 1:08d}.jpg"), i)
        p = str(seq / "depth" / f"{i + 1:08d}.png")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        cv2.imwrite(p, np.random.RandomState(i).randint(
            0, 3000, (40, 60), np.uint16 if False else np.int32).astype(np.uint16))
    np.savetxt(str(seq / "groundtruth.txt"),
               np.tile([4.0, 5.0, 15.0, 12.0], (n, 1)), delimiter=",")
    ds = DepthTrackTrain(str(tmp_path))
    frames, boxes = ds.get_frames(0, [1, 2])
    assert frames[0].shape == (40, 60, 6)  # rgbcolormap composition


def test_lasher_train_layout_and_sampler(tmp_path):
    seq = tmp_path / "seq01"
    # the sampler applies the reference eligibility rule verbatim
    # (len(visible) >= 20 and visible.sum() > 2*(search+template))
    n = 22
    for i in range(n):
        _img(str(seq / "visible" / f"{i:05d}.jpg"), i)
        _img(str(seq / "infrared" / f"{i:05d}.jpg"), 100 + i)
    np.savetxt(str(seq / "visible.txt"),
               np.tile([3.0, 4.0, 18.0, 14.0], (n, 1)), delimiter=",")
    ds = LasHeRTrain(str(tmp_path))
    frames, boxes = ds.get_frames(0, [0])
    assert frames[0].shape == (40, 60, 6)  # rgbrgb composition
    s = TrackingSampler([ds], None, samples_per_epoch=3, max_gap=4, seed=0)
    d = s.sample()
    assert d["template_images"][0].shape == (40, 60, 6)


def test_names2datasets_registry(tmp_path):
    _make_lasot(str(tmp_path))
    out = names2datasets(["LASOT"], {"LASOT": str(tmp_path)})
    assert out[0].num_sequences() == 1
    with pytest.raises(KeyError):
        names2datasets(["NOPE"], {})


def _img16(path, seed=0, size=(40, 60)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    cv2.imwrite(path, rng.randint(200, 4000, size, np.int32).astype(np.uint16))


def _make_depth_seq(seq, n=6):
    for i in range(n):
        _img(os.path.join(seq, "color", f"{i + 1:08d}.jpg"), i)
        _img16(os.path.join(seq, "depth", f"{i + 1:08d}.png"), i)
    np.savetxt(os.path.join(seq, "groundtruth.txt"),
               np.tile([4.0, 5.0, 12.0, 10.0], (n, 1)), delimiter=",")


def test_got10k_depth_layout(tmp_path):
    from mmtrack_tpu.data.rgb_datasets import Got10kDepth
    _make_depth_seq(str(tmp_path / "GOT-10k_Train_000001"))
    ds = Got10kDepth(str(tmp_path))
    assert ds.num_sequences() == 1
    frames, boxes = ds.get_frames(0, [0, 2])
    assert frames[0].shape == (40, 60, 6)  # rgbcolormap composition
    np.testing.assert_allclose(boxes[0], [4, 5, 12, 10])


def test_lasot_depth_layout_nested(tmp_path):
    from mmtrack_tpu.data.rgb_datasets import LaSOTDepth
    seq = str(tmp_path / "cat" / "cat-1")
    _make_depth_seq(seq, n=5)
    np.savetxt(os.path.join(seq, "full_occlusion.txt"),
               np.array([[0, 0, 1, 0, 0]]), delimiter=",", fmt="%d")
    np.savetxt(os.path.join(seq, "out_of_view.txt"),
               np.array([[0, 0, 0, 1, 0]]), delimiter=",", fmt="%d")
    ds = LaSOTDepth(str(tmp_path))
    assert ds.num_sequences() == 1
    info = ds.seq_info(0)
    np.testing.assert_array_equal(info["visible"], [1, 1, 0, 0, 1])
    frames, _ = ds.get_frames(0, [1])
    assert frames[0].shape == (40, 60, 6)


def test_imagenet_vid_layout(tmp_path):
    from mmtrack_tpu.data.rgb_datasets import ImageNetVID
    data = tmp_path / "Data" / "VID" / "train" / "a" / "seq0"
    anno = tmp_path / "Annotations" / "VID" / "train" / "a" / "seq0"
    os.makedirs(str(anno))
    for i in range(4):
        _img(str(data / f"{i:06d}.JPEG"), i)
        occluded = 1 if i == 2 else 0
        (anno / f"{i:06d}.xml").write_text(f"""
<annotation><object><trackid>0</trackid><occluded>{occluded}</occluded>
<bndbox><xmin>5</xmin><ymin>6</ymin><xmax>25</xmax><ymax>21</ymax></bndbox>
</object></annotation>""")
    ds = ImageNetVID(str(tmp_path))
    assert ds.num_sequences() == 1
    info = ds.seq_info(0)
    np.testing.assert_array_equal(info["visible"], [1, 1, 0, 1])
    frames, boxes = ds.get_frames(0, [0])
    assert frames[0].shape == (40, 60, 3)
    np.testing.assert_allclose(boxes[0], [5, 6, 20, 15])


def test_sampler_trident_and_stark_modes(tmp_path):
    """trident/trident_pro/stark frame-id sampling (ViPT sampler.py:298-345):
    1 + len(max_gap) templates; stark draws extras from `valid`."""
    from mmtrack_tpu.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_sequences=2, n_frames=40)
    for mode in ("trident", "trident_pro", "stark"):
        s = TrackingSampler([ds], None, samples_per_epoch=4,
                            max_gap=[10, 30], num_template_frames=3,
                            frame_sample_mode=mode, seed=1)
        out = s.sample()
        assert len(out["template_images"]) == 3   # t1 + 2 extras
        assert len(out["search_images"]) == 1
