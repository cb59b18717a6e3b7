"""Tests for the flow training data layer (training/flow_data.py):
augmentors, dataset catalog on a synthetic FlyingChairs-style tree,
sparse flow-map resize, batch iterator shapes."""

import numpy as np
import pytest
from PIL import Image

from sd_animation_optical_flow_tpu.training import flow_data as FD
from sd_animation_optical_flow_tpu.utils.flow_io import (write_flo,
                                                         write_flow_kitti)


def _img(rng, h=80, w=120):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def _flow(rng, h=80, w=120):
    return (rng.standard_normal((h, w, 2)) * 3).astype(np.float32)


# ---------------------------------------------------------------------------
# augmentors
# ---------------------------------------------------------------------------

def test_color_jitter_shape_and_range(np_rng):
    img = _img(np_rng)
    out = FD.color_jitter(img, np_rng)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_dense_augmentor_crop_and_flip(np_rng):
    aug = FD.FlowAugmentor(crop_size=(48, 64))
    i1, i2, fl = aug(_img(np_rng), _img(np_rng), _flow(np_rng), np_rng)
    assert i1.shape == (48, 64, 3)
    assert i2.shape == (48, 64, 3)
    assert fl.shape == (48, 64, 2)


def test_dense_augmentor_hflip_negates_u():
    rng = np.random.default_rng(0)
    aug = FD.FlowAugmentor(crop_size=(8, 8), do_flip=True,
                           spatial_aug_prob=0.0, stretch_prob=0.0,
                           h_flip_prob=1.0, v_flip_prob=0.0,
                           asymmetric_color_aug_prob=0.0,
                           eraser_aug_prob=0.0)
    img = np.zeros((8, 8, 3), np.uint8)
    flow = np.ones((8, 8, 2), np.float32)
    # neutralize photometric variation by patching color_jitter draw
    _, _, fl = aug.spatial_transform(img, img, flow,
                                     np.random.default_rng(1))
    assert np.allclose(fl[..., 0], -1.0)
    assert np.allclose(fl[..., 1], 1.0)


def test_eraser_changes_only_img2(np_rng):
    aug = FD.FlowAugmentor(crop_size=(8, 8), eraser_aug_prob=1.0)
    i1 = _img(np_rng, 64, 64)
    i2 = _img(np_rng, 64, 64)
    o1, o2 = aug.eraser_transform(i1, i2, np_rng)
    assert o1 is i1                      # untouched
    assert not np.array_equal(o2, i2)    # some pixels replaced


def test_sparse_resize_flow_map():
    flow = np.zeros((10, 10, 2), np.float32)
    valid = np.zeros((10, 10), np.int32)
    flow[4, 6] = (2.0, -1.0)
    valid[4, 6] = 1
    f2, v2 = FD.SparseFlowAugmentor.resize_sparse_flow_map(
        flow, valid, fx=2.0, fy=2.0)
    assert f2.shape == (20, 20, 2) and v2.shape == (20, 20)
    assert v2.sum() == 1
    yy, xx = np.argwhere(v2)[0]
    assert (yy, xx) == (8, 12)
    np.testing.assert_allclose(f2[yy, xx], [4.0, -2.0])


def test_sparse_augmentor_full(np_rng):
    aug = FD.SparseFlowAugmentor(crop_size=(40, 56))
    i1 = _img(np_rng, 96, 128)
    i2 = _img(np_rng, 96, 128)
    flow = _flow(np_rng, 96, 128)
    valid = (np_rng.random((96, 128)) > 0.5).astype(np.int32)
    o1, o2, fl, vl = aug(i1, i2, flow, valid, np_rng)
    assert o1.shape == (40, 56, 3)
    assert fl.shape == (40, 56, 2)
    assert vl.shape == (40, 56)
    assert set(np.unique(vl)).issubset({0, 1})


# ---------------------------------------------------------------------------
# dataset catalog + iterator on a synthetic FlyingChairs tree
# ---------------------------------------------------------------------------

@pytest.fixture
def chairs_root(tmp_path, np_rng):
    root = tmp_path / "chairs"
    root.mkdir()
    for i in range(4):
        a = _img(np_rng, 64, 96)
        b = _img(np_rng, 64, 96)
        Image.fromarray(a).save(root / f"{i:05d}_img1.ppm")
        Image.fromarray(b).save(root / f"{i:05d}_img2.ppm")
        write_flo(str(root / f"{i:05d}_flow.flo"), _flow(np_rng, 64, 96))
    return str(root)


def test_flying_chairs_dataset(chairs_root):
    ds = FD.flying_chairs(chairs_root)
    assert len(ds) == 4
    i1, i2, fl, valid = ds[0]
    assert i1.shape == (64, 96, 3) and i1.dtype == np.float32
    assert fl.shape == (64, 96, 2)
    assert valid.shape == (64, 96)
    assert valid.min() >= 0 and valid.max() <= 1


def test_flying_chairs_with_aug(chairs_root):
    ds = FD.flying_chairs(
        chairs_root, aug_params=dict(crop_size=(32, 48)))
    i1, i2, fl, _ = ds[1]
    assert i1.shape == (32, 48, 3)
    assert fl.shape == (32, 48, 2)


def test_batch_iterator(chairs_root):
    ds = FD.flying_chairs(
        chairs_root, aug_params=dict(crop_size=(32, 48)))
    it = FD.make_batch_iterator(ds, batch_size=2, seed=0)
    batch = next(it)
    assert batch["image1"].shape == (2, 32, 48, 3)
    assert batch["flow"].shape == (2, 32, 48, 2)
    assert batch["valid"].shape == (2, 32, 48)
    assert batch["image1"].dtype == np.float32


def test_concat_datasets(chairs_root):
    ds = FD.flying_chairs(chairs_root)
    mix = FD.concat_datasets([ds, ds], repeats=[2, 1])
    assert len(mix) == 12


def test_kitti_dataset(tmp_path, np_rng):
    root = tmp_path / "KITTI" / "training"
    (root / "image_2").mkdir(parents=True)
    (root / "flow_occ").mkdir()
    for i in range(2):
        Image.fromarray(_img(np_rng, 40, 60)).save(
            root / "image_2" / f"{i:06d}_10.png")
        Image.fromarray(_img(np_rng, 40, 60)).save(
            root / "image_2" / f"{i:06d}_11.png")
        flow = _flow(np_rng, 40, 60)
        valid = np.ones((40, 60), np.float32)
        write_flow_kitti(str(root / "flow_occ" / f"{i:06d}_10.png"),
                         np.concatenate([flow, valid[..., None]], -1))
    ds = FD.kitti(str(tmp_path / "KITTI"))
    assert len(ds) == 2 and ds.sparse
    i1, i2, fl, valid = ds[0]
    assert fl.shape == (40, 60, 2)
    # kitti png16 quantizes to 1/64 px
    assert valid.sum() > 0
