"""Native codec vs numpy reference + data pipeline pieces."""
import numpy as np
import pytest

from gaussianformer_tpu.native import (decode_occupancy, normalize_image,
                                       occ_meshgrid_native, _load)
from gaussianformer_tpu.data.transforms import (
    occ_meshgrid, sample_augmentation, img_transform_matrix,
    photometric_distortion, _prepare_anchor_points, AugConfig)
from gaussianformer_tpu.data.loader import DataLoader, ShardedSampler
from gaussianformer_tpu.data.synthetic import SyntheticOccDataset


def test_native_lib_builds():
    assert _load() is not None, "g++ build of the native codec failed"


def test_decode_occupancy_matches_numpy():
    rng = np.random.RandomState(0)
    k = 500
    rec = np.stack([rng.randint(0, 20, k), rng.randint(0, 20, k),
                    rng.randint(0, 8, k), rng.randint(0, 18, k)],
                   axis=-1).astype(np.int32)
    label, mask = decode_occupancy(rec, grid=(20, 20, 8), empty_label=17)
    ref = np.full((20, 20, 8), 17, np.int32)
    ref[rec[:, 0], rec[:, 1], rec[:, 2]] = rec[:, 3]
    np.testing.assert_array_equal(label, ref)
    np.testing.assert_array_equal(mask.astype(bool), ref != 0)


def test_normalize_image_matches_numpy():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (16, 24, 3), np.uint8)
    mean = (123.675, 116.28, 103.53)
    std = (58.395, 57.12, 57.375)
    got = normalize_image(img, mean, std)
    want = (img.astype(np.float32) - np.asarray(mean, np.float32)) \
        / np.asarray(std, np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_native_meshgrid_matches_numpy():
    got = occ_meshgrid_native((-5.0, -5.0, -1.0), (10, 12, 4), 0.5)
    want = occ_meshgrid((-5.0, -5.0, -1.0, 0.0, 1.0, 1.0), (10, 12, 4), 0.5)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_aug_matrix_identity():
    aug = AugConfig(resize=1.0, resize_dims=(1600, 900),
                    crop=(0, 0, 1600, 900), flip=False, rotate=0.0)
    np.testing.assert_allclose(img_transform_matrix(aug), np.eye(3),
                               atol=1e-8)


def test_aug_matrix_flip_maps_edges():
    aug = AugConfig(resize=1.0, resize_dims=(100, 50), crop=(0, 0, 100, 50),
                    flip=True, rotate=0.0)
    m = img_transform_matrix(aug)
    # x=0 → x=100; x=100 → 0
    np.testing.assert_allclose(m @ np.array([0, 10, 1.0]), [100, 10, 1],
                               atol=1e-6)


def test_sample_augmentation_test_mode_deterministic():
    rng = np.random.RandomState(0)
    a1 = sample_augmentation(rng, H=900, W=1600, final_dim=(864, 1600),
                             resize_lim=(1.0, 1.0), test_mode=True)
    a2 = sample_augmentation(rng, H=900, W=1600, final_dim=(864, 1600),
                             resize_lim=(1.0, 1.0), test_mode=True)
    assert a1 == a2 and not a1.flip and a1.rotate == 0.0


def test_photometric_preserves_shape_dtype():
    rng = np.random.RandomState(2)
    img = rng.rand(8, 12, 3).astype(np.float32) * 255
    out = photometric_distortion(img, rng)
    assert out.shape == img.shape and np.all(np.isfinite(out))


def test_prepare_anchor_points_exact_count_and_range():
    rng = np.random.RandomState(3)
    scan = rng.uniform(-60, 60, (300, 3)).astype(np.float32)
    pts = _prepare_anchor_points(scan, (-50, -50, -5, 50, 50, 3), 512, rng,
                                 0.2)
    assert pts.shape == (512, 3)
    assert pts.min() >= 0.0 and pts.max() <= 1.0


def test_sharded_sampler_resume_and_shards():
    s0 = ShardedSampler(10, shard_id=0, num_shards=2, shuffle=False)
    s1 = ShardedSampler(10, shard_id=1, num_shards=2, shuffle=False)
    a, b = list(s0), list(s1)
    assert sorted(a + b) == list(range(10))
    s0.set_last_iter(3)
    assert list(s0) == a[3:]
    assert list(s0) == a  # fast-forward consumed


def test_dataloader_batches():
    ds = SyntheticOccDataset(num_samples=4, num_cams=2,
                             image_size=(32, 48), grid=(10, 10, 4))
    dl = DataLoader(ds, 2, shuffle=False)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["imgs"].shape == (2, 2, 32, 48, 3)
    assert batches[0]["occ_label"].shape == (2, 10, 10, 4)


def test_dataloader_prefetch_matches_sync():
    """The threaded prefetch loader yields byte-identical batches in the
    same order as the synchronous path, across epochs (reference
    num_workers analog, dataset/__init__.py:30-53)."""
    ds = SyntheticOccDataset(num_samples=7, num_cams=2,
                             image_size=(32, 48), grid=(10, 10, 4))
    sync = DataLoader(ds, 2, shuffle=True, seed=3)
    pre = DataLoader(ds, 2, shuffle=True, seed=3, num_workers=3,
                     prefetch=2)
    for epoch in range(2):
        sync.sampler.set_epoch(epoch)
        pre.sampler.set_epoch(epoch)
        a, b = list(sync), list(pre)
        assert len(a) == len(b) == len(pre) == 3  # drop_last
        for ba, bb in zip(a, b):
            assert sorted(ba) == sorted(bb)
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k])
    # early break mid-epoch leaves the loader reusable
    it = iter(pre)
    next(it)
    it.close()
    assert len(list(pre)) == 3
