"""Data pipeline transforms (numpy / PIL).

Behavioral parity with reference dataset/transform_3d.py:
  - :func:`sample_augmentation` — aug parameter sampling
    (dataset/dataset.py:68-100);
  - :func:`resize_crop_flip` — image warp + homography (ida_mat) update
    (transform_3d.py:75-138);
  - :func:`photometric_distortion` — brightness/contrast/HSV jitter
    (transform_3d.py:181-287);
  - :func:`normalize_images` — (img - mean) / std. Images are loaded RGB
    here (PIL), so `to_rgb` conversion from the reference's BGR loading is
    a no-op by construction;
  - :func:`load_occupancy_surroundocc` — sparse [K, 4] npy → dense
    200x200x16 grid with empty=17, camera mask, voxel-center meshgrid
    (transform_3d.py:474-534).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


@dataclasses.dataclass
class AugConfig:
    resize: float
    resize_dims: Tuple[int, int]     # (W, H)
    crop: Tuple[int, int, int, int]  # (x0, y0, x1, y1)
    flip: bool
    rotate: float                    # degrees


def sample_augmentation(rng: np.random.RandomState, *, H: int, W: int,
                        final_dim: Tuple[int, int],
                        resize_lim: Tuple[float, float],
                        bot_pct_lim: Tuple[float, float] = (0.0, 0.0),
                        rot_lim: Tuple[float, float] = (0.0, 0.0),
                        rand_flip: bool = True,
                        test_mode: bool = False) -> AugConfig:
    fH, fW = final_dim
    if not test_mode:
        resize = rng.uniform(*resize_lim)
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int((1 - rng.uniform(*bot_pct_lim)) * newH) - fH
        crop_w = int(rng.uniform(0, max(0, newW - fW)))
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = bool(rand_flip and rng.choice([0, 1]))
        rotate = rng.uniform(*rot_lim)
    else:
        resize = max(fH / H, fW / W)
        resize_dims = (int(W * resize), int(H * resize))
        newW, newH = resize_dims
        crop_h = int((1 - np.mean(bot_pct_lim)) * newH) - fH
        crop_w = int(max(0, newW - fW) / 2)
        crop = (crop_w, crop_h, crop_w + fW, crop_h + fH)
        flip = False
        rotate = 0.0
    return AugConfig(resize, resize_dims, crop, flip, rotate)


def _rot2(deg: float) -> np.ndarray:
    h = deg / 180.0 * np.pi
    return np.array([[np.cos(h), np.sin(h)], [-np.sin(h), np.cos(h)]],
                    np.float64)


def img_transform_matrix(aug: AugConfig) -> np.ndarray:
    """3x3 post-homography for the resize/crop/flip/rotate chain
    (transform_3d.py:112-138)."""
    ida_rot = np.eye(2) * aug.resize
    ida_tran = -np.asarray(aug.crop[:2], np.float64)
    if aug.flip:
        A = np.array([[-1.0, 0.0], [0.0, 1.0]])
        b = np.array([aug.crop[2] - aug.crop[0], 0.0])
        ida_rot = A @ ida_rot
        ida_tran = A @ ida_tran + b
    A = _rot2(aug.rotate)
    b = np.array([aug.crop[2] - aug.crop[0],
                  aug.crop[3] - aug.crop[1]]) / 2.0
    b = A @ (-b) + b
    ida_rot = A @ ida_rot
    ida_tran = A @ ida_tran + b
    m = np.eye(3)
    m[:2, :2] = ida_rot
    m[:2, 2] = ida_tran
    return m


def resize_crop_flip(imgs: Sequence[np.ndarray], aug: AugConfig,
                     lidar2img: np.ndarray):
    """Apply the warp to each camera image and update lidar2img in place.

    imgs: list of [H, W, 3] float32 (RGB); lidar2img: [N, 4, 4].
    Returns (new_imgs, new_lidar2img, image_shapes)."""
    assert Image is not None, "PIL required for image transforms"
    mat3 = img_transform_matrix(aug)
    mat4 = np.eye(4)
    mat4[:3, :3] = mat3
    new_imgs = []
    new_l2i = lidar2img.copy()
    for i, img in enumerate(imgs):
        im = Image.fromarray(img if img.dtype == np.uint8
                             else np.uint8(img))
        if im.size != tuple(aug.resize_dims):
            im = im.resize(aug.resize_dims)
        im = im.crop(aug.crop)
        if aug.flip:
            im = im.transpose(method=Image.FLIP_LEFT_RIGHT)
        if aug.rotate:
            im = im.rotate(aug.rotate)
        # stays uint8: photometric/normalize promote to f32 themselves
        new_imgs.append(np.asarray(im))
        new_l2i[i] = mat4 @ lidar2img[i]
    shapes = [x.shape[:2] for x in new_imgs]
    return new_imgs, new_l2i, shapes


# ---------------------------------------------------------------- photometric
def _rgb_to_hsv(img):
    """Vectorized RGB[0..255] → HSV (H in [0,360), S in [0,1], V in
    [0,255]). Single-divide formulation: h = (Δch)·(60/δ) + sector
    offset, negatives wrapped by +360 — equal to the textbook
    ((Δch/δ) mod 6)·60 piecewise form."""
    r = np.ascontiguousarray(img[..., 0])
    g = np.ascontiguousarray(img[..., 1])
    b = np.ascontiguousarray(img[..., 2])
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    inv = 60.0 / np.maximum(delta, 1e-12)
    h = np.where(maxc == r, (g - b) * inv,
                 np.where(maxc == g, (b - r) * inv + 120.0,
                          (r - g) * inv + 240.0))
    h = np.where(h < 0, h + 360.0, h)
    h = np.where(delta == 0, 0.0, h)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv):
    """Branch-free exact inverse: ch(n) = v − v·s·clip(min(k, 4−k), 0, 1)
    with k = (n + h/60) mod 6, n = (5, 3, 1) for (r, g, b)."""
    h6 = hsv[..., 0] * (1.0 / 60.0)
    s, v = hsv[..., 1], hsv[..., 2]
    vs = v * s

    def chan(n):
        k = (n + h6) % 6.0
        return v - vs * np.clip(np.minimum(k, 4.0 - k), 0.0, 1.0)

    return np.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def photometric_distortion(img: np.ndarray, rng: np.random.RandomState, *,
                           brightness_delta: float = 32.0,
                           contrast_range=(0.5, 1.5),
                           saturation_range=(0.5, 1.5),
                           hue_delta: float = 18.0) -> np.ndarray:
    """Reference PhotoMetricDistortionMultiViewImage (transform_3d.py:181).

    Gate draws happen in the reference order; the RGB→HSV→RGB round
    trip (the pipeline's hottest CPU op) is skipped entirely when
    neither the saturation nor the hue jitter fires (p = 1/4)."""
    img = img.astype(np.float32)
    if rng.randint(2):
        img += rng.uniform(-brightness_delta, brightness_delta)
    mode = rng.randint(2)
    if mode == 1 and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    sat = rng.uniform(*saturation_range) if rng.randint(2) else None
    hue = rng.uniform(-hue_delta, hue_delta) if rng.randint(2) else None
    if sat is not None or hue is not None:
        hsv = _rgb_to_hsv(np.clip(img, 0, 255))
        if sat is not None:
            hsv[..., 1] *= sat
        if hue is not None:
            hsv[..., 0] = (hsv[..., 0] + hue) % 360.0
        img = _hsv_to_rgb(hsv)
    else:
        np.clip(img, 0, 255, out=img)
    if mode == 0 and rng.randint(2):
        img *= rng.uniform(*contrast_range)
    if rng.randint(2):
        img = np.ascontiguousarray(img[..., rng.permutation(3)])
    return img


def normalize_images(imgs: Sequence[np.ndarray], mean, std) -> np.ndarray:
    mean = np.asarray(mean, np.float32)
    inv_std = 1.0 / np.asarray(std, np.float32)
    out = np.empty((len(imgs),) + tuple(imgs[0].shape), np.float32)
    for i, im in enumerate(imgs):
        np.subtract(im, mean, out=out[i], casting="unsafe")
        out[i] *= inv_std
    return out


# ----------------------------------------------------------------- occupancy
def occ_meshgrid(pc_range=(-50.0, -50.0, -5.0, 50.0, 50.0, 3.0),
                 grid=(200, 200, 16), reso: float = 0.5) -> np.ndarray:
    xs = np.arange(grid[0], dtype=np.float32) * reso + 0.5 * reso + pc_range[0]
    ys = np.arange(grid[1], dtype=np.float32) * reso + 0.5 * reso + pc_range[1]
    zs = np.arange(grid[2], dtype=np.float32) * reso + 0.5 * reso + pc_range[2]
    return np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                    axis=-1).astype(np.float32)


def load_points(pts_path: str, pc_range, num_pts: int,
                rng: Optional[np.random.RandomState] = None,
                jitter: float = 0.2) -> np.ndarray:
    """Lidar point anchors for the v1 `pts_init` path (reference
    LoadPointFromFile, transform_3d.py:357-408): read nuScenes .bin points,
    keep in-range points farther than 1 m, pad with jittered copies or
    subsample to exactly ``num_pts``, and normalize to [0, 1]^3."""
    rng = rng or np.random.RandomState(0)
    scan = np.fromfile(pts_path, dtype=np.float32).reshape(-1, 5)[:, :3]
    return _prepare_anchor_points(scan, pc_range, num_pts, rng, jitter)


def load_pseudo_points(npy_path: str, pc_range, num_pts: int,
                       ego2lidar: Optional[np.ndarray] = None,
                       rng: Optional[np.random.RandomState] = None,
                       jitter: float = 0.3) -> np.ndarray:
    """Pseudo-lidar anchors (reference LoadPseudoPointFromFile,
    transform_3d.py:411-470)."""
    rng = rng or np.random.RandomState(0)
    scan = np.load(npy_path)
    if ego2lidar is not None:
        h = np.concatenate([scan, np.ones_like(scan[:, :1])], axis=-1)
        scan = (ego2lidar[None] @ h[..., None])[..., 0]
    return _prepare_anchor_points(scan[:, :3], pc_range, num_pts, rng,
                                  jitter)


def _prepare_anchor_points(scan, pc_range, num_pts, rng, jitter):
    norm = np.linalg.norm(scan, 2, axis=-1)
    lo = np.asarray(pc_range[:3])
    hi = np.asarray(pc_range[3:6])
    mask = np.all((scan > lo) & (scan < hi), axis=-1) & (norm > 1.0)
    scan = scan[mask]
    if scan.shape[0] == 0:
        scan = np.zeros((1, 3), np.float32)
    if scan.shape[0] < num_pts:
        multi = int(np.ceil(num_pts / scan.shape[0]))
        extra = np.repeat(scan, multi, 0)
        extra = extra + rng.randn(*extra.shape) * jitter
        extra = extra[rng.choice(extra.shape[0],
                                 num_pts - scan.shape[0], False)]
        extra = np.clip(extra, lo, hi)
        scan = np.concatenate([scan, extra], 0)
    else:
        scan = scan[rng.choice(scan.shape[0], num_pts, False)]
    return ((scan - lo) / (hi - lo)).astype(np.float32)


def load_occupancy_kitti360(label_path: str, *,
                            unknown_to_empty: bool = False,
                            training: bool = False):
    """KITTI-360 SSCBench labels (reference LoadOccupancyKITTI360,
    transform_3d.py:543-586): dense 256x256x32 grid at 0.2 m, ignore
    label 255 masked out, grid origin [0, -25.6, -2.0]."""
    label = np.load(label_path).astype(np.int64)
    if unknown_to_empty and training:
        label[label == 255] = 0
    mask = label != 255
    xyz = occ_meshgrid((0.0, -25.6, -2.0, 51.2, 25.6, 4.4),
                       (256, 256, 32), 0.2)
    return label, mask, xyz


def load_occupancy_surroundocc(label_path: str,
                               grid=(200, 200, 16),
                               empty_label: int = 17):
    """Sparse [K, 4] (x, y, z, cls) npy → (occ_label, occ_cam_mask, occ_xyz).

    The camera mask marks voxels with label != 0 (class 0 = "unobserved" in
    the SurroundOcc release; transform_3d.py:509)."""
    label = np.load(label_path)
    occ = np.full(grid, empty_label, np.int64)
    occ[label[:, 0], label[:, 1], label[:, 2]] = label[:, 3]
    mask = occ != 0
    return occ, mask, occ_meshgrid(grid=grid)
