"""nuScenes dataset (SurroundOcc labels).

Parity with reference dataset/dataset.py:13-169: reads the pkl scene
infos, sorts keyframes, builds per-frame camera geometry (lidar2img), runs
the transform pipeline, and returns the model's input dict. Quaternion
math is done with a local helper (the reference uses pyquaternion).
"""
from __future__ import annotations

import os
import pickle
from copy import deepcopy
from typing import Dict, List, Optional, Sequence

import numpy as np

from . import transforms as T


def quat_to_mat(q) -> np.ndarray:
    """(w, x, y, z) → 3x3 rotation matrix (pyquaternion convention)."""
    w, x, y, z = [float(v) for v in q]
    n = np.sqrt(w * w + x * x + y * y + z * z)
    w, x, y, z = w / n, x / n, y / n, z / n
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _pose_mat(calib_or_pose) -> np.ndarray:
    m = np.eye(4)
    m[:3, :3] = quat_to_mat(calib_or_pose["rotation"])
    m[:3, 3] = np.asarray(calib_or_pose["translation"], np.float64)
    return m


def get_sensor2global(calib, pose) -> np.ndarray:
    """sensor→ego (calib) composed with ego→global (pose)
    (reference dataset/utils.py:31-59)."""
    return _pose_mat(pose) @ _pose_mat(calib)


def get_img2global(calib, pose) -> np.ndarray:
    """camera→global including the intrinsic viewpad: global point =
    img2global @ [u*d, v*d, d, 1]."""
    viewpad = np.eye(4)
    intrinsic = np.asarray(calib["camera_intrinsic"], np.float64)
    viewpad[:3, :3] = intrinsic
    return get_sensor2global(calib, pose) @ np.linalg.inv(viewpad)


CAM_TYPES = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
             "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]


class NuScenesDataset:
    def __init__(self, data_root: str, imageset: str, occ_path: str,
                 data_aug_conf: Optional[dict] = None, phase: str = "train",
                 img_norm: Optional[dict] = None,
                 photometric: bool = True,
                 seed: int = 0):
        with open(imageset, "rb") as f:
            data = pickle.load(f)
        self.scene_infos = data["infos"]
        self.keyframes = sorted(
            data["metadata"], key=lambda x: x[0] + "{:0>3}".format(str(x[1])))
        self.data_root = data_root
        self.occ_path = occ_path
        self.data_aug_conf = data_aug_conf
        self.test_mode = phase != "train"
        self.photometric = photometric and not self.test_mode
        self.img_norm = img_norm or dict(
            mean=(123.675, 116.28, 103.53), std=(58.395, 57.12, 57.375))
        self.rng = np.random.RandomState(seed)
        # loader worker threads call __getitem__ concurrently; the
        # shared RandomState is only touched under this lock (one cheap
        # seed draw), each sample then augments with its own stream
        import threading
        self._rng_lock = threading.Lock()

    def __len__(self):
        return len(self.keyframes)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        scene_token, idx = self.keyframes[index]
        info = deepcopy(self.scene_infos[scene_token][idx])

        lidar2global = get_sensor2global(
            info["data"]["LIDAR_TOP"]["calib"],
            info["data"]["LIDAR_TOP"]["pose"])

        imgs, lidar2img = [], []
        for cam in CAM_TYPES:
            path = os.path.join(self.data_root,
                                info["data"][cam]["filename"])
            from PIL import Image
            # uint8 until after the PIL warp (resize_crop_flip wants
            # uint8; photometric/normalize promote to f32 themselves)
            imgs.append(np.asarray(Image.open(path).convert("RGB")))
            img2global = get_img2global(info["data"][cam]["calib"],
                                        info["data"][cam]["pose"])
            lidar2img.append(np.linalg.inv(img2global) @ lidar2global)
        lidar2img = np.asarray(lidar2img)

        # occupancy labels
        label_file = os.path.join(
            self.occ_path,
            info["data"]["LIDAR_TOP"]["filename"].split("/")[-1] + ".npy")
        occ_label, occ_cam_mask, occ_xyz = T.load_occupancy_surroundocc(
            label_file)

        with self._rng_lock:
            rng = np.random.RandomState(self.rng.randint(2 ** 31))

        # image aug
        if self.data_aug_conf is not None:
            aug = T.sample_augmentation(
                rng,
                H=self.data_aug_conf["H"], W=self.data_aug_conf["W"],
                final_dim=self.data_aug_conf["final_dim"],
                resize_lim=self.data_aug_conf["resize_lim"],
                bot_pct_lim=self.data_aug_conf.get("bot_pct_lim", (0.0, 0.0)),
                rot_lim=self.data_aug_conf.get("rot_lim", (0.0, 0.0)),
                rand_flip=self.data_aug_conf.get("rand_flip", True),
                test_mode=self.test_mode)
            imgs, lidar2img, shapes = T.resize_crop_flip(imgs, aug, lidar2img)
        else:
            shapes = [im.shape[:2] for im in imgs]

        if self.photometric:
            imgs = [T.photometric_distortion(im, rng) for im in imgs]

        img = T.normalize_images(imgs, **self.img_norm)

        image_wh = np.asarray(shapes, np.float32)[:, ::-1].copy()
        return {
            "imgs": img,                                 # [6, H, W, 3]
            "projection_mat": lidar2img.astype(np.float32),
            "image_wh": image_wh,
            "occ_label": occ_label.astype(np.int32),
            "occ_cam_mask": occ_cam_mask,
            "occ_xyz": occ_xyz,
        }
