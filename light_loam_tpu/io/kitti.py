"""KITTI odometry dataset I/O — the kittiHelper equivalent
(reference: src/kittiHelper.cpp) plus the evaluation pose writer
(reference: src/laserMapping.cpp:2284-2326).

Host-side NumPy/stdlib code: file I/O is not compute-path work.  The
camera→LiDAR ground-truth re-axing uses the fixed rotation
R = [[0,0,1],[-1,0,0],[0,-1,0]] (kittiHelper.cpp:75-77).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, Optional, Tuple

import numpy as np

# camera frame -> lidar frame rotation (kittiHelper.cpp:76)
R_CAM_TO_LIDAR = np.array(
    [[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]], dtype=np.float64
)


def read_lidar_bin(path: str) -> np.ndarray:
    """Read a KITTI velodyne .bin: float32 records (x, y, z, intensity)
    (kittiHelper.cpp:22-32,137-148).  Returns (N, 4) float32."""
    data = np.fromfile(path, dtype=np.float32)
    return data.reshape(-1, 4)


def read_times(path: str) -> np.ndarray:
    return np.loadtxt(path, dtype=np.float64).reshape(-1)


def read_gt_poses(path: str) -> np.ndarray:
    """Read a KITTI ground-truth/result pose file: each row a 3×4
    row-major camera-frame pose.  Returns (N, 3, 4) float64."""
    raw = np.loadtxt(path, dtype=np.float64)
    return raw.reshape(-1, 3, 4)


def gt_to_lidar_frame(gt: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Re-axe GT from camera to lidar frame like kittiHelper.cpp:105-108:
    q = q_transform * q_cam (rotation only on the left), t = R_transform·t.
    Returns (R (N,3,3), t (N,3))."""
    Rw = R_CAM_TO_LIDAR[None] @ gt[:, :, :3]
    t = (R_CAM_TO_LIDAR @ gt[:, :, 3].T).T
    return Rw, t


@dataclass
class KittiSequence:
    """Iterates (timestamp, points (N,4)) frames of one sequence, with the
    reference's directory layout (kittiHelper.cpp:65-69,128-130)."""

    dataset_folder: str
    sequence: str

    def __post_init__(self):
        self.times = read_times(
            os.path.join(self.dataset_folder, "sequences", self.sequence, "times.txt")
        )
        gt_path = os.path.join(self.dataset_folder, "results", f"{self.sequence}.txt")
        self.gt = read_gt_poses(gt_path) if os.path.exists(gt_path) else None

    def __len__(self) -> int:
        return len(self.times)

    def frame_path(self, i: int) -> str:
        return os.path.join(
            self.dataset_folder, "velodyne", "sequences", self.sequence,
            "velodyne", f"{i:06d}.bin",
        )

    def __iter__(self) -> Iterator[Tuple[float, np.ndarray]]:
        for i in range(len(self)):
            yield self.times[i], read_lidar_bin(self.frame_path(i))


class KittiPoseWriter:
    """Append first-pose-relative 3×4 poses in KITTI format
    (laserMapping.cpp:2284-2326): H_rel = H_init⁻¹ · H, written row-major
    in %e with 6 digits, space-separated, one pose per line."""

    def __init__(self, path: str):
        self.path = path
        self._h_init_inv: Optional[np.ndarray] = None
        # truncate like a fresh run (the reference appends, so stale files
        # would corrupt evaluation; start clean)
        open(path, "w").close()

    def write(self, R: np.ndarray, t: np.ndarray) -> None:
        H = np.eye(4, dtype=np.float64)
        H[:3, :3] = R
        H[:3, 3] = t
        if self._h_init_inv is None:
            self._h_init_inv = np.linalg.inv(H)
        H = self._h_init_inv @ H
        row = H[:3, :].reshape(-1)
        with open(self.path, "a") as f:
            f.write(" ".join(f"{v:.6e}" for v in row) + "\n")


def ate_rmse(traj: np.ndarray, gt: np.ndarray) -> float:
    """Absolute trajectory error (RMSE of translation) after first-pose
    alignment; traj/gt are (N, 3, 4) pose arrays in the same frame."""
    n = min(len(traj), len(gt))
    errs = traj[:n, :, 3] - gt[:n, :, 3]
    return float(np.sqrt(np.mean(np.sum(errs**2, axis=1))))
