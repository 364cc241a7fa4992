"""NumPy oracle implementing the reference scan-registration semantics.

A direct, readable re-expression of src/scanRegistration.cpp:87-368 used as
the ground truth for pick-for-pick validation of the vectorized TPU kernel.
Works on compacted clouds like the C++ (no padding), sequential greedy
selection included.
"""

from __future__ import annotations

import numpy as np


def oracle_ring_ids(pts, n_scans, lower=-24.9, upper=2.0):
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    angle = np.degrees(np.arctan(z / np.sqrt(x * x + y * y)))
    if n_scans == 16:
        ring = np.trunc((angle + 15.0) / 2.0 + 0.5).astype(int)
    elif n_scans == 32:
        ring = np.trunc((angle + 92.0 / 3.0) * 3.0 / 4.0).astype(int)
    else:
        factor = (n_scans - 1) / (upper - lower)
        ring = np.trunc((angle - lower) * factor + 0.5).astype(int)
    ok = (ring >= 0) & (ring < n_scans)
    return ring, ok


def oracle_rel_time(pts, ring_ok):
    n = len(pts)
    start_ori = -np.arctan2(pts[0, 1], pts[0, 0])
    end_ori = -np.arctan2(pts[-1, 1], pts[-1, 0]) + 2 * np.pi
    if end_ori - start_ori > 3 * np.pi:
        end_ori -= 2 * np.pi
    elif end_ori - start_ori < np.pi:
        end_ori += 2 * np.pi
    half_passed = False
    rel = np.zeros(n)
    for i in range(n):
        if not ring_ok[i]:
            continue
        ori = -np.arctan2(pts[i, 1], pts[i, 0])
        if not half_passed:
            if ori < start_ori - np.pi / 2:
                ori += 2 * np.pi
            elif ori > start_ori + np.pi * 3 / 2:
                ori -= 2 * np.pi
            if ori - start_ori > np.pi:
                half_passed = True
        else:
            ori += 2 * np.pi
            if ori < end_ori - np.pi * 3 / 2:
                ori += 2 * np.pi
            elif ori > end_ori + np.pi / 2:
                ori -= 2 * np.pi
        rel[i] = (ori - start_ori) / (end_ori - start_ori)
    return rel


def oracle_features(pts, n_scans, min_range=5.0, lower=-24.9, upper=2.0):
    """Full oracle. Returns a dict with the ring-ordered cloud, per-point
    ring/col, curvature, labels, and the four feature index lists (into the
    ring-ordered concatenated cloud) in reference push order."""
    # range filter (NaNs assumed pre-removed)
    r2 = np.sum(pts**2, axis=1)
    pts = pts[r2 >= min_range**2]

    ring, ok = oracle_ring_ids(pts, n_scans, lower, upper)
    rel = oracle_rel_time(pts, ok)

    # per-ring concatenation preserving arrival order
    scans = [[] for _ in range(n_scans)]
    scan_rel = [[] for _ in range(n_scans)]
    for i in range(len(pts)):
        if ok[i]:
            scans[ring[i]].append(pts[i])
            scan_rel[ring[i]].append(ring[i] + 0.1 * rel[i])
    cloud = []
    cloud_rel = []
    start_ind = np.zeros(n_scans, int)
    end_ind = np.zeros(n_scans, int)
    for r in range(n_scans):
        start_ind[r] = len(cloud) + 5
        cloud.extend(scans[r])
        cloud_rel.extend(scan_rel[r])
        end_ind[r] = len(cloud) - 6
    cloud = np.asarray(cloud, dtype=np.float32)
    cloud_rel = np.asarray(cloud_rel, dtype=np.float32)
    n = len(cloud)

    curv = np.zeros(n, dtype=np.float32)
    for i in range(5, n - 5):
        d = (
            np.sum(cloud[i - 5 : i + 6], axis=0, dtype=np.float32)
            - 11.0 * cloud[i]
        )
        curv[i] = float(np.dot(d, d))

    picked = np.zeros(n, bool)
    label = np.zeros(n, np.int8)
    sharp, less_sharp, flat, less_flat = [], [], [], []

    def suppress(ind, direction):
        for l in range(1, 6):
            j = ind + l * direction
            prev = j - direction
            d = cloud[j] - cloud[prev]
            if float(np.dot(d, d)) > 0.05:
                break
            picked[j] = True

    for r in range(n_scans):
        if end_ind[r] - start_ind[r] < 6:
            continue
        for j in range(6):
            sp = start_ind[r] + (end_ind[r] - start_ind[r]) * j // 6
            ep = start_ind[r] + (end_ind[r] - start_ind[r]) * (j + 1) // 6 - 1
            order = sorted(range(sp, ep + 1), key=lambda k: curv[k])

            largest = 0
            for ind in reversed(order):
                if not picked[ind] and curv[ind] > 0.1:
                    largest += 1
                    if largest <= 2:
                        label[ind] = 2
                        sharp.append(ind)
                        less_sharp.append(ind)
                    elif largest <= 20:
                        label[ind] = 1
                        less_sharp.append(ind)
                    else:
                        break
                    picked[ind] = True
                    suppress(ind, +1)
                    suppress(ind, -1)

            smallest = 0
            for ind in order:
                if not picked[ind] and curv[ind] < 0.1:
                    label[ind] = -1
                    flat.append(ind)
                    smallest += 1
                    if smallest >= 4:
                        break
                    picked[ind] = True
                    suppress(ind, +1)
                    suppress(ind, -1)

            for k in range(sp, ep + 1):
                if label[k] <= 0:
                    less_flat.append(k)

    return dict(
        cloud=cloud,
        rel=cloud_rel,
        start_ind=start_ind,
        end_ind=end_ind,
        curvature=curv,
        label=label,
        sharp=sharp,
        less_sharp=less_sharp,
        flat=flat,
        less_flat=less_flat,
    )
