#!/usr/bin/env python
"""Fit a spherical-projection Lidar model from recorded pointclouds.

Reference: nvblox_ros/scripts/calculate_lidar_params.py — inspects a rosbag's
pointclouds and derives num_azimuth/elevation divisions and vertical FoV for
the node's lidar parameters. Here the input is any `.npy`/`.npz` pointcloud
(N x 3, sensor frame) such as one recorded with datasets/recorded.py.

Usage: python tools/calculate_lidar_params.py cloud.npy [cloud2.npy ...]
"""

import argparse
import sys

import numpy as np


def fit_lidar_params(points: np.ndarray) -> dict:
    """Estimate beam structure from one scan."""
    r = np.linalg.norm(points, axis=1)
    ok = r > 1e-3
    p = points[ok]
    r = r[ok]
    elevation = np.arcsin(np.clip(p[:, 2] / r, -1.0, 1.0))
    azimuth = np.arctan2(p[:, 1], p[:, 0])

    # Beam rows: cluster elevations (histogram peaks with sub-milliradian
    # resolution; standard spinning lidars have fixed elevation rings).
    el_sorted = np.sort(elevation)
    gaps = np.diff(el_sorted)
    ring_break = gaps > max(np.percentile(gaps, 99) * 0.5, 1e-4)
    num_elevation = int(ring_break.sum()) + 1

    # Azimuth divisions: points per ring (median).
    counts = np.histogram(elevation, bins=num_elevation)[0]
    num_azimuth = int(np.median(counts[counts > 0]))
    # Round to the usual power-of-two-ish column counts.
    for cand in (512, 900, 1024, 1800, 2048, 4096):
        if abs(num_azimuth - cand) / cand < 0.12:
            num_azimuth = cand
            break

    return {
        "num_azimuth_divisions": num_azimuth,
        "num_elevation_divisions": num_elevation,
        "min_angle_below_zero_elevation_deg":
            float(np.degrees(-el_sorted[0])),
        "max_angle_above_zero_elevation_deg":
            float(np.degrees(el_sorted[-1])),
        "vertical_fov_deg": float(np.degrees(el_sorted[-1] - el_sorted[0])),
        "min_valid_range_m": float(np.percentile(r, 0.1)),
        "max_valid_range_m": float(np.percentile(r, 99.9)),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("clouds", nargs="+")
    args = ap.parse_args()
    results = []
    for path in args.clouds:
        if path.endswith(".npz"):
            with np.load(path) as d:
                pts = d[list(d.files)[0]]
        else:
            pts = np.load(path)
        results.append(fit_lidar_params(np.asarray(pts).reshape(-1, 3)))
    keys = results[0].keys()
    merged = {k: float(np.median([r[k] for r in results])) for k in keys}
    merged["num_azimuth_divisions"] = int(merged["num_azimuth_divisions"])
    merged["num_elevation_divisions"] = int(merged["num_elevation_divisions"])
    import json
    print(json.dumps(merged, indent=2))


if __name__ == "__main__":
    main()
