"""Synthetic ground-truth point-pair generation.

Parity with ``Data/Scripts/synthetic/create_data.py:27-95``: gaussian-spread
original points, moved points displaced by a rigid offset along an axis whose
magnitude can be constant (Planar), linear in x (Gradual: rigid*(1 + k*x)) or
quadratic (Curvature: rigid*(k*x)^2), plus isotropic gaussian movement; both
sets are then rotated and translated into the camera frustum.
"""

from __future__ import annotations

import numpy as np


def rotation_xyz(angle_x=0.0, angle_y=0.0, angle_z=0.0):
    ax, ay, az = np.deg2rad([angle_x, angle_y, angle_z])
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def generate_points(
    num_points=240,
    rigid_movement=0.0,
    gaussian_movement=0.0,
    x_mean=0.0,
    x_std=0.03,
    y_mean=0.0,
    y_std=0.001,
    z_mean=0.2,
    z_std=0.01,
    angle_x=-45.0,
    angle_y=0.0,
    angle_z=45.0,
    grad_direction="y",
    grad_intensity=25.0,
    movement_type="Planar",
    rng=None,
):
    """Returns (original [N, 3], moved [N, 3]). ``movement_type`` in
    {Planar, Gradual, Curvature}."""
    rng = rng or np.random.default_rng()
    original = np.zeros((num_points, 3))
    original[:, 0] = rng.normal(0.0, x_std, num_points)
    original[:, 1] = rng.normal(0.0, y_std, num_points)
    original[:, 2] = rng.normal(0.0, z_std, num_points)

    moved = original.copy()
    axis = {"x": 0, "y": 1, "z": 2}[grad_direction]
    grad_factor = grad_intensity * moved[:, 0]
    if movement_type == "Curvature":
        moved[:, axis] += rigid_movement * grad_factor**2
    elif movement_type == "Gradual":
        moved[:, axis] += rigid_movement * (1.0 + grad_factor)
    else:
        moved[:, axis] += rigid_movement
    moved += rng.normal(scale=max(gaussian_movement, 1e-300), size=moved.shape)

    R = rotation_xyz(angle_x, angle_y, angle_z)
    mean = np.array([x_mean, y_mean, z_mean])
    return original @ R.T + mean, moved @ R.T + mean


def save_points(filename, points):
    np.savetxt(filename, points, delimiter=" ")
