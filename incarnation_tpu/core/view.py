"""Fly camera / view state (ref: src/demo.cpp FView, lines 108-230).

The reference's FView is an interactive WASD+mouse camera; here the same state
(position + orthonormal LH basis + reverse-Z infinite projection) is a small
host-side object that produces the per-frame view constants consumed by the
jitted frame function (the analogue of FViewConstants uploads,
ref: renderer.cpp:1597-1672).
"""

from __future__ import annotations

import dataclasses
import numpy as np

from . import mathutils as mu


@dataclasses.dataclass
class View:
    position: np.ndarray
    right: np.ndarray
    up: np.ndarray
    look: np.ndarray
    fov: float = 0.25 * np.pi
    aspect: float = 16.0 / 9.0
    near: float = 1.0

    @staticmethod
    def default(aspect: float = 16.0 / 9.0, fov: float = 0.25 * np.pi,
                near: float = 1.0) -> "View":
        """Default camera (ref: demo.cpp:189-197): at (0,0,-15) looking +z."""
        return View(
            position=np.array([0.0, 0.0, -15.0], np.float32),
            right=np.array([1.0, 0.0, 0.0], np.float32),
            up=np.array([0.0, 1.0, 0.0], np.float32),
            look=np.array([0.0, 0.0, 1.0], np.float32),
            fov=fov, aspect=aspect, near=near)

    @staticmethod
    def from_lookat(position, target, aspect=16.0 / 9.0, fov=0.25 * np.pi,
                    near=1.0, world_up=(0.0, 1.0, 0.0)) -> "View":
        position = np.asarray(position, np.float32)
        look = np.asarray(target, np.float32) - position
        right0 = np.cross(np.asarray(world_up, np.float32), look)
        if np.linalg.norm(right0) < 1e-6:
            right0 = np.array([1.0, 0.0, 0.0], np.float32)
        right, up, look = mu.orthonormalize_basis(look, right0)
        return View(position, right, up, look, fov, aspect, near)

    def orthonormalize(self):
        self.right, self.up, self.look = mu.orthonormalize_basis(
            self.look, self.right)

    # -- Matrices (row-vector convention) -----------------------------------
    def view_transform(self) -> np.ndarray:
        return mu.view_matrix(self.position, self.right, self.up, self.look)

    def projection_transform(self) -> np.ndarray:
        return mu.perspective_reverse_z_infinite(self.fov, self.aspect,
                                                 self.near)

    def view_proj(self, jitter_ndc=None) -> np.ndarray:
        """view @ proj, with optional sub-pixel jitter added in NDC units
        (ref: renderer.cpp:1625-1631 applies Halton jitter to the projection).
        """
        m = self.view_transform() @ self.projection_transform()
        if jitter_ndc is not None:
            j = np.eye(4, dtype=np.float32)
            j[3, 0] = float(jitter_ndc[0])
            j[3, 1] = float(jitter_ndc[1])
            m = m @ j
        return m

    # -- Movement (ref: FView::Tick) ----------------------------------------
    def move(self, forward=0.0, strafe=0.0, lift=0.0):
        self.position = (self.position + forward * self.look
                         + strafe * self.right + lift * self.up)

    def rotate(self, yaw=0.0, pitch=0.0):
        """Yaw about world +y, pitch about the camera's right axis."""
        if pitch != 0.0:
            r = _axis_angle(self.right, pitch)
            self.up = self.up @ r
            self.look = self.look @ r
        if yaw != 0.0:
            r = _axis_angle(np.array([0.0, 1.0, 0.0], np.float32), yaw)
            self.right = self.right @ r
            self.up = self.up @ r
            self.look = self.look @ r
        self.orthonormalize()


def _axis_angle(axis, angle) -> np.ndarray:
    """3x3 rotation about a unit axis, row-vector convention."""
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    x, y, z = axis
    c, s = np.cos(angle), np.sin(angle)
    k = np.array([[0, z, -y], [-z, 0, x], [y, -x, 0]], np.float64)
    return (np.eye(3) + s * k + (1 - c) * (k @ k)).astype(np.float32)
