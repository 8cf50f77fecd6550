"""Free camera: position + yaw/pitch, view/projection matrices.

Re-design of ``src/camera/Camera.{h,cpp}``: same observable behavior —
pitch clamped to ±89° (``Camera.cpp:74-78``), view via look-at from the
yaw/pitch forward vector (``:63-72``), local-space Move (``:39-54``),
defaults pos (0, 2, -7), yaw = pi/2 facing +Z (``:19-26``), projection
fovY 60°, near 0.1, far 1000 (``Camera.h:33-35``).

Host-side object (mutable, tiny); produces jnp matrices consumed by the
jitted render pipeline.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from banggameengine_tpu import math3d

_PITCH_LIMIT = np.deg2rad(89.0)


class Camera:
    def __init__(self):
        self.position = np.array([0.0, 2.0, -7.0], np.float32)
        self.yaw = float(np.pi / 2)   # facing +Z
        self.pitch = 0.0
        self.fov_y_deg = 60.0
        self.near = 0.1
        self.far = 1000.0

    # -- orientation ---------------------------------------------------------
    def set_yaw_pitch(self, yaw: float, pitch: float) -> None:
        self.yaw = float(yaw)
        self.pitch = float(np.clip(pitch, -_PITCH_LIMIT, _PITCH_LIMIT))

    def add_yaw_pitch(self, dyaw: float, dpitch: float) -> None:
        self.set_yaw_pitch(self.yaw + dyaw, self.pitch + dpitch)

    def forward(self) -> np.ndarray:
        cp = np.cos(self.pitch)
        return np.array(
            [np.cos(self.yaw) * cp, np.sin(self.pitch), np.sin(self.yaw) * cp],
            np.float32,
        )

    def right(self) -> np.ndarray:
        f = self.forward()
        up = np.array([0.0, 1.0, 0.0], np.float32)
        r = np.cross(up, f)
        n = np.linalg.norm(r)
        return (r / n if n > 1e-9 else np.array([1, 0, 0], np.float32)).astype(np.float32)

    def move(self, local: np.ndarray) -> None:
        """Move in camera-local space (x=right, y=up, z=forward),
        Camera.cpp:39-54."""
        f = self.forward()
        r = self.right()
        up = np.array([0.0, 1.0, 0.0], np.float32)
        self.position = (
            self.position + r * local[0] + up * local[1] + f * local[2]
        ).astype(np.float32)

    # -- matrices ------------------------------------------------------------
    def view_matrix(self) -> jnp.ndarray:
        eye = jnp.asarray(self.position)
        at = eye + jnp.asarray(self.forward())
        return math3d.mtx_look_at(eye, at)

    def proj_matrix(self, aspect: float) -> jnp.ndarray:
        return math3d.mtx_proj(self.fov_y_deg, aspect, self.near, self.far)
