"""Punctual light table (KHR_lights_punctual).

Mirrors FLight + the packed light buffers (ref: inc/gpu-shared-types.h:206-215,
src/scene.cpp:646-670, 1462-1486): per-light type/color/intensity/range/spot
angles plus a world transform gathered from the node that references the
light. Directional lights participate in sun-direction selection
(ref: src/scene.cpp:1593-1655).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

LIGHT_DIRECTIONAL = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2

_TYPES = {"directional": LIGHT_DIRECTIONAL, "point": LIGHT_POINT,
          "spot": LIGHT_SPOT}


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LightTable:
    type: jnp.ndarray          # (L,) i32
    color: jnp.ndarray         # (L, 3) f32
    intensity: jnp.ndarray     # (L,) f32
    range: jnp.ndarray         # (L,) f32 (0 = unbounded)
    spot_angles: jnp.ndarray   # (L, 2) f32 (inner, outer cone angle)
    transform: jnp.ndarray     # (L, 4, 4) f32 world transform
    count: jnp.ndarray         # () i32 actual light count (arrays are padded)


def build_light_table(light_defs, light_transforms, pad_to: int = 1
                      ) -> LightTable:
    """light_defs: list of glTF light dicts; light_transforms: list of 4x4."""
    n = len(light_defs)
    cap = max(pad_to, n, 1)
    t = np.zeros((cap,), np.int32)
    color = np.ones((cap, 3), np.float32)
    intensity = np.zeros((cap,), np.float32)
    rng = np.zeros((cap,), np.float32)
    spot = np.zeros((cap, 2), np.float32)
    xform = np.tile(np.eye(4, dtype=np.float32), (cap, 1, 1))
    for i, (ld, tr) in enumerate(zip(light_defs, light_transforms)):
        t[i] = _TYPES.get(ld.get("type", "point"), LIGHT_POINT)
        color[i] = np.asarray(ld.get("color", [1, 1, 1]), np.float32)
        intensity[i] = ld.get("intensity", 1.0)
        rng[i] = ld.get("range", 0.0)
        s = ld.get("spot", {})
        spot[i] = [s.get("innerConeAngle", 0.0),
                   s.get("outerConeAngle", np.pi / 4.0)]
        xform[i] = np.asarray(tr, np.float32)
    return LightTable(
        type=jnp.asarray(t), color=jnp.asarray(color),
        intensity=jnp.asarray(intensity), range=jnp.asarray(rng),
        spot_angles=jnp.asarray(spot), transform=jnp.asarray(xform),
        count=jnp.asarray(np.int32(n)))


def light_direction_toward(transform):
    """Direction *toward* a directional/spot light: the reference computes
    L = (0,0,-1) @ R = -row2 of the rotation (ref: lighting/common.hlsli:17).
    transform: (..., 4, 4)."""
    l = -transform[..., 2, :3]
    return l / jnp.linalg.norm(l, axis=-1, keepdims=True)


def sun_direction_tod(decimal_hours: float, julian_date: int,
                      latitude_deg: float) -> np.ndarray:
    """Solar direction from time of day (ref: src/scene.cpp:1593-1638,
    Preetham A.6). Returns unit vector toward the sun, LH y-up."""
    l = np.radians(latitude_deg)
    delta = 0.4093 * np.sin(2.0 * np.pi * (julian_date - 81.0) / 368.0)
    t = np.pi * decimal_hours / 12.0
    theta = 0.5 * np.pi - np.arcsin(
        np.sin(l) * np.sin(delta) - np.cos(l) * np.cos(delta) * np.cos(t))
    phi = np.arctan(-np.cos(delta) * np.sin(t)
                    / (np.cos(l) * np.sin(delta)
                       - np.sin(l) * np.cos(delta) * np.cos(t)))
    d = np.array([np.sin(theta) * np.cos(phi),
                  np.cos(theta),
                  np.sin(theta) * np.sin(phi)], np.float32)
    return d / np.linalg.norm(d)


DEFAULT_SUN_DIR = np.array([1.0, 0.1, 1.0], np.float32) / np.linalg.norm(
    [1.0, 0.1, 1.0])  # ref: src/scene.cpp:1652-1654
