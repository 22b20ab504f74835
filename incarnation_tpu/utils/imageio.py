"""Image IO helpers (PNG output, HDR input for environment probes)."""

from __future__ import annotations

import numpy as np


def save_png(path, img):
    """img: (H, W, 3|4) uint8 or float in [0, 1]."""
    from PIL import Image
    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    Image.fromarray(img).save(str(path))


def load_hdr(path) -> np.ndarray:
    """Radiance .hdr -> (H, W, 3) float32 linear (for the HDRI probe path,
    ref: src/demo.cpp:313-321 uses DirectXTex LoadFromHDRFile)."""
    import cv2
    img = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH | cv2.IMREAD_ANYCOLOR)
    if img is None:
        raise FileNotFoundError(path)
    return np.ascontiguousarray(img[..., ::-1]).astype(np.float32)  # BGR->RGB


def psnr(a, b, peak=1.0) -> float:
    """PSNR in dB between two images (the parity gate, SURVEY.md §4)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))
