"""Image directory I/O (PIL-based) + the reference's 16-bit depth PNG contract.

Depth PNGs follow the reference's on-disk format: relative depth normalized to
[0, 65535] uint16, read back as /65535 (/root/reference/motion_seg/load_cut_seq.py:41).
"""
from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm")


def list_images(image_dir) -> List[Path]:
    paths = [p for p in sorted(Path(image_dir).iterdir()) if p.suffix.lower() in IMAGE_EXTS]
    if not paths:
        raise FileNotFoundError(f"no images found in {image_dir}")
    return paths


def load_image(path, resize_hw: Optional[Tuple[int, int]] = None) -> np.ndarray:
    img = Image.open(path).convert("RGB")
    if resize_hw is not None:
        img = img.resize((resize_hw[1], resize_hw[0]), Image.BILINEAR)
    return np.asarray(img, np.float32)


def load_image_stack(image_dir, resize_hw=None) -> Tuple[np.ndarray, List[str]]:
    paths = list_images(image_dir)
    imgs = np.stack([load_image(p, resize_hw) for p in paths])
    return imgs, [p.name for p in paths]


def write_depth_png16(path, depth01: np.ndarray) -> None:
    """Write [0,1] relative depth as 16-bit PNG (run_midas output contract)."""
    d = np.clip(depth01, 0.0, 1.0)
    Image.fromarray((d * 65535.0).astype(np.uint16), mode="I;16").save(path)


def read_depth_png16(path) -> np.ndarray:
    """Read a 16-bit depth PNG back to [0,1] (load_cut_seq.py:41)."""
    return np.asarray(Image.open(path), np.float32) / 65535.0
