"""Shared helpers for the offline tool scripts.

Replaces the reference scripts' skimage/joblib dependencies with cv2/scipy
(skimage is not installed in this environment).  All tools are host-side;
the compute-heavy ones (SLIC parameter search) optionally use the device.
"""

import sys
from pathlib import Path

import cv2
import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def list_images(path):
    """Glob all images within a directory, sorted."""
    path = Path(path)
    images = []
    for ext in ("jpg", "jpeg", "png", "bmp"):
        images.extend(path.glob(f"*.{ext}"))
    return sorted(images)


def imread_rgb(path):
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def imread_gray(path):
    img = cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)
    if img is None:
        raise FileNotFoundError(path)
    return img


def imsave(path, img):
    img = np.asarray(img)
    if img.ndim == 3:
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
    cv2.imwrite(str(path), img)


def mark_boundaries(img, mask, color=(255, 255, 0)):
    """Thick-boundary overlay (skimage.segmentation.mark_boundaries stand-in)."""
    from scipy import ndimage

    mask = np.asarray(mask)
    dil = ndimage.grey_dilation(mask, size=(3, 3))
    ero = ndimage.grey_erosion(mask, size=(3, 3))
    boundary = dil != ero
    out = img.copy()
    out[boundary] = color
    return out


def label8(mask):
    """Connected components with skimage-default 8-connectivity."""
    from scipy import ndimage

    lab, _ = ndimage.label(np.asarray(mask) > 0, structure=np.ones((3, 3)))
    return lab
